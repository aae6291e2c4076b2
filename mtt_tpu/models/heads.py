"""Per-task prediction heads.

Equivalents of the reference heads: MLPHead (1x1 conv,
InvPT/models/transformers/transformer_decoder.py:124-131), ConvHead
(TaskPrompter/models/transformers/taskprompter.py:688-698) and DEConvHead
(taskprompter.py:700-715). NHWC.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mtt_tpu.models.layers import ConvBNAct


class MLPHead(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="linear_pred")(x)


class ConvHead(nn.Module):
    """3x3 conv + BN + GELU -> 1x1 logits."""
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        # exact-erf gelu: torch nn.GELU default (flax defaults to tanh-approx)
        gelu_exact = lambda v: nn.gelu(v, approximate=False)  # noqa: E731
        x = ConvBNAct(C, (3, 3), act=gelu_exact, use_bias=True, dtype=self.dtype,
                      name="mt_proj")(x, train=train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="linear_pred")(x)


class DEConvHead(nn.Module):
    """Deconv 2x upsample + conv stack -> 1x1 logits."""
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        x = nn.ConvTranspose(C // 2, (2, 2), strides=(2, 2), dtype=self.dtype,
                             name="deconv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(C // 2, (3, 3), padding="SAME", dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="linear_pred")(x)


HEADS = {"mlp": MLPHead, "conv": ConvHead, "deconv": DEConvHead}
