"""Per-task prediction heads.

Equivalents of the reference heads: MLPHead (1x1 conv,
InvPT/models/transformers/transformer_decoder.py:124-131), ConvHead
(TaskPrompter/models/transformers/taskprompter.py:688-698) and DEConvHead
(taskprompter.py:700-715). NHWC.
"""

from __future__ import annotations

import jax
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
    """3x3 conv + BN + GELU -> 1x1 logits.

    With ``up4=True`` the input is the LOW-resolution backbone feature map
    and the head computes the exact composite conv3x3(upsample4(x)) via 16
    phase kernels at low resolution (layers.up4_conv3x3_main): the per-task
    (B,4gh,4gw,C) upsampled map — the model's single hottest HBM tensor —
    is never materialised; BN/GELU/1x1 run on the flat phase channels
    (pointwise ops commute with depth-to-space) and only the small logit
    map is reassembled. In eval mode the exact border fixups (the 1-px
    high-res frame that reads the conv's zero padding) are pushed through
    the same pointwise epilogue and scattered into the tiny LOGIT tensor,
    so nothing sits between the big conv and the BN/GELU — XLA fuses them
    into one pass. Parameter tree and math identical to the plain path
    (reference: heads applied to the 4x-upsampled features,
    taskprompter.py:411-421,688-698)."""
    num_classes: int
    up4: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        # exact-erf gelu: torch nn.GELU default (flax defaults to tanh-approx)
        gelu_exact = lambda v: nn.gelu(v, approximate=False)  # noqa: E731
        if not self.up4:
            x = ConvBNAct(C, (3, 3), act=gelu_exact, use_bias=True,
                          dtype=self.dtype, name="mt_proj")(x, train=train)
            return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                           name="linear_pred")(x)

        from mtt_tpu.models.layers import (_Conv1x1Params, depth_to_space4,
                                           scatter_up4_borders,
                                           up4_conv3x3_borders,
                                           up4_conv3x3_main)
        n = self.num_classes
        dt = self.dtype
        kc, bc, gamma, beta, ra_mean, ra_var = \
            _MtProjParams(C, C, name="mt_proj")()
        kp, bp = _Conv1x1Params(n, C, name="linear_pred")()

        def grouped_logits(y):
            # per-phase 1x1 logits on the flat phase channels. NOT a
            # feature_group_count conv: XLA lowers grouped convs by
            # splitting channels into a (16, C) minor pair — a physical
            # retile at C=350 (0.33 ms/head measured). A block-diagonal
            # dense (16C, 16n) matmul wastes 15/16 of its (tiny: 31 GFLOP)
            # FLOPs but keeps the flat layout and fuses with the gelu.
            kb = (jnp.eye(16, dtype=dt)[:, None, :, None]
                  * kp[0, 0].astype(dt)[None, :, None, :])
            kb = kb.reshape(16 * C, 16 * n)
            y = jax.lax.dot_general(y, kb, (((3,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return (y + jnp.tile(bp, 16)).astype(dt)

        main = up4_conv3x3_main(x, kc.astype(dt), dt)     # (B,gh,gw,16C)
        borders = up4_conv3x3_borders(x, kc.astype(dt), dt)

        if train:
            # exact-BN-statistics ordering: fix borders on the conv output
            # first, so batch moments are bit-for-bit the reference's
            y = scatter_up4_borders(main, *borders, C)
            y = y + jnp.tile(bc, 16).astype(dt)
            yf = y.astype(jnp.float32)
            m16 = yf.mean(axis=(0, 1, 2))                 # (16C,)
            m = m16.reshape(16, C).mean(axis=0)           # exact overall mean
            xc = yf - jnp.tile(m, 16)
            v16 = (xc * xc).mean(axis=(0, 1, 2))
            v = v16.reshape(16, C).mean(axis=0)           # exact overall var
            if not self.is_initializing():
                # nn.BatchNorm running-average semantics (momentum 0.9)
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * m
                ra_var.value = 0.9 * ra_var.value + 0.1 * v
            inv = jax.lax.rsqrt(v + 1e-5) * gamma.astype(jnp.float32)
            y = y * jnp.tile(inv, 16).astype(dt) + jnp.tile(
                beta.astype(jnp.float32) - m * inv, 16).astype(dt)
            return depth_to_space4(grouped_logits(gelu_exact(y)), n)

        # eval: BN is a fixed affine — fold the conv bias into it, run the
        # big conv -> affine -> gelu -> grouped 1x1 with no scatter in
        # between (fuses), and push the border strips through the identical
        # pointwise epilogue before scattering them into the LOGITS
        m, v = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(v.astype(jnp.float32) + 1e-5) \
            * gamma.astype(jnp.float32)
        addv = (beta.astype(jnp.float32) - m.astype(jnp.float32) * inv
                + bc.astype(jnp.float32) * inv)           # bias folded in
        y = main * jnp.tile(inv, 16).astype(dt) + jnp.tile(addv, 16).astype(dt)
        y = grouped_logits(gelu_exact(y))                 # (B,gh,gw,16n)

        def epilogue(strip):                              # (B,L,C) -> (B,L,n)
            s = gelu_exact(strip * inv.astype(dt) + addv.astype(dt))
            return jax.lax.dot_general(
                s, kp[0, 0].astype(dt), (((2,), (0,)), ((), ()))) \
                + bp.astype(dt)

        y = scatter_up4_borders(y, *[epilogue(s) for s in borders], n)
        return depth_to_space4(y, n)                      # (B,4gh,4gw,n)


class _MtProjParams(nn.Module):
    """ConvBNAct-layout parameters without computing: submodules 'conv'
    (nn.Conv kernel/bias) and 'bn' (nn.BatchNorm scale/bias + running
    mean/var Variable refs), so checkpoints and the torch converter stay
    layout-compatible with the plain ConvHead path."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        from mtt_tpu.models.layers import _Conv3x3Params
        kc, bc = _Conv3x3Params(self.features, self.in_features,
                                name="conv")()
        gamma, beta, mean, var = _BNParams(self.features, name="bn")()
        return kc, bc, gamma, beta, mean, var


class _BNParams(nn.Module):
    """nn.BatchNorm-layout params/stats without computing. Returns the
    running-stat Variable refs so the caller updates them."""
    features: int

    @nn.compact
    def __call__(self):
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        return gamma, beta, mean, var


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
