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


class MLPHeadParams(nn.Module):
    """Same param tree as MLPHead (a 1x1 'linear_pred' conv) but params
    only — used when the head matmul is fused into the InvPT tail kernel
    (kernels/invpt_tail.py:fused_ms_tail_head) so the conv never runs as
    a module. Checkpoints are interchangeable with MLPHead."""
    num_classes: int
    in_features: int

    @nn.compact
    def __call__(self):
        from mtt_tpu.models.layers import _Conv1x1Params
        k, b = _Conv1x1Params(self.num_classes, self.in_features,
                              name="linear_pred")()
        return k.reshape(self.in_features, self.num_classes), b


class ConvHead(nn.Module):
    """3x3 conv + BN + GELU -> 1x1 logits.

    With ``up4`` set (the input is then the LOW-resolution backbone
    feature map) the head computes the exact composite
    conv3x3(upsample4(x)) without ever materialising the per-task
    (B,4gh,4gw,C) upsampled map — the model's single hottest HBM tensor.
    Two composite implementations:

    - ``up4='factored'`` (default on the wrapper): the channel
      contraction runs at low resolution and two shifted-upsample mix
      matmuls expand the spatial dims (layers.up4_conv3x3_factored,
      8.7x fewer FLOPs than the dense composite; 0.61 vs 2.55 ms/task
      measured on v5e). BN/GELU run channel-major; only the tiny logit
      map is transposed back.
    - ``up4='phase'``: 16 phase kernels at low resolution with flat
      phase-major channels and exact 1-px border fixups scattered into
      the logit tensor (kept: same param tree, useful fallback).

    Parameter tree and math identical to the plain path (reference:
    heads applied to the 4x-upsampled features,
    taskprompter.py:411-421,688-698)."""
    num_classes: int
    up4: object = False          # False | True(=phase) | 'phase' | 'factored'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        mode = {True: "phase", False: "dense"}.get(self.up4, self.up4)
        # exact-erf gelu: torch nn.GELU default (flax defaults to tanh-approx)
        gelu_exact = lambda v: nn.gelu(v, approximate=False)  # noqa: E731
        if mode == "dense":
            x = ConvBNAct(C, (3, 3), act=gelu_exact, use_bias=True,
                          dtype=self.dtype, name="mt_proj")(x, train=train)
            return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                           name="linear_pred")(x)

        from mtt_tpu.models.layers import (_Conv1x1Params, depth_to_space4,
                                           scatter_up4_borders,
                                           up4_conv3x3_borders,
                                           up4_conv3x3_factored,
                                           up4_conv3x3_main)
        n = self.num_classes
        dt = self.dtype
        kc, bc, gamma, beta, ra_mean, ra_var = \
            _MtProjParams(C, C, name="mt_proj")()
        kp, bp = _Conv1x1Params(n, C, name="linear_pred")()

        if mode == "factored":
            if not train:
                # fully fused Pallas head: Gm + both spatial mixes +
                # folded-BN affine + GELU + 1x1 stay in VMEM; only the
                # logits reach HBM (kernels/head_up4.py; 23% faster than
                # the XLA factored composition at bench shapes)
                from mtt_tpu.kernels.head_up4 import fused_up4_head
                m, v = (ra_mean.value.astype(jnp.float32),
                        ra_var.value.astype(jnp.float32))
                inv = jax.lax.rsqrt(v + 1e-5) * gamma.astype(jnp.float32)
                addv = (beta.astype(jnp.float32) - m * inv
                        + bc.astype(jnp.float32) * inv)
                logits = fused_up4_head(x, kc, inv, addv, kp[0, 0])
                return (logits + bp.astype(jnp.float32)).astype(dt)
            Y = up4_conv3x3_factored(x, kc).astype(dt)   # (B, C, W4, H4)
            if train:
                yf = (Y + bc[None, :, None, None].astype(dt)) \
                    .astype(jnp.float32)
                m = yf.mean(axis=(0, 2, 3))              # (C,)
                xc = yf - m[None, :, None, None]
                v = (xc * xc).mean(axis=(0, 2, 3))
                if not self.is_initializing():
                    # nn.BatchNorm running-average semantics (momentum 0.9)
                    ra_mean.value = 0.9 * ra_mean.value + 0.1 * m
                    ra_var.value = 0.9 * ra_var.value + 0.1 * v
            else:
                m, v = (ra_mean.value.astype(jnp.float32),
                        ra_var.value.astype(jnp.float32))
            inv = jax.lax.rsqrt(v + 1e-5) * gamma.astype(jnp.float32)
            addv = (beta.astype(jnp.float32) - m * inv
                    + bc.astype(jnp.float32) * inv)      # conv bias folded
            y = gelu_exact(Y * inv[None, :, None, None].astype(dt)
                           + addv[None, :, None, None].astype(dt))
            # 1x1 logits: contract the channel axis -> (B, W4, H4, n)
            logits = jax.lax.dot_general(
                y, kp[0, 0].astype(dt), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            logits = (logits + bp.astype(jnp.float32)).astype(dt)
            return logits.transpose(0, 2, 1, 3)          # (B, H4, W4, n)

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
