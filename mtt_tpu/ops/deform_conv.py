"""Modulated deformable convolution (DCNv2) as gather + matmul.

TPU-native replacement for the mmcv CUDA DCNv2 op the reference uses on the
last conv of each FCOS3D head branch (TaskPrompter/detection_toolbox/
det_head.py:226, det_head_params.py:86 dcn_on_last_conv=True).

Formulation: predicted per-position offsets deform the 3x3 sampling grid;
bilinear sampling becomes 4 gathers + interpolation weights (VPU work),
and the kernel application is one (K*C, Cout) matmul on the MXU. XLA fuses
the gathers; a Pallas kernel is only warranted if profiling shows the
gather dominating.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def bilinear_gather(x, py, px):
    """Sample x (B,H,W,C) at fractional positions py/px (B,...) with zero
    padding outside. Returns (B, ..., C)."""
    B, H, W, C = x.shape
    pos_shape = py.shape  # (B, ...)
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat_idx = (yc * W + xc).reshape(B, -1)
        vals = jnp.take_along_axis(x.reshape(B, H * W, C),
                                   flat_idx[..., None], axis=1)
        vals = vals.reshape(*pos_shape, C)
        return vals * inb[..., None].astype(vals.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = wy[..., None].astype(x.dtype)
    wx = wx[..., None].astype(x.dtype)
    return ((1 - wy) * (1 - wx) * v00 + (1 - wy) * wx * v01 +
            wy * (1 - wx) * v10 + wy * wx * v11)


class DeformConv2d(nn.Module):
    """3x3 modulated deformable conv: offset/mask predicted by a plain conv
    initialised to zero (identity deformation at init, DCNv2 convention)."""
    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        K = self.kernel_size * self.kernel_size
        om = nn.Conv(3 * K, (self.kernel_size, self.kernel_size),
                     padding="SAME", kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="offset_mask")(x)
        off = om[..., :2 * K].reshape(B, H, W, K, 2)
        mask = jax.nn.sigmoid(om[..., 2 * K:])           # (B,H,W,K)

        r = self.kernel_size // 2
        ky, kx = jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1),
                              indexing="ij")
        ky = ky.reshape(-1).astype(x.dtype)
        kx = kx.reshape(-1).astype(x.dtype)
        yy = jnp.arange(H, dtype=x.dtype)[None, :, None, None]
        xx = jnp.arange(W, dtype=x.dtype)[None, None, :, None]
        py = yy + ky[None, None, None] + off[..., 0]
        px = px_all = xx + kx[None, None, None] + off[..., 1]

        w = self.param("kernel", nn.initializers.he_normal(),
                       (K * C, self.features))
        # per-tap gather + matmul: the stacked (B,H,W,K,C) sample tensor
        # forced a (H,W,K*C) relayout copy before the single big dot
        # (~0.31 ms x8 in the CS3D trace); per tap, the gather output
        # feeds a clean (H*W, C) @ (C, Cout) dot directly and the K
        # partials accumulate in f32
        wt = w.astype(x.dtype).reshape(K, C, self.features)
        out = jnp.zeros((B, H, W, self.features), jnp.float32)
        for k in range(K):
            s_k = bilinear_gather(x, py[..., k], px_all[..., k])
            s_k = s_k * mask[..., k:k + 1].astype(s_k.dtype)
            out = out + jax.lax.dot_general(
                s_k.reshape(B * H * W, C), wt[k],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(
                    B, H, W, self.features)
        out = out.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + b.astype(out.dtype)
        return out
