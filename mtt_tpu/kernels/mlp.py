"""Fused transformer-MLP Pallas kernel: x @ W1 + b1 -> gelu -> @ W2 + b2.

XLA serializes the exact-erf gelu with the fc2 matmul inside one fusion
(profiled 0.85 ms vs 0.36 ms for the bare matmul per ViT-L block); this
kernel splits the hidden dim into column blocks so Mosaic can overlap the
VPU gelu of one sub-block with the MXU matmuls of the next, and keeps the
(M, 4C) hidden activation entirely in VMEM (never round-trips to HBM).

gelu uses an Abramowitz-Stegun 7.1.26 erf (|err| <= 1.5e-7 — fp32-grade,
far below bf16 output resolution; Pallas TPU lowers no erf primitive).

Backward: recompute-based custom VJP in XLA (exact erf), matching the
attention kernels' strategy — HBM-cheap, MXU-heavy.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _erf_poly(z):
    """Minimax erf (A&S 7.1.26, |err| <= 1.5e-7)."""
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))


def _gelu_erf_poly(h):
    """Exact-form gelu with a minimax erf (A&S 7.1.26, |err|<=1.5e-7)."""
    return 0.5 * h * (1.0 + _erf_poly(h * (2.0 ** -0.5)))


# Chebyshev-fit erf(z)/z as a degree-9 polynomial in z^2 on [0, 3]
# (gelu |abs err| <= 2.1e-4 over all of R with the z/z^2 clamps — an
# order below bf16 rounding). No divide, no exp: pure mads, measurably
# cheaper than A&S 7.1.26 where the gelu is VPU-exposed (the fused up4
# head epilogue; the MLP kernels keep the A&S form, their gelu overlaps
# MXU work).
_ERF_Z2_COEFFS = (
    1.1283768672e+00, -3.7607042872e-01, 1.1261189222e-01,
    -2.6508064540e-02, 4.9304063297e-03, -7.1228464379e-04,
    7.6191207693e-05, -5.5816809050e-06, 2.4628598067e-07,
    -4.8841998736e-09)


def _gelu_erf_poly_fast(h):
    """gelu(h) = 0.5 h (1 + erf(h/sqrt2)) with the polynomial erf above."""
    z = h * (2.0 ** -0.5)
    zc = jnp.clip(z, -3.0, 3.0)
    u = zc * zc
    p = jnp.float32(_ERF_Z2_COEFFS[-1])
    for c in _ERF_Z2_COEFFS[-2::-1]:
        p = p * u + jnp.float32(c)
    return 0.5 * h * (1.0 + zc * p)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc,
                *, nsub: int, sub: int, block_h: int):
    """Hidden-block MLP cell, software-pipelined in ``sub`` chunks: the
    NEXT chunk's fc1 matmul is issued before the CURRENT chunk's gelu so
    Mosaic overlaps the VPU erf-gelu with MXU work (a single dependent
    dot->gelu->dot chain serializes them: 0.86 vs 0.69 ms floor per ViT-L
    block; pipelined measures ~7% faster, tools/proto_mlp_r3.py)."""
    xb = x_ref[0]
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    hs = block_h // sub
    h_cur = jax.lax.dot_general(xb, w1_ref[:, 0:hs],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    h_cur = h_cur + b1_ref[0, 0:hs]
    part = jnp.zeros_like(acc)
    for i in range(sub):
        if i + 1 < sub:
            h_nxt = jax.lax.dot_general(
                xb, w1_ref[:, (i + 1) * hs:(i + 2) * hs],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h_nxt = h_nxt + b1_ref[0, (i + 1) * hs:(i + 2) * hs]
        g = _gelu_erf_poly(h_cur).astype(xb.dtype)
        part += jax.lax.dot_general(g, w2_ref[i * hs:(i + 1) * hs],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        if i + 1 < sub:
            h_cur = h_nxt
    acc[...] += part

    @pl.when(j == nsub - 1)
    def _():
        o_ref[...] = (acc[...] + b2_ref[0]).astype(o_ref.dtype)[None]


def _pick_block_n(N: int, cap: int = 512) -> int:
    """Row-block size for a (B, N, C) input: the largest divisor of N that
    is a multiple of 8 and <= cap when one exists >= 128 (zero row padding,
    full MXU rows); otherwise the smallest 8-aligned block covering N in
    ceil(N/cap) steps (e.g. N=1029 -> 344: 3 masked pad rows, 0.3%)."""
    best = 0
    for d in range(8, cap + 1, 8):
        if N % d == 0:
            best = d
    if best >= 128 or best == N:
        return best
    k = -(-N // cap)
    return -(-(-(-N // k)) // 8) * 8


def _mlp_pallas(x3, w1, b1, w2, b2, block_n: int = 0,
                block_h: int = 4096, interpret: bool = False):
    B, N, C = x3.shape
    H = w1.shape[1]
    if block_n == 0:
        block_n = _pick_block_n(N)
    nN = -(-N // block_n)
    block_h = H if H <= block_h else block_h
    nsub = H // block_h
    # gelu/MXU pipelining chunks: target 512-wide fc1 sub-matmuls
    sub = max(1, block_h // 512)
    while block_h % sub:
        sub -= 1
    kwargs = {"scratch_shapes": [pltpu.VMEM((block_n, C), jnp.float32)]} \
        if pltpu is not None else {}
    if not interpret and pltpu is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    return pl.pallas_call(
        functools.partial(_mlp_kernel, nsub=nsub, sub=sub, block_h=block_h),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x3.dtype),
        grid=(B, nN, nsub),
        in_specs=[
            pl.BlockSpec((1, block_n, C), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((C, block_h), lambda b, i, j: (0, j)),
            pl.BlockSpec((1, block_h), lambda b, i, j: (0, j)),
            pl.BlockSpec((block_h, C), lambda b, i, j: (j, 0)),
            pl.BlockSpec((1, C), lambda b, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_n, C), lambda b, i, j: (b, i, 0)),
        interpret=interpret,
        **kwargs,
    )(x3, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


def _mlp_xla(x3, w1, b1, w2, b2):
    h = jax.lax.dot_general(x3, w1, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + b1.astype(jnp.float32), approximate=False)
    out = jax.lax.dot_general(h.astype(x3.dtype), w2,
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return (out + b2.astype(jnp.float32)).astype(x3.dtype)


def _pallas_ok(x3, w1) -> bool:
    C, H = w1.shape
    N = x3.shape[-2]
    # XLA stages a custom call's operand + result in scoped VMEM when
    # it gives them S(1) layouts; an f32 (N, C) pair past the 28 MB
    # scoped cap then fails AT COMPILE ("allocating on stack for %mlp
    # ..."), observed on the f32 CS3D train CLI at (1, 4608, 1024).
    # Route oversized-staging shapes to the XLA path instead.
    if 2 * N * C * x3.dtype.itemsize > 26 * 2 ** 20:
        return False
    # weights in lane-aligned blocks; scratch + operands within VMEM.
    # H <= 4096 runs as a single hidden block; larger H needs 1024-aligned
    # sub-blocks (grid nsub = H // block_h must cover H exactly).
    return C % 128 == 0 and H % 128 == 0 and (H <= 4096 or H % 1024 == 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_mlp(x3, w1, b1, w2, b2, impl: str):
    if impl == "pallas" and pltpu is not None:
        if _pallas_ok(x3, w1):
            return _mlp_pallas(x3, w1, b1, w2, b2)
        from mtt_tpu.kernels.fallback_log import note_fallback
        note_fallback("mlp", f"x={tuple(x3.shape)} w1={tuple(w1.shape)}")
    if impl == "interpret" and pltpu is not None and _pallas_ok(x3, w1):
        return _mlp_pallas(x3, w1, b1, w2, b2, interpret=True)
    return _mlp_xla(x3, w1, b1, w2, b2)


def _fwd(x3, w1, b1, w2, b2, impl):
    return _fused_mlp(x3, w1, b1, w2, b2, impl), (x3, w1, b1, w2)


def _bwd(impl, res, g):
    x3, w1, b1, w2 = res
    xf = x3.astype(jnp.float32)
    pre = jax.lax.dot_general(xf, w1.astype(jnp.float32),
                              (((2,), (0,)), ((), ()))) + b1.astype(jnp.float32)
    h = jax.nn.gelu(pre, approximate=False)
    gf = g.astype(jnp.float32)
    db2 = gf.sum((0, 1))
    dw2 = jax.lax.dot_general(h, gf, (((0, 1), (0, 1)), ((), ())))
    dh = jax.lax.dot_general(gf, w2.astype(jnp.float32),
                             (((2,), (1,)), ((), ())))
    # d gelu(x)/dx = Phi(x) + x phi(x)
    inv_sqrt2 = 2.0 ** -0.5
    phi = jnp.exp(-0.5 * pre * pre) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    Phi = 0.5 * (1.0 + jax.lax.erf(pre * inv_sqrt2))
    dpre = dh * (Phi + pre * phi)
    db1 = dpre.sum((0, 1))
    dw1 = jax.lax.dot_general(xf, dpre, (((0, 1), (0, 1)), ((), ())))
    dx = jax.lax.dot_general(dpre, w1.astype(jnp.float32),
                             (((2,), (1,)), ((), ())))
    return (dx.astype(x3.dtype), dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b1.dtype))


_fused_mlp.defvjp(_fwd, _bwd)


def _as3d(x):
    """View (..., N, C) as (B, N, C) with zero data movement. When the row
    dim is 8-aligned the whole tensor flattens to one batch (largest
    blocks); otherwise leading dims stay as the batch so no retile copy is
    needed (a flat (B*N, C) view of an 8-unaligned N physically re-tiles
    the T(8,128) layout — profiled 0.02 ms per call each way at ViT-L
    shapes, x24 blocks)."""
    C = x.shape[-1]
    if x.ndim == 2:
        return x[None]
    if x.shape[-2] % 8 == 0:
        return x.reshape(1, -1, C)
    return x.reshape(-1, x.shape[-2], C)


def fused_mlp(x, w1, b1, w2, b2, impl: Optional[str] = None):
    """Transformer MLP over (..., C) with hidden dim w1.shape[1].

    Lane-misaligned dims (C % 128, H % 128) are zero-padded so the Pallas
    kernel still applies — EXACT (zero input columns contribute nothing;
    padded hidden units have b1=0 so gelu(0)=0 against zero w2 rows) and
    still faster than the XLA fallback despite the wasted flops: the
    InvPT decoder's stage-2 MLP (C=144) ran as a 34 TF/s XLA fusion with
    a column-major f32 hidden tensor."""
    if impl is None:
        import os
        impl = os.environ.get("MTT_MLP_IMPL")
        if impl is None:
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    shape = x.shape
    C, H = w1.shape
    if impl in ("pallas", "interpret") and (C % 128 or H % 128):
        Cp = -(-C // 128) * 128
        Hp = -(-H // 128) * 128
        x3 = _as3d(x)
        x3 = jnp.pad(x3, ((0, 0), (0, 0), (0, Cp - C)))
        w1p = jnp.pad(w1, ((0, Cp - C), (0, Hp - H)))
        b1p = jnp.pad(b1, (0, Hp - H))
        w2p = jnp.pad(w2, ((0, Hp - H), (0, Cp - C)))
        b2p = jnp.pad(b2, (0, Cp - C))
        out = _fused_mlp(x3, w1p, b1p, w2p, b2p, impl)
        return out[..., :C].reshape(shape)
    out = _fused_mlp(_as3d(x), w1, b1, w2, b2, impl)
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# Fully fused pre-norm MLP half-block: out = x + MLP(LN(x)).
#
# Folding the LayerNorm prologue and the residual epilogue into the MLP
# kernel removes two custom-call boundaries per transformer block. Those
# boundaries are expensive out of proportion to their math: XLA cannot keep
# activations in scoped (VMEM) memory across a custom call, so each
# standalone LN costs materialize-copies on both sides (profiled ~2.6 ms
# per ViT-L forward in pad/reshape/copy around 48 LN calls, plus ~1 ms of
# unfused residual adds). Here x is read once from HBM and written once.
# ---------------------------------------------------------------------------


def _mlp_ln_res_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       o_ref, xn_ref, acc, *, nsub: int, eps: float):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        xf = x_ref[0].astype(jnp.float32)
        m = xf.mean(axis=-1, keepdims=True)
        xc = xf - m
        v = (xc * xc).mean(axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(v + eps)
        xn_ref[...] = (y * g_ref[0] + be_ref[0]).astype(xn_ref.dtype)
        acc[...] = jnp.zeros_like(acc)

    h = jax.lax.dot_general(xn_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = _gelu_erf_poly(h + b1_ref[0]).astype(xn_ref.dtype)
    acc[...] += jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)

    @pl.when(j == nsub - 1)
    def _():
        o_ref[...] = (acc[...] + b2_ref[0]
                      + x_ref[0].astype(jnp.float32)).astype(o_ref.dtype)[None]


def _mlp_ln_res_pallas(x3, gamma, beta, w1, b1, w2, b2, eps: float,
                       block_n: int = 0, block_h: int = 512,
                       interpret: bool = False):
    # block_h 512 (vs 1024 in the plain kernel): the LN(x) cache scratch
    # costs block_n*C extra VMEM, which pushed the 1024-column config
    # 972K over the 16M scoped-vmem limit at ViT-L shapes; halving the
    # w1/w2 working blocks frees ~5M with identical HBM weight traffic
    B, N, C = x3.shape
    H = w1.shape[1]
    if block_n == 0:
        block_n = _pick_block_n(N)
    nN = -(-N // block_n)
    block_h = min(block_h, H)
    nsub = H // block_h
    kwargs = {"scratch_shapes": [
        pltpu.VMEM((block_n, C), x3.dtype),       # LN(x) cache
        pltpu.VMEM((block_n, C), jnp.float32),    # fc2 accumulator
    ]} if pltpu is not None else {}
    if not interpret and pltpu is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    return pl.pallas_call(
        functools.partial(_mlp_ln_res_kernel, nsub=nsub, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x3.dtype),
        grid=(B, nN, nsub),
        in_specs=[
            pl.BlockSpec((1, block_n, C), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, C), lambda b, i, j: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i, j: (0, 0)),
            pl.BlockSpec((C, block_h), lambda b, i, j: (0, j)),
            pl.BlockSpec((1, block_h), lambda b, i, j: (0, j)),
            pl.BlockSpec((block_h, C), lambda b, i, j: (j, 0)),
            pl.BlockSpec((1, C), lambda b, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_n, C), lambda b, i, j: (b, i, 0)),
        interpret=interpret,
        **kwargs,
    )(x3, gamma.reshape(1, C).astype(jnp.float32),
      beta.reshape(1, C).astype(jnp.float32),
      w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


def _mlp_ln_res_bb_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref,
                          b2_ref, o_ref, xn_ref, acc, *, nsub: int,
                          eps: float, bb: int, bn: int):
    """Batch-blocked variant: ``bb`` batch items share one grid cell, so the
    fc1/fc2 weight blocks stream from HBM once per ``bb`` items instead of
    once per item (16.8 MB x B x nN -> /bb at ViT-L shapes). The sub-batch
    is unrolled with static slices — same 2-D matmuls as the base kernel."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        for u in range(bb):
            xf = x_ref[u].astype(jnp.float32)
            m = xf.mean(axis=-1, keepdims=True)
            xc = xf - m
            v = (xc * xc).mean(axis=-1, keepdims=True)
            y = xc * jax.lax.rsqrt(v + eps)
            xn_ref[u * bn:(u + 1) * bn, :] = \
                (y * g_ref[0] + be_ref[0]).astype(xn_ref.dtype)
        acc[...] = jnp.zeros_like(acc)

    # staged across sub-batch items: item u+1's fc1 is issued before item
    # u's gelu so the VPU erf-gelu overlaps MXU work instead of
    # serializing inside a dot->gelu->dot chain (tools/proto_mlp_r3.py)
    def _fc1(u):
        h = jax.lax.dot_general(
            xn_ref[u * bn:(u + 1) * bn, :], w1_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return h + b1_ref[0]

    h_cur = _fc1(0)
    for u in range(bb):
        h_nxt = _fc1(u + 1) if u + 1 < bb else None
        g = _gelu_erf_poly(h_cur).astype(xn_ref.dtype)
        acc[u * bn:(u + 1) * bn, :] += jax.lax.dot_general(
            g, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h_cur = h_nxt

    @pl.when(j == nsub - 1)
    def _():
        for u in range(bb):
            r = (acc[u * bn:(u + 1) * bn, :] + b2_ref[0]
                 + x_ref[u].astype(jnp.float32))
            o_ref[u] = r.astype(o_ref.dtype)


def _mlp_ln_res_pallas_bb(x3, gamma, beta, w1, b1, w2, b2, eps: float,
                          bb: int = 2, block_n: int = 0, block_h: int = 512,
                          interpret: bool = False):
    B, N, C = x3.shape
    H = w1.shape[1]
    if block_n == 0:
        block_n = _pick_block_n(N)
    nN = -(-N // block_n)
    block_h = min(block_h, H)
    nsub = H // block_h
    kwargs = {"scratch_shapes": [
        pltpu.VMEM((bb * block_n, C), x3.dtype),
        pltpu.VMEM((bb * block_n, C), jnp.float32),
    ]} if pltpu is not None else {}
    if not interpret and pltpu is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    return pl.pallas_call(
        functools.partial(_mlp_ln_res_bb_kernel, nsub=nsub, eps=eps,
                          bb=bb, bn=block_n),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x3.dtype),
        grid=(B // bb, nN, nsub),
        in_specs=[
            pl.BlockSpec((bb, block_n, C), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, C), lambda b, i, j: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i, j: (0, 0)),
            pl.BlockSpec((C, block_h), lambda b, i, j: (0, j)),
            pl.BlockSpec((1, block_h), lambda b, i, j: (0, j)),
            pl.BlockSpec((block_h, C), lambda b, i, j: (j, 0)),
            pl.BlockSpec((1, C), lambda b, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, block_n, C), lambda b, i, j: (b, i, 0)),
        interpret=interpret,
        **kwargs,
    )(x3, gamma.reshape(1, C).astype(jnp.float32),
      beta.reshape(1, C).astype(jnp.float32),
      w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


def _ln_f32(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    m = xf.mean(axis=-1, keepdims=True)
    xc = xf - m
    v = (xc * xc).mean(axis=-1, keepdims=True)
    return (xc * jax.lax.rsqrt(v + eps) * gamma.astype(jnp.float32)
            + beta.astype(jnp.float32))


def _mlp_ln_res_xla(x2, gamma, beta, w1, b1, w2, b2, eps):
    xn = _ln_f32(x2, gamma, beta, eps).astype(x2.dtype)
    return x2 + _mlp_xla(xn, w1, b1, w2, b2)


def _bb_for(x3, w1, block_h: int = 512) -> int:
    """Sub-batch per grid cell for the batch-blocked kernel: divides the
    fc1/fc2 HBM weight streaming by bb. Constrained by the 16 MB scoped
    VMEM (the f32 training path at ViT-B shapes OOMs at bb=2). 1 disables
    (MTT_MLP_BB override)."""
    import os
    bb = int(os.environ.get("MTT_MLP_BB", "2"))
    B, N, C = x3.shape
    bn = _pick_block_n(N)
    it = x3.dtype.itemsize
    while bb > 1:
        # x double-buffered + xn scratch + f32 acc + out db + w1/w2 db
        # (budget matches the 23 MB scoped-vmem cap set in mtt_tpu/__init__)
        vmem = (2 * bb * bn * C * it + bb * bn * C * it + bb * bn * C * 4
                + 2 * bb * bn * C * it + 4 * C * block_h * w1.dtype.itemsize)
        if B % bb == 0 and vmem <= 21 * 2 ** 20:
            return bb
        bb -= 1
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_mlp_ln_res(x2, gamma, beta, w1, b1, w2, b2, eps: float, impl: str):
    if impl == "pallas" and pltpu is not None:
        if _pallas_ok(x2, w1):
            bb = _bb_for(x2, w1)
            if bb > 1:
                return _mlp_ln_res_pallas_bb(x2, gamma, beta, w1, b1, w2,
                                             b2, eps, bb=bb)
            return _mlp_ln_res_pallas(x2, gamma, beta, w1, b1, w2, b2, eps)
        from mtt_tpu.kernels.fallback_log import note_fallback
        note_fallback("mlp_ln_res",
                      f"x={tuple(x2.shape)} w1={tuple(w1.shape)}")
    if impl == "interpret" and pltpu is not None and _pallas_ok(x2, w1):
        return _mlp_ln_res_pallas(x2, gamma, beta, w1, b1, w2, b2, eps,
                                  interpret=True)
    return _mlp_ln_res_xla(x2, gamma, beta, w1, b1, w2, b2, eps)


def _mlp_ln_res_fwd(x2, gamma, beta, w1, b1, w2, b2, eps, impl):
    out = _fused_mlp_ln_res(x2, gamma, beta, w1, b1, w2, b2, eps, impl)
    return out, (x2, gamma, beta, w1, b1, w2, b2)


def _mlp_ln_res_bwd(eps, impl, res, g):
    # Hand-written recompute backward with bf16 intermediates: the
    # generic vjp of the XLA composition stores the (B*N, H) hidden and
    # its cotangent in f32 (375 MB of round-trips per ViT-L train block);
    # casting h/a/dact to the model dtype halves that traffic. gelu'
    # recomputes from the bf16 h — grad-parity tests bound the error.
    x2, gamma, beta, w1, b1, w2, b2 = res
    dt = x2.dtype
    B, N, C = x2.shape
    xn_f, ln_vjp = jax.vjp(lambda xx, ga, be: _ln_f32(xx, ga, be, eps),
                           x2, gamma, beta)
    xn = xn_f.astype(dt)
    h = jax.lax.dot_general(xn, w1, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) \
        + b1.astype(jnp.float32)
    hb = h.astype(dt)
    a = _gelu_erf_poly(h).astype(dt)
    gf = g.astype(dt)
    dact = jax.lax.dot_general(gf, w2, (((2,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    # d/dh gelu(h) = Phi(h) + h phi(h)
    hf = hb.astype(jnp.float32)
    phi = jnp.exp(-0.5 * hf * hf) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    cdf = 0.5 * (1.0 + _erf_poly(hf * (2.0 ** -0.5)))
    dh = (dact * (cdf + hf * phi)).astype(dt)
    dxn = jax.lax.dot_general(dh, w1, (((2,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw1 = jax.lax.dot_general(
        xn.reshape(B * N, C), dh.reshape(B * N, -1),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w1.dtype)
    db1 = dh.astype(jnp.float32).sum((0, 1)).astype(b1.dtype)
    dw2 = jax.lax.dot_general(
        a.reshape(B * N, -1), gf.reshape(B * N, C),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w2.dtype)
    db2 = g.astype(jnp.float32).sum((0, 1)).astype(b2.dtype)
    dx, dgamma, dbeta = ln_vjp(dxn)
    dx = (dx + g.astype(dx.dtype)).astype(x2.dtype)   # residual branch
    return dx, dgamma, dbeta, dw1, db1, dw2, db2


_fused_mlp_ln_res.defvjp(_mlp_ln_res_fwd, _mlp_ln_res_bwd)


def fused_mlp_ln_res(x, gamma, beta, w1, b1, w2, b2, eps: float = 1e-6,
                     impl: Optional[str] = None):
    """Pre-norm MLP half-block over (..., C): x + MLP(LN(x))."""
    if impl is None:
        import os
        impl = os.environ.get("MTT_MLP_IMPL")
        if impl is None:
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    shape = x.shape
    out = _fused_mlp_ln_res(_as3d(x), gamma, beta, w1, b1, w2, b2, eps, impl)
    return out.reshape(shape)
