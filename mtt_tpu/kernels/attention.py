"""Fused multi-head attention Pallas kernel (TPU) with XLA fallback.

The reference's hot op is the ViT backbone's full self-attention
(InvPT/models/transformers/vit.py:172-196: ~1025 tokens x 24 blocks for
ViT-L @512^2). This kernel keeps the whole per-head K/V resident in VMEM
(1029 x 64 x bf16 = 130 KiB — tiny) and streams query row-blocks through
the MXU, fusing scale + softmax + PV into one pass so the (N x N) score
matrix never round-trips to HBM.

For ViT-scale N this row-blocked form matches flash-attention's memory
behaviour without online-softmax bookkeeping; longer sequences should use
the kv-blocked variant (planned for the InvPT decoder stage-3 kernel).

Backward: custom VJP recomputes probabilities in fp32 with XLA einsums —
HBM-cheap (saves only q,k,v), MXU-heavy, which is the right trade on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _hpb_default() -> int:
    """Heads per (batch, head-group) program in the fused qkv kernels.
    2 is tuned for ViT-L (16 heads, D=64); MTT_ATTN_HPB overrides for
    shape sweeps (read at trace time)."""
    import os
    return int(os.environ.get("MTT_ATTN_HPB", "2"))


# Fast softmax for the pre-norm qkv kernels: fold log2(e) into the score
# scale and use exp2 WITHOUT the running-max subtraction. The max-reduce
# is the one softmax op Mosaic cannot fuse into the exponentiation pass
# (cross-lane reduction + broadcast); dropping it converts the softmax
# from ~2 VPU passes over the (q_chunk, N) score matrix to 1 and measures
# 36% faster end-to-end on the fused LN+qkv+attention kernel at ViT-L
# bench shapes (2.571 -> 1.643 ms, tools/proto_attn_ln.py on v5e).
#
# Validity: softmax(x) = exp2(s*x) / sum(exp2(s*x)) exactly, provided
# exp2 never overflows. f32 exp2 overflows above 2^128, so logits are
# clamped at 126 (an elementwise min with a scalar — fuses into the same
# VPU pass as exp2). These kernels only ever see q,k projected from
# LayerNormed activations, whose logits in trained ViTs stay |l| < ~50;
# the clamp only engages (and then degrades toward a uniform max-logit
# softmax instead of producing inf/nan) in pathological cases. The
# generic q/k/v kernel (_attn_kernel) keeps the max-subtracted form: its
# inputs carry no LN bound.
_LOG2E = 1.4426950408889634
_EXP2_CLAMP = 126.0
# floor with headroom: exp2(-126.) is the fp32 normal/underflow boundary and
# XLA's exp2 lowering (exp(x*ln2)) returns exactly 0 there on some backends;
# exp2(-120) = 7.5e-37 is comfortably normal on all of them
_EXP2_FLOOR = -120.0


def _resolve_safe(safe: Optional[bool]) -> bool:
    """Resolve the softmax mode for the qkv kernels (read at trace time;
    changing the env requires a fresh jit).

    MTT_ATTN_SAFE_SOFTMAX, when set, overrides everything: "0" forces the
    fast exp2 path, any other value forces the max-subtracted path.
    Otherwise the call site decides: model code passes safe=True on
    training forwards (train_phase traces with the exact softmax so
    attention-logit growth past the clamp fails loud in the loss rather
    than silently degrading toward uniform — the ViT-22B failure mode)
    and safe=False/None on inference, where LN-boundedness of *trained*
    ViTs licenses the fast path."""
    import os
    env = os.environ.get("MTT_ATTN_SAFE_SOFTMAX")
    if env is not None and env != "":
        return env != "0"
    return bool(safe)


def _fast_exp2_probs(logits, safe: bool, n_keys: Optional[int] = None):
    """exp2 probabilities for pre-scaled (log2e-folded) fp32 logits.

    Fast path: no running-max subtraction — one VPU pass instead of two;
    exact softmax whenever max|logit| < 126, which holds for q/k projected
    from LayerNormed activations in trained ViTs (|raw logit| < ~50). The
    two-sided clamp makes failure modes non-silent-NaN: the +126 side keeps
    exp2 finite, and the -120 floor keeps every probability a strictly
    positive fp32 normal (TPU flushes denormals, and exp2(-126) itself
    underflows to 0 under XLA's exp-based lowering) so a row of very
    negative logits can never produce a 0/0 NaN; it degrades toward
    uniform instead.
    Safe path (MTT_ATTN_SAFE_SOFTMAX=1): row-max subtraction — exact at any
    logit magnitude, for training runs where LN-boundedness is not trusted
    (e.g. attention-logit growth, the ViT-22B failure mode).
    """
    if safe:
        m = jnp.max(logits, axis=-1, keepdims=True)
        return jnp.exp2(logits - m)
    # leave log2(n_keys) headroom so the row SUM of clamped probabilities
    # (up to n_keys * 2^clamp) stays below the f32 max — otherwise a row
    # with many clamped logits yields inf/inf = NaN instead of degrading
    # toward uniform
    import math
    hi = _EXP2_CLAMP - (math.ceil(math.log2(n_keys))
                        if n_keys else 16)
    return jnp.exp2(jnp.clip(logits, _EXP2_FLOOR, hi))


def _attn_kernel(q_ref, k_ref, v_ref, b_ref, o_ref):
    """One (batch*head, q-block) cell: softmax(q K^T + bias) V.

    VPU economy (the softmax, not the matmuls, bounds this kernel at
    ViT shapes): the attention scale is pre-folded into q outside the
    kernel; key padding is an additive bias row (one add pass instead of
    iota+compare+select); the 1/sum normalisation is applied AFTER the
    PV matmul on the (bq, D) output instead of the (bq, Nk) probability
    matrix — D/Nk times less divide work.
    """
    q = q_ref[0]                        # (bq, D), pre-scaled
    k = k_ref[0]                        # (Nk, D)
    v = v_ref[0]                        # (Nk, D)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (bq, Nk)
    logits = logits + b_ref[0]                       # key-padding bias
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (bq, D)
    o_ref[0] = (o / s).astype(o_ref.dtype)


def _attention_pallas(q, k, v, scale: float, block_q: int = 256,
                      interpret: bool = False):
    """q: (BH, Nq, D), k/v: (BH, Nk, D) -> (BH, Nq, D)."""
    BH, Nq, D = q.shape
    Nk = k.shape[1]
    Nqp = _ceil_to(Nq, block_q)
    Nkp = _ceil_to(Nk, 128)  # lane-aligned key length
    q = q * jnp.asarray(scale, q.dtype)   # fold scale into q (tiny tensor)
    if Nqp != Nq:
        q = jnp.pad(q, [(0, 0), (0, Nqp - Nq), (0, 0)])
    if Nkp != Nk:
        k = jnp.pad(k, [(0, 0), (0, Nkp - Nk), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, Nkp - Nk), (0, 0)])
    bias = jnp.zeros((1, Nkp), jnp.float32).at[:, Nk:].set(-1e30)
    grid = (BH, Nqp // block_q)
    kwargs = {}
    if not interpret and pltpu is not None:
        # both grid axes are embarrassingly parallel; marking them lets
        # Mosaic software-pipeline across iterations instead of serializing
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    out = pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((BH, Nqp, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Nkp, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Nkp, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Nkp), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
        interpret=interpret,
        **kwargs,
    )(q, k, v, bias)
    return out[:, :Nq]


def _attention_xla(q, k, v, scale: float):
    logits = jnp.einsum("bqd,bkd->bqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkd->bqd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_attention(q, k, v, scale: float, impl: str):
    if impl == "pallas":
        return _attention_pallas(q, k, v, scale)
    if impl == "interpret":
        return _attention_pallas(q, k, v, scale, interpret=True)
    return _attention_xla(q, k, v, scale)


def _fwd(q, k, v, scale, impl):
    return _fused_attention(q, k, v, scale, impl), (q, k, v)


def _bwd(scale, impl, res, g):
    q, k, v = res
    logits = jnp.einsum("bqd,bkd->bqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dv = jnp.einsum("bqk,bqd->bkd", p, gf)
    dp = jnp.einsum("bqd,bkd->bqk", gf, vf)
    dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkd->bqd", dl, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bqk,bqd->bkd", dl, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_fused_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# qkv-direct attention: consumes the fused qkv projection straight from the
# Dense output in (B, N, H*3*D) HEAD-MAJOR column order and emits the
# standard head-concat (B, N, H*D) — no slices, head transposes, or pad ops
# ever reach the XLA graph (on this chip those cost ~1 ms/block at ~250 GB/s
# effective HBM bandwidth). One program per (batch, head-pair); K/V stay
# VMEM-resident for the whole (small-N) sequence; per-head writes into the
# output ref keep peak VMEM under the 16 MB budget.
# ---------------------------------------------------------------------------

def _attn_qkv_kernel(kv_ref, o_ref, *, scale: float, D: int, hpb: int,
                     safe: bool):
    blk = kv_ref[0]                            # (N, hpb*3*D)
    s2 = jnp.asarray(scale * _LOG2E, blk.dtype)
    for h in range(hpb):
        base = h * 3 * D
        q = blk[:, base:base + D] * s2
        k = blk[:, base + D:base + 2 * D]
        v = blk[:, base + 2 * D:base + 3 * D]
        logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        p = _fast_exp2_probs(logits, safe, k.shape[0])
        s = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, h * D:(h + 1) * D] = (o / s).astype(o_ref.dtype)


def _attn_qkv_pallas(qkv, heads: int, scale: float, hpb: int = 2,
                     interpret: bool = False, safe: bool = False):
    B, N, C3 = qkv.shape
    D = C3 // heads // 3
    kwargs = {}
    if not interpret and pltpu is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    return pl.pallas_call(
        functools.partial(_attn_qkv_kernel, scale=scale, D=D, hpb=hpb,
                          safe=safe),
        out_shape=jax.ShapeDtypeStruct((B, N, heads * D), qkv.dtype),
        grid=(B, heads // hpb),
        in_specs=[pl.BlockSpec((1, N, hpb * 3 * D), lambda b, h: (b, 0, h))],
        out_specs=pl.BlockSpec((1, N, hpb * D), lambda b, h: (b, 0, h)),
        interpret=interpret,
        **kwargs,
    )(qkv)


def _attn_qkv_xla(qkv, heads: int, scale: float):
    B, N, C3 = qkv.shape
    D = C3 // heads // 3
    q, k, v = [qkv.reshape(B, N, heads, 3, D)[:, :, :, i] for i in range(3)]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return out.reshape(B, N, heads * D)


def _qkv_pallas_ok(qkv, heads: int, hpb: int = 2) -> bool:
    B, N, C3 = qkv.shape
    D = C3 // heads // 3
    return (heads % hpb == 0 and (hpb * 3 * D) % 128 == 0
            and N * N * 4 * 2 <= 12 * 2 ** 20)  # logits+probs VMEM budget


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _fused_attention_qkv(qkv, heads: int, scale: float, impl: str,
                         safe: bool = False):
    hpb = _hpb_default()
    if impl == "pallas":
        if _qkv_pallas_ok(qkv, heads, hpb):
            return _attn_qkv_pallas(qkv, heads, scale, hpb=hpb, safe=safe)
        from mtt_tpu.kernels.fallback_log import note_fallback
        note_fallback("attention_qkv",
                      f"qkv={tuple(qkv.shape)} heads={heads}")
    if impl == "interpret" and _qkv_pallas_ok(qkv, heads, hpb):
        return _attn_qkv_pallas(qkv, heads, scale, hpb=hpb, interpret=True,
                                safe=safe)
    return _attn_qkv_xla(qkv, heads, scale)


def _qkv_fwd(qkv, heads, scale, impl, safe):
    return _fused_attention_qkv(qkv, heads, scale, impl, safe), (qkv,)


def _qkv_bwd(heads, scale, impl, safe, res, g):
    (qkv,) = res
    B, N, C3 = qkv.shape
    D = C3 // heads // 3
    qkv5 = qkv.reshape(B, N, heads, 3, D)
    q, k, v = qkv5[:, :, :, 0], qkv5[:, :, :, 1], qkv5[:, :, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    gf = g.reshape(B, N, heads, D).astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gf)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf, vf)
    dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", dl, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", dl, q.astype(jnp.float32)) * scale
    dqkv = jnp.stack([dq, dk, dv], axis=3).astype(qkv.dtype)
    return (dqkv.reshape(B, N, C3),)


_fused_attention_qkv.defvjp(_qkv_fwd, _qkv_bwd)


def fused_attention_qkv(qkv, heads: int, scale: float,
                        impl: Optional[str] = None,
                        safe: Optional[bool] = None):
    """Attention over a fused qkv tensor in (B, N, H*3*D) head-major column
    order (each head's q, k, v are contiguous); returns (B, N, H*D) in
    standard head-concat order, ready for the output projection.

    PRECONDITION (TPU pallas path): the fast exp2 softmax assumes
    LN-bounded inputs — qkv must be projected from LayerNormed activations
    so scaled logits stay within (-126, 126); see _fast_exp2_probs. Out of
    that range the forward degrades toward a clamped-uniform softmax (no
    NaN) while the XLA fallback used on CPU/tests stays exact, so tolerance
    tests cannot catch it — set MTT_ATTN_SAFE_SOFTMAX=1 or use
    fused_attention (max-subtracted everywhere) for unbounded inputs.

    NOTE the column order differs from the torch/npz convention (3, H, D);
    converters reorder the qkv projection weights accordingly.
    """
    if impl is None:
        import os
        impl = os.environ.get("MTT_ATTN_IMPL")
        if impl is None:
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    return _fused_attention_qkv(qkv, heads, scale, impl, _resolve_safe(safe))


# ---------------------------------------------------------------------------
# Fully fused pre-norm attention front half: LN(x) @ W_qkv -> attention.
#
# Removes two more custom-call boundaries per block: the standalone LN
# (whose operands XLA must copy out of scoped/VMEM memory on both sides)
# and the HBM round trip of the (B, N, 3C) qkv tensor (50 MB at ViT-L
# bench shapes). Each (batch, head-pair) program re-derives LN(x) as a
# transient (freed before the attention phase — a persistent scratch
# blew the 16 MB scoped-VMEM limit at ViT-L shapes), computes its own
# column slice of the qkv projection on the MXU, and runs softmax
# attention in q-row chunks so the score buffer stays bounded, without
# the scores ever leaving VMEM.
#
# Tap layers (need_qkv=True) run a two-kernel composition: the fused LN
# kernel materializes LN(x) in HBM (the raw prompt-score decode consumes
# it anyway), then an emit variant of this kernel consumes LN(x), writes
# its qkv column slice to HBM (head-major — exactly the layout the raw
# score einsums want, killing the layout copy XLA inserted between its
# own qkv matmul and the attention custom call), and runs the same
# softmax attention.
#
# The output projection stays in XLA: it is a plain matmul that XLA runs
# at speed-of-light and fuses the residual add into.
# ---------------------------------------------------------------------------

_Q_CHUNK = 512
_Q_CHUNK_CACHED = 384   # smaller score chunk frees VMEM for the LN(x) cache


def _ln_rows(xb, g, be, eps):
    xf = xb.astype(jnp.float32)
    m = xf.mean(axis=-1, keepdims=True)
    xc = xf - m
    v = (xc * xc).mean(axis=-1, keepdims=True)
    return (xc * jax.lax.rsqrt(v + eps) * g + be).astype(xb.dtype)


def _attn_ln_qkv_kernel(x_ref, g_ref, be_ref, w_ref, b_ref, o_ref,
                        *maybe_qkv_ref, scale: float, D: int, hpb: int,
                        eps: float, ln: bool, q_chunk: int, safe: bool):
    xn = _ln_rows(x_ref[0], g_ref[0], be_ref[0], eps) if ln else x_ref[0]
    qkv = jax.lax.dot_general(
        xn, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[0]).astype(x_ref.dtype)    # (N, hpb*3D)
    if maybe_qkv_ref:
        maybe_qkv_ref[0][0] = qkv
    N = qkv.shape[0]
    s2 = jnp.asarray(scale * _LOG2E, qkv.dtype)
    for h in range(hpb):
        base = h * 3 * D
        k = qkv[:, base + D:base + 2 * D]
        v = qkv[:, base + 2 * D:base + 3 * D]
        for q0 in range(0, N, q_chunk):
            q = qkv[q0:q0 + q_chunk, base:base + D] * s2
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = _fast_exp2_probs(logits, safe, k.shape[0])
            s = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, q0:q0 + q.shape[0], h * D:(h + 1) * D] = \
                (o / s).astype(o_ref.dtype)


def _attn_ln_qkv_cached_kernel(x_ref, g_ref, be_ref, w_ref, b_ref, o_ref,
                               xn_ref, *, scale: float, D: int, hpb: int,
                               eps: float, q_chunk: int, safe: bool):
    """Non-emit variant with the LN(x) rows cached in scratch: the head-pair
    grid axis is sequential per batch item, so LN runs ONCE per item instead
    of once per head-pair (8x redundant VPU passes at ViT-L heads=16)."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        xn_ref[...] = _ln_rows(x_ref[0], g_ref[0], be_ref[0], eps)

    qkv = jax.lax.dot_general(
        xn_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[0]).astype(x_ref.dtype)    # (N, hpb*3D)
    N = qkv.shape[0]
    s2 = jnp.asarray(scale * _LOG2E, qkv.dtype)
    for h in range(hpb):
        base = h * 3 * D
        k = qkv[:, base + D:base + 2 * D]
        v = qkv[:, base + 2 * D:base + 3 * D]
        for q0 in range(0, N, q_chunk):
            q = qkv[q0:q0 + q_chunk, base:base + D] * s2
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = _fast_exp2_probs(logits, safe, k.shape[0])
            s = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, q0:q0 + q.shape[0], h * D:(h + 1) * D] = \
                (o / s).astype(o_ref.dtype)


def _attn_ln_qkv_pallas(x, gamma, beta, w, b, heads: int, scale: float,
                        eps: float, hpb: int = 2, ln: bool = True,
                        emit: bool = False, interpret: bool = False,
                        safe: bool = False):
    B, N, C = x.shape
    D = w.shape[1] // heads // 3
    kwargs = {}
    if not interpret and pltpu is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
    out_shape = [jax.ShapeDtypeStruct((B, N, heads * D), x.dtype)]
    out_specs = [pl.BlockSpec((1, N, hpb * D), lambda bi, h: (bi, 0, h))]
    if emit:
        out_shape.append(
            jax.ShapeDtypeStruct((B, N, heads * 3 * D), x.dtype))
        out_specs.append(
            pl.BlockSpec((1, N, hpb * 3 * D), lambda bi, h: (bi, 0, h)))
    if ln and not emit:
        kern = functools.partial(
            _attn_ln_qkv_cached_kernel, scale=scale, D=D, hpb=hpb, eps=eps,
            q_chunk=_Q_CHUNK_CACHED, safe=safe)
        kwargs.setdefault("scratch_shapes", []).append(
            pltpu.VMEM((N, C), x.dtype) if pltpu is not None else None)
    else:
        kern = functools.partial(
            _attn_ln_qkv_kernel, scale=scale, D=D, hpb=hpb, eps=eps, ln=ln,
            q_chunk=_Q_CHUNK // 2 if emit else _Q_CHUNK,
            safe=safe)
    out = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(B, heads // hpb),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda bi, h: (bi, 0, 0)),
            pl.BlockSpec((1, C), lambda bi, h: (0, 0)),
            pl.BlockSpec((1, C), lambda bi, h: (0, 0)),
            pl.BlockSpec((C, hpb * 3 * D), lambda bi, h: (0, h)),
            pl.BlockSpec((1, hpb * 3 * D), lambda bi, h: (0, h)),
        ],
        out_specs=out_specs,
        interpret=interpret,
        **kwargs,
    )(x, gamma.reshape(1, C).astype(jnp.float32),
      beta.reshape(1, C).astype(jnp.float32), w, b.reshape(1, -1))
    return out if emit else out[0]


def _ln_f32_full(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    m = xf.mean(axis=-1, keepdims=True)
    xc = xf - m
    v = (xc * xc).mean(axis=-1, keepdims=True)
    return (xc * jax.lax.rsqrt(v + eps) * gamma.astype(jnp.float32)
            + beta.astype(jnp.float32))


def _attn_ln_qkv_xla(x, gamma, beta, w, b, heads, scale, eps, emit,
                     sub_impl: str = "xla", safe: bool = False):
    # emit (tap) layers need qkv and LN(x) materialized in HBM for the
    # raw prompt-score decode, so LN+projection stay in XLA — but the
    # attention itself still runs through the fused qkv kernel
    xn = _ln_f32_full(x, gamma, beta, eps).astype(x.dtype)
    qkv = xn @ w + b.astype(x.dtype)
    out = _fused_attention_qkv(qkv, heads, scale, sub_impl, safe)
    return (out, qkv, xn) if emit else out


def _attn_ln_ok(x, w, heads: int, hpb: int = 2, emit: bool = False) -> bool:
    B, N, C = x.shape
    D = w.shape[1] // heads // 3
    cols = hpb * 3 * D
    # peak-phase VMEM estimate (bytes): x double-buffered + w db + qkv
    # bf16 + one q-chunk of logits f32 + its exp + bf16 cast + out db;
    # the LN transient and f32 qkv live only before the score phase.
    # emit adds the double-buffered qkv output block (the q-chunk halves);
    # the non-emit cached variant adds the (N, C) LN(x) scratch.
    qc = min(_Q_CHUNK // 2 if emit else _Q_CHUNK_CACHED, N)
    it = x.dtype.itemsize
    ex = 2 * N * cols * it if emit else N * C * it
    peak = ex + max(
        2 * N * C * it + 2 * C * cols * it + N * cols * (4 + it) + N * C * it,
        2 * N * C * it + 2 * C * cols * it + N * cols * it
        + qc * N * (4 + 4 + it) + 2 * N * hpb * D * it)
    return (heads % hpb == 0 and cols % 128 == 0 and C % 128 == 0
            and peak <= 14 * 2 ** 20)


def _attn_ln_qkv_emit_pallas(x, gamma, beta, w, b, heads, scale, eps,
                             hpb=2, interpret=False, safe=False):
    # two-kernel tap composition: LN(x) lands in HBM for the raw-score
    # decode; the attention kernel consumes it pre-normalized and emits
    # the qkv tensor head-major (no XLA-side matmul or layout copy)
    from mtt_tpu.kernels.layernorm import fused_layernorm
    xn = fused_layernorm(x, gamma, beta, eps=eps,
                         impl="interpret" if interpret else "pallas")
    out, qkv = _attn_ln_qkv_pallas(xn, gamma, beta, w, b, heads, scale,
                                   eps, hpb=hpb, ln=False, emit=True,
                                   interpret=interpret, safe=safe)
    return out, qkv, xn


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _fused_attn_ln_qkv(x, gamma, beta, w, b, heads: int, scale: float,
                       eps: float, emit: bool, impl: str,
                       safe: bool = False):
    hpb = _hpb_default()
    if impl == "pallas":
        if _attn_ln_ok(x, w, heads, hpb, emit=emit):
            if not emit:
                return _attn_ln_qkv_pallas(x, gamma, beta, w, b, heads,
                                           scale, eps, hpb=hpb, safe=safe)
            return _attn_ln_qkv_emit_pallas(x, gamma, beta, w, b, heads,
                                            scale, eps, hpb=hpb, safe=safe)
        from mtt_tpu.kernels.fallback_log import note_fallback
        note_fallback("attn_ln_qkv",
                      f"x={tuple(x.shape)} heads={heads} emit={emit}")
    if impl == "interpret" and _attn_ln_ok(x, w, heads, hpb, emit=emit):
        if not emit:
            return _attn_ln_qkv_pallas(x, gamma, beta, w, b, heads, scale,
                                       eps, hpb=hpb, interpret=True,
                                       safe=safe)
        return _attn_ln_qkv_emit_pallas(x, gamma, beta, w, b, heads, scale,
                                        eps, hpb=hpb, interpret=True,
                                        safe=safe)
    return _attn_ln_qkv_xla(x, gamma, beta, w, b, heads, scale, eps, emit,
                            sub_impl=impl, safe=safe)


def _attn_ln_fwd(x, gamma, beta, w, b, heads, scale, eps, emit, impl, safe):
    out = _fused_attn_ln_qkv(x, gamma, beta, w, b, heads, scale, eps, emit,
                             impl, safe)
    return out, (x, gamma, beta, w, b)


# ---------------------------------------------------------------------------
# Flash-style attention-core backward: given the head-major qkv tensor and
# the output cotangent, recompute probabilities per (batch, head-pair) in
# q-row chunks and emit dqkv — the (N, N) probability/cotangent matrices
# never reach HBM. The XLA recompute backward materialises four
# (B, H, N, N) f32 tensors per block (135 MB each at ViT-L train shapes);
# its softmax-correction multiply_reduce alone profiled 0.46 ms/block.
# ---------------------------------------------------------------------------

_BWD_Q_CHUNK = 256


def _attn_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, D: int, hpb: int,
                     scale: float, q_chunk: int):
    qkv = qkv_ref[0]
    N = qkv.shape[0]
    sc = jnp.asarray(scale, jnp.float32)
    for h in range(hpb):
        base = h * 3 * D
        q = qkv[:, base:base + D]
        k = qkv[:, base + D:base + 2 * D]
        v = qkv[:, base + 2 * D:base + 3 * D]
        gh = g_ref[0][:, h * D:(h + 1) * D]
        dv = jnp.zeros((N, D), jnp.float32)
        dk = jnp.zeros((N, D), jnp.float32)
        for q0 in range(0, N, q_chunk):
            qc = q[q0:q0 + q_chunk]
            gc = gh[q0:q0 + q_chunk]
            logits = jax.lax.dot_general(
                qc, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sc
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            pn = e / jnp.sum(e, axis=-1, keepdims=True)
            dp = jax.lax.dot_general(
                gc, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (qc, N)
            r = jnp.sum(dp * pn, axis=-1, keepdims=True)
            dl = (pn * (dp - r)).astype(qkv.dtype)           # (qc, N)
            pb = pn.astype(qkv.dtype)
            dq_c = jax.lax.dot_general(
                dl, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * sc
            dqkv_ref[0, q0:q0 + qc.shape[0], base:base + D] = \
                dq_c.astype(dqkv_ref.dtype)
            dv += jax.lax.dot_general(
                pb, gc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (N, D)
            dk += jax.lax.dot_general(
                dl, qc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dqkv_ref[0, :, base + D:base + 2 * D] = \
            (dk * sc).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, base + 2 * D:base + 3 * D] = dv.astype(dqkv_ref.dtype)


def _attn_core_bwd_pallas(qkv, g, heads: int, scale: float, hpb: int = 2,
                          interpret: bool = False):
    B, N, C3 = qkv.shape
    D = C3 // heads // 3
    kwargs = {}
    if not interpret and pltpu is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, D=D, hpb=hpb, scale=scale,
                          q_chunk=_BWD_Q_CHUNK),
        out_shape=jax.ShapeDtypeStruct((B, N, C3), qkv.dtype),
        grid=(B, heads // hpb),
        in_specs=[
            pl.BlockSpec((1, N, hpb * 3 * D), lambda b, h: (b, 0, h)),
            pl.BlockSpec((1, N, hpb * D), lambda b, h: (b, 0, h)),
        ],
        out_specs=pl.BlockSpec((1, N, hpb * 3 * D), lambda b, h: (b, 0, h)),
        interpret=interpret,
        **kwargs,
    )(qkv, g)


def _attn_core_bwd_xla(qkv, g, heads: int, scale: float):
    """Reference attention-core backward (same math, XLA einsums)."""
    B, N, C3 = qkv.shape
    D = C3 // heads // 3
    qkv5 = qkv.reshape(B, N, heads, 3, D)
    q, k, v = qkv5[:, :, :, 0], qkv5[:, :, :, 1], qkv5[:, :, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    gf = g.reshape(B, N, heads, D).astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gf)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf, v.astype(jnp.float32))
    dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", dl, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", dl, q.astype(jnp.float32)) * scale
    dqkv = jnp.stack([dq, dk, dv], axis=3).astype(qkv.dtype)
    return dqkv.reshape(B, N, C3)


def _bwd_pallas_ok(x, w, heads: int, hpb: int = 2) -> bool:
    B, N, C = x.shape
    D = w.shape[1] // heads // 3
    return (pltpu is not None and heads % hpb == 0
            and (hpb * 3 * D) % 128 == 0 and (hpb * D) % 128 == 0
            and N * min(_BWD_Q_CHUNK, N) * 4 * 3 <= 10 * 2 ** 20)


def _attn_ln_bwd(heads, scale, eps, emit, impl, safe, res, g):
    x, gamma, beta, w, b = res
    if impl == "pallas" and not _bwd_pallas_ok(x, w, heads, _hpb_default()):
        from mtt_tpu.kernels.fallback_log import note_fallback
        note_fallback("attn_ln_bwd",
                      f"x={tuple(x.shape)} heads={heads}")
    if impl in ("pallas", "interpret") and _bwd_pallas_ok(
            x, w, heads, _hpb_default()):
        # recompute LN and qkv (MXU-fast XLA), run the attention-core
        # backward in Pallas, then close LN/projection grads in XLA
        interp = impl == "interpret"
        B, N, C = x.shape
        xn_f, ln_vjp = jax.vjp(
            lambda xx, ga, be: _ln_f32_full(xx, ga, be, eps), x, gamma, beta)
        xn = xn_f.astype(x.dtype)
        qkv = xn @ w + b.astype(x.dtype)
        if emit:
            g_out, g_qkv, g_xn = g
        else:
            g_out, g_qkv, g_xn = g, None, None
        dqkv = _attn_core_bwd_pallas(qkv, g_out, heads, scale,
                                     hpb=_hpb_default(), interpret=interp)
        if g_qkv is not None:
            dqkv = dqkv + g_qkv
        dxn = (dqkv @ w.T).astype(jnp.float32)
        if g_xn is not None:
            dxn = dxn + g_xn.astype(jnp.float32)
        dw = jax.lax.dot_general(
            xn.reshape(B * N, C), dqkv.reshape(B * N, -1),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(w.dtype)
        db = dqkv.astype(jnp.float32).sum((0, 1)).astype(b.dtype)
        dx, dgamma, dbeta = ln_vjp(dxn)
        return dx, dgamma, dbeta, dw, db
    # fallback: differentiate the XLA composition
    _, vjp = jax.vjp(
        lambda xx, ga, be, ww, bb:
            _attn_ln_qkv_xla(xx, ga, be, ww, bb, heads, scale, eps, emit),
        x, gamma, beta, w, b)
    return vjp(g)


_fused_attn_ln_qkv.defvjp(_attn_ln_fwd, _attn_ln_bwd)


def fused_attention_ln_qkv(x, gamma, beta, w, b, heads: int,
                           scale: Optional[float] = None, eps: float = 1e-6,
                           need_qkv: bool = False,
                           impl: Optional[str] = None,
                           safe: Optional[bool] = None):
    """Pre-norm attention front half over (B, N, C): softmax-attention of
    LN(x) @ w + b, with w's columns in HEAD-MAJOR (H, 3, D) order (same
    convention as fused_attention_qkv). Returns the pre-projection head
    concat (B, N, H*D); with ``need_qkv`` returns a tuple
    (out, qkv (B, N, H*3*D), xn = LN(x)) for raw-score tap layers.

    PRECONDITION (TPU pallas path): qkv comes from LN(x) here by
    construction, which is what licenses the fast exp2 softmax (scaled
    logits within +-126; see _fast_exp2_probs and fused_attention_qkv's
    docstring). If the LN gain is adversarially large — e.g. an untrusted
    converted checkpoint — set MTT_ATTN_SAFE_SOFTMAX=1."""
    if scale is None:
        scale = (w.shape[1] // heads // 3) ** -0.5
    if impl is None:
        import os
        impl = os.environ.get("MTT_ATTN_IMPL")
        if impl is None:
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    return _fused_attn_ln_qkv(x, gamma, beta, w, b, heads, scale, eps,
                              need_qkv, impl, _resolve_safe(safe))


# ---------------------------------------------------------------------------
# Windowed attention with additive bias + window mask (Swin).
# One program per (batch-window, head): K/V stay VMEM-resident, the
# relative-position bias (per head) and shifted-window mask (per window)
# are added to the logits in-kernel — the XLA path materialises the
# (B*nW, heads, M, M) logits tensor four times per block.
# ---------------------------------------------------------------------------


def _wattn_kernel(q_ref, k_ref, v_ref, b_ref, m_ref, o_ref, *, scale: float):
    q = q_ref[0]                        # (M, D)
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    logits = logits + b_ref[0] + m_ref[0]
    mx = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - mx)
    s = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (o / s).astype(o_ref.dtype)


def _window_attention_xla(q, k, v, bias, mask, scale, nW):
    BW, M, H, D = q.shape
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias[None]
    if mask is not None:
        m = jnp.tile(mask, (BW // nW, 1, 1))
        logits = logits + m[:, None]
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def _window_attention_pallas(q, k, v, bias, mask, scale, nW,
                             interpret=False):
    BW, M, H, D = q.shape
    qf = q.transpose(0, 2, 1, 3).reshape(BW * H, M, D)
    kf = k.transpose(0, 2, 1, 3).reshape(BW * H, M, D)
    vf = v.transpose(0, 2, 1, 3).reshape(BW * H, M, D)
    if mask is None:
        mask = jnp.zeros((1, M, M), jnp.float32)
        nW = 1
    kwargs = {}
    if not interpret and pltpu is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    out = pl.pallas_call(
        functools.partial(_wattn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((BW * H, M, D), q.dtype),
        grid=(BW * H,),
        in_specs=[
            pl.BlockSpec((1, M, D), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, M, D), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, M, D), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, M, M), lambda bh: (bh % H, 0, 0)),
            pl.BlockSpec((1, M, M), lambda bh: ((bh // H) % nW, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, M, D), lambda bh: (bh, 0, 0)),
        interpret=interpret,
        **kwargs,
    )(qf, kf, vf, bias.astype(jnp.float32), mask.astype(jnp.float32))
    return out.reshape(BW, H, M, D).transpose(0, 2, 1, 3)


def _wattn_bwd_kernel(q_ref, k_ref, v_ref, b_ref, m_ref, g_ref,
                      dq_ref, dk_ref, dv_ref, db_ref, *, scale: float):
    """One (head, batch-window) program of the window-attention backward.

    Recomputes the window's probabilities and closes dq/dk/dv in VMEM —
    the XLA composition materialises four (BW, heads, M, M) f32 tensors
    per Swin block (177 MB each at CS3D stage-1 shapes). The bias grad
    accumulates into its per-head block across the (sequential) inner
    batch-window grid axis."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    g = g_ref[0]
    sc = jnp.asarray(scale, jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sc
    logits = logits + b_ref[0] + m_ref[0]
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    pn = e / jnp.sum(e, axis=-1, keepdims=True)          # (M, M) f32
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (M, M)
    r = jnp.sum(dp * pn, axis=-1, keepdims=True)
    dl = pn * (dp - r)                                   # f32
    dlb = dl.astype(q_ref.dtype)
    pb = pn.astype(q_ref.dtype)
    dq_ref[0] = (jax.lax.dot_general(
        dlb, k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sc).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        dlb, q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sc).astype(dk_ref.dtype)
    dv_ref[0] = jax.lax.dot_general(
        pb, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        db_ref[0] = dl

    @pl.when(pl.program_id(1) != 0)
    def _acc():
        db_ref[0] += dl


def _wattn_bwd_pallas(q, k, v, bias, mask, g, scale, nW, interpret=False):
    """dq/dk/dv/dbias for window attention; dmask is NOT computed (the
    Swin shifted-window mask is derived from window geometry, never a
    parameter — reference taskprompter_swin.py:194-198)."""
    BW, M, H, D = q.shape
    qf = q.transpose(0, 2, 1, 3).reshape(BW * H, M, D)
    kf = k.transpose(0, 2, 1, 3).reshape(BW * H, M, D)
    vf = v.transpose(0, 2, 1, 3).reshape(BW * H, M, D)
    gf = g.transpose(0, 2, 1, 3).reshape(BW * H, M, D)
    kwargs = {}
    if not interpret and pltpu is not None:
        # h outer (parallel), bw inner (arbitrary): each head's dbias
        # block is visited consecutively, so in-place accumulation works
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_wattn_bwd_kernel, scale=scale),
        out_shape=[
            jax.ShapeDtypeStruct((BW * H, M, D), q.dtype),
            jax.ShapeDtypeStruct((BW * H, M, D), k.dtype),
            jax.ShapeDtypeStruct((BW * H, M, D), v.dtype),
            jax.ShapeDtypeStruct((H, M, M), jnp.float32),
        ],
        grid=(H, BW),
        in_specs=[
            pl.BlockSpec((1, M, D), lambda h, bw: (bw * H + h, 0, 0)),
            pl.BlockSpec((1, M, D), lambda h, bw: (bw * H + h, 0, 0)),
            pl.BlockSpec((1, M, D), lambda h, bw: (bw * H + h, 0, 0)),
            pl.BlockSpec((1, M, M), lambda h, bw: (h, 0, 0)),
            pl.BlockSpec((1, M, M), lambda h, bw: (bw % nW, 0, 0)),
            pl.BlockSpec((1, M, D), lambda h, bw: (bw * H + h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, M, D), lambda h, bw: (bw * H + h, 0, 0)),
            pl.BlockSpec((1, M, D), lambda h, bw: (bw * H + h, 0, 0)),
            pl.BlockSpec((1, M, D), lambda h, bw: (bw * H + h, 0, 0)),
            pl.BlockSpec((1, M, M), lambda h, bw: (h, 0, 0)),
        ],
        interpret=interpret,
        **kwargs,
    )(qf, kf, vf, bias.astype(jnp.float32), mask.astype(jnp.float32), gf)
    unf = lambda x: x.reshape(BW, H, M, D).transpose(0, 2, 1, 3)
    return (unf(dq), unf(dk), unf(dv), db.astype(bias.dtype),
            jnp.zeros_like(mask))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_window_attention(q, k, v, bias, mask, scale, nW, impl):
    if impl == "pallas" and pltpu is not None:
        return _window_attention_pallas(q, k, v, bias, mask, scale, nW)
    if impl == "interpret":
        return _window_attention_pallas(q, k, v, bias, mask, scale, nW,
                                        interpret=True)
    return _window_attention_xla(q, k, v, bias, mask, scale, nW)


def _wattn_fwd(q, k, v, bias, mask, scale, nW, impl):
    return (_fused_window_attention(q, k, v, bias, mask, scale, nW, impl),
            (q, k, v, bias, mask))


def _wattn_bwd(scale, nW, impl, res, g):
    q, k, v, bias, mask = res
    if impl in ("pallas", "interpret") and (pltpu is not None
                                            or impl == "interpret"):
        m = mask
        w = nW
        if m is None:
            m = jnp.zeros((1,) + bias.shape[-2:], jnp.float32)
            w = 1
        dq, dk, dv, db, dm = _wattn_bwd_pallas(
            q, k, v, bias, m, g, scale, w, interpret=impl == "interpret")
        return dq, dk, dv, db, (None if mask is None else dm)
    _, vjp = jax.vjp(
        lambda qq, kk, vv, bb, mm:
            _window_attention_xla(qq, kk, vv, bb, mm, scale, nW),
        q, k, v, bias, mask)
    return vjp(g)


_fused_window_attention.defvjp(_wattn_fwd, _wattn_bwd)


def fused_window_attention(q, k, v, bias, mask, scale: float, nW: int,
                           impl: Optional[str] = None):
    """Swin window attention over (B*nW, M, H, D) with a per-head additive
    bias (H, M, M) and an optional per-window mask (nW, M, M) — prompt
    rows/cols are expressed as zero-padded bias/mask entries by the
    caller. Returns (B*nW, M, H, D)."""
    if impl is None:
        import os
        impl = os.environ.get("MTT_ATTN_IMPL")
        if impl is None:
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if mask is None:
        return _fused_window_attention(q, k, v, bias, None, scale, 1, impl)
    return _fused_window_attention(q, k, v, bias, mask, scale, nW, impl)


def fused_attention(q, k, v, scale: Optional[float] = None,
                    impl: Optional[str] = None):
    """Multi-head attention over (B, N, H, D) tensors.

    impl: 'pallas' | 'xla' | 'interpret' | None (auto: pallas on TPU).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl is None:
        import os
        impl = os.environ.get("MTT_ATTN_IMPL")
        if impl is None:
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, Nq, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, Nk, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, Nk, D)
    out = _fused_attention(qf, kf, vf, scale, impl)
    return out.reshape(B, H, Nq, D).transpose(0, 2, 1, 3)
