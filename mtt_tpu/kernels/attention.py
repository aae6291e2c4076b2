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


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    """One (batch*head, q-block) cell: softmax(q K^T * scale) V."""
    q = q_ref[0]                        # (bq, D)
    k = k_ref[0]                        # (Nk, D)
    v = v_ref[0]                        # (Nk, D)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (bq, Nk)
    nk = logits.shape[-1]
    if n_valid < nk:  # mask padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < n_valid, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attention_pallas(q, k, v, scale: float, block_q: int = 256,
                      interpret: bool = False):
    """q: (BH, Nq, D), k/v: (BH, Nk, D) -> (BH, Nq, D)."""
    BH, Nq, D = q.shape
    Nk = k.shape[1]
    Nqp = _ceil_to(Nq, block_q)
    Nkp = _ceil_to(Nk, 128)  # lane-aligned key length
    if Nqp != Nq:
        q = jnp.pad(q, [(0, 0), (0, Nqp - Nq), (0, 0)])
    if Nkp != Nk:
        k = jnp.pad(k, [(0, 0), (0, Nkp - Nk), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, Nkp - Nk), (0, 0)])
    grid = (BH, Nqp // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_valid=Nk),
        out_shape=jax.ShapeDtypeStruct((BH, Nqp, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Nkp, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Nkp, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(q, k, v)
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
