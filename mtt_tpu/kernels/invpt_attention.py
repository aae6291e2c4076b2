"""Fused InvPT decoder attention with cross-stage message passing (Pallas).

The InvPT decoder's hot op (SURVEY.md §5: stage-3 runs 5 tasks x 64x64
queries against a 5x8x8 kv set, with the previous stage's attention matrix
upsampled and fused into the scores through a 1x1 conv over heads —
invpt.py:199-241). Standard flash attention can't express this: the score
matrix is a *first-class output* consumed by the next stage.

This kernel computes, in one VMEM-resident pass per query block:
    scores_h = scale * q_h k_h^T
    fused_h  = sum_c W[h, c] * concat_c([scores, msg]) + b[h]   (head mix)
    out_h    = softmax(fused_h) v_h
and emits ``fused`` as the new message — the raw scores and the softmax
probabilities never touch HBM. The kv length is constant across stages
(8x8 per task) so k/v stay resident.

Backward: custom VJP with XLA einsums (recompute; fp32), including the
gradient path through the message output.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, k_ref, v_ref, m_ref, w_ref, b_ref, o_ref, f_ref, *,
            scale: float, nheads: int, has_msg: bool):
    H = nheads
    outs = []
    scores = []
    for h in range(H):
        s = jax.lax.dot_general(
            q_ref[0, h], k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores.append(s)
    for h in range(H):
        if has_msg:
            f = b_ref[h]
            for c in range(H):
                f = f + w_ref[h, c] * scores[c]
            for c in range(H):
                f = f + w_ref[h, H + c] * m_ref[0, c].astype(jnp.float32)
        else:
            f = scores[h]
        f_ref[0, h] = f.astype(f_ref.dtype)
        p = jax.nn.softmax(f, axis=-1)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, h] = o.astype(o_ref.dtype)


def _forward_pallas(q, k, v, msg, w, b, scale, block_q: int = 512,
                    interpret: bool = False):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    has_msg = msg is not None
    if msg is None:
        msg = jnp.zeros((B, H, Lq, Lk), q.dtype)
        w = jnp.zeros((H, 2 * H), jnp.float32)
        b = jnp.zeros((H,), jnp.float32)
    bq = min(block_q, _ceil_to(Lq, 128))
    Lqp = _ceil_to(Lq, bq)
    if Lqp != Lq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Lqp - Lq), (0, 0)))
        msg = jnp.pad(msg, ((0, 0), (0, 0), (0, Lqp - Lq), (0, 0)))
    out, fused = pl.pallas_call(
        functools.partial(_kernel, scale=scale, nheads=H, has_msg=has_msg),
        out_shape=(jax.ShapeDtypeStruct((B, H, Lqp, D), q.dtype),
                   jax.ShapeDtypeStruct((B, H, Lqp, Lk), jnp.float32)),
        grid=(B, Lqp // bq),
        in_specs=[
            pl.BlockSpec((1, H, bq, D), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, H, Lk, D), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, H, Lk, D), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, H, bq, Lk), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((H, 2 * H), lambda i, j: (0, 0)),
            pl.BlockSpec((H,), lambda i, j: (0,)),
        ],
        out_specs=(pl.BlockSpec((1, H, bq, D), lambda i, j: (i, 0, j, 0)),
                   pl.BlockSpec((1, H, bq, Lk), lambda i, j: (i, 0, j, 0))),
        interpret=interpret,
    )(q, k, v, msg, w.astype(jnp.float32), b.astype(jnp.float32))
    return out[:, :, :Lq], fused[:, :, :Lq]


def _forward_xla(q, k, v, msg, w, b, scale):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if msg is not None:
        both = jnp.concatenate([scores, msg.astype(jnp.float32)], axis=1)
        fused = jnp.einsum("hc,bcqk->bhqk", w.astype(jnp.float32), both) \
            + b.astype(jnp.float32)[None, :, None, None]
    else:
        fused = scores
    probs = jax.nn.softmax(fused, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return out, fused


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused(q, k, v, msg, w, b, scale, impl):
    if impl == "pallas":
        return _forward_pallas(q, k, v, msg, w, b, scale)
    if impl == "interpret":
        return _forward_pallas(q, k, v, msg, w, b, scale, interpret=True)
    return _forward_xla(q, k, v, msg, w, b, scale)


def _fwd(q, k, v, msg, w, b, scale, impl):
    out = _fused(q, k, v, msg, w, b, scale, impl)
    return out, (q, k, v, msg, w, b)


def _bwd(scale, impl, res, grads):
    q, k, v, msg, w, b = res
    dout, dfused_out = grads
    has_msg = msg is not None
    H = q.shape[1]

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    if has_msg:
        both = jnp.concatenate([scores, msg.astype(jnp.float32)], axis=1)
        wf = w.astype(jnp.float32)
        fused = jnp.einsum("hc,bcqk->bhqk", wf, both) \
            + b.astype(jnp.float32)[None, :, None, None]
    else:
        fused = scores
    p = jax.nn.softmax(fused, axis=-1)

    do = dout.astype(jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", do, vf)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, do)
    dfused = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dfused = dfused + dfused_out.astype(jnp.float32)

    if has_msg:
        dboth = jnp.einsum("hc,bhqk->bcqk", wf, dfused)
        dscores = dboth[:, :H]
        dmsg = dboth[:, H:].astype(msg.dtype)
        dw = jnp.einsum("bhqk,bcqk->hc", dfused, both)
        db = dfused.sum(axis=(0, 2, 3))
    else:
        dscores = dfused
        dmsg = None
        dw = jnp.zeros_like(w) if w is not None else None
        db = jnp.zeros_like(b) if b is not None else None

    dq = jnp.einsum("bhqk,bhkd->bhqd", dscores, kf) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", dscores, qf) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dmsg, dw, db)


_fused.defvjp(_fwd, _bwd)


def invpt_fused_attention(q, k, v, msg: Optional[jax.Array],
                          w: Optional[jax.Array], b: Optional[jax.Array],
                          scale: float, impl: Optional[str] = None
                          ) -> Tuple[jax.Array, jax.Array]:
    """q,k,v: (B, H, L, D); msg: (B, H, Lq, Lk) or None; w: (H, 2H), b: (H,).

    Returns (attention output (B,H,Lq,D), fused scores / new message).
    """
    if impl is None:
        import os
        impl = os.environ.get("MTT_ATTN_IMPL")
        if impl is None:
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    return _fused(q, k, v, msg, w, b, scale, impl)
