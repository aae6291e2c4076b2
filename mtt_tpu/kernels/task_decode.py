"""Fused TaskPrompter spatial+channel task-feature decode (TPU Pallas).

The decode at each tap layer (reference cal_task_feature,
TaskPrompter/models/transformers/taskprompter.py:434-474) scales the patch
map per task by attention weights, adds the residual, and applies a
per-task 1x1 projection — for both the spatial and the channel pathway.
Done in XLA this materializes two (B, S, T, C) intermediates (84 MB each
at ViT-L bench shapes) that exist only to feed grouped 1x1 convs
(profiled ~0.5 ms of broadcast+format copies per tap layer). This kernel
builds the scaled inputs in VMEM and runs the per-task projections
directly: x is read once per spatial block, nothing intermediate touches
HBM.

Mosaic constraints shape the design: no lane-dim shape casts (the
head-group broadcast is a (S, G) @ (G, C) 0/1 expansion matmul instead
of a reshape) and no mid-block strided stores (each task's spatial and
channel projections get their own full-block output ref; the task-major
channel concat the fuse convs consume is one XLA fusion on the way out).

Specialized to chan_nheads == 1 (every published TaskPrompter-ViT config);
the windowed case falls back to the XLA composition.

Backward: recompute-based custom VJP via the XLA composition.
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


def _decode_kernel(x_ref, a_ref, cw_ref, ws_ref, bs_ref, wc_ref, bc_ref,
                   *o_refs, T: int, G: int, tar: int):
    x = x_ref[0]                                   # (bs, C)
    S, C = x.shape
    gc = C // G
    cw = cw_ref[0].astype(jnp.float32)             # (T, C)
    xf = x.astype(jnp.float32)
    # per-head-group scale expanded to channels via a 0/1 matmul: Mosaic
    # cannot shape-cast (S, C) -> (S, G, gc) (lane-dim split), and a
    # (S, G) @ (G, C) expansion dot is trivially cheap on the MXU
    rows = jax.lax.broadcasted_iota(jnp.int32, (G, C), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (G, C), 1) // gc
    expand = (rows == cols).astype(jnp.float32)    # (G, C)
    for t in range(T):
        at = a_ref[0, t].astype(jnp.float32)       # (bs, G)
        at_c = jax.lax.dot_general(
            at, expand, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (bs, C)
        f_in = xf * at_c + xf
        fc_in = xf * cw[t] + xf
        ws = ws_ref[0, t]                          # (C, tar)
        wc = wc_ref[0, t]
        f = jax.lax.dot_general(
            f_in.astype(x.dtype), ws, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bs_ref[0, t]
        fc = jax.lax.dot_general(
            fc_in.astype(x.dtype), wc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bc_ref[0, t]
        o_refs[2 * t][0] = f.astype(o_refs[2 * t].dtype)
        o_refs[2 * t + 1][0] = fc.astype(o_refs[2 * t + 1].dtype)


def _decode_pallas(x, a, cw, ws, bs, wc, bc, block_s: int = 256,
                   interpret: bool = False):
    B, S, C = x.shape
    T, _, tar = ws.shape
    G = a.shape[-1]
    nS = S // block_s
    kwargs = {}
    if not interpret and pltpu is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    outs = pl.pallas_call(
        functools.partial(_decode_kernel, T=T, G=G, tar=tar),
        out_shape=[jax.ShapeDtypeStruct((B, S, tar), x.dtype)
                   for _ in range(2 * T)],
        grid=(B, nS),
        in_specs=[
            pl.BlockSpec((1, block_s, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T, block_s, G), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, T, C, tar), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, T, 1, tar), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, T, C, tar), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, T, 1, tar), lambda b, i: (0, 0, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, block_s, tar), lambda b, i: (b, i, 0))
                   for _ in range(2 * T)],
        interpret=interpret,
        **kwargs,
    )(x, a, cw, ws[None], bs[None, :, None], wc[None], bc[None, :, None])
    # task-major channel concat [f_0, fc_0, f_1, fc_1, ...]: exactly the
    # layout the grouped fuse convs consume — one XLA fusion
    return jnp.concatenate(outs, axis=-1)


def _decode_xla(x, a, cw, ws, bs, wc, bc):
    B, S, C = x.shape
    T, _, tar = ws.shape
    G = a.shape[-1]
    gc = C // G
    xg = x.reshape(B, S, G, gc)
    at = a.transpose(0, 2, 1, 3).astype(x.dtype)   # (B, S, T, G)
    f_in = (xg[:, :, None] * at[..., None]).reshape(B, S, T, C) \
        + x[:, :, None]
    fc_in = x[:, :, None] * cw[:, None].astype(x.dtype) + x[:, :, None]
    f = jnp.einsum("bstc,tcr->bstr", f_in, ws,
                   preferred_element_type=jnp.float32) + bs[None, None]
    fc = jnp.einsum("bstc,tcr->bstr", fc_in, wc,
                    preferred_element_type=jnp.float32) + bc[None, None]
    cat = jnp.concatenate([f, fc], axis=-1)        # (B, S, T, 2*tar)
    return cat.reshape(B, S, T * 2 * tar).astype(x.dtype)


def _decode_ok(x, a, ws) -> bool:
    if pltpu is None:
        return False
    B, S, C = x.shape
    T, _, tar = ws.shape
    return (C % 128 == 0 and S % 256 == 0
            and 2 * T * C * tar * x.dtype.itemsize <= 8 * 2 ** 20)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused_decode(x, a, cw, ws, bs, wc, bc, impl: str):
    if impl == "pallas" and _decode_ok(x, a, ws):
        return _decode_pallas(x, a, cw, ws, bs, wc, bc)
    if impl == "interpret" and _decode_ok(x, a, ws):
        return _decode_pallas(x, a, cw, ws, bs, wc, bc, interpret=True)
    return _decode_xla(x, a, cw, ws, bs, wc, bc)


def _decode_fwd(x, a, cw, ws, bs, wc, bc, impl):
    return _fused_decode(x, a, cw, ws, bs, wc, bc, impl), \
        (x, a, cw, ws, bs, wc, bc)


def _decode_bwd(impl, res, g):
    x, a, cw, ws, bs, wc, bc = res
    _, vjp = jax.vjp(
        lambda *args: _decode_xla(*args), x, a, cw, ws, bs, wc, bc)
    return vjp(g)


_fused_decode.defvjp(_decode_fwd, _decode_bwd)


def fused_task_decode(x, a, cw, ws, bs, wc, bc,
                      impl: Optional[str] = None) -> jax.Array:
    """Per-task spatial+channel decode projections.

    x: (B, S, C) patch map; a: (B, T, S, G) spatial attention weights
    (head-major groups); cw: (B, T, C) channel weights; ws/wc: (T, C, tar)
    per-task projection kernels; bs/bc: (T, tar) biases.
    Returns (B, S, T*2*tar) with task-major channels
    [f_0, fc_0, f_1, fc_1, ...] where
      f_t  = (x *g a_t + x) @ ws_t + bs_t
      fc_t = (x * cw_t + x) @ wc_t + bc_t
    """
    if impl is None:
        import os
        impl = os.environ.get("MTT_DECODE_IMPL")
        if impl is None:
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    return _fused_decode(x, a, cw, ws, bs, wc, bc, impl)
