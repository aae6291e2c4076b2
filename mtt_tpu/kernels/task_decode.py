"""Fused TaskPrompter spatial+channel task-feature decode (TPU Pallas).

The decode at each tap layer (reference cal_task_feature,
TaskPrompter/models/transformers/taskprompter.py:434-474) scales the patch
map per task by attention weights, adds the residual, applies a per-task
1x1 projection for both the spatial and the channel pathway, concatenates
the two, and feeds a per-task 1x1 fuse conv (ref fuse stack
taskprompter.py:477-486 first stage). Done in XLA this materializes two
(B, S, T, C) intermediates (84 MB each at ViT-L bench shapes) plus the
(B, S, T*2*tar) concat (49 MB written, re-read, and layout-copied into
the fuse conv — profiled ~0.42 ms of pure data formatting per tap layer).
This kernel builds the scaled inputs in VMEM, runs the per-task
projections AND the first fuse projection in place, and writes one
(B, S, T*final) tensor: x is read once per spatial block, nothing
intermediate touches HBM, and the downstream (B, gh, gw, T*final)
reshape is free.

Grid is (B, spatial blocks) with a static task loop inside the kernel:
every weight operand is constant-indexed (fetched into VMEM once for the
whole call), the x block is read once for all T tasks, and all tasks'
outputs land in one (block, T, final) block so no concat/interleave op
exists downstream.

Mosaic constraints shape the design: no lane-dim shape casts (the
head-group broadcast is a (S, G) @ (G, C) 0/1 expansion matmul instead
of a reshape).

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
                   wf_ref, bf_ref, o_ref, *, T: int, G: int, tar: int):
    x = x_ref[0]                                   # (bs, C)
    S, C = x.shape
    gc = C // G
    # per-head-group scale expanded to channels via a 0/1 matmul: Mosaic
    # cannot shape-cast (S, C) -> (S, G, gc) (lane-dim split), and a
    # (S, G) @ (G, C) expansion dot is trivially cheap on the MXU.
    # Scaled inputs stay in x.dtype — identical precision to the XLA
    # composition (which builds them in x.dtype too).
    rows = jax.lax.broadcasted_iota(jnp.int32, (G, C), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (G, C), 1) // gc
    expand = (rows == cols).astype(x.dtype)        # (G, C)
    ys = []
    for t in range(T):
        # f32 acc (Mosaic requires it), cast back: exact — the 0/1 matrix
        # just selects one bf16 value per output element
        at_c = jax.lax.dot_general(
            a_ref[0, t], expand, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)   # (bs, C)
        f_in = x * at_c + x
        fc_in = x * cw_ref[0, t] + x
        f = jax.lax.dot_general(
            f_in, ws_ref[0, t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bs_ref[0, t]
        fc = jax.lax.dot_general(
            fc_in, wc_ref[0, t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bc_ref[0, t]
        # first fuse stage folded in: y_t = [f_t; fc_t] @ wf_t + bf_t
        y = jax.lax.dot_general(
            f.astype(x.dtype), wf_ref[0, t, :tar], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y += jax.lax.dot_general(
            fc.astype(x.dtype), wf_ref[0, t, tar:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ys.append((y + bf_ref[0, t]).astype(o_ref.dtype))
    # single store of all tasks' outputs: a lane-dim concat (a store into
    # the sublane-tiled T slot of a (bs, T, fin) block is an unsupported
    # Mosaic shape cast)
    o_ref[0] = jnp.concatenate(ys, axis=-1)


def _decode_pallas(x, a, cw, ws, bs, wc, bc, wf, bf, block_s: int = 128,
                   interpret: bool = False):
    B, S, C = x.shape
    T, _, tar = ws.shape
    fin = wf.shape[-1]
    G = a.shape[-1]
    nS = S // block_s
    kwargs = {}
    if not interpret and pltpu is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    return pl.pallas_call(
        functools.partial(_decode_kernel, T=T, G=G, tar=tar),
        out_shape=jax.ShapeDtypeStruct((B, S, T * fin), x.dtype),
        grid=(B, nS),
        in_specs=[
            pl.BlockSpec((1, block_s, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T, block_s, G), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, T, C, tar), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, T, 1, tar), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, T, C, tar), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, T, 1, tar), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, T, 2 * tar, fin), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, T, 1, fin), lambda b, i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_s, T * fin), lambda b, i: (b, i, 0)),
        interpret=interpret,
        **kwargs,
    )(x, a.astype(x.dtype), cw.astype(x.dtype), ws[None],
      bs[None, :, None], wc[None], bc[None, :, None],
      wf[None], bf[None, :, None])


def _decode_xla(x, a, cw, ws, bs, wc, bc, wf, bf):
    B, S, C = x.shape
    T, _, tar = ws.shape
    G = a.shape[-1]
    gc = C // G
    xg = x.reshape(B, S, G, gc)
    at = a.transpose(0, 2, 1, 3).astype(x.dtype)   # (B, S, T, G)
    f_in = (xg[:, :, None] * at[..., None]).reshape(B, S, T, C) \
        + x[:, :, None]
    fc_in = x[:, :, None] * cw[:, None].astype(x.dtype) + x[:, :, None]
    f = (jnp.einsum("bstc,tcr->bstr", f_in, ws,
                    preferred_element_type=jnp.float32)
         + bs[None, None]).astype(x.dtype)
    fc = (jnp.einsum("bstc,tcr->bstr", fc_in, wc,
                     preferred_element_type=jnp.float32)
          + bc[None, None]).astype(x.dtype)
    y = jnp.einsum("bstr,trf->bstf", f, wf[:, :tar],
                   preferred_element_type=jnp.float32)
    y += jnp.einsum("bstr,trf->bstf", fc, wf[:, tar:],
                    preferred_element_type=jnp.float32)
    return (y + bf[None, None]).astype(x.dtype).reshape(B, S, -1)


def _decode_ok(x, a, ws, wf) -> bool:
    if pltpu is None:
        return False
    B, S, C = x.shape
    T, _, tar = ws.shape
    wbytes = (2 * T * C * tar + T * 2 * tar * wf.shape[-1]) * x.dtype.itemsize
    return C % 128 == 0 and S % 128 == 0 and wbytes <= 9 * 2 ** 20


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _fused_decode(x, a, cw, ws, bs, wc, bc, wf, bf, impl: str):
    if impl == "pallas":
        if _decode_ok(x, a, ws, wf):
            return _decode_pallas(x, a, cw, ws, bs, wc, bc, wf, bf)
        from mtt_tpu.kernels.fallback_log import note_fallback
        note_fallback("task_decode",
                      f"x={tuple(x.shape)} ws={tuple(ws.shape)}")
    if impl == "interpret" and _decode_ok(x, a, ws, wf):
        return _decode_pallas(x, a, cw, ws, bs, wc, bc, wf, bf,
                              interpret=True)
    return _decode_xla(x, a, cw, ws, bs, wc, bc, wf, bf)


def _decode_fwd(x, a, cw, ws, bs, wc, bc, wf, bf, impl):
    return _fused_decode(x, a, cw, ws, bs, wc, bc, wf, bf, impl), \
        (x, a, cw, ws, bs, wc, bc, wf, bf)


def _decode_bwd(impl, res, g):
    x, a, cw, ws, bs, wc, bc, wf, bf = res
    _, vjp = jax.vjp(
        lambda *args: _decode_xla(*args), x, a, cw, ws, bs, wc, bc, wf, bf)
    return vjp(g)


_fused_decode.defvjp(_decode_fwd, _decode_bwd)


def fused_task_decode(x, a, cw, ws, bs, wc, bc, wf, bf,
                      impl: Optional[str] = None) -> jax.Array:
    """Per-task spatial+channel decode + first fuse projection.

    x: (B, S, C) patch map; a: (B, T, S, G) spatial attention weights
    (head-major groups); cw: (B, T, C) channel weights; ws/wc: (T, C, tar)
    per-task projection kernels; bs/bc: (T, tar) biases; wf: (T, 2*tar, F)
    per-task fuse kernels ([f; fc] row order); bf: (T, F).
    Returns (B, S, T*F), task-major, where
      y_t = [f_t; fc_t] @ wf_t + bf_t,
      f_t  = (x *g a_t + x) @ ws_t + bs_t,
      fc_t = (x * cw_t + x) @ wc_t + bc_t
    """
    if impl is None:
        import os
        impl = os.environ.get("MTT_DECODE_IMPL")
        if impl is None:
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    # rows are independent (per-token decode, no cross-row reduction), so
    # non-128-multiple S (e.g. every non-final NYUD stage: 252/1008/4032
    # tokens) zero-pads to the block size and slices back; the pad/slice
    # sit OUTSIDE the custom_vjp so autodiff handles them
    S = x.shape[1]
    Sp = -(-S // 128) * 128
    if impl != "xla" and Sp != S:
        xp = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0)))
        ap = jnp.pad(a, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        return _fused_decode(xp, ap, cw, ws, bs, wc, bc, wf, bf,
                             impl)[:, :S]
    return _fused_decode(x, a, cw, ws, bs, wc, bc, wf, bf, impl)
