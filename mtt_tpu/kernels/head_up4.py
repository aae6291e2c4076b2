"""Fused up4 ConvHead Pallas kernel (TPU) with XLA fallback.

The reference applies each task head to the 4x-bilinear-upsampled
backbone features (TaskPrompter/models/transformers/taskprompter.py:411-421,
688-698: conv3x3 + BN + GELU -> 1x1 logits). The factored XLA composite
(layers.up4_conv3x3_factored) avoids materialising the upsampled
feature map but still emits a (B, C, 4gh, 4gw) float Y tensor per head
(~73 MB at bench shapes) that the BN/GELU/1x1 epilogue re-reads — the
profile shows ~1.1 ms/head of layout copies, a memory-bound spatial-mix
dot and a VPU multiply-reduce 1x1.

This kernel keeps everything in VMEM per (batch-item, channel-chunk)
grid cell: the channel contraction (Gm), both shifted-upsample spatial
mixes, the folded-BN affine + exact-erf GELU, and the 1x1 logits
contraction; only the (B, H4, W4, n) logits reach HBM. Measured 1.91 vs
2.48 ms for a 5-task-equivalent chained head at bench shapes
(tools/proto_head_r3.py on v5e).

Layout notes (the design constraint on TPU): Mosaic only runs fast
matmuls on 2D (sublane, lane) operands or batch-dim-0 batched operands,
and (sublane, lane) reshapes are relayouts. The kernel therefore:
  * computes Gm rows (h'w', cols) and splits them (free sublane split)
    into (h', w', ds) tap slices;
  * runs the width mix as h'-batched dots (batch dim 0 = h');
  * runs the height mix as dim0-contracting dots per H-strip (strip
    output (H, W, ds) keeps (W, ds) as (sublane, lane));
  * flattens (H, W) rows (free outer-into-sublane merge) for the 1x1.
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

# in-kernel gelu: the polynomial-only erf (no divide/exp) — the
# head's gelu is VPU-exposed (not MXU-overlapped like the MLP's)
# and measures 0.285 -> 0.113 ms/head-call (tools/proto_head_abl.py)
from mtt_tpu.kernels.mlp import _gelu_erf_poly
from mtt_tpu.kernels.mlp import _gelu_erf_poly_fast


def _gm_hc(gh: int, gw: int):
    """h-rows per Gm chunk: must divide gh, and hc*gw (the dynamic
    sublane write offset stride into the flat gm scratch) must be a
    multiple of 8 or Mosaic rejects the store. Prefer the largest such
    divisor <= gh//4 (bounds the f32 chunk transient); None -> caller
    falls back to XLA."""
    cands = [h for h in range(1, gh + 1)
             if gh % h == 0 and (h * gw) % 8 == 0]
    if not cands:
        return None
    small = [h for h in cands if h <= max(gh // 4, 1)]
    return max(small) if small else min(cands)


def _head_kernel(x_ref, wf_ref, swt_ref, sht_ref, inv_ref, addv_ref,
                 kp_ref, o_ref, gm_ref, bk_ref, *, n: int, C: int, gh: int,
                 gw: int, hc: int, n_strips: int):
    j = pl.program_id(1)
    W4 = 4 * gw
    # Gm in sequential row chunks via fori_loop (an unrolled chunk loop
    # gets software-pipelined by Mosaic — all chunk transients co-live
    # and the f32 peak is as bad as one full-size dot)
    rc = hc * gw

    def _gm_chunk(i, carry):
        xr = x_ref[0, pl.ds(i * hc, hc)].reshape(rc, C)
        ch = jax.lax.dot_general(xr, wf_ref[...],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        gm_ref[pl.ds(i * rc, rc)] = ch.astype(jnp.bfloat16)
        return carry

    jax.lax.fori_loop(0, gh // hc, _gm_chunk, 0)
    gm = gm_ref[...].reshape(gh, gw, 9 * 128)
    # width mix, h'-batched per (tap k, tap l): Bk[k] = sum_l Sw_l-mix
    swb = [jnp.broadcast_to(swt_ref[l][None], (gh, W4, gw))
           for l in range(3)]
    for k in range(3):
        acc = jnp.zeros((gh, W4, 128), jnp.float32)
        for l in range(3):
            a_kl = gm[:, :, (k * 3 + l) * 128:(k * 3 + l + 1) * 128]
            acc += jax.lax.dot_general(
                swb[l], a_kl, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        bk_ref[k] = acc.astype(jnp.bfloat16)          # (h', W, ds)
    ivec = inv_ref[0]
    avec = addv_ref[0]
    sh = 4 * gh // n_strips
    for s in range(n_strips):
        y = jnp.zeros((sh, W4, 128), jnp.float32)
        for k in range(3):                            # height mix
            sh_k = sht_ref[k][:, s * sh:(s + 1) * sh]  # (h', H-strip)
            y += jax.lax.dot_general(
                sh_k, bk_ref[k], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (H, W, ds)
        t = _gelu_erf_poly_fast(y * ivec[None, None, :] + avec[None, None, :])
        tv = t.astype(jnp.bfloat16).reshape(sh * W4, 128)
        part = jax.lax.dot_general(tv, kp_ref[...], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

        # bf16 output accumulation: an f32 out block would lane-pad n to
        # 128 (8.4 MB double-buffered — the VMEM budget); bf16 halves it.
        # Only the j-partial sums round (<= 2 roundings on ~|10| logits).
        @pl.when(j == 0)
        def _():
            o_ref[0, s * sh:(s + 1) * sh] = \
                part.reshape(sh, W4, n).astype(o_ref.dtype)

        @pl.when(j != 0)
        def _():
            o_ref[0, s * sh:(s + 1) * sh] = (
                o_ref[0, s * sh:(s + 1) * sh].astype(jnp.float32)
                + part.reshape(sh, W4, n)).astype(o_ref.dtype)


def _hmix_stencil_np(G: int):
    """Decompose the height-mix matrix Sh[(h',k), H] into a 4-phase
    interior stencil plus exact first/last-q border rows.

    For H = 4q + p the bilinear4+conv composite draws h' = q + d with
    d in {-1, 0, 1} and a coefficient c[p, k, d] independent of q except
    at q in {0, G-1} where the upsample's edge behaviour differs. Returns
    (c_int (4,3,3), cb0 (4,3,3) over h' 0..2, cb1 (4,3,3) over h'
    G-3..G-1, ok) with ok=False when the stencil does not reproduce Sh
    exactly (callers then fall back to the dot-based height mix)."""
    import numpy as np
    from mtt_tpu.models.layers import _up4_shift_stack_np
    S = _up4_shift_stack_np(G)                 # (h', k, 4G)
    if G < 6:
        return None, None, None, False
    q0 = G // 2
    c_int = np.zeros((4, 3, 3), np.float32)
    for p in range(4):
        for k in range(3):
            for di, d in enumerate((-1, 0, 1)):
                c_int[p, k, di] = S[q0 + d, k, 4 * q0 + p]
    cb0 = np.zeros((4, 3, 3), np.float32)
    cb1 = np.zeros((4, 3, 3), np.float32)
    for p in range(4):
        for k in range(3):
            cb0[p, k] = S[0:3, k, p]
            cb1[p, k] = S[G - 3:G, k, 4 * (G - 1) + p]
    # validate: rebuild S from the stencil
    R = np.zeros_like(S)
    for p in range(4):
        for k in range(3):
            for q in range(1, G - 1):
                for di, d in enumerate((-1, 0, 1)):
                    hp = q + d
                    if 0 <= hp < G:
                        R[hp, k, 4 * q + p] += c_int[p, k, di]
            R[0:3, k, p] = cb0[p, k]
            R[G - 3:G, k, 4 * (G - 1) + p] = cb1[p, k]
    ok = bool(np.abs(R - S).max() < 1e-6)
    return c_int, cb0, cb1, ok


def _head_kernel_stencil(x_ref, wf_ref, swt_ref, inv_ref, addv_ref,
                         kp_ref, o_ref, gm_ref, bk_ref, *, n: int, C: int,
                         gh: int, gw: int, hc: int, c_int, cb0, cb1):
    """Stencil variant of the height mix: the 12 dim0-contracting Mosaic
    dots (internal relayouts, ~1.2 ms/head) become ~30 VPU slab
    multiply-adds on outer-dim-shifted Bk slabs; output is phase-major
    (p, q, W, ds) so the 1x1 rows flatten for free."""
    j = pl.program_id(1)
    W4 = 4 * gw
    rc = hc * gw

    def _gm_chunk(i, carry):
        xr = x_ref[0, pl.ds(i * hc, hc)].reshape(rc, C)
        ch = jax.lax.dot_general(xr, wf_ref[...],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        gm_ref[pl.ds(i * rc, rc)] = ch.astype(jnp.bfloat16)
        return carry

    jax.lax.fori_loop(0, gh // hc, _gm_chunk, 0)
    gm = gm_ref[...].reshape(gh, gw, 9 * 128)
    # K-folded width mix: one batched dot per k with the 3 l-taps
    # concatenated on the contraction dim — K = 3*gw instead of gw
    # (25% -> 75% MXU pass utilisation at gw=32; measured -0.1 ms/head,
    # tools/proto_head_abl.py wmix96)
    sw3 = jnp.concatenate([swt_ref[l] for l in range(3)], axis=1)
    swb3 = jnp.broadcast_to(sw3[None], (gh, W4, 3 * gw))
    for k in range(3):
        a_k = jnp.concatenate(
            [gm[:, :, (k * 3 + l) * 128:(k * 3 + l + 1) * 128]
             for l in range(3)], axis=1)
        acc = jax.lax.dot_general(
            swb3, a_k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        bk_ref[k] = acc.astype(jnp.bfloat16)          # (h', W, ds)
    ivec = inv_ref[0]
    avec = addv_ref[0]
    for p in range(4):
        y = jnp.zeros((gh, W4, 128), jnp.float32)
        for k in range(3):
            bk_k = bk_ref[k].astype(jnp.float32)      # (gh, W, ds)
            for di, d in enumerate((-1, 0, 1)):
                c = float(c_int[p, k, di])
                if abs(c) < 1e-12:
                    continue
                # y[q] += c * bk_k[q + d]: shift along the OUTER dim via
                # slice + zero-row concat (scatter-add has no Mosaic
                # lowering); border rows q=0/gh-1 are overwritten below
                z = jnp.zeros((1, W4, 128), jnp.float32)
                if d == 0:
                    y = y + c * bk_k
                elif d == 1:
                    y = y + c * jnp.concatenate([bk_k[1:], z], axis=0)
                else:
                    y = y + c * jnp.concatenate([z, bk_k[:gh - 1]], axis=0)
        row0 = jnp.zeros((1, W4, 128), jnp.float32)
        rowl = jnp.zeros((1, W4, 128), jnp.float32)
        for k in range(3):
            for hi in range(3):
                c0 = float(cb0[p, k, hi])
                cl = float(cb1[p, k, hi])
                if abs(c0) > 1e-12:
                    row0 = row0 + c0 * bk_ref[k, hi:hi + 1].astype(
                        jnp.float32)
                if abs(cl) > 1e-12:
                    rowl = rowl + cl * bk_ref[k, gh - 3 + hi:gh - 2 + hi] \
                        .astype(jnp.float32)
        y = jnp.concatenate([row0, y[1:gh - 1], rowl], axis=0)
        t = _gelu_erf_poly_fast(y * ivec[None, None, :] + avec[None, None, :])
        tv = t.astype(jnp.bfloat16).reshape(gh * W4, 128)
        part = jax.lax.dot_general(tv, kp_ref[...], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _():
            o_ref[0, p] = part.reshape(gh, W4, n).astype(o_ref.dtype)

        @pl.when(j != 0)
        def _():
            o_ref[0, p] = (o_ref[0, p].astype(jnp.float32)
                           + part.reshape(gh, W4, n)).astype(o_ref.dtype)


def _head_kernel_stencil2(x_ref, wf_ref, inv_ref, addv_ref, kp_ref, o_ref,
                          gm_ref, bk_ref, *, n: int, C: int, G: int,
                          hc: int, c_int, cb0, cb1):
    """Both spatial mixes as phase-major stencils: the width mix becomes
    ~30 sublane-rolled slab multiply-adds per channel chunk (instead of 9
    h'-batched Mosaic dots at 25% MXU) and the height mix the outer-dim
    stencil of _head_kernel_stencil; everything stays phase-major
    (ph, px, qh, qw) so only a small logits transpose runs in XLA."""
    j = pl.program_id(1)
    # hc comes from _gm_hc (caller): (hc * G) % 8 == 0 guaranteed — an
    # internally derived G//4 can produce a non-8-aligned dynamic
    # sublane store offset that Mosaic rejects (e.g. G=12 -> rc=36)
    rc = hc * G

    def _gm_chunk(i, carry):
        xr = x_ref[0, pl.ds(i * hc, hc)].reshape(rc, C)
        ch = jax.lax.dot_general(xr, wf_ref[...],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        gm_ref[pl.ds(i * rc, rc)] = ch.astype(jnp.bfloat16)
        return carry

    jax.lax.fori_loop(0, G // hc, _gm_chunk, 0)
    gm = gm_ref[...].reshape(G, G, 9 * 128)
    col = jax.lax.broadcasted_iota(jnp.int32, (G, G, 1), 1)
    # width-mix stencil -> bk[k, px] = (h', qw, ds)
    for k in range(3):
        a_k = [gm[:, :, (k * 3 + l) * 128:(k * 3 + l + 1) * 128]
               .astype(jnp.float32) for l in range(3)]
        for px in range(4):
            acc = jnp.zeros((G, G, 128), jnp.float32)
            for l in range(3):
                for di, d in enumerate((-1, 0, 1)):
                    c = float(c_int[px, l, di])
                    if abs(c) < 1e-12:
                        continue
                    # acc[:, qw] += c * a[:, qw + d]; circular wrap only
                    # touches the border columns, overwritten below
                    # (pltpu.roll wants a non-negative shift)
                    acc = acc + c * pltpu.roll(a_k[l], (-d) % G, 1)
            b0 = jnp.zeros((G, 1, 128), jnp.float32)
            bl = jnp.zeros((G, 1, 128), jnp.float32)
            for l in range(3):
                for hi in range(3):
                    c0 = float(cb0[px, l, hi])
                    cl = float(cb1[px, l, hi])
                    if abs(c0) > 1e-12:
                        b0 = b0 + c0 * a_k[l][:, hi:hi + 1]
                    if abs(cl) > 1e-12:
                        bl = bl + cl * a_k[l][:, G - 3 + hi:G - 2 + hi]
            acc = jnp.where(col == 0, b0, acc)
            acc = jnp.where(col == G - 1, bl, acc)
            bk_ref[k, px] = acc.astype(jnp.bfloat16)
    ivec = inv_ref[0]
    avec = addv_ref[0]
    for ph in range(4):
        for px in range(4):
            y = jnp.zeros((G, G, 128), jnp.float32)
            for k in range(3):
                bkk = bk_ref[k, px].astype(jnp.float32)
                for di, d in enumerate((-1, 0, 1)):
                    c = float(c_int[ph, k, di])
                    if abs(c) < 1e-12:
                        continue
                    z = jnp.zeros((1, G, 128), jnp.float32)
                    if d == 0:
                        y = y + c * bkk
                    elif d == 1:
                        y = y + c * jnp.concatenate([bkk[1:], z], axis=0)
                    else:
                        y = y + c * jnp.concatenate([z, bkk[:G - 1]], axis=0)
            row0 = jnp.zeros((1, G, 128), jnp.float32)
            rowl = jnp.zeros((1, G, 128), jnp.float32)
            for k in range(3):
                for hi in range(3):
                    c0 = float(cb0[ph, k, hi])
                    cl = float(cb1[ph, k, hi])
                    if abs(c0) > 1e-12:
                        row0 = row0 + c0 * bk_ref[k, px, hi:hi + 1] \
                            .astype(jnp.float32)
                    if abs(cl) > 1e-12:
                        rowl = rowl + cl * \
                            bk_ref[k, px, G - 3 + hi:G - 2 + hi] \
                            .astype(jnp.float32)
            y = jnp.concatenate([row0, y[1:G - 1], rowl], axis=0)
            t = _gelu_erf_poly_fast(y * ivec[None, None, :]
                               + avec[None, None, :])
            tv = t.astype(jnp.bfloat16).reshape(G * G, 128)
            part = jax.lax.dot_general(tv, kp_ref[...],
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

            @pl.when(j == 0)
            def _():
                o_ref[0, ph, px] = part.reshape(G, G, n).astype(o_ref.dtype)

            @pl.when(j != 0)
            def _():
                o_ref[0, ph, px] = (
                    o_ref[0, ph, px].astype(jnp.float32)
                    + part.reshape(G, G, n)).astype(o_ref.dtype)


def _head_pallas(x, kc, inv, addv, kp, interpret=False):
    B, Gh, Gw, C = x.shape
    n = kp.shape[-1]
    W4 = 4 * Gw
    H4 = 4 * Gh
    hc = _gm_hc(Gh, Gw)
    dt = x.dtype
    DP = -(-C // 128) * 128
    nj = DP // 128
    from mtt_tpu.models.layers import _up4_shift_stack_np
    kpad = jnp.pad(kc.astype(dt), ((0, 0), (0, 0), (0, 0), (0, DP - C)))
    # Wf columns ordered (chunk j, tap k, tap l, ds)
    Wf = kpad.transpose(2, 0, 1, 3).reshape(C, 3, 3, nj, 128) \
        .transpose(0, 3, 1, 2, 4).reshape(C, nj * 1152)
    Sw = _up4_shift_stack_np(Gw)                      # (w', l, 4gw)
    Sh = _up4_shift_stack_np(Gh)                      # (h', k, 4gh)
    swt = jnp.asarray(Sw.transpose(1, 2, 0), dt)      # (l, W4, w')
    sht = jnp.asarray(Sh.transpose(1, 0, 2), dt)      # (k, h', H4)
    invp = jnp.pad(inv.astype(jnp.float32), (0, DP - C)).reshape(1, DP)
    addvp = jnp.pad(addv.astype(jnp.float32), (0, DP - C)).reshape(1, DP)
    kpp = jnp.pad(kp.astype(dt), ((0, DP - C), (0, 0)))
    kwargs = {}
    if not interpret and pltpu is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
    scratch = [pltpu.VMEM((Gh * Gw, 1152), jnp.bfloat16),
               pltpu.VMEM((3, Gh, W4, 128), jnp.bfloat16)] \
        if pltpu is not None else [None, None]
    import os
    c_int, cb0, cb1, st_ok = _hmix_stencil_np(Gh)
    # "stencil" (H-mix stencil, W-mix batched dots) measures fastest:
    # 141.4 imgs/s headline vs 138.2 for "stencil2" (both mixes as
    # stencils — the sublane pltpu.rolls of the width pass cost more than
    # the 25%-MXU batched dots they replace) vs 134.4 for "dots".
    s2 = os.environ.get("MTT_HEAD_S2", "stencil")
    if st_ok and s2 == "stencil2" and Gh == Gw:
        G = Gh                                 # square-only variant
        out = pl.pallas_call(
            functools.partial(_head_kernel_stencil2, n=n, C=C, G=G,
                              hc=hc, c_int=c_int, cb0=cb0, cb1=cb1),
            out_shape=jax.ShapeDtypeStruct((B, 4, 4, G, G, n),
                                           jnp.bfloat16),
            grid=(B, nj),
            in_specs=[
                pl.BlockSpec((1, G, G, C), lambda b, j: (b, 0, 0, 0)),
                pl.BlockSpec((C, 1152), lambda b, j: (0, j)),
                pl.BlockSpec((1, 128), lambda b, j: (0, j)),
                pl.BlockSpec((1, 128), lambda b, j: (0, j)),
                pl.BlockSpec((128, n), lambda b, j: (j, 0)),
            ],
            out_specs=pl.BlockSpec((1, 4, 4, G, G, n),
                                   lambda b, j: (b, 0, 0, 0, 0, 0)),
            scratch_shapes=[pltpu.VMEM((G * G, 1152), jnp.bfloat16),
                            pltpu.VMEM((3, 4, G, G, 128), jnp.bfloat16)]
            if pltpu is not None else [None, None],
            interpret=interpret,
            **kwargs,
        )(x, Wf, invp, addvp, kpp)
        # phase-major (B, ph, px, qh, qw, n) -> (B, 4qh+ph, 4qw+px, n)
        out = out.transpose(0, 3, 1, 4, 2, 5).reshape(B, W4, W4, n)
        return out.astype(jnp.float32)
    if st_ok and s2 == "stencil":
        out = pl.pallas_call(
            functools.partial(_head_kernel_stencil, n=n, C=C, gh=Gh, gw=Gw,
                              hc=hc, c_int=c_int, cb0=cb0, cb1=cb1),
            out_shape=jax.ShapeDtypeStruct((B, 4, Gh, W4, n), jnp.bfloat16),
            grid=(B, nj),
            in_specs=[
                pl.BlockSpec((1, Gh, Gw, C), lambda b, j: (b, 0, 0, 0)),
                pl.BlockSpec((C, 1152), lambda b, j: (0, j)),
                pl.BlockSpec((3, W4, Gw), lambda b, j: (0, 0, 0)),
                pl.BlockSpec((1, 128), lambda b, j: (0, j)),
                pl.BlockSpec((1, 128), lambda b, j: (0, j)),
                pl.BlockSpec((128, n), lambda b, j: (j, 0)),
            ],
            out_specs=pl.BlockSpec((1, 4, Gh, W4, n),
                                   lambda b, j: (b, 0, 0, 0, 0)),
            scratch_shapes=scratch,
            interpret=interpret,
            **kwargs,
        )(x, Wf, swt, invp, addvp, kpp)
        # phase-major (B, p, q, W, n) -> (B, 4q+p = H, W, n)
        out = out.transpose(0, 2, 1, 3, 4).reshape(B, H4, W4, n)
        return out.astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_head_kernel, n=n, C=C, gh=Gh, gw=Gw, hc=hc,
                          n_strips=8),
        out_shape=jax.ShapeDtypeStruct((B, H4, W4, n), jnp.bfloat16),
        grid=(B, nj),
        in_specs=[
            pl.BlockSpec((1, Gh, Gw, C), lambda b, j: (b, 0, 0, 0)),
            pl.BlockSpec((C, 1152), lambda b, j: (0, j)),
            pl.BlockSpec((3, W4, Gw), lambda b, j: (0, 0, 0)),
            pl.BlockSpec((3, Gh, H4), lambda b, j: (0, 0, 0)),
            pl.BlockSpec((1, 128), lambda b, j: (0, j)),
            pl.BlockSpec((1, 128), lambda b, j: (0, j)),
            pl.BlockSpec((128, n), lambda b, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((1, H4, W4, n), lambda b, j: (b, 0, 0, 0)),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(x, Wf, swt, sht, invp, addvp, kpp)
    return out.astype(jnp.float32)


def _head_xla(x, kc, inv, addv, kp):
    """Reference composition (identical math, channel-major Y)."""
    from mtt_tpu.models.layers import up4_conv3x3_factored
    dt = x.dtype
    Y = up4_conv3x3_factored(x, kc)                    # (B, d, W4, H4) f32
    y = _gelu_erf_poly(Y * inv[None, :, None, None]
                       + addv[None, :, None, None])
    logits = jax.lax.dot_general(y.astype(dt), kp.astype(dt),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    return logits.transpose(0, 2, 1, 3)                # (B, H4, W4, n) f32


def _ok(x, kp) -> bool:
    B, Gh, Gw, C = x.shape
    n = kp.shape[-1]
    # bf16 only: an f32 model doubles every block and blows the scoped
    # VMEM cap (observed 25.2M for the f32 training-CLI eval); f32 also
    # wants f32 reference numerics — use the XLA composition there.
    if x.dtype != jnp.bfloat16:
        return False
    # Gh % 4: strip geometry; _gm_hc: an 8-aligned Gm chunk row count
    # must exist. Non-square grids (NYUD 28x36) use per-axis shift stacks.
    if Gh % 4 or Gw % 4 or Gh < 8 or Gw < 8 or _gm_hc(Gh, Gw) is None:
        return False
    # VMEM budget: gm f32 transient + bk scratch + strip temps + out
    vmem = (Gh * Gw * 1152 * 4 + 3 * Gh * 4 * Gw * 128 * 2
            + (Gh * 4 * Gw * 128) * (4 + 4 + 2) // 4
            + 4 * Gh * 4 * Gw * n * 4 * 2
            + Gh * Gw * C * 2 * 2 + C * 1152 * 2 * 2)
    # gate scaled with the 28 MB scoped-VMEM cap (was 15 MB at the 23 MB
    # cap; the estimate runs ~1.5x under the compiler's scoped report, so
    # 18.5 MB est ~ 27.5 MB actual — NYUD semseg n=40 measured OK on HW)
    return n <= 128 and vmem <= 18.5 * 2 ** 20


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_head(x, kc, inv, addv, kp, impl: str):
    if impl == "pallas":
        if _ok(x, kp):
            return _head_pallas(x, kc, inv, addv, kp)
        from mtt_tpu.kernels.fallback_log import note_fallback
        note_fallback("head_up4",
                      f"x={tuple(x.shape)} {x.dtype} n={kp.shape[-1]}")
    if impl == "interpret" and _ok(x, kp):
        return _head_pallas(x, kc, inv, addv, kp, interpret=True)
    return _head_xla(x, kc, inv, addv, kp)


def _fwd(x, kc, inv, addv, kp, impl):
    return _fused_head(x, kc, inv, addv, kp, impl), (x, kc, inv, addv, kp)


def _bwd(impl, res, g):
    x, kc, inv, addv, kp = res
    _, vjp = jax.vjp(lambda *a: _head_xla(*a), x, kc, inv, addv, kp)
    return vjp(g)


_fused_head.defvjp(_fwd, _bwd)


def fused_up4_head(x, kc, inv, addv, kp, impl: Optional[str] = None):
    """conv3x3-SAME(bilinear_upsample4(x)) -> folded-BN affine -> exact
    GELU -> 1x1 logits, fused; returns (B, 4gh, 4gw, n) float32 logits
    (no 1x1 bias — callers add it; it commutes with the transpose).

    x: (B, g, g, C); kc: (3, 3, C, C); inv/addv: (C,) f32 folded BN
    affine; kp: (C, n) 1x1 weights. Equivalent to the factored XLA path
    (layers.up4_conv3x3_factored + epilogue) with the affine/GELU in f32
    (the XLA path computes them in the model dtype — bf16-level diffs).
    """
    if impl is None:
        import os
        impl = os.environ.get("MTT_HEAD_KERNEL_IMPL")
        if impl is None:
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    return _fused_head(x, kc, inv, addv, kp, impl)
