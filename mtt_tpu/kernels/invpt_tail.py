"""Fused InvPT multi-scale tail Pallas kernel (TPU) with XLA fallback.

The InvPT decoder ends, per task, with
    relu(BN(conv3x3(U8(x0) + U4(x1) + U2(x2))))
(reference invpt.py:520-543: all stages' task features upsampled to the
final (th, tw) grid, summed, then conv+BN+ReLU). The dense XLA path
materialises three (B, th, tw, D) upsampled tensors plus the f32 conv
output per task (~0.6 GB of HBM round-trips per ViT-L PASCAL bench step)
and runs the 3x3 conv on the full-resolution sum (97.8 GFLOP/task/img).

conv3x3 and bilinear upsample are both linear, so the composite factors
per scale: conv(U_f(x)) = Sh_f^T (x @ Wk) Sw_f with the channel
contraction at LOW resolution (upf_conv3x3_factored lineage, ~32 GFLOP
— 3x fewer). Round 3 measured the factored XLA form SLOWER (68.7 vs
81.4 imgs/s): it writes three f32 channel-major accumulators per task to
HBM. This kernel is the in-VMEM version that r3's PERF.md names as the
successor: per (batch, out-channel-chunk, row-strip) grid cell the
channel dot, both shifted-upsample mixes, the cross-scale sum and the
BN+ReLU epilogue all stay in VMEM; only the final bf16 NHWC strip
reaches HBM.

Layout notes (same constraints as head_up4.py): the width mix runs as
h'-batched dots (batch dim 0), the height mix as dim0-contracting strip
dots; the two small scales' width-mixed slabs are computed once per
(b, j) at strip 0 and cached in scratch; the large scale is pre-sliced
into overlapping row slabs OUTSIDE the kernel (BlockSpecs cannot express
halo windows) so each strip's block arrives by plain indexing.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _shift_stack(g: int, f: int) -> np.ndarray:
    """(g, 3, f*g) composite weights: S[w, l, W] = weight of low-res
    index w, conv tap l in output index W of conv3x3(U_f(x)) along one
    axis (upf_conv3x3_factored's matrices, models/layers.py)."""
    from mtt_tpu.models.layers import _upf_shift_stack_np
    return _upf_shift_stack_np(g, f)


def _strip_windows(g: int, f: int, th: int, n_strips: int):
    """Per-strip h' windows [start, start+slab) covering every nonzero
    Sh coefficient for that strip's output rows; None when a uniform
    static slab cannot cover the support (caller falls back)."""
    S = _shift_stack(g, f)                       # (h', k, th)
    sh_rows = th // n_strips
    los, his = [], []
    for t in range(n_strips):
        cols = S[:, :, t * sh_rows:(t + 1) * sh_rows]
        nz = np.where(np.abs(cols).max(axis=(1, 2)) > 1e-12)[0]
        if len(nz) == 0:
            return None
        los.append(int(nz[0]))
        his.append(int(nz[-1]) + 1)
    slab = max(h - l for l, h in zip(los, his))
    starts = [min(max(l, 0), g - slab) for l in los]
    for t in range(n_strips):
        if not (starts[t] <= los[t] and his[t] <= starts[t] + slab):
            return None
    return starts, slab, sh_rows


def _tail_kernel(x0_ref, x1_ref, x2s_ref, wf_ref, sw0_ref, sw1_ref,
                 sw2_ref, sht0_ref, sht1_ref, sht2s_ref, inv_ref,
                 addv_ref, o_ref, bk0_ref, bk1_ref, *, C: int,
                 g0: Tuple[int, int], g1: Tuple[int, int],
                 g2: Tuple[int, int], slab2: int, sh_rows: int, tw: int):
    strip = pl.program_id(2)

    def _gm(x2d, rows):
        """Channel contraction in row chunks: (rows, C) @ (C, 1152) with
        the f32 transient bounded to one chunk."""
        nch = max(rows // 256, 1)
        while rows % nch:          # chunks must tile the rows exactly
            nch -= 1
        ch = rows // nch
        outs = []
        for i in range(nch):
            d = jax.lax.dot_general(
                x2d[i * ch:(i + 1) * ch], wf_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append(d.astype(x2d.dtype))
        return jnp.concatenate(outs, axis=0) if nch > 1 else outs[0]

    def _wmix(gm3, sw_ref, gh, gw):
        """gm3 (gh, gw, 9*128) -> [bk_k (gh, tw, 128) bf16 for k in 0..2]
        via K-folded h'-batched dots: the 3 l-taps concatenate on the
        contraction dim (K = 3*gw; 3x the MXU pass utilisation of the
        per-tap K=gw dots, tools/proto_head_abl.py wmix96)."""
        sw3 = jnp.concatenate([sw_ref[l] for l in range(3)], axis=1)
        swb3 = jnp.broadcast_to(sw3[None], (gh, tw, 3 * gw))
        out = []
        for k in range(3):
            a_k = jnp.concatenate(
                [gm3[:, :, (k * 3 + l) * 128:(k * 3 + l + 1) * 128]
                 for l in range(3)], axis=1)
            acc = jax.lax.dot_general(
                swb3, a_k, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            out.append(acc.astype(gm3.dtype))
        return out

    # small scales: width-mixed slabs computed once per (b, j), cached
    @pl.when(strip == 0)
    def _():
        gm0 = _gm(x0_ref[0].reshape(g0[0] * g0[1], C), g0[0] * g0[1])
        for k, bk in enumerate(_wmix(gm0.reshape(g0[0], g0[1], 9 * 128),
                                     sw0_ref, g0[0], g0[1])):
            bk0_ref[k] = bk
        gm1 = _gm(x1_ref[0].reshape(g1[0] * g1[1], C), g1[0] * g1[1])
        for k, bk in enumerate(_wmix(gm1.reshape(g1[0], g1[1], 9 * 128),
                                     sw1_ref, g1[0], g1[1])):
            bk1_ref[k] = bk

    # large scale: this strip's pre-sliced slab
    gm2 = _gm(x2s_ref[0, 0].reshape(slab2 * g2[1], C), slab2 * g2[1])
    bk2 = _wmix(gm2.reshape(slab2, g2[1], 9 * 128), sw2_ref, slab2, g2[1])

    y = jnp.zeros((sh_rows, tw, 128), jnp.float32)
    for k in range(3):
        # height mixes: dim0-contracting strip dots (K = low-res rows).
        # All three Sh operands arrive PRE-SLICED per strip via their
        # BlockSpecs — an in-kernel pl.ds on the lane dim at a
        # non-128-multiple offset fails Mosaic lowering ("cannot
        # statically prove that index ... is a multiple of 128").
        y += jax.lax.dot_general(
            sht0_ref[0, k], bk0_ref[k],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        y += jax.lax.dot_general(
            sht1_ref[0, k], bk1_ref[k],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        y += jax.lax.dot_general(
            sht2s_ref[0, k], bk2[k],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    ivec = inv_ref[0]
    avec = addv_ref[0]
    o_ref[0, 0] = jnp.maximum(
        y * ivec[None, None, :] + avec[None, None, :], 0.0
    ).astype(o_ref.dtype)


def _tail_plan(shapes, th: int, tw: int, n_strips: int = 8):
    """Static strip plan for the three scales; None -> fall back."""
    (h0, w0), (h1, w1), (h2, w2) = shapes
    if th % n_strips:
        return None
    fs = []
    for (h, w) in shapes:
        if th % h or tw % w or th // h != tw // w:
            return None
        fs.append(th // h)
    win2 = _strip_windows(h2, fs[2], th, n_strips)
    if win2 is None:
        return None
    return fs, win2


def _n_strips_default() -> int:
    import os
    return int(os.environ.get("MTT_TAIL_STRIPS", "8"))


def _tail_pallas(xs, kc, inv, addv, th, tw, interpret=False,
                 n_strips: Optional[int] = None):
    if n_strips is None:
        n_strips = _n_strips_default()
    x0, x1, x2 = xs
    B = x0.shape[0]
    C = x0.shape[-1]
    dt = x0.dtype
    plan = _tail_plan([x.shape[1:3] for x in xs], th, tw, n_strips)
    fs, (starts2, slab2, sh_rows) = plan
    g0, g1, g2 = [x.shape[1:3] for x in xs]
    D = kc.shape[-1]
    nj = -(-D // 128)
    DP = nj * 128

    # Wf columns ordered (chunk j, tap k, tap l, ds)
    kpad = jnp.pad(kc.astype(dt), ((0, 0), (0, 0), (0, 0), (0, DP - D)))
    Wf = kpad.transpose(2, 0, 1, 3).reshape(C, 3, 3, nj, 128) \
        .transpose(0, 3, 1, 2, 4).reshape(C, nj * 1152)

    sws, shts = [], []
    for (gh, gw), f in zip((g0, g1, g2), fs):
        Sw = _shift_stack(gw, f)                  # (w, l, tw)
        Sh = _shift_stack(gh, f)                  # (h, k, th)
        sws.append(jnp.asarray(Sw.transpose(1, 2, 0), dt))   # (l, tw, w)
        # pre-sliced per strip (T, k, h, sh_rows): the strip slice must
        # happen in the BlockSpec, not in-kernel (lane-dim pl.ds at a
        # non-128-multiple offset fails Mosaic lowering)
        shts.append(jnp.asarray(np.stack(
            [Sh[:, :, t * sh_rows:(t + 1) * sh_rows]
             for t in range(n_strips)], axis=0), dt)
            .transpose(0, 2, 1, 3))               # (T, k, h, sh)
    # large scale: pre-sliced x2 row slabs + matching Sh slices
    x2s = jnp.stack([jax.lax.slice_in_dim(x2, s, s + slab2, axis=1)
                     for s in starts2], axis=1)  # (B, T, slab2, w2, C)
    Sh2 = _shift_stack(g2[0], fs[2])
    sht2s = jnp.asarray(np.stack(
        [Sh2[s:s + slab2, :, t * sh_rows:(t + 1) * sh_rows]
         for t, s in enumerate(starts2)], axis=0), dt) \
        .transpose(0, 2, 1, 3)                    # (T, k, slab2, sh)

    invp = jnp.pad(inv.astype(jnp.float32), (0, DP - D)).reshape(1, DP)
    addvp = jnp.pad(addv.astype(jnp.float32), (0, DP - D)).reshape(1, DP)

    kwargs = {}
    if not interpret and pltpu is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"))
    scratch = [pltpu.VMEM((3, g0[0], tw, 128), dt),
               pltpu.VMEM((3, g1[0], tw, 128), dt)] \
        if pltpu is not None else [None, None]
    out = pl.pallas_call(
        functools.partial(_tail_kernel, C=C, g0=g0, g1=g1, g2=g2,
                          slab2=slab2, sh_rows=sh_rows, tw=tw),
        out_shape=jax.ShapeDtypeStruct((B, n_strips, sh_rows, tw, DP), dt),
        grid=(B, nj, n_strips),
        in_specs=[
            pl.BlockSpec((1,) + g0 + (C,), lambda b, j, t: (b, 0, 0, 0)),
            pl.BlockSpec((1,) + g1 + (C,), lambda b, j, t: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, slab2, g2[1], C),
                         lambda b, j, t: (b, t, 0, 0, 0)),
            pl.BlockSpec((C, 1152), lambda b, j, t: (0, j)),
            pl.BlockSpec((3, tw, g0[1]), lambda b, j, t: (0, 0, 0)),
            pl.BlockSpec((3, tw, g1[1]), lambda b, j, t: (0, 0, 0)),
            pl.BlockSpec((3, tw, g2[1]), lambda b, j, t: (0, 0, 0)),
            pl.BlockSpec((1, 3, g0[0], sh_rows),
                         lambda b, j, t: (t, 0, 0, 0)),
            pl.BlockSpec((1, 3, g1[0], sh_rows),
                         lambda b, j, t: (t, 0, 0, 0)),
            pl.BlockSpec((1, 3, slab2, sh_rows),
                         lambda b, j, t: (t, 0, 0, 0)),
            pl.BlockSpec((1, 128), lambda b, j, t: (0, j)),
            pl.BlockSpec((1, 128), lambda b, j, t: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, 1, sh_rows, tw, 128),
                               lambda b, j, t: (b, t, 0, 0, j)),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(x0, x1, x2s, Wf, sws[0], sws[1], sws[2], shts[0], shts[1], sht2s,
      invp, addvp)
    out = out.reshape(B, th, tw, DP)
    return out[..., :D]


def _stencil_f_np(g: int, f: int):
    """Phase stencil of the f-x upsample+conv height-mix matrix
    S = _shift_stack(g, f): output row r = f*q + p draws on low-res rows
    q + d, d in {-1, 0, 1}, with phase coefficients c[p, k, d] that are
    q-invariant in the interior (same derivation as head_up4's
    _hmix_stencil_np, generalised to any integer factor f). Returns
    (c_int (f,3,3), cb0 (f,3,3) over rows q=0, cb1 (f,3,3) over rows
    q=g-1, ok); ok=False -> caller uses the dot-based height mix."""
    S = _shift_stack(g, f)                       # (h', k, f*g)
    if g < 6:
        return None, None, None, False
    q0 = g // 2
    c_int = np.zeros((f, 3, 3), np.float32)
    cb0 = np.zeros((f, 3, 3), np.float32)
    cb1 = np.zeros((f, 3, 3), np.float32)
    for p in range(f):
        for k in range(3):
            for di, d in enumerate((-1, 0, 1)):
                c_int[p, k, di] = S[q0 + d, k, f * q0 + p]
            cb0[p, k] = S[0:3, k, p]
            cb1[p, k] = S[g - 3:g, k, f * (g - 1) + p]
    R = np.zeros_like(S)
    for p in range(f):
        for k in range(3):
            for q in range(1, g - 1):
                for di, d in enumerate((-1, 0, 1)):
                    hp = q + d
                    if 0 <= hp < g:
                        R[hp, k, f * q + p] += c_int[p, k, di]
            R[0:3, k, p] = cb0[p, k]
            R[g - 3:g, k, f * (g - 1) + p] = cb1[p, k]
    ok = bool(np.abs(R - S).max() < 1e-6)
    return c_int, cb0, cb1, ok


def _tail_kernel_st(x0_ref, x1_ref, x2s_ref, wf_ref, sw0_ref, sw1_ref,
                    sw2_ref, inv_ref, addv_ref, *refs,
                    C: int, g0, g1, g2, sh_rows: int, tw: int,
                    fs, stencils, n_strips: int, head: bool = False):
    """Stencil height mix: the 9 dim0-contracting strip dots (~1.16 of
    the 3.44 ms/task-call, tools/proto_tail_iso.py) become per-phase VPU
    slab multiply-adds on row-shifted Bk slabs. All three scales' inputs
    arrive zero-padded by one row top and bottom, so every interior
    stencil tap is an in-range slice (the padded rows contribute zero
    exactly where the interior formula is invalid — at q = 0 / g-1 —
    and those border output rows are rebuilt exactly from cb0/cb1).

    With ``head`` the per-task 1x1 head conv is fused into the epilogue:
    each (b, j, t) cell emits its channel chunk's PARTIAL logits
    act_j @ Wh_j (f32, (sh, tw, n)) instead of the (sh, tw, 128) feature
    strip; the caller sums the nj partials in XLA. The five 150 MB
    per-task feature tensors (written by this kernel, re-read by the
    five head convs — ~1.5 GB of HBM round-trips per InvPT bench step)
    never materialise. Reference math: decoder tail invpt.py:541-543
    followed by the 1x1 MLPHead (transformer_decoder.py:124-131)."""
    if head:
        wh_ref, bh_ref, o_ref, bk0_ref, bk1_ref, acc_ref = refs
    else:
        o_ref, bk0_ref, bk1_ref = refs
    strip = pl.program_id(2)

    def _gm(x2d, rows):
        nch = max(rows // 256, 1)
        while rows % nch:
            nch -= 1
        ch = rows // nch
        outs = []
        for i in range(nch):
            d = jax.lax.dot_general(
                x2d[i * ch:(i + 1) * ch], wf_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append(d.astype(x2d.dtype))
        return jnp.concatenate(outs, axis=0) if nch > 1 else outs[0]

    def _wmix(gm3, sw_ref, gh, gw):
        # K-folded (K = 3*gw) like the stencil kernel's _wmix
        sw3 = jnp.concatenate([sw_ref[l] for l in range(3)], axis=1)
        swb3 = jnp.broadcast_to(sw3[None], (gh, tw, 3 * gw))
        out = []
        for k in range(3):
            a_k = jnp.concatenate(
                [gm3[:, :, (k * 3 + l) * 128:(k * 3 + l + 1) * 128]
                 for l in range(3)], axis=1)
            acc = jax.lax.dot_general(
                swb3, a_k, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            out.append(acc.astype(gm3.dtype))
        return out

    # small scales (rows padded to g+2): width-mixed once, cached
    @pl.when(strip == 0)
    def _():
        gp0 = (g0[0] + 2) * g0[1]
        gm0 = _gm(x0_ref[0].reshape(gp0, C), gp0)
        for k, bk in enumerate(_wmix(gm0.reshape(g0[0] + 2, g0[1],
                                                 9 * 128),
                                     sw0_ref, g0[0] + 2, g0[1])):
            bk0_ref[k] = bk
        gp1 = (g1[0] + 2) * g1[1]
        gm1 = _gm(x1_ref[0].reshape(gp1, C), gp1)
        for k, bk in enumerate(_wmix(gm1.reshape(g1[0] + 2, g1[1],
                                                 9 * 128),
                                     sw1_ref, g1[0] + 2, g1[1])):
            bk1_ref[k] = bk

    # large scale: uniform padded slab [q0s, q0s + qpb2 + 2)
    qpb2 = sh_rows // fs[2]
    slab2 = qpb2 + 2
    gm2 = _gm(x2s_ref[0, 0].reshape(slab2 * g2[1], C), slab2 * g2[1])
    bk2 = _wmix(gm2.reshape(slab2, g2[1], 9 * 128), sw2_ref, slab2, g2[1])

    row = jax.lax.broadcasted_iota(jnp.int32, (sh_rows, 1, 1), 0)
    last = n_strips - 1

    def _hmix_st(get_bk, f, c_int, cb0, cb1, base, top_base, bot_base):
        """get_bk(k, start, size) -> (size, tw, 128) f32 slab, padded-row
        coords of the provider (global for the scratch scales, slab-local
        for scale 2). base = provider coord of this strip's first q;
        top_base/bot_base = provider coords of padded rows 1 and g-2
        (both STATIC so scale 2's slab reads stay static slices).
        Returns the strip's (sh_rows, tw, 128) f32 contribution."""
        qpb = sh_rows // f
        ys = []
        for p in range(f):
            acc = jnp.zeros((qpb, tw, 128), jnp.float32)
            for k in range(3):
                for di, d in enumerate((-1, 0, 1)):
                    c = float(c_int[p, k, di])
                    if abs(c) < 1e-12:
                        continue
                    acc += c * get_bk(k, base + d, qpb)
            ys.append(acc)
        y = jnp.stack(ys, axis=1).reshape(sh_rows, tw, 128)
        # exact border rows (q = 0 / g-1): the interior formula there
        # reads the zero pad rows instead of edge-replicated upsample
        # behaviour, so both are rebuilt from the true matrix columns
        top = []
        bot = []
        for p in range(f):
            tacc = jnp.zeros((1, tw, 128), jnp.float32)
            bacc = jnp.zeros((1, tw, 128), jnp.float32)
            for k in range(3):
                for h in range(3):
                    c0 = float(cb0[p, k, h])
                    cl = float(cb1[p, k, h])
                    if abs(c0) > 1e-12:
                        tacc += c0 * get_bk(k, top_base + h, 1)
                    if abs(cl) > 1e-12:
                        bacc += cl * get_bk(k, bot_base + h, 1)
            top.append(tacc)
            bot.append(bacc)
        ztail = jnp.zeros((sh_rows - f, tw, 128), jnp.float32)
        topf = jnp.concatenate(top + [ztail], axis=0)
        botf = jnp.concatenate([ztail] + bot, axis=0)
        y = jnp.where((row < f) & (strip == 0), topf, y)
        y = jnp.where((row >= sh_rows - f) & (strip == last), botf, y)
        return y

    def _bk_ref_get(ref):
        return lambda k, start, size: \
            ref[k, pl.ds(start, size)].astype(jnp.float32)

    def _bk2_get(k, start, size):
        # slab-local coords; every caller passes a static start
        return bk2[k][start:start + size].astype(jnp.float32)

    qpb0 = sh_rows // fs[0]
    qpb1 = sh_rows // fs[1]
    c0i, c0b0, c0b1 = stencils[0]
    c1i, c1b0, c1b1 = stencils[1]
    c2i, c2b0, c2b1 = stencils[2]
    y = _hmix_st(_bk_ref_get(bk0_ref), fs[0], c0i, c0b0, c0b1,
                 strip * qpb0 + 1, 1, g0[0] - 2)
    y += _hmix_st(_bk_ref_get(bk1_ref), fs[1], c1i, c1b0, c1b1,
                  strip * qpb1 + 1, 1, g1[0] - 2)
    # scale 2 slab covers padded rows [strip*qpb2, strip*qpb2+qpb2+2):
    # the strip's first q sits at slab index 1; top border rows (padded
    # 1..3) sit at 1..3 of strip 0's slab, bottom rows (padded g-2..g)
    # at qpb2-2..qpb2 of the last strip's slab — all static in-slab
    y += _hmix_st(_bk2_get, fs[2], c2i, c2b0, c2b1,
                  1, 1, qpb2 - 2)
    ivec = inv_ref[0]
    avec = addv_ref[0]
    act = jnp.maximum(y * ivec[None, None, :] + avec[None, None, :], 0.0)
    if head:
        # this channel chunk's partial logits; padded-D lanes carry
        # act == 0 (Wf/inv/addv zero-padded) so Wh's padded rows are
        # inert. Accumulated across the nj chunk (j) grid steps in a
        # persistent f32 VMEM scratch — an XLA-side partial-sum was
        # latency-bound on the n-minor layout (flat 0.445 ms per task
        # regardless of size). The output block is written every cell;
        # the last j's (bias-added, complete) write wins.
        dt = x0_ref.dtype
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        part = jax.lax.dot_general(
            act.astype(dt).reshape(sh_rows * tw, 128), wh_ref[0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        part = part.reshape(sh_rows, tw, -1)

        @pl.when(j == 0)
        def _():
            acc_ref[strip] = part

        @pl.when(j > 0)
        def _():
            acc_ref[strip] = acc_ref[strip] + part

        # the out block spans the WHOLE (th, tw, n) image and its index
        # ignores (j, t): it stays VMEM-resident across the full (j, t)
        # sweep and is flushed ONCE per b — per-cell flushes of n-minor
        # (lane-padded) blocks cost 5x the logical bytes
        n = o_ref.shape[-1]

        @pl.when(j == nj - 1)
        def _():
            o_ref[0, pl.ds(strip * sh_rows, sh_rows)] = \
                (acc_ref[strip]
                 + bh_ref[0][None, None, :])[..., :n].astype(o_ref.dtype)
    else:
        o_ref[0, 0] = act.astype(o_ref.dtype)


def _stencil_plan(shapes, th: int, tw: int):
    """(n_strips, fs, stencils) for the stencil kernel or None.
    sh_rows must be a multiple of every scale factor so strips align to
    whole phase groups (PASCAL 128/8 -> 16; NYUD 112/7 -> 16)."""
    fs = []
    for (h, w) in shapes:
        if th % h or tw % w or th // h != tw // w:
            return None
        fs.append(th // h)
    fmax = max(fs)
    n_strips = None
    for sh in (16, fmax, 2 * fmax, 32):
        # sh must be a whole number of phase groups for EVERY scale
        # factor (the kernel computes qpb = sh // f per scale), not just
        # the largest — e.g. fs=(6, 8) -> sh=16 divides 8 but not 6 and
        # would fail at trace time instead of falling back
        if all(sh % f == 0 for f in fs) and th % sh == 0:
            n_strips = th // sh
            break
    if n_strips is None or n_strips < 2:
        return None
    stencils = []
    for (h, w), f in zip(shapes, fs):
        ci, cb0, cb1, ok = _stencil_f_np(h, f)
        if not ok:
            return None
        stencils.append((ci, cb0, cb1))
    return n_strips, tuple(fs), tuple(stencils)


def _tail_pallas_st(xs, kc, inv, addv, th, tw, plan, interpret=False,
                    head=None):
    x0, x1, x2 = xs
    B, C, dt = x0.shape[0], x0.shape[-1], x0.dtype
    n_strips, fs, stencils = plan
    sh_rows = th // n_strips
    g0, g1, g2 = [x.shape[1:3] for x in xs]
    D = kc.shape[-1]
    nj = -(-D // 128)
    DP = nj * 128

    kpad = jnp.pad(kc.astype(dt), ((0, 0), (0, 0), (0, 0), (0, DP - D)))
    Wf = kpad.transpose(2, 0, 1, 3).reshape(C, 3, 3, nj, 128) \
        .transpose(0, 3, 1, 2, 4).reshape(C, nj * 1152)

    sws = []
    for (gh, gw), f in zip((g0, g1, g2), fs):
        Sw = _shift_stack(gw, f)                  # (w, l, tw)
        sws.append(jnp.asarray(Sw.transpose(1, 2, 0), dt))   # (l, tw, w)

    # one zero row top+bottom per scale: every interior stencil tap is
    # then an in-range slice and the uniform scale-2 slab windows need
    # no per-strip starts
    x0p = jnp.pad(x0, ((0, 0), (1, 1), (0, 0), (0, 0)))
    x1p = jnp.pad(x1, ((0, 0), (1, 1), (0, 0), (0, 0)))
    x2p = jnp.pad(x2, ((0, 0), (1, 1), (0, 0), (0, 0)))
    qpb2 = sh_rows // fs[2]
    slab2 = qpb2 + 2
    x2s = jnp.stack([jax.lax.slice_in_dim(x2p, s * qpb2, s * qpb2 + slab2,
                                          axis=1)
                     for s in range(n_strips)], axis=1)

    invp = jnp.pad(inv.astype(jnp.float32), (0, DP - D)).reshape(1, DP)
    addvp = jnp.pad(addv.astype(jnp.float32), (0, DP - D)).reshape(1, DP)

    kwargs = {}
    if not interpret and pltpu is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"))
    scratch = [pltpu.VMEM((3, g0[0] + 2, tw, 128), dt),
               pltpu.VMEM((3, g1[0] + 2, tw, 128), dt)] \
        if pltpu is not None else [None, None]
    in_specs = [
        pl.BlockSpec((1, g0[0] + 2, g0[1], C),
                     lambda b, j, t: (b, 0, 0, 0)),
        pl.BlockSpec((1, g1[0] + 2, g1[1], C),
                     lambda b, j, t: (b, 0, 0, 0)),
        pl.BlockSpec((1, 1, slab2, g2[1], C),
                     lambda b, j, t: (b, t, 0, 0, 0)),
        pl.BlockSpec((C, 1152), lambda b, j, t: (0, j)),
        pl.BlockSpec((3, tw, g0[1]), lambda b, j, t: (0, 0, 0)),
        pl.BlockSpec((3, tw, g1[1]), lambda b, j, t: (0, 0, 0)),
        pl.BlockSpec((3, tw, g2[1]), lambda b, j, t: (0, 0, 0)),
        pl.BlockSpec((1, 128), lambda b, j, t: (0, j)),
        pl.BlockSpec((1, 128), lambda b, j, t: (0, j)),
    ]
    operands = [x0p, x1p, x2s, Wf, sws[0], sws[1], sws[2], invp, addvp]
    if head is not None:
        wh, bh = head
        n = wh.shape[-1]
        # n (<=128) padded to a full 128-lane tile so the epilogue dot is
        # MXU-native; only the final o_ref store masks back to n lanes
        whp = jnp.pad(wh.astype(dt), ((0, DP - D), (0, 128 - n))) \
            .reshape(nj, 128, 128)
        bhp = jnp.pad(bh.astype(jnp.float32), (0, 128 - n)).reshape(1, 128)
        in_specs += [pl.BlockSpec((1, 128, 128),
                                  lambda b, j, t: (j, 0, 0)),
                     pl.BlockSpec((1, 128), lambda b, j, t: (0, 0))]
        operands += [whp, bhp]
        # logits accumulate in a persistent f32 VMEM scratch across the
        # nj chunk steps (grid dim j); the output block — whose index
        # ignores j — is rewritten each step and the last (complete)
        # write wins. The f32 accumulation matches the dense head's
        # single f32 dot up to chunk-boundary rounding of act.
        scratch_h = scratch + ([pltpu.VMEM(
            (n_strips, sh_rows, tw, 128), jnp.float32)]
            if pltpu is not None else [None])
        out = pl.pallas_call(
            functools.partial(_tail_kernel_st, C=C, g0=g0, g1=g1, g2=g2,
                              sh_rows=sh_rows, tw=tw, fs=fs,
                              stencils=stencils, n_strips=n_strips,
                              head=True),
            out_shape=jax.ShapeDtypeStruct((B, th, tw, n), dt),
            grid=(B, nj, n_strips),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, th, tw, n),
                                   lambda b, j, t: (b, 0, 0, 0)),
            scratch_shapes=scratch_h,
            interpret=interpret,
            **kwargs,
        )(*operands)
        return out
    out = pl.pallas_call(
        functools.partial(_tail_kernel_st, C=C, g0=g0, g1=g1, g2=g2,
                          sh_rows=sh_rows, tw=tw, fs=fs,
                          stencils=stencils, n_strips=n_strips),
        # ragged last dim: blocks stay 128 lanes but the array is D wide
        # (Pallas masks the edge store) - a DP-wide array would need a
        # [..., :D] lane slice afterwards, a full relayout copy per task
        out_shape=jax.ShapeDtypeStruct((B, n_strips, sh_rows, tw, D), dt),
        grid=(B, nj, n_strips),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, sh_rows, tw, 128),
                               lambda b, j, t: (b, t, 0, 0, j)),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(*operands)
    return out.reshape(B, th, tw, D)


def _tail_xla(xs, kc, inv, addv, th, tw):
    """Dense reference composition (the model's eval-mode tail math)."""
    from mtt_tpu.models.layers import interpolate
    dt = xs[0].dtype
    acc = 0.0
    for x in xs:
        acc = acc + interpolate(x, (th, tw), "bilinear")
    xc = jax.lax.conv_general_dilated(
        acc.astype(dt), kc.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = xc.astype(jnp.float32) * inv[None, None, None, :] \
        + addv[None, None, None, :]
    return jnp.maximum(y, 0.0).astype(dt)


def _compat(xs, kc) -> bool:
    C = xs[0].shape[-1]
    return C == kc.shape[2] and all(x.shape[-1] == C for x in xs)


def _ok(xs, kc, th, tw) -> bool:
    """Dot-kernel viability: plan exists AND its VMEM footprint fits."""
    if not _compat(xs, kc):
        return False
    C = xs[0].shape[-1]
    plan = _tail_plan([x.shape[1:3] for x in xs], th, tw,
                      _n_strips_default())
    if plan is None:
        return False
    fs, (starts2, slab2, sh_rows) = plan
    g0, g1, g2 = [x.shape[1:3] for x in xs]
    # VMEM estimate (bytes, bf16 unless noted): resident x0/x1 + x2 slab
    # + Wf (dbuf) + bk scratches + f32 y/gm transients + out strip (dbuf)
    it = 2
    vmem = (g0[0] * g0[1] * C * it + g1[0] * g1[1] * C * it
            + 2 * slab2 * g2[1] * C * it + 2 * C * 1152 * it
            + 3 * (g0[0] + g1[0] + slab2) * tw * 128 * it
            + slab2 * g2[1] * 1152 * it + 256 * 1152 * 4
            + sh_rows * tw * 128 * 4 + 2 * sh_rows * tw * 128 * it)
    return vmem <= 21 * 2 ** 20


def _ok_st(xs, kc, th, tw, plan, head: bool = False) -> bool:
    """Stencil-kernel viability: sized on ITS actual shapes (height-
    padded x0/x1, +2-row scale-2 slabs, its own bk scratches) — the
    stencil plan chooses n_strips independently of MTT_TAIL_STRIPS, so
    the dot-kernel _ok() estimate neither covers nor gates it."""
    if not _compat(xs, kc):
        return False
    C = xs[0].shape[-1]
    n_strips, fs, _ = plan
    sh_rows = th // n_strips
    g0, g1, g2 = [x.shape[1:3] for x in xs]
    slab2 = sh_rows // fs[2] + 2
    it = 2
    vmem = ((g0[0] + 2) * g0[1] * C * it + (g1[0] + 2) * g1[1] * C * it
            + 2 * slab2 * g2[1] * C * it + 2 * C * 1152 * it
            + 3 * (g0[0] + 2 + g1[0] + 2 + slab2) * tw * 128 * it
            + slab2 * g2[1] * 1152 * it + 256 * 1152 * 4
            # y f32 + per-phase stencil accs + topf/botf concats
            + 3 * sh_rows * tw * 128 * 4 + 2 * sh_rows * tw * 128 * it)
    if head:
        # lane-padded f32 logits accumulator (n_strips, sh, tw, <=128)
        vmem += n_strips * sh_rows * tw * 128 * 4
        return vmem <= 30 * 2 ** 20
    return vmem <= 21 * 2 ** 20


def _hmix_mode() -> str:
    import os
    return os.environ.get("MTT_TAIL_HMIX", "stencil")


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_tail(xs, kc, inv, addv, th: int, tw: int, impl: str):
    # bf16-only on hardware: an f32 model doubles every block past the
    # scoped-VMEM budget (interpret mode on CPU tests takes any dtype)
    interp = impl == "interpret"
    if (impl == "pallas" or interp) \
            and (interp or (pltpu is not None
                            and xs[0].dtype == jnp.bfloat16)):
        # each Pallas variant is gated on ITS OWN plan + VMEM estimate:
        # a custom MTT_TAIL_STRIPS that invalidates the dot plan must
        # not also disable the otherwise-viable stencil path
        if _hmix_mode() == "stencil":
            plan = _stencil_plan([x.shape[1:3] for x in xs], th, tw)
            if plan is not None and _ok_st(xs, kc, th, tw, plan):
                return _tail_pallas_st(xs, kc, inv, addv, th, tw, plan,
                                       interpret=interp)
        if _ok(xs, kc, th, tw):
            return _tail_pallas(xs, kc, inv, addv, th, tw,
                                interpret=interp)
        if impl == "pallas":
            from mtt_tpu.kernels.fallback_log import note_fallback
            note_fallback(
                "invpt_tail",
                f"xs={[tuple(x.shape) for x in xs]} th={th} tw={tw}")
    elif impl == "pallas":
        from mtt_tpu.kernels.fallback_log import note_fallback
        note_fallback("invpt_tail", f"dtype={xs[0].dtype} (bf16-only)")
    return _tail_xla(xs, kc, inv, addv, th, tw)


def _tail_fwd(xs, kc, inv, addv, th, tw, impl):
    return _fused_tail(xs, kc, inv, addv, th, tw, impl), (xs, kc, inv, addv)


def _tail_bwd(th, tw, impl, res, g):
    xs, kc, inv, addv = res
    _, vjp = jax.vjp(lambda *a: _tail_xla(a[:3], a[3], a[4], a[5], th, tw),
                     *xs, kc, inv, addv)
    grads = vjp(g)
    return (tuple(grads[:3]), grads[3], grads[4], grads[5])


_fused_tail.defvjp(_tail_fwd, _tail_bwd)


def fused_ms_tail(xs: Sequence[jax.Array], kc, inv, addv, th: int, tw: int,
                  impl: Optional[str] = None):
    """relu(affine(conv3x3(sum_s upsample_{f_s}(xs[s])))) at (th, tw).

    xs: three NHWC feature maps at (th/f, tw/f) for integer f per scale
    (InvPT: f = 8, 4, 2); kc: (3, 3, C, D); inv/addv: (D,) f32 folded-BN
    affine. Exact vs the dense composition up to bf16 rounding (the
    factored algebra is exact; upf parity tests pin the upsample
    matrices). Returns (B, th, tw, D) in the input dtype.
    """
    if impl is None:
        import os
        impl = os.environ.get("MTT_TAIL_IMPL")
        if impl is None:
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    return _fused_tail(tuple(xs), kc, inv, addv, th, tw, impl)


def fused_ms_tail_head(xs: Sequence[jax.Array], kc, inv, addv, wh, bh,
                       th: int, tw: int, impl: Optional[str] = None):
    """Fused tail + per-task 1x1 head: logits(B, th, tw, n) =
    relu(affine(conv3x3(sum_s upsample(xs[s])))) @ wh + bh.

    Eval-only (no VJP; training uses the dense tail + head module).
    wh: (D, n) with n <= 128, bh: (n,). The per-task 576-channel feature
    map never reaches HBM — the kernel emits nj partial-logit chunks
    (~10x less traffic) that are summed here. Falls back to the dense
    composition + XLA matmul (identical math). Reference:
    invpt.py:541-543 + transformer_decoder.py:124-131.
    """
    if impl is None:
        import os
        impl = os.environ.get("MTT_TAIL_IMPL")
        if impl is None:
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    interp = impl == "interpret"
    n = wh.shape[-1]
    if (impl == "pallas" or interp) and n <= 128 \
            and (interp or (pltpu is not None
                            and xs[0].dtype == jnp.bfloat16)) \
            and _hmix_mode() == "stencil":
        plan = _stencil_plan([x.shape[1:3] for x in xs], th, tw)
        if plan is not None and _ok_st(xs, kc, th, tw, plan, head=True):
            return _tail_pallas_st(xs, kc, inv, addv, th, tw, plan,
                                   interpret=interp, head=(wh, bh))
        if impl == "pallas":
            from mtt_tpu.kernels.fallback_log import note_fallback
            note_fallback(
                "invpt_tail_head",
                f"xs={[tuple(x.shape) for x in xs]} th={th} tw={tw} n={n}")
    feats = _tail_xla(xs, kc, inv, addv, th, tw)
    dt = feats.dtype
    logits = jax.lax.dot_general(
        feats.reshape(-1, feats.shape[-1]), wh.astype(dt),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    logits = logits + bh.astype(jnp.float32)
    return logits.reshape(feats.shape[:3] + (n,)).astype(dt)
