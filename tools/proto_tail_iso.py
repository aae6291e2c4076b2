#!/usr/bin/env python
"""Ablation microbench for the in-VMEM InvPT tail kernel: where do the
~3.3 ms/task-call go? Variants drop the height mix ("nohmix"), both mixes
("gmonly"), or the Gm contraction ("nogm" — mixes on a constant gm) while
keeping grid/stores identical, isolating each stage's marginal cost.

Numbers are NOT parity-checked — measurement only.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtt_tpu.utils.cache import enable_compilation_cache
from mtt_tpu.kernels.invpt_tail import (_tail_plan, _shift_stack,
                                        _n_strips_default)


def _kernel(x0_ref, x1_ref, x2s_ref, wf_ref, sw0_ref, sw1_ref, sw2_ref,
            sht0_ref, sht1_ref, sht2s_ref, inv_ref, addv_ref, o_ref,
            bk0_ref, bk1_ref, *, C, g0, g1, g2, slab2, sh_rows, tw,
            variant):
    strip = pl.program_id(2)

    def _gm(x2d, rows):
        if variant == "nogm":
            return jnp.full((rows, 9 * 128), jnp.bfloat16(0.01))
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
        if variant == "gmonly":
            rep = jnp.concatenate([gm3[:, :, :128]] * (tw // gw), axis=1)
            return [rep for _ in range(3)]
        out = []
        for k in range(3):
            acc = jnp.zeros((gh, tw, 128), jnp.float32)
            for l in range(3):
                a_kl = gm3[:, :, (k * 3 + l) * 128:(k * 3 + l + 1) * 128]
                swb = jnp.broadcast_to(sw_ref[l][None], (gh, tw, gw))
                acc += jax.lax.dot_general(
                    swb, a_kl, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
            out.append(acc.astype(gm3.dtype))
        return out

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

    gm2 = _gm(x2s_ref[0, 0].reshape(slab2 * g2[1], C), slab2 * g2[1])
    bk2 = _wmix(gm2.reshape(slab2, g2[1], 9 * 128), sw2_ref, slab2, g2[1])

    if variant == "nohmix":
        y = (bk0_ref[0][:sh_rows].astype(jnp.float32)
             + bk1_ref[1][:sh_rows].astype(jnp.float32)
             + bk2[2][:min(slab2, sh_rows)].astype(jnp.float32).sum(
                 0, keepdims=True))
    else:
        y = jnp.zeros((sh_rows, tw, 128), jnp.float32)
        for k in range(3):
            y += jax.lax.dot_general(
                sht0_ref[0, k], bk0_ref[k],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y += jax.lax.dot_general(
                sht1_ref[0, k], bk1_ref[k],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y += jax.lax.dot_general(
                sht2s_ref[0, k], bk2[k],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    ivec = inv_ref[0]
    avec = addv_ref[0]
    o_ref[0, 0] = jnp.maximum(
        y * ivec[None, None, :] + avec[None, None, :], 0.0
    ).astype(o_ref.dtype)


def tail_variant(xs, kc, inv, addv, th, tw, variant, n_strips=8):
    x0, x1, x2 = xs
    B, C, dt = x0.shape[0], x0.shape[-1], x0.dtype
    plan = _tail_plan([x.shape[1:3] for x in xs], th, tw, n_strips)
    fs, (starts2, slab2, sh_rows) = plan
    g0, g1, g2 = [x.shape[1:3] for x in xs]
    D = kc.shape[-1]
    nj = -(-D // 128)
    DP = nj * 128
    kpad = jnp.pad(kc.astype(dt), ((0, 0), (0, 0), (0, 0), (0, DP - D)))
    Wf = kpad.transpose(2, 0, 1, 3).reshape(C, 3, 3, nj, 128) \
        .transpose(0, 3, 1, 2, 4).reshape(C, nj * 1152)
    sws, shts = [], []
    for (gh, gw), f in zip((g0, g1, g2), fs):
        Sw = _shift_stack(gw, f)
        Sh = _shift_stack(gh, f)
        sws.append(jnp.asarray(Sw.transpose(1, 2, 0), dt))
        shts.append(jnp.asarray(np.stack(
            [Sh[:, :, t * sh_rows:(t + 1) * sh_rows]
             for t in range(n_strips)], axis=0), dt).transpose(0, 2, 1, 3))
    x2s = jnp.stack([jax.lax.slice_in_dim(x2, s, s + slab2, axis=1)
                     for s in starts2], axis=1)
    Sh2 = _shift_stack(g2[0], fs[2])
    sht2s = jnp.asarray(np.stack(
        [Sh2[s:s + slab2, :, t * sh_rows:(t + 1) * sh_rows]
         for t, s in enumerate(starts2)], axis=0), dt).transpose(0, 2, 1, 3)
    invp = jnp.pad(inv.astype(jnp.float32), (0, DP - D)).reshape(1, DP)
    addvp = jnp.pad(addv.astype(jnp.float32), (0, DP - D)).reshape(1, DP)
    out = pl.pallas_call(
        functools.partial(_kernel, C=C, g0=g0, g1=g1, g2=g2, slab2=slab2,
                          sh_rows=sh_rows, tw=tw, variant=variant),
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
        scratch_shapes=[pltpu.VMEM((3, g0[0], tw, 128), dt),
                        pltpu.VMEM((3, g1[0], tw, 128), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
    )(x0, x1, x2s, Wf, sws[0], sws[1], sws[2], shts[0], shts[1], sht2s,
      invp, addvp)
    return out.reshape(B, th, tw, DP)[..., :D]


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B, C, D, th, tw = 8, 576, 576, 128, 128
    xs = [jnp.asarray(rng.normal(size=(B, g, g, C)) * 0.3, jnp.bfloat16)
          for g in (16, 32, 64)]
    kc = jnp.asarray(rng.normal(size=(3, 3, C, D)) * 0.02, jnp.float32)
    inv = jnp.asarray(1 + 0.1 * rng.normal(size=(D,)), jnp.float32)
    addv = jnp.asarray(0.1 * rng.normal(size=(D,)), jnp.float32)

    for variant in ("full", "nohmix", "gmonly", "nogm"):
        @jax.jit
        def f(xs):
            y = 0.
            for _ in range(3):
                o = tail_variant(xs, kc, inv, addv, th, tw, variant)
                y = y + jnp.sum(o.astype(jnp.float32))
            return y
        float(jax.device_get(f(xs)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                r = f(xs)
            float(jax.device_get(r))
            best = min(best, (time.perf_counter() - t0) / 15)
        print(f"{variant:8s} {best*1000:7.3f} ms/task-call")


if __name__ == "__main__":
    main()
