#!/usr/bin/env python
"""Ablate the shipped fused up4 head kernel (kernels/head_up4.py,
stencil variant) to locate its 0.86 ms/head: time the production kernel
with individual phases disabled (gm / wmix / hmix+border / gelu / 1x1).

Each variant is the REAL kernel body with one phase stubbed; numbers are
deltas, not standalone costs (phases overlap on MXU/VPU). In-jit REP
chaining per the tunnel timing rules (docs/PERF.md).

Usage: python tools/proto_head_abl.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtt_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from mtt_tpu.kernels.mlp import _gelu_erf_poly, _gelu_erf_poly_fast
from mtt_tpu.kernels.head_up4 import (_gm_hc, _hmix_stencil_np)
from mtt_tpu.models.layers import _up4_shift_stack_np

REP = 10
B, G, C, N = 8, 32, 350, 21
rng = np.random.default_rng(0)


def _kernel(x_ref, wf_ref, swt_ref, inv_ref, addv_ref, kp_ref, o_ref,
            gm_ref, bk_ref, *, n, C, gh, gw, hc, c_int, cb0, cb1,
            do_gm, do_wmix, do_hmix, do_gelu, do_one):
    j = pl.program_id(1)
    W4 = 4 * gw
    rc = hc * gw

    if do_gm:
        def _gm_chunk(i, carry):
            xr = x_ref[0, pl.ds(i * hc, hc)].reshape(rc, C)
            ch = jax.lax.dot_general(xr, wf_ref[...],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            gm_ref[pl.ds(i * rc, rc)] = ch.astype(jnp.bfloat16)
            return carry
        jax.lax.fori_loop(0, gh // hc, _gm_chunk, 0)
    gm = gm_ref[...].reshape(gh, gw, 9 * 128)
    if do_wmix == 2:
        # K=96 fold: one batched dot per k with the 3 l-taps concatenated
        # on the contraction dim (25% -> 75% MXU pass utilisation)
        sw3 = jnp.concatenate([swt_ref[l] for l in range(3)], axis=1)
        swb3 = jnp.broadcast_to(sw3[None], (gh, W4, 3 * gw))
        for k in range(3):
            a_k = jnp.concatenate(
                [gm[:, :, (k * 3 + l) * 128:(k * 3 + l + 1) * 128]
                 for l in range(3)], axis=1)
            acc = jax.lax.dot_general(
                swb3, a_k, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            bk_ref[k] = acc.astype(jnp.bfloat16)
    elif do_wmix:
        swb = [jnp.broadcast_to(swt_ref[l][None], (gh, W4, gw))
               for l in range(3)]
        for k in range(3):
            acc = jnp.zeros((gh, W4, 128), jnp.float32)
            for l in range(3):
                a_kl = gm[:, :, (k * 3 + l) * 128:(k * 3 + l + 1) * 128]
                acc += jax.lax.dot_general(
                    swb[l], a_kl, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
            bk_ref[k] = acc.astype(jnp.bfloat16)
    ivec = inv_ref[0]
    avec = addv_ref[0]
    for p in range(4):
        if do_hmix == 2:
            # outer-dim rolls instead of slice+zero-concat: wrapped rows
            # land only in rows 0/gh-1, which the exact border rebuild
            # overwrites below
            y = jnp.zeros((gh, W4, 128), jnp.float32)
            for k in range(3):
                bk_k = bk_ref[k].astype(jnp.float32)
                for di, d in enumerate((-1, 0, 1)):
                    c = float(c_int[p, k, di])
                    if abs(c) < 1e-12:
                        continue
                    if d == 0:
                        y = y + c * bk_k
                    else:
                        y = y + c * pltpu.roll(bk_k, (-d) % gh, 0)
        elif do_hmix:
            y = jnp.zeros((gh, W4, 128), jnp.float32)
            for k in range(3):
                bk_k = bk_ref[k].astype(jnp.float32)
                for di, d in enumerate((-1, 0, 1)):
                    c = float(c_int[p, k, di])
                    if abs(c) < 1e-12:
                        continue
                    z = jnp.zeros((1, W4, 128), jnp.float32)
                    if d == 0:
                        y = y + c * bk_k
                    elif d == 1:
                        y = y + c * jnp.concatenate([bk_k[1:], z], axis=0)
                    else:
                        y = y + c * jnp.concatenate([z, bk_k[:gh - 1]],
                                                    axis=0)
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
                        rowl = rowl + cl * \
                            bk_ref[k, gh - 3 + hi:gh - 2 + hi].astype(
                                jnp.float32)
            y = jnp.concatenate([row0, y[1:gh - 1], rowl], axis=0)
        else:
            y = bk_ref[0].astype(jnp.float32)
        if do_gelu == 2:
            t = _gelu_erf_poly_fast(y * ivec[None, None, :]
                                    + avec[None, None, :])
        elif do_gelu:
            t = _gelu_erf_poly(y * ivec[None, None, :]
                               + avec[None, None, :])
        else:
            t = y * ivec[None, None, :] + avec[None, None, :]
        tv = t.astype(jnp.bfloat16).reshape(gh * W4, 128)
        if do_one:
            part = jax.lax.dot_general(tv, kp_ref[...],
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        else:
            part = tv[:, :n].astype(jnp.float32)

        @pl.when(j == 0)
        def _():
            o_ref[0, p] = part.reshape(gh, W4, n).astype(o_ref.dtype)

        @pl.when(j != 0)
        def _():
            o_ref[0, p] = (o_ref[0, p].astype(jnp.float32)
                           + part.reshape(gh, W4, n)).astype(o_ref.dtype)


def build(x, kc, inv, addv, kp, **flags):
    Bx, Gh, Gw, C = x.shape
    n = kp.shape[-1]
    W4 = 4 * Gw
    hc = _gm_hc(Gh, Gw)
    dt = x.dtype
    DP = -(-C // 128) * 128
    nj = DP // 128
    kpad = jnp.pad(kc.astype(dt), ((0, 0), (0, 0), (0, 0), (0, DP - C)))
    Wf = kpad.transpose(2, 0, 1, 3).reshape(C, 3, 3, nj, 128) \
        .transpose(0, 3, 1, 2, 4).reshape(C, nj * 1152)
    Sw = _up4_shift_stack_np(Gw)
    swt = jnp.asarray(Sw.transpose(1, 2, 0), dt)
    invp = jnp.pad(inv.astype(jnp.float32), (0, DP - C)).reshape(1, DP)
    addvp = jnp.pad(addv.astype(jnp.float32), (0, DP - C)).reshape(1, DP)
    kpp = jnp.pad(kp.astype(dt), ((0, DP - C), (0, 0)))
    c_int, cb0, cb1, ok = _hmix_stencil_np(Gh)
    assert ok

    def run(xx):
        return pl.pallas_call(
            functools.partial(_kernel, n=n, C=C, gh=Gh, gw=Gw, hc=hc,
                              c_int=c_int, cb0=cb0, cb1=cb1, **flags),
            out_shape=jax.ShapeDtypeStruct((Bx, 4, Gh, W4, n),
                                           jnp.bfloat16),
            grid=(Bx, nj),
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
            scratch_shapes=[pltpu.VMEM((Gh * Gw, 1152), jnp.bfloat16),
                            pltpu.VMEM((3, Gh, W4, 128), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(xx, Wf, swt, invp, addvp, kpp)
    return run


def main():
    x = jnp.asarray(rng.normal(size=(B, G, G, C)) * 0.2, jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.02, jnp.float32)
    inv = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)), jnp.float32)
    addv = jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(C, N)) * 0.05, jnp.float32)

    variants = {
        "full": dict(do_gm=1, do_wmix=1, do_hmix=1, do_gelu=1, do_one=1),
        "roll_hmix": dict(do_gm=1, do_wmix=1, do_hmix=2, do_gelu=2,
                          do_one=1),
        "wmix96": dict(do_gm=1, do_wmix=2, do_hmix=1, do_gelu=2,
                       do_one=1),
        "roll96": dict(do_gm=1, do_wmix=2, do_hmix=2, do_gelu=2,
                       do_one=1),
        "fast_gelu": dict(do_gm=1, do_wmix=1, do_hmix=1, do_gelu=2,
                          do_one=1),
        "no_gelu": dict(do_gm=1, do_wmix=1, do_hmix=1, do_gelu=0,
                        do_one=1),
        "no_hmix": dict(do_gm=1, do_wmix=1, do_hmix=0, do_gelu=1,
                        do_one=1),
        "no_wmix": dict(do_gm=1, do_wmix=0, do_hmix=1, do_gelu=1,
                        do_one=1),
        "no_gm": dict(do_gm=0, do_wmix=1, do_hmix=1, do_gelu=1, do_one=1),
        "no_1x1": dict(do_gm=1, do_wmix=1, do_hmix=1, do_gelu=1,
                       do_one=0),
        "gm_only": dict(do_gm=1, do_wmix=0, do_hmix=0, do_gelu=0,
                        do_one=0),
    }
    for name, flags in variants.items():
        run = build(x, kc, inv, addv, kp, **flags)

        @jax.jit
        def rep(xx):
            s = jnp.float32(0)
            for i in range(REP):
                o = run(xx + jnp.bfloat16(i) * jnp.bfloat16(1e-6))
                s = s + jnp.sum(o.astype(jnp.float32))
            return s
        float(jax.device_get(rep(x)))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(jax.device_get(rep(x)))
            dt_ = (time.perf_counter() - t0) / REP
            best = dt_ if best is None else min(best, dt_)
        print(f"{name:10s} {best * 1e3:7.3f} ms/head-call")


if __name__ == "__main__":
    main()
