#!/usr/bin/env python
"""Round-3 attention kernel sweep with in-jit repetition.

The remote tunnel has a ~2 ms per-dispatch floor, so every variant is
chained x = f(x) REP times inside ONE jit (the block output has the same
(B, N, C) shape as its input; LN at the head keeps magnitudes sane).
Reported ms is per-block-call.

Variants over the cached-LN fused kernel structure:
  shipped   — hpb2 qc384, VPU row-sum (what kernels/attention.py runs).
  vext      — ones column appended to v: row-sum rides the PV matmul's
              padded lanes (64->65 of 128), deleting the VPU reduce.
  noqscale  — scale*log2e folded into w's q columns outside the kernel.
  split     — LN as its own Pallas kernel + attention kernel with a fully
              parallel grid (no scratch => Mosaic may pipeline head-pairs).
Each also swept over q_chunk.

Usage: python tools/proto_attn_r3.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtt_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from mtt_tpu.kernels import attention as A
from mtt_tpu.kernels.layernorm import fused_layernorm

REP = 12
B, N, H, D = 8, 1029, 16, 64
C = H * D
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(B, N, C)) * 0.3, jnp.bfloat16)
ga = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)), jnp.float32)
be = jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32)
w = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.02, jnp.bfloat16)
b = jnp.asarray(rng.normal(size=(3 * C,)) * 0.02, jnp.bfloat16)
scale = D ** -0.5
EPS = 1e-6
flops = 2 * B * N * C * 3 * C + 4 * B * H * N * N * D

_s2 = scale * A._LOG2E
w_sc = np.asarray(w, np.float32).reshape(C, H, 3, D).copy()
w_sc[:, :, 0] *= _s2
w_sc = jnp.asarray(w_sc.reshape(C, 3 * C), jnp.bfloat16)
b_sc = np.asarray(b, np.float32).reshape(H, 3, D).copy()
b_sc[:, 0] *= _s2
b_sc = jnp.asarray(b_sc.reshape(3 * C), jnp.bfloat16)


def kern_cached(x_ref, g_ref, be_ref, w_ref, b_ref, o_ref, xn_ref, *,
                hpb, q_chunk, vext, noqscale):
    @pl.when(pl.program_id(1) == 0)
    def _():
        xn_ref[...] = A._ln_rows(x_ref[0], g_ref[0], be_ref[0], EPS)
    _attn_body(xn_ref[...], w_ref[...], b_ref[0], o_ref, hpb, q_chunk,
               vext, noqscale)


def kern_noln(xn_in_ref, w_ref, b_ref, o_ref, *, hpb, q_chunk, vext,
              noqscale):
    _attn_body(xn_in_ref[0], w_ref[...], b_ref[0], o_ref, hpb, q_chunk,
               vext, noqscale)


def _attn_body(xn, wblk, bblk, o_ref, hpb, q_chunk, vext, noqscale):
    qkv = jax.lax.dot_general(
        xn, wblk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bblk).astype(o_ref.dtype)
    s2 = jnp.asarray(_s2, qkv.dtype)
    for h in range(hpb):
        base = h * 3 * D
        k = qkv[:, base + D:base + 2 * D]
        v = qkv[:, base + 2 * D:base + 3 * D]
        if vext:
            ones = jnp.ones((v.shape[0], 1), v.dtype)
            vx = jnp.concatenate([v, ones], axis=1)
        for q0 in range(0, N, q_chunk):
            q = qkv[q0:q0 + q_chunk, base:base + D]
            if not noqscale:
                q = q * s2
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = A._fast_exp2_probs(logits, False, k.shape[0])
            pb = p.astype(v.dtype)
            if vext:
                ox = jax.lax.dot_general(pb, vx, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                o = ox[:, :D]
                s = ox[:, D:D + 1]
            else:
                s = jnp.sum(p, axis=-1, keepdims=True)
                o = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            o_ref[0, q0:q0 + q.shape[0], h * D:(h + 1) * D] = \
                (o / s).astype(o_ref.dtype)


def cached_variant(xin, hpb, q_chunk, vext, noqscale):
    ww, bb = (w_sc, b_sc) if noqscale else (w, b)
    return pl.pallas_call(
        functools.partial(kern_cached, hpb=hpb, q_chunk=q_chunk, vext=vext,
                          noqscale=noqscale),
        out_shape=jax.ShapeDtypeStruct((B, N, C), xin.dtype),
        grid=(B, H // hpb),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda bi, h: (bi, 0, 0)),
            pl.BlockSpec((1, C), lambda bi, h: (0, 0)),
            pl.BlockSpec((1, C), lambda bi, h: (0, 0)),
            pl.BlockSpec((C, hpb * 3 * D), lambda bi, h: (0, h)),
            pl.BlockSpec((1, hpb * 3 * D), lambda bi, h: (0, h)),
        ],
        out_specs=pl.BlockSpec((1, N, hpb * D), lambda bi, h: (bi, 0, h)),
        scratch_shapes=[pltpu.VMEM((N, C), xin.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xin, ga.reshape(1, C), be.reshape(1, C), ww, bb.reshape(1, -1))


def split_variant(xin, hpb, q_chunk, vext, noqscale):
    ww, bb = (w_sc, b_sc) if noqscale else (w, b)
    xn = fused_layernorm(xin, ga, be, eps=EPS, impl="pallas")
    return pl.pallas_call(
        functools.partial(kern_noln, hpb=hpb, q_chunk=q_chunk, vext=vext,
                          noqscale=noqscale),
        out_shape=jax.ShapeDtypeStruct((B, N, C), xin.dtype),
        grid=(B, H // hpb),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda bi, h: (bi, 0, 0)),
            pl.BlockSpec((C, hpb * 3 * D), lambda bi, h: (0, h)),
            pl.BlockSpec((1, hpb * 3 * D), lambda bi, h: (0, h)),
        ],
        out_specs=pl.BlockSpec((1, N, hpb * D), lambda bi, h: (bi, 0, h)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(xn, ww, bb.reshape(1, -1))


def chain(f):
    def g(xin):
        for _ in range(REP):
            xin = f(xin)
        return xin
    return jax.jit(g)


def main():
    cases = [
        ("shipped cached", chain(
            lambda h: A._attn_ln_qkv_pallas(h, ga, be, w, b, H, scale, EPS))),
    ]
    for name, hpb, qc, vext, noq, fn in [
        ("cached hpb2 qc384 vpu", 2, 384, False, False, cached_variant),
        ("cached hpb2 qc384 vext", 2, 384, True, False, cached_variant),
        ("cached hpb2 qc1029 vext", 2, 1029, True, False, cached_variant),
        ("cached hpb2 qc1029 vext noq", 2, 1029, True, True, cached_variant),
        ("cached hpb2 qc512 vext noq", 2, 512, True, True, cached_variant),
        ("cached hpb1 qc1029 vext noq", 1, 1029, True, True, cached_variant),
        ("split hpb2 qc1029 vext noq", 2, 1029, True, True, split_variant),
        ("split hpb2 qc512 vext noq", 2, 512, True, True, split_variant),
        ("split hpb4 qc256 vext noq", 4, 256, True, True, split_variant),
        ("split hpb1 qc1029 vext noq", 1, 1029, True, True, split_variant),
    ]:
        cases.append((name, chain(
            functools.partial(fn, hpb=hpb, q_chunk=qc, vext=vext,
                              noqscale=noq))))

    ok, results, ref = [], {}, None
    for name, fn in cases:
        try:
            r = np.asarray(jax.block_until_ready(fn(x0)), np.float32)
            if ref is None:
                ref = r
            results[name] = {"maxdiff": round(float(np.max(np.abs(r - ref))),
                                              5), "ms": 1e9}
            ok.append((name, fn))
        except Exception as e:
            print(f"{name} FAIL {str(e)[:160]}")
    steps = 10
    for _ in range(3):
        for name, fn in ok:
            t0 = time.perf_counter()
            for _ in range(steps):
                r = fn(x0)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / steps / REP
            results[name]["ms"] = min(results[name]["ms"], round(dt * 1e3, 4))
    for name, _ in ok:
        d = results[name]
        d["tflops"] = round(flops / d["ms"] / 1e9, 1)
        print(json.dumps({"variant": name, **d}))


if __name__ == "__main__":
    main()
