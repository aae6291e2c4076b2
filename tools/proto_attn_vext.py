#!/usr/bin/env python
"""Prototype: fold the softmax row-sum into the PV matmul's padded lanes.

The PV matmul p(qc,N) @ v(N,64) pads v's 64 columns to the MXU's 128
lanes — half the output width is already computed and thrown away.
Appending a ones column to v makes the same matmul produce the row sum
(s = o_ext[:, 64]) at zero extra MXU cost, deleting the cross-lane VPU
row-sum reduction over the (qc, N) probability matrix.

Usage: python tools/proto_attn_vext.py
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

B, N, H, D = 8, 1029, 16, 64
C = H * D
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.3, jnp.bfloat16)
ga = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)), jnp.float32)
be = jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32)
w = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.02, jnp.bfloat16)
b = jnp.asarray(rng.normal(size=(3 * C,)) * 0.02, jnp.bfloat16)
scale = D ** -0.5
EPS = 1e-6
flops = 2 * B * N * C * 3 * C + 4 * B * H * N * N * D


def kern(x_ref, g_ref, be_ref, w_ref, b_ref, o_ref, xn_ref, *,
         hpb, q_chunk, mode):
    @pl.when(pl.program_id(1) == 0)
    def _():
        xn_ref[...] = A._ln_rows(x_ref[0], g_ref[0], be_ref[0], EPS)

    qkv = jax.lax.dot_general(
        xn_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[0]).astype(x_ref.dtype)
    s2 = jnp.asarray(scale * A._LOG2E, qkv.dtype)
    for h in range(hpb):
        base = h * 3 * D
        k = qkv[:, base + D:base + 2 * D]
        v = qkv[:, base + 2 * D:base + 3 * D]
        if mode in ("vext", "vext_bf16"):
            ones = jnp.ones((v.shape[0], 1), v.dtype)
            vx = jnp.concatenate([v, ones], axis=1)   # (N, 65)
        for q0 in range(0, N, q_chunk):
            q = qkv[q0:q0 + q_chunk, base:base + D] * s2
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = A._fast_exp2_probs(logits, False, k.shape[0])
            if mode == "vext":
                pb = p.astype(v.dtype)
                ox = jax.lax.dot_general(pb, vx, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                o = ox[:, :D]
                s = ox[:, D:D + 1]
            elif mode == "vext_bf16":
                # exp2 directly in bf16: one pass, no separate cast
                pb = A._fast_exp2_probs(
                    logits.astype(jnp.bfloat16), False, k.shape[0])
                ox = jax.lax.dot_general(pb, vx, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                o = ox[:, :D]
                s = ox[:, D:D + 1]
            else:
                s = jnp.sum(p, axis=-1, keepdims=True)
                o = jax.lax.dot_general(p.astype(v.dtype), v,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            o_ref[0, q0:q0 + q.shape[0], h * D:(h + 1) * D] = \
                (o / s).astype(o_ref.dtype)


def variant(hpb, q_chunk, mode):
    return pl.pallas_call(
        functools.partial(kern, hpb=hpb, q_chunk=q_chunk, mode=mode),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        grid=(B, H // hpb),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda bi, h: (bi, 0, 0)),
            pl.BlockSpec((1, C), lambda bi, h: (0, 0)),
            pl.BlockSpec((1, C), lambda bi, h: (0, 0)),
            pl.BlockSpec((C, hpb * 3 * D), lambda bi, h: (0, h)),
            pl.BlockSpec((1, hpb * 3 * D), lambda bi, h: (0, h)),
        ],
        out_specs=pl.BlockSpec((1, N, hpb * D), lambda bi, h: (bi, 0, h)),
        scratch_shapes=[pltpu.VMEM((N, C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, ga.reshape(1, C), be.reshape(1, C), w, b.reshape(1, -1))


def timeit(name, fn, ref=None):
    t0 = time.perf_counter()
    r = jax.block_until_ready(fn())
    comp = time.perf_counter() - t0
    steps = 30
    t0 = time.perf_counter()
    for _ in range(steps):
        r = fn()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / steps
    err = (float(jnp.max(jnp.abs(r.astype(jnp.float32) - ref)))
           if ref is not None else 0.0)
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                      "tflops": round(flops / dt / 1e12, 1),
                      "maxdiff": round(err, 5), "compile_s": round(comp, 1)}))
    return np.asarray(r, np.float32)


def main():
    ref = timeit("shipped cached (hpb2 qc384 vpu-sum)", jax.jit(
        lambda: A._attn_ln_qkv_pallas(x, ga, be, w, b, H, scale, EPS)))
    for hpb, qc, mode in [(2, 384, "vext"), (2, 512, "vext"),
                          (2, 1029, "vext"), (2, 256, "vext"),
                          (2, 1029, "vext_bf16"), (2, 1029, "vpu"),
                          (2, 384, "vpu")]:
        try:
            timeit(f"hpb{hpb} qc{qc} {mode}",
                   jax.jit(lambda a=hpb, b_=qc, c=mode: variant(a, b_, c)),
                   ref)
        except Exception as e:
            print(f"hpb{hpb} qc{qc} {mode} FAIL {str(e)[:150]}")


if __name__ == "__main__":
    main()
