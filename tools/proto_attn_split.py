#!/usr/bin/env python
"""Split the fused attention kernel into phases to locate the 3x gap
between its ~0.6 ms matmul floor and the measured ~1.6-2.0 ms.

Phases timed separately (Pallas) + raw XLA references of the same shapes:
  qkv-only   — LN + qkv projection per (batch, head-pair) cell.
  attn-only  — attention from a precomputed head-major qkv tensor.
  xla-qkv    — jnp: LN + (B,N,C)@(C,3C) in one call.
  xla-attn   — jnp einsum attention at (BH,N,D) shapes.

Usage: python tools/proto_attn_split.py
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
f_qkv = 2 * B * N * C * 3 * C
f_attn = 4 * B * H * N * N * D


def qkv_kern(x_ref, g_ref, be_ref, w_ref, b_ref, o_ref, xn_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        xn_ref[...] = A._ln_rows(x_ref[0], g_ref[0], be_ref[0], EPS)
    qkv = jax.lax.dot_general(
        xn_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (qkv + b_ref[0]).astype(o_ref.dtype)


def qkv_only(hpb=2):
    return pl.pallas_call(
        qkv_kern,
        out_shape=jax.ShapeDtypeStruct((B, N, 3 * C), x.dtype),
        grid=(B, H // hpb),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda bi, h: (bi, 0, 0)),
            pl.BlockSpec((1, C), lambda bi, h: (0, 0)),
            pl.BlockSpec((1, C), lambda bi, h: (0, 0)),
            pl.BlockSpec((C, hpb * 3 * D), lambda bi, h: (0, h)),
            pl.BlockSpec((1, hpb * 3 * D), lambda bi, h: (0, h)),
        ],
        out_specs=pl.BlockSpec((1, N, hpb * 3 * D), lambda bi, h: (bi, 0, h)),
        scratch_shapes=[pltpu.VMEM((N, C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, ga.reshape(1, C), be.reshape(1, C), w, b.reshape(1, -1))


def attn_kern(qkv_ref, o_ref, *, hpb, q_chunk):
    qkv = qkv_ref[0]
    s2 = jnp.asarray(scale * A._LOG2E, qkv.dtype)
    for h in range(hpb):
        base = h * 3 * D
        k = qkv[:, base + D:base + 2 * D]
        v = qkv[:, base + 2 * D:base + 3 * D]
        for q0 in range(0, N, q_chunk):
            q = qkv[q0:q0 + q_chunk, base:base + D] * s2
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = A._fast_exp2_probs(logits, False, N)
            s = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, q0:q0 + q.shape[0], h * D:(h + 1) * D] = \
                (o / s).astype(o_ref.dtype)


def attn_only(qkv, hpb=2, q_chunk=384):
    return pl.pallas_call(
        functools.partial(attn_kern, hpb=hpb, q_chunk=q_chunk),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        grid=(B, H // hpb),
        in_specs=[pl.BlockSpec((1, N, hpb * 3 * D), lambda bi, h: (bi, 0, h))],
        out_specs=pl.BlockSpec((1, N, hpb * D), lambda bi, h: (bi, 0, h)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qkv)


def xla_qkv():
    xn = A._ln_f32_full(x, ga, be, EPS).astype(x.dtype)
    return xn @ w + b.astype(x.dtype)


def xla_attn(qkv):
    q, k, v = [qkv.reshape(B, N, H, 3, D)[:, :, :, i] for i in range(3)]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, N, C)


def raw_logits(q4, k4):
    return jax.lax.dot_general(
        q4, k4, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)


def raw_pv(p4, v4):
    return jax.lax.dot_general(
        p4, v4, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def main():
    qkv_host = np.asarray(jax.block_until_ready(jax.jit(xla_qkv)()))
    qkv_in = jnp.asarray(qkv_host)
    q4 = jnp.asarray(qkv_host.reshape(B, N, H, 3, D)[:, :, :, 0]
                     .transpose(0, 2, 1, 3).copy())   # (B,H,N,D)
    k4 = jnp.asarray(qkv_host.reshape(B, N, H, 3, D)[:, :, :, 1]
                     .transpose(0, 2, 1, 3).copy())
    p4 = jnp.asarray(rng.random((B, H, N, N)), jnp.bfloat16)
    v4 = jnp.asarray(qkv_host.reshape(B, N, H, 3, D)[:, :, :, 2]
                     .transpose(0, 2, 1, 3).copy())

    cases = [
        ("full shipped", f_qkv + f_attn,
         jax.jit(lambda: A._attn_ln_qkv_pallas(x, ga, be, w, b, H, scale,
                                               EPS))),
        ("qkv-only pallas", f_qkv, jax.jit(qkv_only)),
        ("attn-only pallas qc384", f_attn,
         jax.jit(lambda: attn_only(qkv_in, 2, 384))),
        ("attn-only pallas qc1029", f_attn,
         jax.jit(lambda: attn_only(qkv_in, 2, 1029))),
        ("xla qkv", f_qkv, jax.jit(xla_qkv)),
        ("xla attn", f_attn, jax.jit(lambda: xla_attn(qkv_in))),
        ("raw logits matmul", f_attn // 2,
         jax.jit(lambda: raw_logits(q4, k4))),
        ("raw PV matmul", f_attn // 2, jax.jit(lambda: raw_pv(p4, v4))),
    ]
    ok = []
    results = {}
    for name, fl, fn in cases:
        try:
            jax.block_until_ready(fn())
            results[name] = {"ms": 1e9, "fl": fl}
            ok.append((name, fn))
        except Exception as e:
            print(f"{name} FAIL {str(e)[:200]}")
    steps = 20
    for _ in range(3):
        for name, fn in ok:
            t0 = time.perf_counter()
            for _ in range(steps):
                r = fn()
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / steps
            results[name]["ms"] = min(results[name]["ms"],
                                      round(dt * 1e3, 3))
    for name, _ in ok:
        d = results[name]
        print(json.dumps({"variant": name, "ms": d["ms"],
                          "tflops": round(d["fl"] / d["ms"] / 1e9, 1)}))


if __name__ == "__main__":
    main()
