#!/usr/bin/env python
"""Round-3 attention decomposition with in-jit repetition (valid timing).

Probes where the cached-LN kernel's 0.96 ms/block go:
  full      — shipped cached kernel (LN + qkv + softmax attention).
  floor     — same structure, exp2/sum/div deleted (pb = logits cast):
              the matmul+memory floor of this kernel shape.
  qkv-only  — LN + qkv matmul per cell, attention deleted.
  attn-only — attention phase from a precomputed qkv tensor.
  xla-ref   — LN + qkv + xla softmax attention (no pallas).

Usage: python tools/proto_attn_r3b.py
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
f_qkv = 2 * B * N * C * 3 * C
f_attn = 4 * B * H * N * N * D


def kern(x_ref, g_ref, be_ref, w_ref, b_ref, o_ref, xn_ref, *,
         hpb, q_chunk, mode):
    @pl.when(pl.program_id(1) == 0)
    def _():
        xn_ref[...] = A._ln_rows(x_ref[0], g_ref[0], be_ref[0], EPS)
    qkv = jax.lax.dot_general(
        xn_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[0]).astype(x_ref.dtype)
    if mode == "qkvonly":
        for h in range(hpb):
            o_ref[0, :, h * D:(h + 1) * D] = qkv[:, h * 3 * D:h * 3 * D + D]
        return
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
            if mode == "floor":
                pb = logits.astype(v.dtype)
                s = jnp.float32(1.0)
                o = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                o_ref[0, q0:q0 + q.shape[0], h * D:(h + 1) * D] = \
                    o.astype(o_ref.dtype)
            elif mode == "noexp":
                # keep sum+div, drop only exp2/clip: isolates transcendental
                pb = logits.astype(v.dtype)
                s = jnp.sum(logits, axis=-1, keepdims=True)
                o = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                o_ref[0, q0:q0 + q.shape[0], h * D:(h + 1) * D] = \
                    (o / s).astype(o_ref.dtype)
            else:
                p = A._fast_exp2_probs(logits, False, k.shape[0])
                s = jnp.sum(p, axis=-1, keepdims=True)
                o = jax.lax.dot_general(p.astype(v.dtype), v,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                o_ref[0, q0:q0 + q.shape[0], h * D:(h + 1) * D] = \
                    (o / s).astype(o_ref.dtype)


def variant(xin, hpb, q_chunk, mode):
    return pl.pallas_call(
        functools.partial(kern, hpb=hpb, q_chunk=q_chunk, mode=mode),
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
    )(xin, ga.reshape(1, C), be.reshape(1, C), w, b.reshape(1, -1))


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


def attn_only_chained(xin, hpb=2, q_chunk=1029):
    # reconstruct a qkv-shaped tensor from the block output by tiling
    # (cheap concat, keeps the data dependence real)
    qkv = jnp.concatenate([xin, xin, xin], axis=-1)
    out = pl.pallas_call(
        functools.partial(attn_kern, hpb=hpb, q_chunk=q_chunk),
        out_shape=jax.ShapeDtypeStruct((B, N, C), xin.dtype),
        grid=(B, H // hpb),
        in_specs=[pl.BlockSpec((1, N, hpb * 3 * D), lambda bi, h: (bi, 0, h))],
        out_specs=pl.BlockSpec((1, N, hpb * D), lambda bi, h: (bi, 0, h)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qkv)
    return out


def xla_ref(xin):
    xn = A._ln_f32_full(xin, ga, be, EPS).astype(xin.dtype)
    qkv = xn @ w + b.astype(xin.dtype)
    q, k, v = [qkv.reshape(B, N, H, 3, D)[:, :, :, i] for i in range(3)]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, N, C)


def chain(f):
    def g(xin):
        for _ in range(REP):
            xin = f(xin)
        return xin
    return jax.jit(g)


def main():
    cases = [
        ("full qc1029", f_qkv + f_attn,
         chain(lambda h: variant(h, 2, 1029, "full"))),
        ("floor qc1029", f_qkv + f_attn,
         chain(lambda h: variant(h, 2, 1029, "floor"))),
        ("noexp qc1029", f_qkv + f_attn,
         chain(lambda h: variant(h, 2, 1029, "noexp"))),
        ("qkv-only", f_qkv, chain(lambda h: variant(h, 2, 1029, "qkvonly"))),
        ("attn-only qc1029", f_attn, chain(attn_only_chained)),
        ("xla-ref", f_qkv + f_attn, chain(xla_ref)),
    ]
    ok, results = [], {}
    for name, fl, fn in cases:
        try:
            jax.block_until_ready(fn(x0))
            results[name] = {"ms": 1e9, "fl": fl}
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
        print(json.dumps({"variant": name, "ms": d["ms"],
                          "tflops": round(d["fl"] / d["ms"] / 1e9, 1)}))


if __name__ == "__main__":
    main()
