#!/usr/bin/env python
"""Time fused_attention_ln_qkv variants (heads-per-block, q-chunk) at the
ViT-L bench shape to pick kernel parameters on real hardware."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

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

flops = 2 * B * N * C * 3 * C + 4 * B * H * N * N * D


def timeit(name, fn):
    t0 = time.perf_counter()
    r = jax.block_until_ready(fn())
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    steps = 30
    for _ in range(steps):
        r = fn()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                      "tflops": round(flops / dt / 1e12, 1),
                      "compile_s": round(comp, 1)}))
    return np.asarray(r[0] if isinstance(r, tuple) else r, np.float32)


ref = timeit("xla", jax.jit(lambda: A._attn_ln_qkv_xla(
    x, ga, be, w, b, H, scale, 1e-6, False, sub_impl="xla")))

for hpb in (2, 4, 8):
    try:
        out = timeit(f"pallas hpb={hpb}", jax.jit(
            lambda hpb=hpb: A._attn_ln_qkv_pallas(x, ga, be, w, b, H, scale,
                                                  1e-6, hpb=hpb)))
        err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"  rel err vs xla: {err:.4f}")
    except Exception as e:
        print(f"  hpb={hpb} FAILED: {str(e)[:200]}")


# fast-softmax variant: exp2 with log2(e) folded into the q scale, no
# running-max subtraction (LN-bounded logits stay far from f32 overflow)
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp


def _kern_fast(x_ref, g_ref, be_ref, w_ref, b_ref, o_ref, *, scale, D, hpb,
               eps, q_chunk):
    xn = A._ln_rows(x_ref[0], g_ref[0], be_ref[0], eps)
    qkv = jax.lax.dot_general(xn, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[0]).astype(x_ref.dtype)
    N = qkv.shape[0]
    s2 = scale * 1.4426950408889634
    for h in range(hpb):
        base = h * 3 * D
        k = qkv[:, base + D:base + 2 * D]
        v = qkv[:, base + 2 * D:base + 3 * D]
        for q0 in range(0, N, q_chunk):
            q = qkv[q0:q0 + q_chunk, base:base + D] * jnp.asarray(s2, qkv.dtype)
            logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            p = jnp.exp2(logits)
            s = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, q0:q0 + q.shape[0], h * D:(h + 1) * D] = \
                (o / s).astype(o_ref.dtype)


def fast_pallas(x, gamma, beta, w, b, heads, scale, eps, hpb=2):
    B, N, C = x.shape
    D = w.shape[1] // heads // 3
    return pl.pallas_call(
        functools.partial(_kern_fast, scale=scale, D=D, hpb=hpb, eps=eps,
                          q_chunk=512),
        out_shape=jax.ShapeDtypeStruct((B, N, heads * D), x.dtype),
        grid=(B, heads // hpb),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda bi, h: (bi, 0, 0)),
            pl.BlockSpec((1, C), lambda bi, h: (0, 0)),
            pl.BlockSpec((1, C), lambda bi, h: (0, 0)),
            pl.BlockSpec((C, hpb * 3 * D), lambda bi, h: (0, h)),
            pl.BlockSpec((1, hpb * 3 * D), lambda bi, h: (0, h)),
        ],
        out_specs=pl.BlockSpec((1, N, hpb * D), lambda bi, h: (bi, 0, h)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, gamma.reshape(1, C).astype(jnp.float32),
      beta.reshape(1, C).astype(jnp.float32), w, b.reshape(1, -1))


out = timeit("pallas fast-softmax", jax.jit(
    lambda: fast_pallas(x, ga, be, w, b, H, scale, 1e-6)))
err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
print(f"  rel err vs xla: {err:.5f}")
