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
