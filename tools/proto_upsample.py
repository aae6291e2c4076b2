#!/usr/bin/env python
"""Time bilinear-upsample formulations at head shape (B,32,32,350)->4x.

Variants: current two-dot with explicit reshapes; a reshape-free pair of
dot_generals contracting non-minor dims (XLA chooses layouts); XLA's own
jax.image.resize.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json, time
import numpy as np
import jax, jax.numpy as jnp

from mtt_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from mtt_tpu.models.layers import _linear_resize_matrix, _upsample_matmul

B, H, W, C = 8, 32, 32, 350
O, P = 128, 128
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, H, W, C)) * 0.3, jnp.bfloat16)
R = jnp.asarray(_linear_resize_matrix(H, O), x.dtype)
Cm = jnp.asarray(_linear_resize_matrix(W, P), x.dtype)


def up_nofmt(x):
    # rows: contract h (dim 1) with batch b — no reshape before or after
    z = jax.lax.dot_general(
        jnp.broadcast_to(R, (B, O, H)), x,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(x.dtype)  # (B, O, W, C)
    # cols: contract w (dim 2) with batch (b, o)
    y = jax.lax.dot_general(
        jnp.broadcast_to(Cm, (B, O, P, W)), z,
        (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)                  # (B, O, P, C)
    return y.astype(x.dtype)


def timeit(name, fn):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(f(x)); comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(50):
        r = f(x)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 50
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                      "compile_s": round(comp, 1)}))
    return np.asarray(r, np.float32)


a = timeit("current _upsample_matmul", lambda x: _upsample_matmul(x, (O, P)))
b = timeit("nofmt dot_general", up_nofmt)
c = timeit("jax.image.resize", lambda x: jax.image.resize(
    x, (B, O, P, C), "bilinear").astype(x.dtype))
print("max |nofmt-current|:", float(np.max(np.abs(b - a))))
