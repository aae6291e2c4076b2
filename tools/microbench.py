#!/usr/bin/env python
"""Micro-bench the ViT-L block ops at bench shapes to find the utilization
gap (backbone measured at ~63 TFLOP/s = 32% of v5e bf16 peak)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np


def bench(fn, *args, steps=20):
    """device_get of a scalar checksum is the only reliable sync through
    the remote-dispatch tunnel (block_until_ready can return early)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chk(*a):
        out = fn(*a)
        return jnp.float32(sum(jnp.sum(l.astype(jnp.float32))
                               for l in jax.tree.leaves(out)))

    float(jax.device_get(chk(*args)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = chk(*args)
    float(jax.device_get(out))
    return (time.perf_counter() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp
    from mtt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    B, N, C, H, D = 8, 1029, 1024, 16, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.02, jnp.bfloat16)
    wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.02, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(C, 4 * C)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(4 * C, C)) * 0.02, jnp.bfloat16)
    res = {}

    @jax.jit
    def matmuls(x):
        h = x @ wqkv
        h = h[..., :C] @ wproj
        h = h @ w1
        h = jax.nn.gelu(h, approximate=False)
        return h @ w2

    dt = bench(matmuls, x)
    fl = B * N * (2 * C * 3 * C + 2 * C * C + 2 * C * 4 * C + 2 * 4 * C * C)
    res["block_matmuls+gelu"] = {"ms": round(dt * 1e3, 3),
                                 "tflops": round(fl / dt / 1e12, 1)}

    @jax.jit
    def matmuls_nogelu(x):
        h = x @ wqkv
        h = h[..., :C] @ wproj
        h = h @ w1
        return h @ w2

    dt = bench(matmuls_nogelu, x)
    res["block_matmuls"] = {"ms": round(dt * 1e3, 3),
                            "tflops": round(fl / dt / 1e12, 1)}

    @jax.jit
    def gelu_only(h):
        return jax.nn.gelu(h, approximate=False)

    h4 = jnp.asarray(rng.normal(size=(B, N, 4 * C)), jnp.bfloat16)
    res["gelu_exact_(B,N,4C)"] = {"ms": round(bench(gelu_only, h4) * 1e3, 3)}

    @jax.jit
    def gelu_tanh(h):
        return jax.nn.gelu(h, approximate=True)

    res["gelu_tanh_(B,N,4C)"] = {"ms": round(bench(gelu_tanh, h4) * 1e3, 3)}

    from mtt_tpu.kernels.attention import fused_attention
    q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.bfloat16)

    pal = jax.jit(lambda q: fused_attention(q, q, q, impl="pallas"))
    xla = jax.jit(lambda q: fused_attention(q, q, q, impl="xla"))
    afl = B * H * (2 * N * N * D * 2)
    dt = bench(pal, q)
    res["attn_pallas"] = {"ms": round(dt * 1e3, 3),
                          "tflops": round(afl / dt / 1e12, 1)}
    dt = bench(xla, q)
    res["attn_xla"] = {"ms": round(dt * 1e3, 3),
                       "tflops": round(afl / dt / 1e12, 1)}

    @jax.jit
    def ln(x):
        import flax.linen as nn
        m = x.mean(-1, keepdims=True)
        v = ((x - m) ** 2).mean(-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + 1e-6)

    res["layernorm_(B,N,C)"] = {"ms": round(bench(ln, x) * 1e3, 3)}

    # one full ViT block for comparison (expected from parts vs actual)
    from mtt_tpu.models.layers import ViTBlock
    blk = ViTBlock(num_heads=H, dtype=jnp.bfloat16)
    vars_ = jax.jit(blk.init)(jax.random.PRNGKey(0), x)
    bf = jax.jit(lambda v, x: blk.apply(v, x, True))
    dt = bench(bf, vars_, x)
    res["full_block"] = {"ms": round(dt * 1e3, 3),
                         "x24_ms": round(dt * 24 * 1e3, 1)}

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
