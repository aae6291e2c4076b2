#!/usr/bin/env python
"""Per-op cost via 24x in-jit repetition (one dispatch per measurement —
the remote tunnel has a ~2ms host dispatch floor that poisons small
per-call benches)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np

REP = 24


def bench(fn, *args, steps=10):
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
    return (time.perf_counter() - t0) / steps / REP


def main():
    import jax
    import jax.numpy as jnp
    from mtt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from mtt_tpu.kernels.attention import fused_attention

    B, N, C, H, D = 8, 1029, 1024, 16, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.1, jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.02, jnp.bfloat16)
    wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.02, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(C, 4 * C)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(4 * C, C)) * 0.02, jnp.bfloat16)
    res = {}

    def matmuls_once(h):
        a = h @ wqkv
        h = h + a[..., :C] @ wproj
        m = h @ w1
        return h + m @ w2

    def rep(f):
        def g(x):
            for _ in range(REP):
                x = f(x)
            return x
        return g

    dt = bench(rep(matmuls_once), x)
    fl = B * N * (2 * C * 3 * C + 2 * C * C + 2 * C * 4 * C + 2 * 4 * C * C)
    res["matmuls_x24"] = {"ms": round(dt * 1e3, 3),
                          "tflops": round(fl / dt / 1e12, 1)}

    def gelu_once(h):
        return jax.nn.gelu(h @ w1, approximate=False) @ w2 + h

    dt = bench(rep(gelu_once), x)
    fl = B * N * (2 * C * 4 * C + 2 * 4 * C * C)
    res["mlp_gelu_x24"] = {"ms": round(dt * 1e3, 3),
                           "tflops": round(fl / dt / 1e12, 1)}

    def mlp_nogelu_once(h):
        return ((h @ w1) @ w2) + h

    dt = bench(rep(mlp_nogelu_once), x)
    res["mlp_nogelu_x24"] = {"ms": round(dt * 1e3, 3),
                             "tflops": round(fl / dt / 1e12, 1)}

    def ln_once(h):
        m = h.mean(-1, keepdims=True)
        v = ((h - m) ** 2).mean(-1, keepdims=True)
        return (h - m) * jax.lax.rsqrt(v + 1e-6)

    res["ln_x24"] = {"ms": round(bench(rep(ln_once), x) * 1e3, 3)}

    def attn_once(h, impl):
        qkv = (h @ wqkv).reshape(B, N, 3, H, D)
        o = fused_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                            scale=D ** -0.5, impl=impl)
        return h + o.reshape(B, N, C) @ wproj

    afl = B * H * 2 * 2 * N * N * D + B * N * (2 * C * 3 * C + 2 * C * C)
    for impl in ("pallas", "xla"):
        dt = bench(rep(lambda h: attn_once(h, impl)), x)
        res[f"attn_{impl}_x24"] = {"ms": round(dt * 1e3, 3),
                                   "tflops": round(afl / dt / 1e12, 1)}

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
