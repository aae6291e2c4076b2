#!/usr/bin/env python
"""Follow-up: calibrate MXU peak, test shape-alignment effects, and compare
attention kernels (ours vs jax.experimental.pallas.ops.tpu.flash_attention).
"""

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

    rng = np.random.default_rng(0)
    res = {}

    # 1. MXU peak calibration: big square bf16 matmul
    a = jnp.asarray(rng.normal(size=(8192, 8192)) * 0.02, jnp.bfloat16)
    mm = jax.jit(lambda a: a @ a)
    dt = bench(mm, a)
    res["peak_matmul_8192"] = {"ms": round(dt * 1e3, 3),
                               "tflops": round(2 * 8192**3 / dt / 1e12, 1)}

    # 2. alignment: matmul at N=1029 vs 1024 vs 1040
    for n in (1024, 1029, 1056):
        x = jnp.asarray(rng.normal(size=(8, n, 1024)) * 0.02, jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(1024, 4096)) * 0.02, jnp.bfloat16)
        f = jax.jit(lambda x, w: x @ w)
        dt = bench(f, x, w)
        res[f"matmul_bx{n}x1024x4096"] = {
            "ms": round(dt * 1e3, 3),
            "tflops": round(2 * 8 * n * 1024 * 4096 / dt / 1e12, 1)}

    # 3. gelu + LN alignment
    for n in (1024, 1029):
        h = jnp.asarray(rng.normal(size=(8, n, 4096)), jnp.bfloat16)
        g = jax.jit(lambda h: jax.nn.gelu(h, approximate=False))
        res[f"gelu_exact_{n}"] = {"ms": round(bench(g, h) * 1e3, 3)}
        x = jnp.asarray(rng.normal(size=(8, n, 1024)), jnp.bfloat16)

        def ln(x):
            m = x.mean(-1, keepdims=True)
            v = ((x - m) ** 2).mean(-1, keepdims=True)
            return (x - m) * jax.lax.rsqrt(v + 1e-6)

        res[f"layernorm_{n}"] = {"ms": round(bench(jax.jit(ln), x) * 1e3, 3)}
        # fp32 LN for comparison
        x32 = x.astype(jnp.float32)
        res[f"layernorm_{n}_fp32"] = {"ms": round(bench(jax.jit(ln), x32) * 1e3, 3)}

    # 4. attention: ours (block sizes) vs official flash kernel
    B, N, H, D = 8, 1029, 16, 64
    q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.bfloat16)
    afl = B * H * 2 * 2 * N * N * D

    from mtt_tpu.kernels.attention import _attention_pallas
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    for bq in (256, 512, 1024):
        f = jax.jit(lambda qf, bq=bq: _attention_pallas(
            qf, qf, qf, scale=D ** -0.5, block_q=bq))
        dt = bench(f, qf)
        res[f"ours_bq{bq}"] = {"ms": round(dt * 1e3, 3),
                               "tflops": round(afl / dt / 1e12, 1)}

    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)
        qh = q.transpose(0, 2, 1, 3)  # (B,H,N,D)
        f = jax.jit(lambda qh: flash_attention(qh, qh, qh, sm_scale=D ** -0.5))
        dt = bench(f, qh)
        res["official_flash"] = {"ms": round(dt * 1e3, 3),
                                 "tflops": round(afl / dt / 1e12, 1)}
    except Exception as e:  # noqa: BLE001
        res["official_flash"] = {"error": str(e)[:200]}

    # 5. padded-to-1056 attention (aligned) with ours
    N2 = 1056
    qp = jnp.pad(qf, [(0, 0), (0, N2 - N), (0, 0)])
    f = jax.jit(lambda qp: _attention_pallas(qp, qp, qp, scale=D ** -0.5,
                                             block_q=528))
    dt = bench(f, qp)
    res["ours_padded1056"] = {"ms": round(dt * 1e3, 3),
                              "tflops": round(afl / dt / 1e12, 1)}

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
