#!/usr/bin/env python
"""Attention kernel shootout at backbone shape (BH=128, N=1029, D=64),
24x in-jit repetition: ours (tuned) vs official pallas flash (padded +
segment-id masked) vs jax.nn.dot_product_attention vs raw XLA."""

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
    from mtt_tpu.kernels.attention import _attention_pallas, _attention_xla

    B, N, H, D = 8, 1029, 16, 64
    BH = B * H
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(BH, N, D)) * 0.3, jnp.bfloat16)
    afl = BH * 2 * 2 * N * N * D
    res = {}

    def rep(f):
        def g(x):
            for _ in range(REP):
                x = f(x) + x * jnp.bfloat16(0.001)
            return x
        return g

    for bq in (256, 512):
        dt = bench(rep(lambda x, bq=bq: _attention_pallas(
            x, x, x, scale=D ** -0.5, block_q=bq)), q)
        res[f"ours_par_bq{bq}"] = {"ms": round(dt * 1e3, 3),
                                   "tflops": round(afl / dt / 1e12, 1)}

    dt = bench(rep(lambda x: _attention_xla(x, x, x, scale=D ** -0.5)), q)
    res["xla"] = {"ms": round(dt * 1e3, 3), "tflops": round(afl / dt / 1e12, 1)}

    # official flash kernel: wants (B,H,N,D) with N % block == 0; pad keys
    # and mask with segment ids
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention)
        Np = 1152
        q4 = q.reshape(B, H, N, D)
        pad = [(0, 0), (0, 0), (0, Np - N), (0, 0)]
        qp = jnp.pad(q4, pad)
        seg = jnp.zeros((B, Np), jnp.int32).at[:, N:].set(1)
        qseg = jnp.zeros((B, Np), jnp.int32)

        def flash(x):
            out = flash_attention(
                x, x, x, segment_ids=SegmentIds(q=qseg, kv=seg),
                sm_scale=D ** -0.5)
            return out

        def rep4(f):
            def g(x):
                for _ in range(REP):
                    x = f(x) + x * jnp.bfloat16(0.001)
                return x
            return g

        dt = bench(rep4(flash), qp)
        res["official_flash_p1152_seg"] = {
            "ms": round(dt * 1e3, 3), "tflops": round(afl / dt / 1e12, 1)}

        # no segment ids (upper bound; masking-free)
        dt = bench(rep4(lambda x: flash_attention(x, x, x,
                                                  sm_scale=D ** -0.5)), qp)
        res["official_flash_p1152_nomask"] = {
            "ms": round(dt * 1e3, 3), "tflops": round(afl / dt / 1e12, 1)}
    except Exception as e:  # noqa: BLE001
        res["official_flash"] = {"error": str(e)[:300]}

    # jax.nn.dot_product_attention (B,N,H,D)
    try:
        qn = q.reshape(B, H, N, D).transpose(0, 2, 1, 3)

        def jnn(x):
            return jax.nn.dot_product_attention(x, x, x, scale=D ** -0.5)

        def repn(f):
            def g(x):
                for _ in range(REP):
                    x = f(x) + x * jnp.bfloat16(0.001)
                return x
            return g

        dt = bench(repn(jnn), qn)
        res["jax_nn_dpa"] = {"ms": round(dt * 1e3, 3),
                             "tflops": round(afl / dt / 1e12, 1)}
    except Exception as e:  # noqa: BLE001
        res["jax_nn_dpa"] = {"error": str(e)[:300]}

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
