#!/usr/bin/env python
"""Microbench: grouped 3x3 conv (feature_group_count=T) vs batch-stacked
dense conv for the TaskFeatureDecode fuse1 stage.

The trace (tools/trace_ops.py, batch 4) shows fuse1_* grouped convs run at
~77 TF/s (40% of the 195.7 TF/s bf16 peak) while the same-FLOP dense head
convs hit 166 TF/s. Hypothesis: moving the task axis into the batch axis
lets XLA tile the conv like a plain dense one.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
from flax import linen as nn


def bench(fn, args, steps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    B, gh, gw, T, C = 4, 32, 32, 5, 350
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, gh, gw, T * C), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, C, T * C), jnp.bfloat16) * 0.02
    b = jnp.zeros((T * C,), jnp.bfloat16)

    @jax.jit
    def grouped(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=T,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    wd = w.reshape(3, 3, C, T, C)

    @jax.jit
    def stacked(x):
        xs = x.reshape(B, gh, gw, T, C).transpose(0, 3, 1, 2, 4) \
            .reshape(B * T, gh, gw, C)
        # per-task weights differ -> can't share one dense conv; instead
        # run T dense convs batched via vmap over the task axis
        def one(xt, wt, bt):
            return jax.lax.conv_general_dilated(
                xt, wt, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bt
        xs = xs.reshape(T, B, gh, gw, C).transpose(1, 0, 2, 3, 4)
        y = jax.vmap(one, in_axes=(1, 3, 0), out_axes=1)(
            xs, wd, b.reshape(T, C))
        return y.transpose(0, 2, 3, 1, 4).reshape(B, gh, gw, T * C)

    @jax.jit
    def im2col(x):
        # dense matmul formulation: im2col patches (B*S, 9*C) per task and
        # one big (T, 9C, C) batched matmul
        xs = x.reshape(B, gh, gw, T, C)
        pads = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        cols = jnp.stack([pads[:, i:i + gh, j:j + gw]
                          for i in range(3) for j in range(3)], axis=-2)
        cols = cols.transpose(0, 1, 2, 3, 4, 5).reshape(B, gh * gw, T, 9 * C)
        wt = wd.transpose(3, 0, 1, 2, 4).reshape(T, 9 * C, C)
        y = jnp.einsum("bstk,tkc->bstc", cols, wt)
        return (y + b.reshape(T, C)).reshape(B, gh, gw, T * C)

    fl = 2 * B * gh * gw * T * C * C * 9 / 1e12
    for name, fn in [("grouped", grouped), ("stacked-vmap", stacked),
                     ("im2col-bmm", im2col)]:
        dt = bench(fn, (x,))
        print(f"{name:14s} {dt*1e3:7.3f} ms   {fl/dt:6.1f} TF/s")
    # correctness
    g = grouped(x)
    for name, fn in [("stacked-vmap", stacked), ("im2col-bmm", im2col)]:
        d = jnp.max(jnp.abs(fn(x).astype(jnp.float32) - g.astype(jnp.float32)))
        print(f"{name} max|diff| = {d:.4f}")


if __name__ == "__main__":
    main()
