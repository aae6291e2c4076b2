#!/usr/bin/env python
"""Prototype: factored conv3x3(upsample4(x)) for the ConvHead.

The head's hot op is a 3x3 SAME conv on the 4x-upsampled task feature
map: 289 GFLOP/task at bench shapes, 2.12 ms at 137 TF/s (trace r2).
But conv and bilinear-upsample are both linear, and the composite
factors so the EXPENSIVE channel contraction runs at LOW resolution:

  conv3x3(U x)[i,j,d] = sum_{k,l} Sh[k] (x @ W[k,l]) Sw[l]^T

where Sh[k] = shift(k-1) o U_row is a (4g, g) matrix (zero rows encode
the conv's zero padding; U_row's clamped taps encode half-pixel
bilinear). FLOPs: one (B*S, C)@(C, 9D) channel matmul (18 GF) + two
K=96 spatial mix matmuls (~15 GF) = 33 GF vs 289 GF dense: 8.7x fewer.

Usage: python tools/proto_head_factored.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from mtt_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from mtt_tpu.models.layers import _linear_resize_matrix, interpolate


def shift_up_matrices(g: int, dtype):
    """S[k] (g, 4g): TRANSPOSED rows of the 4x upsample matrix shifted by
    k-1, with zero columns where the conv tap reads the zero padding —
    laid out (low, high) so the einsums contract over the low-res axis."""
    U = _linear_resize_matrix(g, 4 * g)              # (4g, g)
    S = np.zeros((3, 4 * g, g), np.float32)
    for k in range(3):
        d = k - 1
        lo, hi = max(0, -d), min(4 * g, 4 * g - d)
        S[k, lo:hi] = U[lo + d:hi + d]
    return jnp.asarray(S.transpose(0, 2, 1), dtype)  # (3, g, 4g)


def bench(fn, args, steps=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    B, g, C, D = 8, 32, 350, 350
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, g, g, C)) * 0.1, jnp.bfloat16)
    W = jnp.asarray(rng.normal(size=(3, 3, C, D)) * 0.05, jnp.bfloat16)

    @jax.jit
    def dense(x):
        u = interpolate(x, (4 * g, 4 * g))
        return jax.lax.conv_general_dilated(
            u, W, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    Sw = shift_up_matrices(g, jnp.bfloat16)
    Sh = shift_up_matrices(g, jnp.bfloat16)

    @jax.jit
    def factored(x):
        Wf = W.transpose(2, 0, 1, 3).reshape(C, 9 * D)
        Gm = jax.lax.dot_general(x.reshape(B * g * g, C), Wf,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        Gm = Gm.astype(x.dtype).reshape(B, g, g, 3, 3, D)
        # w-mix: contract (l, w) -> W_hi; out (B, h, k, d?, W) orders tried
        H = jnp.einsum("bhwkld,lwW->bhkdW", Gm, Sw,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        Y = jnp.einsum("bhkdW,khH->bHWd", H, Sh,
                       preferred_element_type=jnp.float32)
        return Y.astype(x.dtype)

    @jax.jit
    def factored2(x):
        # variant: keep d minor throughout (W-mix emits (B,h,k,W,d))
        Wf = W.transpose(2, 0, 1, 3).reshape(C, 9 * D)
        Gm = jax.lax.dot_general(x.reshape(B * g * g, C), Wf,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        Gm = Gm.astype(x.dtype).reshape(B, g, g, 3, 3, D)
        H = jnp.einsum("bhwkld,lwW->bhkWd", Gm, Sw,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        Y = jnp.einsum("bhkWd,khH->bHWd", H, Sh,
                       preferred_element_type=jnp.float32)
        return Y.astype(x.dtype)

    ref = dense(x)
    for name, fn in [("factored", factored), ("factored2", factored2)]:
        got = fn(x)
        d = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
        r = jnp.max(jnp.abs(ref.astype(jnp.float32)))
        print(f"{name} max|diff| = {float(d):.4f} (ref max {float(r):.2f})")
    for name, fn in [("dense-upsample-conv", dense), ("factored", factored),
                     ("factored2", factored2)]:
        dt = bench(fn, (x,))
        print(f"{name:20s} {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
