#!/usr/bin/env python
"""Dilated grouped conv lowering probe (InvPT UpEmbed hot op,
fusion.34/75/41 at ~71 TF/s): dilation-2 3x3 grouped conv vs the same
math as 4 parity-phase stride-1 convs vs 9 shifted task-batched dots."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from mtt_tpu.utils.cache import enable_compilation_cache


def timeit(f, *args):
    float(jax.device_get(f(*args)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            r = f(*args)
        float(jax.device_get(r))
        best = min(best, (time.perf_counter() - t0) / 15)
    return best * 1000


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B, H, W, T, Cin, Cout = 8, 64, 64, 5, 288, 144
    x = jnp.asarray(rng.normal(size=(B, H, W, T * Cin)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, Cin, T * Cout)) * 0.02,
                    jnp.bfloat16)

    def conv_dil(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
            feature_group_count=T,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_phase(x, w):
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        outs = []
        for ph in range(2):
            row = []
            for pw in range(2):
                sub = xp[:, ph::2, pw::2]          # ((H+4)/2, (W+4)/2)
                o = jax.lax.conv_general_dilated(
                    sub, w, (1, 1), "VALID", feature_group_count=T,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                row.append(o)
            outs.append(row)
        # interleave phases back: out[2a+ph, 2b+pw] = outs[ph][pw][a, b]
        top = jnp.stack(outs[0], axis=3)            # (B, H/2, W/2, 2, C)
        bot = jnp.stack(outs[1], axis=3)
        y = jnp.stack([top, bot], axis=2)           # (B, H/2, 2, W/2, 2, C)
        return y.reshape(B, H, W, T * Cout)

    def conv_dots(x, w):
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        xt = xp.reshape(B, H + 4, W + 4, T, Cin)
        wt = w.reshape(3, 3, Cin, T, Cout).transpose(3, 0, 1, 2, 4)
        y = 0.
        for i in range(3):
            for j in range(3):
                sub = jax.lax.dynamic_slice(
                    xt, (0, 2 * i, 2 * j, 0, 0), (B, H, W, T, Cin))
                y = y + jnp.einsum("bhwtc,tcd->bhwtd", sub, wt[:, i, j],
                                   preferred_element_type=jnp.float32)
        return y.astype(x.dtype).reshape(B, H, W, T * Cout)

    fl = 2 * B * H * W * T * Cin * Cout * 9
    for name, f in [("dilated", conv_dil), ("phase4", conv_phase),
                    ("dots9", conv_dots)]:
        @jax.jit
        def g(x, w, f=f):
            y = 0.
            for _ in range(3):
                o = f(x, w)
                y = y + jnp.sum(o.astype(jnp.float32))
                x = x + jnp.bfloat16(1e-6)
            return y
        ms = timeit(g, x, w) / 3
        print(f"{name:8s} {ms:7.3f} ms  {fl/ms*1e3/1e12:6.1f} TF/s")
    ref = np.asarray(conv_dil(x, w), np.float32)
    for name, f in [("phase4", conv_phase), ("dots9", conv_dots)]:
        got = np.asarray(f(x, w), np.float32)
        print(name, "maxdiff", np.abs(got - ref).max())


if __name__ == "__main__":
    main()
