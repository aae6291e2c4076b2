#!/usr/bin/env python
"""Prototype: fused MLP pallas kernel (x@w1 -> gelu -> @w2) vs XLA chain.

Tests whether Mosaic overlaps VPU gelu with MXU matmuls when the kernel
body is split into column sub-blocks (software-pipelinable)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, json, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from mtt_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

REP = 24
B, N, C = 8, 1029, 1024
H = 4 * C
M = B * N
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(M, C)) * 0.1, jnp.bfloat16)
w1 = jnp.asarray(rng.normal(size=(C, H)) * 0.02, jnp.bfloat16)
w2 = jnp.asarray(rng.normal(size=(H, C)) * 0.02, jnp.bfloat16)
b1 = jnp.asarray(rng.normal(size=(H,)) * 0.01, jnp.float32)
b2 = jnp.asarray(rng.normal(size=(C,)) * 0.01, jnp.float32)


def kern(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc, *, nsub):
    xb = x_ref[...]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    h = jax.lax.dot_general(xb, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[0]
    # exact-grade gelu: erf via Abramowitz-Stegun 7.1.26 (|err|<=1.5e-7,
    # i.e. fp32 accuracy; Pallas TPU has no erf/erfc primitive)
    z = h * (2.0 ** -0.5)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_az = 1.0 - poly * jnp.exp(-az * az)
    erf_z = jnp.sign(z) * erf_az
    h = (0.5 * h * (1.0 + erf_z)).astype(xb.dtype)
    acc[...] += jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)

    @pl.when(j == nsub - 1)
    def _():
        o_ref[...] = (acc[...] + b2_ref[0]).astype(o_ref.dtype)


def fused_mlp(x, w1, b1, w2, b2, block_m=512, block_h=1024):
    M, C = x.shape
    Hh = w1.shape[1]
    Mp = (M + block_m - 1) // block_m * block_m
    if Mp != M:
        x = jnp.pad(x, [(0, Mp - M), (0, 0)])
    nsub = Hh // block_h
    out = pl.pallas_call(
        functools.partial(kern, nsub=nsub),
        out_shape=jax.ShapeDtypeStruct((Mp, C), x.dtype),
        grid=(Mp // block_m, nsub),
        in_specs=[
            pl.BlockSpec((block_m, C), lambda i, j: (i, 0)),
            pl.BlockSpec((C, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((block_h, C), lambda i, j: (j, 0)),
            pl.BlockSpec((1, C), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, C), lambda i, j: (i, 0)),
        scratch_shapes=[pltpu.VMEM((block_m, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return out[:M]


def xla_mlp(x, w1, b1, w2, b2):
    h = (x @ w1 + b1.astype(jnp.float32)).astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    return (h @ w2 + b2).astype(x.dtype)


ref = xla_mlp(x[:600], w1, b1, w2, b2)
got = fused_mlp(x[:600], w1, b1, w2, b2)
print("max_err", float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                       - got.astype(jnp.float32)))))


def bench(fn, *args, steps=10):
    @jax.jit
    def chk(*a):
        out = fn(*a)
        return jnp.float32(jnp.sum(out.astype(jnp.float32)))
    float(jax.device_get(chk(*args)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = chk(*args)
    float(jax.device_get(out))
    return (time.perf_counter() - t0) / steps / REP


def rep(f):
    def g_(x):
        for _ in range(REP):
            x = f(x) + x * jnp.bfloat16(0.001)
        return x
    return g_


fl = 2 * M * C * H * 2
for bm, bh in ((512, 1024), (512, 2048), (1024, 1024), (256, 1024)):
    dt = bench(rep(lambda x, bm=bm, bh=bh: fused_mlp(x, w1, b1, w2, b2,
                                                     block_m=bm, block_h=bh)), x)
    print(json.dumps({f"fused_bm{bm}_bh{bh}": {
        "ms": round(dt * 1e3, 3), "tflops": round(fl / dt / 1e12, 1)}}))
dt = bench(rep(lambda x: xla_mlp(x, w1, b1, w2, b2)), x)
print(json.dumps({"xla_chain": {"ms": round(dt * 1e3, 3),
                                "tflops": round(fl / dt / 1e12, 1)}}))
