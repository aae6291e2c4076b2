#!/usr/bin/env python
"""Prototype: batch-blocked fused LN+MLP+residual kernel.

The shipped kernel's grid is (B, nN, nsub); every (batch-item, row-block)
pair re-streams the full 16.8 MB of fc1+fc2 weights from HBM: B=8, nN=3
-> 403 MB/layer, 27% above the 0.353 ms MXU floor at ViT-L bench shapes
(measured 0.442 ms/layer, trace_ops). Folding ``bb`` batch items into one
grid cell divides the weight traffic by bb.

Usage: python tools/proto_mlp_bb.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from mtt_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from mtt_tpu.kernels.mlp import (_mlp_ln_res_pallas, _gelu_erf_poly,
                                 _pick_block_n)

B, N, C = 8, 1029, 1024
H = 4 * C
EPS = 1e-6
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.1, jnp.bfloat16)
g = jnp.asarray(rng.normal(size=(C,)) * 0.1 + 1, jnp.float32)
be = jnp.asarray(rng.normal(size=(C,)) * 0.01, jnp.float32)
w1 = jnp.asarray(rng.normal(size=(C, H)) * 0.02, jnp.bfloat16)
w2 = jnp.asarray(rng.normal(size=(H, C)) * 0.02, jnp.bfloat16)
b1 = jnp.asarray(rng.normal(size=(H,)) * 0.01, jnp.float32)
b2 = jnp.asarray(rng.normal(size=(C,)) * 0.01, jnp.float32)


def kern_bb(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            o_ref, xn_ref, acc, *, nsub, eps, bb, bn):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        xf = x_ref[...].reshape(bb * bn, C).astype(jnp.float32)
        m = xf.mean(axis=-1, keepdims=True)
        xc = xf - m
        v = (xc * xc).mean(axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(v + eps)
        xn_ref[...] = (y * g_ref[0] + be_ref[0]).astype(xn_ref.dtype)
        acc[...] = jnp.zeros_like(acc)

    h = jax.lax.dot_general(xn_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = _gelu_erf_poly(h + b1_ref[0]).astype(xn_ref.dtype)
    acc[...] += jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)

    @pl.when(j == nsub - 1)
    def _():
        r = (acc[...] + b2_ref[0]
             + x_ref[...].reshape(bb * bn, C).astype(jnp.float32))
        o_ref[...] = r.astype(o_ref.dtype).reshape(bb, bn, C)


def mlp_bb(x3, bb: int, block_n: int, block_h: int):
    Bf, Nf, Cf = x3.shape
    nN = -(-Nf // block_n)
    nsub = H // block_h
    return pl.pallas_call(
        functools.partial(kern_bb, nsub=nsub, eps=EPS, bb=bb, bn=block_n),
        out_shape=jax.ShapeDtypeStruct((Bf, Nf, Cf), x3.dtype),
        grid=(Bf // bb, nN, nsub),
        in_specs=[
            pl.BlockSpec((bb, block_n, Cf), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, Cf), lambda b, i, j: (0, 0)),
            pl.BlockSpec((1, Cf), lambda b, i, j: (0, 0)),
            pl.BlockSpec((Cf, block_h), lambda b, i, j: (0, j)),
            pl.BlockSpec((1, block_h), lambda b, i, j: (0, j)),
            pl.BlockSpec((block_h, Cf), lambda b, i, j: (j, 0)),
            pl.BlockSpec((1, Cf), lambda b, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, block_n, Cf), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[pltpu.VMEM((bb * block_n, Cf), x3.dtype),
                        pltpu.VMEM((bb * block_n, Cf), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x3, g.reshape(1, C), be.reshape(1, C), w1, b1.reshape(1, -1),
      w2, b2.reshape(1, -1))


def bench(fn, steps=30):
    o = fn(); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(steps):
        o = fn()
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / steps


def main():
    base = jax.jit(lambda: _mlp_ln_res_pallas(x, g, be, w1, b1, w2, b2, EPS))
    ref = base()
    print(f"current (bn={_pick_block_n(N)}, bh=512): {bench(base)*1e3:.3f} ms")
    for bb, bn, bh in [(2, 344, 512)]:
        if (bn * -(-N // bn) < N) or (bb * bn * C * 4 > 15 * 2**20):
            continue
        try:
            f = jax.jit(functools.partial(mlp_bb, x, bb, bn, bh))
            o = f()
            d = jnp.max(jnp.abs(o.astype(jnp.float32) - ref.astype(jnp.float32)))
            print(f"bb={bb} bn={bn} bh={bh}: {bench(f)*1e3:.3f} ms   "
                  f"max|diff|={float(d):.4f}")
        except Exception as e:
            print(f"bb={bb} bn={bn} bh={bh}: FAIL {str(e)[:4000]}")


if __name__ == "__main__":
    main()
