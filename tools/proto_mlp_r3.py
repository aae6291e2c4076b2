#!/usr/bin/env python
"""MLP kernel round-3: software-pipeline the VPU gelu against the MXU
matmuls INSIDE each grid cell.

The shipped kernel's per-cell chain dot->gelu->dot is fully dependent, so
the ~0.21 ms of erf-gelu VPU work per ViT-L block serializes after the
0.69 ms of MXU work (0.86 ms measured vs 0.69 floor). Splitting the
hidden block into sub-chunks and issuing the NEXT chunk's fc1 matmul
before the CURRENT chunk's gelu gives Mosaic independent MXU/VPU work to
overlap.

Usage: python tools/proto_mlp_r3.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtt_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from mtt_tpu.kernels import mlp as M

REP = 12
B, N, C, H = 8, 1029, 1024, 4096
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(B, N, C)) * 0.3, jnp.bfloat16)
w1 = jnp.asarray(rng.normal(size=(C, H)) * 0.02, jnp.bfloat16)
b1 = jnp.asarray(rng.normal(size=(H,)) * 0.02, jnp.bfloat16)
w2 = jnp.asarray(rng.normal(size=(H, C)) * 0.02, jnp.bfloat16)
b2 = jnp.asarray(rng.normal(size=(C,)) * 0.02, jnp.bfloat16)
flops = 2 * B * N * C * H * 2


def kern_pipe(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc,
              *, nsub: int, sub: int, block_h: int):
    xb = x_ref[0]
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    hs = block_h // sub
    h_cur = jax.lax.dot_general(xb, w1_ref[:, 0:hs], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    h_cur = h_cur + b1_ref[0, 0:hs]
    part = jnp.zeros_like(acc)
    for i in range(sub):
        if i + 1 < sub:
            h_nxt = jax.lax.dot_general(
                xb, w1_ref[:, (i + 1) * hs:(i + 2) * hs],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h_nxt = h_nxt + b1_ref[0, (i + 1) * hs:(i + 2) * hs]
        g = M._gelu_erf_poly(h_cur).astype(xb.dtype)
        part += jax.lax.dot_general(g, w2_ref[i * hs:(i + 1) * hs],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        if i + 1 < sub:
            h_cur = h_nxt
    acc[...] += part

    @pl.when(j == nsub - 1)
    def _():
        o_ref[...] = (acc[...] + b2_ref[0]).astype(o_ref.dtype)[None]


def mlp_pipe(x3, block_n=344, block_h=2048, sub=8):
    Bx, Nx, Cx = x3.shape
    nN = -(-Nx // block_n)
    nsub = H // block_h
    return pl.pallas_call(
        functools.partial(kern_pipe, nsub=nsub, sub=sub, block_h=block_h),
        out_shape=jax.ShapeDtypeStruct((Bx, Nx, Cx), x3.dtype),
        grid=(Bx, nN, nsub),
        in_specs=[
            pl.BlockSpec((1, block_n, Cx), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((Cx, block_h), lambda b, i, j: (0, j)),
            pl.BlockSpec((1, block_h), lambda b, i, j: (0, j)),
            pl.BlockSpec((block_h, Cx), lambda b, i, j: (j, 0)),
            pl.BlockSpec((1, Cx), lambda b, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_n, Cx), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_n, Cx), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x3, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


def chain(f):
    def g(xin):
        for _ in range(REP):
            xin = f(xin)
        return xin
    return jax.jit(g)


def main():
    cases = [("shipped", chain(
        lambda h: M._mlp_pallas(h, w1, b1, w2, b2)))]
    for bn, bh, sub in [(344, 1024, 4), (344, 2048, 8), (344, 4096, 16),
                        (344, 2048, 4), (512, 2048, 8), (344, 4096, 8)]:
        cases.append((f"pipe bn{bn} bh{bh} s{sub}", chain(
            functools.partial(mlp_pipe, block_n=bn, block_h=bh, sub=sub))))
    ok, results, ref = [], {}, None
    for name, fn in cases:
        try:
            r = np.asarray(jax.block_until_ready(fn(x0)), np.float32)
            if ref is None:
                ref = r
            results[name] = {"maxdiff": round(float(np.max(np.abs(r - ref))),
                                              5), "ms": 1e9}
            ok.append((name, fn))
        except Exception as e:
            print(f"{name} FAIL {str(e)[:150]}")
    steps = 10
    for _ in range(3):
        for name, fn in ok:
            t0 = time.perf_counter()
            for _ in range(steps):
                r = fn(x0)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / steps / REP
            results[name]["ms"] = min(results[name]["ms"], round(dt * 1e3, 4))
    for name, _ in ok:
        d = results[name]
        d["tflops"] = round(flops / d["ms"] / 1e9, 1)
        print(json.dumps({"variant": name, **d}))


if __name__ == "__main__":
    main()


# NOTE: a j-outer grid (weights streamed once, x re-streamed) was
# sketched and ABANDONED: the fc2 accumulator must persist across the
# j sweep PER (b, i) block, which a shared scratch cannot express once
# j is the outer grid dim (each j pass visits every (b, i) cell).
