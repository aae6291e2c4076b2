#!/usr/bin/env python
"""Prototype: attention kernel consuming the fused qkv Dense output
directly in (B, N, H*3*D) head-major layout — no slices, transposes, or
pads in the XLA graph. Grid (B, H/2): two heads per program keep the
block's lane width at 384 (divisible by 128)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, json, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from mtt_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

B, N, H, D = 8, 1029, 16, 64
rng = np.random.default_rng(0)
qkv = jnp.asarray(rng.normal(size=(B, N, H, 3, D)) * 0.3,
                  jnp.bfloat16).reshape(B, N, H * 3 * D)
afl = B * H * 2 * 2 * N * N * D


def kern(q_ref, kv_ref, o_ref, *, scale, D, hpb):
    qblk = q_ref[0]                        # (bq, hpb*3*D)
    kvblk = kv_ref[0]                      # (N, hpb*3*D)
    outs = []
    for h in range(hpb):
        base = h * 3 * D
        q = qblk[:, base:base + D] * jnp.asarray(scale, qblk.dtype)
        k = kvblk[:, base + D:base + 2 * D]
        v = kvblk[:, base + 2 * D:base + 3 * D]
        logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        outs.append((o / s).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)


def attn_qkv(qkv, heads, scale, hpb=2, bq=128):
    B, N, C3 = qkv.shape
    D = C3 // heads // 3
    nq = (N + bq - 1) // bq
    out = pl.pallas_call(
        functools.partial(kern, scale=scale, D=D, hpb=hpb),
        out_shape=jax.ShapeDtypeStruct((B, N, heads * D), qkv.dtype),
        grid=(B, heads // hpb, nq),
        in_specs=[
            pl.BlockSpec((1, bq, hpb * 3 * D), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((1, N, hpb * 3 * D), lambda b, h, i: (b, 0, h)),
        ],
        out_specs=pl.BlockSpec((1, bq, hpb * D), lambda b, h, i: (b, i, h)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
    )(qkv, qkv)
    return out


# correctness vs xla on the same data
qkv5 = qkv.reshape(B, N, H, 3, D)
from mtt_tpu.kernels.attention import _attention_xla
q = qkv5[:, :, :, 0].transpose(0, 2, 1, 3).reshape(B * H, N, D)
k = qkv5[:, :, :, 1].transpose(0, 2, 1, 3).reshape(B * H, N, D)
v = qkv5[:, :, :, 2].transpose(0, 2, 1, 3).reshape(B * H, N, D)
ref = _attention_xla(q, k, v, D ** -0.5).reshape(B, H, N, D)
ref = ref.transpose(0, 2, 1, 3).reshape(B, N, H * D)
got = attn_qkv(qkv, H, D ** -0.5)
print("max_err", float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                       - got.astype(jnp.float32)))))

REP = 24


def bench(fn, *args, steps=10):
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


def rep(f):
    def g(x):
        for _ in range(REP):
            y = f(x)
            x = x + jnp.pad(y, [(0, 0), (0, 0), (0, x.shape[-1] - y.shape[-1])]) * jnp.bfloat16(0.001)
        return x
    return g


for hpb in (2,):
    dt = bench(rep(lambda x, hpb=hpb: attn_qkv(x, H, D ** -0.5, hpb)), qkv)
    print(json.dumps({f"attn_qkv_hpb{hpb}": {
        "ms": round(dt * 1e3, 3), "tflops": round(afl / dt / 1e12, 1)}}))
