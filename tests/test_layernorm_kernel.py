"""Fused LayerNorm kernel: interpret-mode vs XLA reference + grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtt_tpu.kernels.layernorm import fused_layernorm


@pytest.mark.parametrize("shape", [(2, 100, 64), (8, 33, 128)])
def test_fused_ln_matches_reference(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 3 + 1
    g = jnp.asarray(rng.normal(size=shape[-1:]).astype(np.float32))
    b = jnp.asarray(rng.normal(size=shape[-1:]).astype(np.float32))
    ref = fused_layernorm(x, g, b, impl="xla")
    out = fused_layernorm(x, g, b, impl="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # against flax nn.LayerNorm
    from flax import linen as nn
    ln = nn.LayerNorm(epsilon=1e-6)
    want = ln.apply({"params": {"scale": g, "bias": b}}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_ln_grads():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 37, 96)).astype(np.float32))
    g = jnp.asarray(1 + 0.1 * rng.normal(size=(96,)).astype(np.float32))
    b = jnp.asarray(0.1 * rng.normal(size=(96,)).astype(np.float32))

    def loss_fused(x, g, b):
        return (fused_layernorm(x, g, b, impl="xla") ** 2).sum()

    def loss_plain(x, g, b):
        m = x.mean(-1, keepdims=True)
        v = ((x - m) ** 2).mean(-1, keepdims=True)
        y = (x - m) * jax.lax.rsqrt(v + 1e-6) * g + b
        return (y ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, g, b)
    g2 = jax.grad(loss_plain, argnums=(0, 1, 2))(x, g, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=2e-3, rtol=2e-3)


def test_fused_ln_bf16_io():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 64, 256)).astype(np.float32),
                    jnp.bfloat16)
    g = jnp.ones((256,), jnp.float32)
    b = jnp.zeros((256,), jnp.float32)
    out = fused_layernorm(x, g, b, impl="interpret")
    ref = fused_layernorm(x, g, b, impl="xla")
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)
