"""Pallas kernel correctness: interpret-mode vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtt_tpu.kernels.attention import fused_attention


@pytest.mark.parametrize("n,d,h", [(64, 32, 2), (100, 16, 4)])
def test_fused_attention_matches_xla(n, d, h):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, n, h, d)).astype(np.float32))
    ref = fused_attention(q, k, v, impl="xla")
    out = fused_attention(q, k, v, impl="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_attention_grads_match():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 32, 2, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 32, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 32, 2, 16)).astype(np.float32))

    def loss_custom(q, k, v):
        return (fused_attention(q, k, v, impl="xla") ** 2).sum()

    def loss_plain(q, k, v):
        scale = q.shape[-1] ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        p = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        return (out ** 2).sum()

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_cross_len_attention():
    # decoder-style: kv shorter than q
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 80, 2, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 24, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 24, 2, 16)).astype(np.float32))
    ref = fused_attention(q, k, v, impl="xla")
    out = fused_attention(q, k, v, impl="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_qkv_direct_attention_matches_xla():
    """fused_attention_qkv pallas(interpret) vs xla on the head-major qkv
    layout, plus gradient path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mtt_tpu.kernels.attention import fused_attention_qkv

    rng = np.random.default_rng(5)
    B, N, H, D = 2, 100, 2, 64
    qkv = jnp.asarray(rng.normal(size=(B, N, H * 3 * D)).astype(np.float32))
    ref = fused_attention_qkv(qkv, H, D ** -0.5, impl="xla")
    out = fused_attention_qkv(qkv, H, D ** -0.5, impl="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_fused(qkv):
        return (fused_attention_qkv(qkv, H, D ** -0.5, impl="xla") ** 2).sum()

    def loss_plain(qkv):
        q5 = qkv.reshape(B, N, H, 3, D)
        q, k, v = q5[:, :, :, 0], q5[:, :, :, 1], q5[:, :, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (D ** -0.5)
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        return (o ** 2).sum()

    g1 = jax.grad(loss_fused)(qkv)
    g2 = jax.grad(loss_plain)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-4, rtol=1e-4)


def test_fused_mlp_matches_xla():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mtt_tpu.kernels.mlp import fused_mlp

    rng = np.random.default_rng(6)
    M, C, H = 100, 128, 1024  # pallas path needs C%128==0, H%1024==0
    x = jnp.asarray(rng.normal(size=(2, 50, C)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.05)
    ref = fused_mlp(x, w1, b1, w2, b2, impl="xla")
    out = fused_mlp(x, w1, b1, w2, b2, impl="interpret")
    # interpret path uses the A&S poly erf (|err|<=1.5e-7 per element)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)

    def loss_f(x, w1, b1, w2, b2):
        return (fused_mlp(x, w1, b1, w2, b2, impl="xla") ** 2).sum()

    def loss_p(x, w1, b1, w2, b2):
        h = jax.nn.gelu(x @ w1 + b1, approximate=False)
        return ((h @ w2 + b2) ** 2).sum()

    g1 = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g2 = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)
