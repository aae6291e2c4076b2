"""InvPT fused attention kernel: pallas-interpret vs XLA reference + grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtt_tpu.kernels.invpt_attention import invpt_fused_attention


def _data(B=2, H=2, Lq=256, Lk=64, D=16, with_msg=True, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, Lq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
    msg = w = b = None
    if with_msg:
        msg = jnp.asarray(rng.normal(size=(B, H, Lq, Lk)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(H, 2 * H)).astype(np.float32) * 0.3)
        b = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
    return q, k, v, msg, w, b


@pytest.mark.parametrize("with_msg", [False, True])
def test_interpret_matches_xla(with_msg):
    q, k, v, msg, w, b = _data(with_msg=with_msg)
    o_ref, f_ref = invpt_fused_attention(q, k, v, msg, w, b, 0.1, impl="xla")
    o, f = invpt_fused_attention(q, k, v, msg, w, b, 0.1, impl="interpret")
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5,
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=2e-5,
                               rtol=2e-5)


def test_gradients_match_plain_autodiff():
    q, k, v, msg, w, b = _data(Lq=64, Lk=32, D=8)

    def loss_custom(q, k, v, msg, w, b):
        o, f = invpt_fused_attention(q, k, v, msg, w, b, 0.1, impl="xla")
        return (o ** 2).sum() + 0.1 * (f ** 2).sum()

    def loss_plain(q, k, v, msg, w, b):
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.1
        both = jnp.concatenate([scores, msg], axis=1)
        fused = jnp.einsum("hc,bcqk->bhqk", w, both) + b[None, :, None, None]
        p = jax.nn.softmax(fused, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        return (o ** 2).sum() + 0.1 * (fused ** 2).sum()

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, msg, w, b)
    g2 = jax.grad(loss_plain, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, msg, w, b)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-3,
                                   rtol=2e-3)


def test_unaligned_lq_padding():
    q, k, v, msg, w, b = _data(Lq=100, Lk=24, D=8)
    o_ref, f_ref = invpt_fused_attention(q, k, v, msg, w, b, 0.2, impl="xla")
    o, f = invpt_fused_attention(q, k, v, msg, w, b, 0.2, impl="interpret")
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5,
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=2e-5,
                               rtol=2e-5)
