"""InvPT fused multi-scale tail kernel (kernels/invpt_tail.py):
interpret-mode parity vs the dense composition, square and non-square
grids, plan validation and gradient fallback. Reference math:
InvPT/models/transformers/invpt.py:520-543 (upsample-sum + conv+BN+ReLU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtt_tpu.kernels.invpt_tail import (_ok, _tail_plan, _tail_xla,
                                        fused_ms_tail)

# the production default is "stencil"; "dots" is the live fallback that
# runs whenever _stencil_plan fails — both must keep parity coverage
HMIX_MODES = ("stencil", "dots")


def _inputs(rng, B, th, tw, C=576, D=576, dtype=jnp.float32):
    xs = [jnp.asarray(rng.normal(size=(B, th // f, tw // f, C)) * 0.2,
                      dtype) for f in (8, 4, 2)]
    kc = jnp.asarray(rng.normal(size=(3, 3, C, D)) * 0.02, jnp.float32)
    inv = jnp.asarray(1.0 + 0.1 * rng.normal(size=(D,)), jnp.float32)
    addv = jnp.asarray(0.1 * rng.normal(size=(D,)), jnp.float32)
    return xs, kc, inv, addv


@pytest.mark.parametrize("hmix", HMIX_MODES)
def test_tail_matches_dense_square(hmix, monkeypatch):
    monkeypatch.setenv("MTT_TAIL_HMIX", hmix)
    rng = np.random.default_rng(0)
    th = tw = 64  # smaller than bench (128) for test speed; same factors
    xs, kc, inv, addv = _inputs(rng, 2, th, tw, C=192, D=160)
    assert _ok(xs, kc, th, tw)
    ref = np.asarray(_tail_xla(xs, kc, inv, addv, th, tw), np.float32)
    got = np.asarray(fused_ms_tail(xs, kc, inv, addv, th, tw,
                                   impl="interpret"), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("hmix", HMIX_MODES)
def test_tail_matches_dense_nonsquare_nyud(hmix, monkeypatch):
    """NYUD grid: 448x576 -> (th, tw) = (112, 144), scales (14,18),
    (28,36), (56,72)."""
    monkeypatch.setenv("MTT_TAIL_HMIX", hmix)
    rng = np.random.default_rng(1)
    th, tw = 112, 144
    xs, kc, inv, addv = _inputs(rng, 1, th, tw, C=192, D=192)
    plan = _tail_plan([x.shape[1:3] for x in xs], th, tw)
    assert plan is not None and plan[0] == [8, 4, 2]
    ref = np.asarray(_tail_xla(xs, kc, inv, addv, th, tw), np.float32)
    got = np.asarray(fused_ms_tail(xs, kc, inv, addv, th, tw,
                                   impl="interpret"), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_tail_plan_rejects_bad_shapes():
    rng = np.random.default_rng(2)
    th = tw = 64
    xs, kc, inv, addv = _inputs(rng, 1, th, tw, C=192, D=192)
    # mismatched factor chain (h/w ratios differ) -> no plan
    bad = [xs[0], xs[1][:, :, :-2], xs[2]]
    assert _tail_plan([x.shape[1:3] for x in bad], th, tw) is None
    # fallback still computes (dense path), just not the kernel
    out = fused_ms_tail(bad, kc, inv, addv, th, tw, impl="interpret")
    assert out.shape == (1, th, tw, 192)


def test_tail_gradients_flow():
    """custom_vjp backward (dense recompute) matches autodiff of the
    dense composition."""
    rng = np.random.default_rng(3)
    th = tw = 32
    xs, kc, inv, addv = _inputs(rng, 1, th, tw, C=64, D=64)

    def loss_fused(x0, x1, x2, k):
        return (fused_ms_tail((x0, x1, x2), k, inv, addv, th, tw,
                              impl="interpret") ** 2).sum()

    def loss_dense(x0, x1, x2, k):
        return (_tail_xla((x0, x1, x2), k, inv, addv, th, tw) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*xs, kc)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(*xs, kc)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("n", [21, 1])
def test_tail_head_fused_matches_dense(n, monkeypatch):
    """Head-fused tail (partial-logit chunks summed over nj) vs the dense
    tail + f32 matmul composition."""
    monkeypatch.setenv("MTT_TAIL_HMIX", "stencil")
    rng = np.random.default_rng(4)
    th = tw = 64
    xs, kc, inv, addv = _inputs(rng, 2, th, tw, C=192, D=192)
    wh = jnp.asarray(rng.normal(size=(192, n)) * 0.05, jnp.float32)
    bh = jnp.asarray(rng.normal(size=(n,)) * 0.1, jnp.float32)
    from mtt_tpu.kernels.invpt_tail import fused_ms_tail_head
    ref_feats = _tail_xla(xs, kc, inv, addv, th, tw)
    ref = np.asarray(ref_feats.reshape(-1, 192) @ wh + bh,
                     np.float32).reshape(2, th, tw, n)
    got = np.asarray(fused_ms_tail_head(xs, kc, inv, addv, wh, bh, th, tw,
                                        impl="interpret"), np.float32)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=5e-5)
