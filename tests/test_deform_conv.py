"""DCNv2 gather-formulation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mtt_tpu.ops.deform_conv import DeformConv2d, bilinear_gather


def test_bilinear_gather_integer_positions():
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    py = jnp.broadcast_to(jnp.arange(4.0)[None, :, None], (2, 4, 4))
    px = jnp.broadcast_to(jnp.arange(4.0)[None, None, :], (2, 4, 4))
    out = bilinear_gather(x, py, px)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_bilinear_gather_midpoint():
    x = jnp.zeros((1, 2, 2, 1)).at[0, 0, 0, 0].set(4.0)
    out = bilinear_gather(x, jnp.full((1, 1), 0.5), jnp.full((1, 1), 0.5))
    assert float(out[0, 0, 0]) == 1.0  # average of 4 corners (4+0+0+0)/4


def test_bilinear_gather_out_of_bounds_zero():
    x = jnp.ones((1, 4, 4, 2))
    out = bilinear_gather(x, jnp.full((1, 3), -5.0), jnp.full((1, 3), 1.0))
    assert float(jnp.abs(out).max()) == 0.0


def test_deform_conv_zero_offset_matches_halved_conv():
    """Offset/mask conv is zero-init -> identity grid, mask = sigmoid(0)=0.5:
    output must equal 0.5 * (standard 3x3 conv with the same kernel)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    m = DeformConv2d(6)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)

    w = np.asarray(v["params"]["kernel"]).reshape(3, 3, 4, 6)
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = 0.5 * ref + np.asarray(v["params"]["bias"])
    # interior matches exactly; borders differ (bilinear zero-padding vs
    # conv zero-padding agree here too since both zero-pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_deform_conv_grads_finite():
    x = jnp.ones((1, 6, 6, 4))
    m = DeformConv2d(4)
    v = m.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return (m.apply({"params": params}, x) ** 2).sum()

    g = jax.grad(loss)(v["params"])
    total = sum(float(jnp.abs(leaf).sum()) for leaf in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0
