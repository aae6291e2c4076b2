"""Native C++ iou3d library vs the XLA implementation."""

import numpy as np
import pytest

from mtt_tpu.detection import iou3d_native as nat


pytestmark = pytest.mark.skipif(not nat.available(),
                                reason="native lib not built")


def test_native_matches_xla_iou():
    import jax.numpy as jnp
    from mtt_tpu.detection.iou3d import boxes_iou_bev
    rng = np.random.default_rng(0)
    a = np.concatenate([rng.uniform(-2, 2, (8, 2)), rng.uniform(1, 3, (8, 2)),
                        rng.uniform(0, np.pi, (8, 1))], -1)
    b = np.concatenate([rng.uniform(-2, 2, (6, 2)), rng.uniform(1, 3, (6, 2)),
                        rng.uniform(0, np.pi, (6, 1))], -1)
    ref = np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    out = nat.boxes_iou_bev(a, b)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_native_nms_matches_xla():
    import jax.numpy as jnp
    from mtt_tpu.detection.iou3d import nms_bev as nms_xla
    rng = np.random.default_rng(1)
    boxes = np.concatenate([rng.uniform(0, 10, (20, 2)),
                            rng.uniform(1, 4, (20, 2)),
                            rng.uniform(0, np.pi, (20, 1))], -1)
    scores = rng.uniform(0, 1, 20)
    k_nat = nat.nms_bev(boxes, scores, 0.3)
    k_xla = np.asarray(nms_xla(jnp.asarray(boxes, jnp.float32),
                               jnp.asarray(scores, jnp.float32), 0.3))
    assert (k_nat == k_xla).all()


def test_native_2d_iou_matrix():
    a = np.array([[0, 0, 2, 2], [0, 0, 1, 1]], np.float64)
    b = np.array([[1, 0, 3, 2]], np.float64)
    out = nat.iou_matrix_2d(a, b)
    assert out[0, 0] == pytest.approx(2 / 6)
    assert out[1, 0] == pytest.approx(0.0)
