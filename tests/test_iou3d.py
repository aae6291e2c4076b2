"""Rotated-BEV IoU / NMS correctness vs analytic + Monte-Carlo references."""

import jax.numpy as jnp
import numpy as np
import pytest

from mtt_tpu.detection.iou3d import (boxes_iou_bev, boxes_overlap_bev,
                                     nms_bev, nms_normal_bev)


def mc_intersection(a, b, n=200_000, seed=0):
    """Monte-Carlo intersection area of two rotated boxes [cx,cy,w,h,yaw]."""
    rng = np.random.default_rng(seed)
    lo = np.minimum(a[:2] - np.hypot(a[2], a[3]), b[:2] - np.hypot(b[2], b[3]))
    hi = np.maximum(a[:2] + np.hypot(a[2], a[3]), b[:2] + np.hypot(b[2], b[3]))
    pts = rng.uniform(lo, hi, size=(n, 2))

    def inside(p, box):
        d = p - box[:2]
        c, s = np.cos(box[4]), np.sin(box[4])
        lx = d[:, 0] * c + d[:, 1] * s
        ly = -d[:, 0] * s + d[:, 1] * c
        return (np.abs(lx) <= box[2] / 2) & (np.abs(ly) <= box[3] / 2)

    both = inside(pts, a) & inside(pts, b)
    return both.mean() * np.prod(hi - lo)


def test_axis_aligned_iou_exact():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
    iou = float(boxes_iou_bev(a, b)[0, 0])
    assert abs(iou - 2.0 / 6.0) < 1e-5


def test_identical_box_iou_one():
    a = jnp.array([[1.0, 2.0, 3.0, 1.5, 0.7]])
    assert abs(float(boxes_iou_bev(a, a)[0, 0]) - 1.0) < 1e-5


def test_disjoint_zero():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.3]])
    b = jnp.array([[10.0, 10.0, 1.0, 1.0, 1.2]])
    assert float(boxes_iou_bev(a, b)[0, 0]) == 0.0


def test_45deg_cross_overlap():
    # square rotated 45 deg inside the same square: intersection is the
    # regular octagon; analytic area for unit squares = 2*(sqrt(2)-1)*... use MC
    a = np.array([0.0, 0.0, 2.0, 2.0, 0.0])
    b = np.array([0.0, 0.0, 2.0, 2.0, np.pi / 4])
    ours = float(boxes_overlap_bev(jnp.array([a]), jnp.array([b]))[0, 0])
    ref = mc_intersection(a, b)
    assert abs(ours - ref) < 0.05


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_overlaps_match_mc(seed):
    rng = np.random.default_rng(seed)
    a = np.array([*rng.uniform(-1, 1, 2), *rng.uniform(1, 3, 2),
                  rng.uniform(0, np.pi)])
    b = np.array([*rng.uniform(-1, 1, 2), *rng.uniform(1, 3, 2),
                  rng.uniform(0, np.pi)])
    ours = float(boxes_overlap_bev(jnp.array([a]), jnp.array([b]))[0, 0])
    ref = mc_intersection(a, b, seed=seed)
    assert abs(ours - ref) < 0.08, (ours, ref)


def test_nms_suppresses_overlapping():
    boxes = jnp.array([
        [0.0, 0.0, 2.0, 2.0, 0.0],
        [0.1, 0.0, 2.0, 2.0, 0.0],   # heavy overlap with 0
        [5.0, 5.0, 2.0, 2.0, 0.5],   # far away
    ])
    scores = jnp.array([0.9, 0.8, 0.7])
    keep = np.asarray(nms_bev(boxes, scores, iou_thr=0.3))
    assert keep.tolist() == [True, False, True]


def test_nms_respects_validity_mask():
    boxes = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0],
                       [5.0, 5.0, 2.0, 2.0, 0.0]])
    scores = jnp.array([0.9, 0.8])
    keep = np.asarray(nms_bev(boxes, scores, 0.3,
                              valid=jnp.array([False, True])))
    assert keep.tolist() == [False, True]


def test_nms_normal_matches_rotated_for_axis_aligned():
    rng = np.random.default_rng(0)
    centers = rng.uniform(0, 10, (20, 2))
    wh = rng.uniform(1, 3, (20, 2))
    boxes = np.concatenate([centers, wh, np.zeros((20, 1))], -1)
    scores = rng.uniform(0, 1, 20).astype(np.float32)
    k1 = np.asarray(nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    k2 = np.asarray(nms_normal_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    assert (k1 == k2).all()
