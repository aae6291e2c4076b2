"""Rotated-BEV IoU and NMS, fixed-shape XLA (TPU-native).

Replaces the reference's iou3d CUDA extension (TaskPrompter/
detection_toolbox/iou3d/src/iou3d_kernel.cu:253-397 + iou3d.cpp host
bitmask reduction) with masked fixed-shape computation:

  * pairwise rotated-rectangle intersection via the vertex-collection
    method the CUDA kernel itself uses — contained corners + the 16
    possible edge-edge intersections (a fixed 24-point candidate set),
    angle-sorted around the centroid, shoelace area; everything batched
    with vmap so XLA vectorises it across the (N, M) pair grid;
  * greedy NMS as a fixed-trip-count `lax.fori_loop` over a boolean
    keep-mask — the TPU equivalent of the reference's host-side 64-bit
    bitmask sweep (iou3d.cpp:96-202).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mtt_tpu.detection.box3d import xywhr_to_corners

_EPS = 1e-8


def _point_in_box(pts, box):
    """pts (...,2) inside rotated box (5,) [cx,cy,w,h,yaw]."""
    c, s = jnp.cos(box[4]), jnp.sin(box[4])
    d = pts - box[:2]
    lx = d[..., 0] * c + d[..., 1] * s
    ly = -d[..., 0] * s + d[..., 1] * c
    return (jnp.abs(lx) <= box[2] / 2 + 1e-6) & (jnp.abs(ly) <= box[3] / 2 + 1e-6)


def _seg_intersections(ca, cb):
    """All 16 edge-edge intersection points between two quads.
    ca, cb: (4,2) corners. Returns (16,2) points, (16,) valid.

    The degeneracy guard is *relative*: near-parallel edges have
    |den| ~ |r||q|·sin(angle), so an absolute eps misclassifies either
    tiny boxes (false parallels) or big far-away boxes (fp32 noise in
    den treated as a real crossing, which is what broke on TPU).
    """
    a0 = jnp.repeat(ca, 4, axis=0)                    # (16,2)
    a1 = jnp.repeat(jnp.roll(ca, -1, 0), 4, axis=0)
    b0 = jnp.tile(cb, (4, 1))
    b1 = jnp.tile(jnp.roll(cb, -1, 0), (4, 1))
    r = a1 - a0
    q = b1 - b0
    den = r[:, 0] * q[:, 1] - r[:, 1] * q[:, 0]
    scale = jnp.sqrt((r * r).sum(-1) * (q * q).sum(-1))
    degenerate = jnp.abs(den) < jnp.maximum(1e-5 * scale, _EPS)
    safe_den = jnp.where(degenerate, 1.0, den)
    d0 = b0 - a0
    t = (d0[:, 0] * q[:, 1] - d0[:, 1] * q[:, 0]) / safe_den
    u = (d0[:, 0] * r[:, 1] - d0[:, 1] * r[:, 0]) / safe_den
    valid = ~degenerate & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts = a0 + t[:, None] * r
    return pts, valid


def _pair_intersection_area(box_a, box_b):
    """Intersection area of two rotated BEV boxes [cx,cy,w,h,yaw].

    All geometry is done relative to the midpoint of the two box
    centers: Cityscapes BEV coordinates reach ~100 m, and fp32
    cancellation on far-from-origin corners feeds the near-parallel
    determinant divisions above (VERDICT.md weak #1).
    """
    mid = (box_a[:2] + box_b[:2]) / 2
    box_a = box_a.at[:2].add(-mid)
    box_b = box_b.at[:2].add(-mid)
    ca = xywhr_to_corners(box_a[None])[0]
    cb = xywhr_to_corners(box_b[None])[0]
    ipts, ival = _seg_intersections(ca, cb)
    a_in = _point_in_box(ca, box_b)
    b_in = _point_in_box(cb, box_a)
    pts = jnp.concatenate([ca, cb, ipts], axis=0)          # (24,2)
    valid = jnp.concatenate([a_in, b_in, ival], axis=0)    # (24,)

    nval = valid.sum()
    centroid = (pts * valid[:, None]).sum(0) / jnp.maximum(nval, 1)
    ang = jnp.arctan2(pts[:, 1] - centroid[1], pts[:, 0] - centroid[0])
    ang = jnp.where(valid, ang, 1e9)                       # invalid sort last
    order = jnp.argsort(ang)
    sp = pts[order]
    sv = valid[order]
    # collapse invalid tail onto the first (valid) vertex so the shoelace
    # contributions of degenerate edges vanish
    sp = jnp.where(sv[:, None], sp, sp[0])
    rolled = jnp.roll(sp, -1, axis=0)
    cross = sp[:, 0] * rolled[:, 1] - sp[:, 1] * rolled[:, 0]
    area = 0.5 * jnp.abs(cross.sum())
    return jnp.where(nval >= 3, area, 0.0)


def boxes_overlap_bev(boxes_a, boxes_b):
    """(N,5) x (M,5) rotated boxes -> (N,M) intersection areas
    (CUDA boxes_overlap_kernel equivalent)."""
    f = jax.vmap(lambda a: jax.vmap(lambda b: _pair_intersection_area(a, b))(boxes_b))
    return f(boxes_a)


def boxes_iou_bev(boxes_a, boxes_b):
    """(N,5) x (M,5) -> (N,M) rotated IoU (CUDA boxes_iou_bev_kernel)."""
    inter = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 2] * boxes_a[:, 3])[:, None]
    area_b = (boxes_b[:, 2] * boxes_b[:, 3])[None, :]
    return inter / jnp.maximum(area_a + area_b - inter, _EPS)


def _greedy_nms_from_iou(iou, scores, iou_thr, valid):
    """Greedy suppression on a precomputed IoU matrix. Returns keep mask."""
    N = scores.shape[0]
    order = jnp.argsort(-scores)
    iou_o = iou[order][:, order]
    valid_o = valid[order]

    def body(i, alive):
        # kill everything with IoU > thr against i if i is still alive
        row = (iou_o[i] > iou_thr) & (jnp.arange(N) > i)
        return jnp.where(alive[i], alive & ~row, alive)

    alive = jax.lax.fori_loop(0, N, body, valid_o)
    # scatter back to original index order
    keep = jnp.zeros((N,), bool).at[order].set(alive)
    return keep


def nms_bev(boxes, scores, iou_thr: float, valid=None):
    """Rotated-BEV NMS; boxes (N,5) [x1? no: cx,cy,w,h,yaw]. Returns keep
    mask (N,), fixed shape (CUDA nms_kernel + host loop equivalent)."""
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    iou = boxes_iou_bev(boxes, boxes)
    return _greedy_nms_from_iou(iou, scores, iou_thr, valid)


def boxes_iou_aligned(boxes):
    """Axis-aligned pairwise IoU matrix on BEV footprints (N,5)."""
    x1 = boxes[:, 0] - boxes[:, 2] / 2
    y1 = boxes[:, 1] - boxes[:, 3] / 2
    x2 = boxes[:, 0] + boxes[:, 2] / 2
    y2 = boxes[:, 1] + boxes[:, 3] / 2
    area = (x2 - x1) * (y2 - y1)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    return inter / jnp.maximum(area[:, None] + area[None, :] - inter, _EPS)


def nms_normal_bev(boxes, scores, iou_thr: float, valid=None):
    """Axis-aligned NMS on the BEV footprints (CUDA nms_normal_kernel)."""
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    return _greedy_nms_from_iou(boxes_iou_aligned(boxes), scores, iou_thr,
                                valid)
