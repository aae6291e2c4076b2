"""FCOS3D training targets, loss and box decoding — fixed-shape, jit-safe.

Re-design of the reference DetModel (TaskPrompter/detection_toolbox/
det_model.py:41-1239) for TPU:

  * ragged per-image GT lists become fixed-capacity padded arrays with a
    validity mask (`det_valid`); the reference's "label-less sample"
    tensor surgery (det_model.py:284-299) is just masking here;
  * target assignment (det_model.py:858-954) is one vectorised
    (points x max_boxes) computation: FCOS center sampling, per-level
    regress ranges, min-distance disambiguation, centerness
    exp(-2.5 * d / (1.414 * stride));
  * losses (det_model.py:253-481): focal(cls) + smooth-L1 on
    offset/depth/size/rot-sin/bbox2d with code weights + CE direction
    bins (3 Euler angles, sin-difference encoding det_model.py:145-168)
    + BCE centerness;
  * inference decode (det_model.py:483-681): fixed top-k pre-NMS,
    offset->center, image->camera unprojection, yaw decode from 2-bin
    direction classes, per-class rotated-BEV NMS with fixed output
    capacity.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mtt_tpu.detection import det_losses as L
from mtt_tpu.detection.box3d import (bbox_bev, distance2bbox, limit_period,
                                     points_img2cam)
from mtt_tpu.detection.iou3d import nms_bev, nms_normal_bev

INF = 1e8


def level_points(feat_sizes: Sequence[Tuple[int, int]],
                 strides: Sequence[float]) -> jnp.ndarray:
    """Concatenated (P,2) pixel-center points + (P,) strides + (P,) level ids
    (det_model.py:717-753)."""
    pts, strs, lvls = [], [], []
    for i, ((h, w), s) in enumerate(zip(feat_sizes, strides)):
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        p = np.stack([xs.reshape(-1) * s, ys.reshape(-1) * s], -1) + s // 2
        pts.append(p)
        strs.append(np.full((h * w,), s, np.float32))
        lvls.append(np.full((h * w,), i, np.int32))
    return (jnp.asarray(np.concatenate(pts), jnp.float32),
            jnp.asarray(np.concatenate(strs)), jnp.asarray(np.concatenate(lvls)))


def get_targets_single(points, strides_pt, regress_lo, regress_hi, gt, cfg):
    """Targets for ONE image from padded GT dict with M boxes.

    gt keys: bboxes2d (M,4) xyxy, labels (M,), boxes3d (M,9)
    [x,y,z,l,w,h,r0,r1,yaw], centers2d (M,2), depths (M,), valid (M,).
    Returns labels (P,), bbox_targets (P, 9[+4]), centerness (P,).
    """
    P = points.shape[0]
    M = gt["labels"].shape[0]
    num_classes = cfg["num_classes"]
    xs, ys = points[:, 0:1], points[:, 1:2]               # (P,1)

    cx = gt["centers2d"][None, :, 0]                      # (1,M)
    cy = gt["centers2d"][None, :, 1]
    dx = xs - cx                                          # (P,M)
    dy = ys - cy
    dist = jnp.sqrt(dx ** 2 + dy ** 2)

    # center sampling box (radius * stride)
    rad = strides_pt[:, None] * cfg["center_sample_radius"]
    inside_center = (jnp.abs(dx) < rad) & (jnp.abs(dy) < rad)

    # regress range on the max distance to the 2D box sides
    b = gt["bboxes2d"]
    left = xs - b[None, :, 0]
    top = ys - b[None, :, 1]
    right = b[None, :, 2] - xs
    bottom = b[None, :, 3] - ys
    max_reg = jnp.maximum(jnp.maximum(left, right), jnp.maximum(top, bottom))
    in_range = (max_reg >= regress_lo[:, None]) & (max_reg <= regress_hi[:, None])

    valid = gt["valid"][None, :].astype(bool)
    cost = jnp.where(inside_center & in_range & valid, dist, INF)
    min_dist = cost.min(axis=1)                           # (P,)
    min_idx = cost.argmin(axis=1)

    labels = jnp.where(min_dist < INF,
                       gt["labels"][min_idx].astype(jnp.int32), num_classes)

    take = lambda arr: arr[min_idx]
    sel_dx = jnp.take_along_axis(dx, min_idx[:, None], 1)[:, 0]
    sel_dy = jnp.take_along_axis(dy, min_idx[:, None], 1)[:, 0]
    sel_depth = take(gt["depths"])
    box3d = take(gt["boxes3d"])                           # (P,9)
    tgt3d = jnp.concatenate(
        [sel_dx[:, None], sel_dy[:, None], sel_depth[:, None], box3d[:, 3:]],
        axis=1)                                           # (P,9)

    if cfg["pred_bbox2d"]:
        l2 = jnp.take_along_axis(left, min_idx[:, None], 1)[:, 0]
        t2 = jnp.take_along_axis(top, min_idx[:, None], 1)[:, 0]
        r2 = jnp.take_along_axis(right, min_idx[:, None], 1)[:, 0]
        b2 = jnp.take_along_axis(bottom, min_idx[:, None], 1)[:, 0]
        tgt3d = jnp.concatenate(
            [tgt3d, jnp.stack([l2, t2, r2, b2], -1)], axis=1)  # (P,13)

    rel = jnp.sqrt(sel_dx ** 2 + sel_dy ** 2) / (1.414 * strides_pt)
    centerness = jnp.exp(-cfg["centerness_alpha"] * rel)

    if cfg["norm_on_bbox"]:
        tgt3d = tgt3d.at[:, :2].divide(strides_pt[:, None])
        if cfg["pred_bbox2d"]:
            tgt3d = tgt3d.at[:, -4:].divide(strides_pt[:, None])
    return labels, tgt3d, centerness


def direction_targets(rot_targets, dir_offset: float = 0.0, num_bins: int = 2):
    """(P,3) rotation targets -> (P,3) int bin ids (det_model.py:171-204)."""
    offset_rot = limit_period(rot_targets - dir_offset, 0, 2 * np.pi)
    bins = jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32)
    return jnp.clip(bins, 0, num_bins - 1)


def detection_loss(head_out, batch, det_cfg, strides):
    """Multi-level FCOS3D loss over a padded-GT batch. Returns scalar total
    and a dict of components."""
    cls_scores, bbox_preds, dir_preds, centernesses = head_out
    Bq = cls_scores[0].shape[0]
    feat_sizes = [c.shape[1:3] for c in cls_scores]
    points, strides_pt, lvl_ids = level_points(feat_sizes, strides)
    rr = jnp.asarray(det_cfg["regress_ranges"], jnp.float32)
    regress_lo = rr[lvl_ids, 0]
    regress_hi = rr[lvl_ids, 1]

    cfg = {"num_classes": det_cfg["num_classes"],
           "center_sample_radius": det_cfg["center_sample_radius"],
           "centerness_alpha": det_cfg["centerness_alpha"],
           "norm_on_bbox": det_cfg["norm_on_bbox"],
           "pred_bbox2d": det_cfg["pred_bbox2d"]}

    gt = {"bboxes2d": batch["det_bboxes2d"], "labels": batch["det_labels"],
          "boxes3d": batch["det_boxes3d"], "centers2d": batch["det_centers2d"],
          "depths": batch["det_depths"], "valid": batch["det_valid"]}
    labels, tgt3d, ctr_tgt = jax.vmap(
        lambda g: get_targets_single(points, strides_pt, regress_lo,
                                     regress_hi, g, cfg))(gt)
    # (B,P) labels, (B,P,C) targets, (B,P) centerness

    flat = lambda lst, c: jnp.concatenate(
        [x.reshape(Bq, -1, c) for x in lst], axis=1)
    n_reg = sum(det_cfg["group_reg_dims"])
    cls_f = flat(cls_scores, det_cfg["num_classes"]).reshape(-1, det_cfg["num_classes"])
    bbox_f = flat(bbox_preds, n_reg).reshape(-1, n_reg)
    dir_f = flat(dir_preds, 6).reshape(-1, 3, 2)
    ctr_f = flat(centernesses, 1).reshape(-1)
    labels_f = labels.reshape(-1)
    tgt_f = tgt3d.reshape(-1, tgt3d.shape[-1])
    ctr_tgt_f = ctr_tgt.reshape(-1)

    pos = (labels_f >= 0) & (labels_f < det_cfg["num_classes"])
    num_pos = pos.sum()
    posf = pos.astype(jnp.float32)
    # reference avg_factor = num_pos + num_imgs where label-less images are
    # REMOVED from the batch before the loss (det_model.py:284-299,380):
    # count only images that carry at least one valid GT box
    n_labeled = jnp.sum(jnp.any(batch["det_valid"] > 0, axis=1)
                        .astype(jnp.float32))
    avg = jnp.maximum(posf.sum() + n_labeled, 1.0)

    out = {}
    # a label-less image's rows are excluded from the cls loss entirely
    # (the reference removes those images from the batch, not just their
    # positives, det_model.py:284-299)
    cls_w = jnp.broadcast_to(
        jnp.any(batch["det_valid"] > 0, axis=1)[:, None], labels.shape
    ).astype(jnp.float32).reshape(-1)
    out["loss_cls"] = L.sigmoid_focal_loss(
        cls_f, labels_f, det_cfg["num_classes"],
        gamma=det_cfg["loss_cls"]["gamma"], alpha=det_cfg["loss_cls"]["alpha"],
        weight=cls_w,
        avg_factor=avg, loss_weight=det_cfg["loss_cls"]["loss_weight"])

    cw = jnp.asarray(det_cfg["code_weight"], jnp.float32)
    eq_sum = jnp.maximum(posf.sum(), 1e-6)
    beta = det_cfg["loss_bbox"]["beta"]

    # sin-difference rotation encoding on channels 6:9 (det_model.py:145-168)
    sin_p = jnp.sin(bbox_f[:, 6:9]) * jnp.cos(tgt_f[:, 6:9])
    sin_t = jnp.cos(bbox_f[:, 6:9]) * jnp.sin(tgt_f[:, 6:9])
    pred_enc = jnp.concatenate([bbox_f[:, :6], sin_p, bbox_f[:, 9:]], -1)
    tgt_enc = jnp.concatenate([tgt_f[:, :6], sin_t, tgt_f[:, 9:]], -1)

    def group_loss(sl):
        w = posf[:, None] * cw[None, sl]
        return L.smooth_l1_loss(pred_enc[:, sl], tgt_enc[:, sl], beta=beta,
                                weight=w, avg_factor=eq_sum)

    out["loss_offset"] = group_loss(slice(0, 2))
    out["loss_depth"] = group_loss(slice(2, 3))
    out["loss_size"] = group_loss(slice(3, 6))
    out["loss_rotsin"] = group_loss(slice(6, 9))
    if det_cfg["pred_bbox2d"]:
        out["loss_bbox2d"] = group_loss(slice(n_reg - 4, n_reg))

    if det_cfg["use_direction_classifier"]:
        dir_tgt = direction_targets(tgt_f[:, 6:9], det_cfg["dir_offset"])
        dl = 0.0
        for r in range(3):
            dl = dl + L.softmax_ce_loss(dir_f[:, r], dir_tgt[:, r],
                                        weight=posf, avg_factor=eq_sum)
        out["loss_dir"] = dl

    out["loss_centerness"] = L.binary_ce_loss(ctr_f, ctr_tgt_f, weight=posf,
                                              avg_factor=eq_sum)
    total = sum(out.values())
    return total, out


def build_detection_criterion(p):
    det_cfg = p.det_cfg
    strides = tuple(det_cfg["strides"])

    def crit(head_out, batch):
        total, _ = detection_loss(head_out, batch, det_cfg, strides)
        return total

    return crit


def decode_bboxes_single(head_out_i, K, det_cfg, strides, scale_factor=1.0):
    """Decode one image's detections with fixed output size.

    head_out_i: per-level (cls (H,W,C), bbox (H,W,R), dir (H,W,6),
    ctr (H,W,1)). Returns dict with boxes3d (K,9), scores (K,), labels (K,),
    valid (K,), bboxes2d (K,4).
    (reference _get_bboxes_single, det_model.py:555-681)
    """
    cls_scores, bbox_preds, dir_preds, ctrs = head_out_i
    feat_sizes = [c.shape[0:2] for c in cls_scores]
    points, strides_pt, _ = level_points(feat_sizes, strides)
    nc = det_cfg["num_classes"]
    n_reg = sum(det_cfg["group_reg_dims"])

    scores = jnp.concatenate([c.reshape(-1, nc) for c in cls_scores])
    scores = jax.nn.sigmoid(scores)
    bbox = jnp.concatenate([b.reshape(-1, n_reg) for b in bbox_preds])
    dirp = jnp.concatenate([d.reshape(-1, 3, 2) for d in dir_preds])
    ctr = jax.nn.sigmoid(jnp.concatenate([c.reshape(-1) for c in ctrs]))

    if det_cfg["norm_on_bbox"]:
        bbox = bbox.at[:, :2].multiply(strides_pt[:, None])
        if det_cfg["pred_bbox2d"]:
            bbox = bbox.at[:, -4:].multiply(strides_pt[:, None])

    nms_pre = int(det_cfg["test_cfg"]["nms_pre"])
    max_scores = (scores * ctr[:, None]).max(axis=1)
    k = min(nms_pre, max_scores.shape[0])
    _, topk = jax.lax.top_k(max_scores, k)
    scores = scores[topk]
    bbox = bbox[topk]
    dirp = dirp[topk]
    ctr = ctr[topk]
    pts = points[topk]

    # offset -> projected center, then unproject to camera frame
    centers2d = pts - bbox[:, :2]
    centers2d = centers2d / scale_factor
    c3 = jnp.concatenate([centers2d, bbox[:, 2:3]], axis=1)
    cam_xyz = points_img2cam(c3, K)
    box3d = jnp.concatenate([cam_xyz, bbox[:, 3:9]], axis=1)  # (k,9)

    dir_score = jnp.argmax(dirp, axis=-1)                     # (k,3)
    for ri, rot in enumerate(range(6, 9)):
        dr = limit_period(box3d[:, rot] - det_cfg["dir_offset"], 0, np.pi)
        box3d = box3d.at[:, rot].set(
            dr + det_cfg["dir_offset"] + np.pi * dir_score[:, ri])

    bev = bbox_bev(box3d)
    # xyxy+angle NMS input footprint
    nms_scores = scores * ctr[:, None]

    max_out = int(det_cfg["test_cfg"]["max_per_img"])
    score_thr = float(det_cfg["test_cfg"]["score_thr"])
    iou_thr = float(det_cfg["test_cfg"]["nms_thr"])
    use_rot = bool(det_cfg["test_cfg"]["use_rotate_nms"])

    # the (k,k) BEV IoU matrix is class-independent — compute it ONCE and
    # reuse it for every class's greedy suppression (the reference's
    # box3d_multiclass_nms recomputes per-class on the class-sliced boxes,
    # det_tools.py:85-210; here all classes share the same top-k candidate
    # set so one matrix serves all nc passes: 6x fewer rotated polygon clips)
    from mtt_tpu.detection.iou3d import (_greedy_nms_from_iou,
                                         boxes_iou_bev, boxes_iou_aligned)
    iou_mat = boxes_iou_bev(bev, bev) if use_rot else boxes_iou_aligned(bev)

    all_scores, all_labels, all_keep = [], [], []
    for c in range(nc):
        sc = nms_scores[:, c]
        valid = sc > score_thr
        keep = _greedy_nms_from_iou(iou_mat, sc, iou_thr, valid)
        all_scores.append(jnp.where(keep, sc, -1.0))
        all_labels.append(jnp.full_like(sc, c, dtype=jnp.float32))
        all_keep.append(keep)
    sc_cat = jnp.concatenate(all_scores)
    lb_cat = jnp.concatenate(all_labels)
    kp_cat = jnp.concatenate(all_keep)

    kk = min(max_out, sc_cat.shape[0])
    top_sc, top_i = jax.lax.top_k(sc_cat, kk)
    idx_in_k = top_i % k
    out = {
        "boxes3d": box3d[idx_in_k],
        "bboxes2d": (distance2bbox(pts, bbox[:, -4:])[idx_in_k]
                     if det_cfg["pred_bbox2d"] else jnp.zeros((kk, 4))),
        "scores": top_sc,
        "labels": lb_cat[top_i].astype(jnp.int32),
        "centers2d": jnp.concatenate([centers2d, bbox[:, 2:3]], 1)[idx_in_k],
        "valid": kp_cat[top_i] & (top_sc > score_thr),
    }
    return out
