"""Detection toolbox tests: FPN/FCOS3D shapes, target assignment,
loss finiteness/grads, decode pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtt_tpu.detection.det_params import default_det_params


def small_det_cfg():
    cfg = default_det_params(num_classes=3)
    cfg.strides = (8, 16, 32, 32, 64)
    cfg.max_boxes = 8
    return cfg


def _feats(B=1, h=32, w=64, c=64, n=4):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        out.append(jnp.asarray(rng.normal(
            size=(B, h // 2 ** i, w // 2 ** i, c)).astype(np.float32)))
    return out


def test_fpn_levels_and_shapes():
    from mtt_tpu.detection.fpn import FPN
    fpn = FPN(out_channels=32, num_outs=5)
    feats = _feats()
    v = fpn.init(jax.random.PRNGKey(0), feats)
    outs = fpn.apply(v, feats)
    assert len(outs) == 5
    assert outs[0].shape == (1, 32, 64, 32)
    assert outs[4].shape == (1, 2, 4, 32)


def test_fcos3d_head_outputs():
    from mtt_tpu.detection.fcos3d_head import DetectionHead
    cfg = small_det_cfg()
    cfg.feat_channels = 32
    cfg.cls_branch = (32, 16)
    cfg.reg_branch = ((32,),) * 5
    cfg.dir_branch = (32,)
    cfg.centerness_branch = (32,)
    cfg.norm_groups = 8
    cfg.neck.out_channels = 32
    head = DetectionHead(det_cfg=cfg)
    feats = _feats()
    v = head.init(jax.random.PRNGKey(0), feats)
    cls, bbox, dirp, ctr = head.apply(v, feats)
    assert len(cls) == 5
    assert cls[0].shape[-1] == 3
    assert bbox[0].shape[-1] == 13
    assert dirp[0].shape[-1] == 6
    assert ctr[0].shape[-1] == 1
    # depth and size channels must be positive (exp-activated)
    assert float(bbox[0][..., 2].min()) > 0
    assert float(bbox[0][..., 3:6].min()) > 0


def _gt_batch(B=2, M=8):
    rng = np.random.default_rng(1)
    valid = np.zeros((B, M), np.float32)
    valid[0, :3] = 1  # second image has NO boxes (label-less sample case)
    cx = rng.uniform(50, 400, (B, M)).astype(np.float32)
    cy = rng.uniform(30, 200, (B, M)).astype(np.float32)
    return {
        "det_bboxes2d": np.stack([cx - 20, cy - 15, cx + 20, cy + 15],
                                 -1).astype(np.float32),
        "det_labels": rng.integers(0, 3, (B, M)).astype(np.int32),
        "det_boxes3d": np.concatenate([
            rng.uniform(-5, 5, (B, M, 3)), rng.uniform(1, 4, (B, M, 3)),
            rng.uniform(-1, 1, (B, M, 3))], -1).astype(np.float32),
        "det_centers2d": np.stack([cx, cy], -1),
        "det_depths": rng.uniform(5, 50, (B, M)).astype(np.float32),
        "det_valid": valid,
    }


def test_target_assignment_marks_positives():
    from mtt_tpu.detection.det_model import (get_targets_single, level_points)
    cfg = small_det_cfg()
    points, strides_pt, lvl = level_points([(32, 64), (16, 32), (8, 16),
                                            (8, 16), (4, 8)], cfg.strides)
    rr = jnp.asarray(cfg.regress_ranges, jnp.float32)
    gt = {k.replace("det_", ""): jnp.asarray(v[0])
          for k, v in _gt_batch().items()}
    labels, tgt, ctr = get_targets_single(
        points, strides_pt, rr[lvl, 0], rr[lvl, 1], gt,
        {"num_classes": 3, "center_sample_radius": 1.5,
         "centerness_alpha": 2.5, "norm_on_bbox": True, "pred_bbox2d": True})
    pos = np.asarray(labels) < 3
    assert pos.sum() > 0
    assert tgt.shape == (points.shape[0], 13)
    assert float(ctr[pos].min()) > 0 and float(ctr[pos].max()) <= 1.0


def test_detection_loss_finite_and_differentiable():
    from mtt_tpu.detection.det_model import detection_loss
    from mtt_tpu.detection.fcos3d_head import DetectionHead
    cfg = small_det_cfg()
    cfg.feat_channels = 32
    cfg.cls_branch = (32, 16)
    cfg.reg_branch = ((32,),) * 5
    cfg.dir_branch = (32,)
    cfg.centerness_branch = (32,)
    cfg.norm_groups = 8
    cfg.neck.out_channels = 32
    head = DetectionHead(det_cfg=cfg)
    feats = _feats(B=2)
    v = head.init(jax.random.PRNGKey(0), feats)
    batch = {k: jnp.asarray(x) for k, x in _gt_batch().items()}

    def loss_fn(params):
        out = head.apply({"params": params["params"]}, feats)
        total, comps = detection_loss(out, batch, cfg, cfg.strides)
        return total

    total, grads = jax.value_and_grad(loss_fn)(dict(v))
    assert np.isfinite(float(total))
    gnorm = sum(float((g ** 2).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_decode_pipeline_shapes():
    from mtt_tpu.detection.det_model import decode_bboxes_single
    cfg = small_det_cfg()
    cfg.test_cfg.nms_pre = 64
    cfg.test_cfg.max_per_img = 16
    rng = np.random.default_rng(2)
    sizes = [(8, 16), (4, 8), (2, 4), (2, 4), (1, 2)]
    cls = [jnp.asarray(rng.normal(size=(h, w, 3)).astype(np.float32))
           for h, w in sizes]
    bbox = [jnp.asarray(np.abs(rng.normal(size=(h, w, 13))).astype(np.float32))
            for h, w in sizes]
    dirp = [jnp.asarray(rng.normal(size=(h, w, 6)).astype(np.float32))
            for h, w in sizes]
    ctr = [jnp.asarray(rng.normal(size=(h, w, 1)).astype(np.float32))
           for h, w in sizes]
    K = jnp.asarray([[500.0, 0, 64], [0, 500, 32], [0, 0, 1]], jnp.float32)
    out = decode_bboxes_single((cls, bbox, dirp, ctr), K, cfg, cfg.strides)
    assert out["boxes3d"].shape == (16, 9)
    assert out["scores"].shape == (16,)
    assert out["valid"].dtype == bool
    assert np.isfinite(np.asarray(out["boxes3d"])).all()
