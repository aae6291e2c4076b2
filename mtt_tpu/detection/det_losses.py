"""Detection losses in pure jnp: focal, smooth-L1, CE, BCE, GIoU.

Replaces the reference's mmdet-style loss classes and the mmcv CUDA
sigmoid-focal-loss extension (TaskPrompter/detection_toolbox/
det_losses.py:9-725, CUDA call at :271-295) with fused XLA element-wise
math — on TPU the focal loss is a handful of VPU ops fused into the
surrounding graph, no custom kernel needed. All functions take an optional
element-wise ``weight`` and an ``avg_factor`` (mmdet reduction semantics:
sum(loss * weight) / avg_factor).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _reduce(loss, weight=None, avg_factor=None):
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / jnp.maximum(avg_factor, 1e-6)


def sigmoid_focal_loss(logits, labels, num_classes: int, gamma: float = 2.0,
                       alpha: float = 0.25, weight=None, avg_factor=None,
                       loss_weight: float = 1.0):
    """Multi-class sigmoid focal loss; ``labels`` in [0, num_classes] with
    num_classes = background (one-hot of background is all-zeros), matching
    mmdet's convention (det_losses.py:178-231)."""
    logits = logits.astype(jnp.float32)
    target = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    p = jax.nn.sigmoid(logits)
    pt = p * target + (1 - p) * (1 - target)
    focal = (alpha * target + (1 - alpha) * (1 - target)) * (1 - pt) ** gamma
    ce = -(target * jax.nn.log_sigmoid(logits) +
           (1 - target) * jax.nn.log_sigmoid(-logits))
    loss = (focal * ce).sum(-1)
    return loss_weight * _reduce(loss, weight, avg_factor)


def smooth_l1_loss(pred, target, beta: float = 1.0 / 9.0, weight=None,
                   avg_factor=None, loss_weight: float = 1.0):
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return loss_weight * _reduce(loss, weight, avg_factor)


def softmax_ce_loss(logits, labels, weight=None, avg_factor=None,
                    loss_weight: float = 1.0):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot multiply-reduce: per-row class gathers are serial on TPU
    # (see losses/loss_functions.py cross_entropy_loss)
    oh = jax.nn.one_hot(labels.astype(jnp.int32), logits.shape[-1],
                        dtype=logp.dtype)
    nll = -(logp * oh).sum(axis=-1)
    return loss_weight * _reduce(nll, weight, avg_factor)


def binary_ce_loss(logits, targets, weight=None, avg_factor=None,
                   loss_weight: float = 1.0):
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    loss = -(targets * jax.nn.log_sigmoid(logits) +
             (1 - targets) * jax.nn.log_sigmoid(-logits))
    return loss_weight * _reduce(loss, weight, avg_factor)


def giou_loss(pred, target, weight=None, avg_factor=None,
              loss_weight: float = 1.0, eps: float = 1e-7):
    """GIoU on (..., 4) xyxy boxes (det_losses.py:673-725)."""
    px1, py1, px2, py2 = jnp.split(pred.astype(jnp.float32), 4, -1)
    tx1, ty1, tx2, ty2 = jnp.split(target.astype(jnp.float32), 4, -1)
    pa = jnp.maximum(px2 - px1, 0) * jnp.maximum(py2 - py1, 0)
    ta = jnp.maximum(tx2 - tx1, 0) * jnp.maximum(ty2 - ty1, 0)
    ix1, iy1 = jnp.maximum(px1, tx1), jnp.maximum(py1, ty1)
    ix2, iy2 = jnp.minimum(px2, tx2), jnp.minimum(py2, ty2)
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    union = pa + ta - inter + eps
    iou = inter / union
    cx1, cy1 = jnp.minimum(px1, tx1), jnp.minimum(py1, ty1)
    cx2, cy2 = jnp.maximum(px2, tx2), jnp.maximum(py2, ty2)
    carea = (cx2 - cx1) * (cy2 - cy1) + eps
    giou = iou - (carea - union) / carea
    loss = (1 - giou)[..., 0]
    return loss_weight * _reduce(loss, weight, avg_factor)
