"""Losses + meters: golden-value tests vs hand-computed / torch-free refs."""

import jax.numpy as jnp
import numpy as np
import pytest

from mtt_tpu.losses.loss_functions import (balanced_bce_loss,
                                           cross_entropy_loss, depth_l1_loss,
                                           l1_loss)


def test_cross_entropy_ignore():
    logits = jnp.array([[[[10.0, 0.0], [0.0, 10.0]],
                         [[10.0, 0.0], [0.0, 10.0]]]])  # (1,2,2,2)
    label = jnp.array([[[0, 1], [255, 255]]])
    loss = cross_entropy_loss(logits, label)
    # both valid pixels predicted correctly with margin 10
    assert float(loss) < 1e-3
    label_wrong = jnp.array([[[1, 0], [255, 255]]])
    assert float(cross_entropy_loss(logits, label_wrong)) > 5.0


def test_cross_entropy_matches_manual_mean():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    label = rng.integers(0, 3, size=(2, 4, 4))
    label[0, 0, :] = 255
    loss = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(label)))
    # manual
    x = logits - logits.max(-1, keepdims=True)
    logp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    valid = label != 255
    nll = -np.take_along_axis(logp, np.where(valid, label, 0)[..., None], -1)[..., 0]
    ref = nll[valid].mean()
    assert abs(loss - ref) < 1e-5


def test_balanced_bce_weighting():
    # 3 neg, 1 pos -> w = 0.75; loss scaled by (1-w)
    logits = jnp.zeros((1, 2, 2, 1))
    label = jnp.array([[[1.0, 0.0], [0.0, 0.0]]])[..., None]
    loss = float(balanced_bce_loss(logits, label))
    # manual: per-pixel BCE at logit 0 = log(2); pos weighted 0.75/0.25=3
    ref = (3 * np.log(2) + 3 * np.log(2)) / 4 * 0.25
    assert abs(loss - ref) < 1e-5


def test_l1_normalize_and_mask():
    pred = jnp.array([[[[3.0, 0.0, 0.0]]]])  # normalizes to (1,0,0)
    label = jnp.array([[[[1.0, 0.0, 0.0]]]])
    assert float(l1_loss(pred, label, normalize=True)) < 1e-6
    label_ign = jnp.full((1, 1, 1, 3), 255.0)
    assert float(l1_loss(pred, label_ign, normalize=True)) == 0.0


def test_depth_loss_invalid_area():
    pred = jnp.ones((1, 2, 2, 1))
    gt = jnp.array([[[2.0, -1.0], [255.0, 2.0]]])[..., None]
    loss = float(depth_l1_loss(pred, gt, ignore_invalid_area=True))
    assert abs(loss - 1.0) < 1e-6


def test_confusion_meter_miou():
    from mtt_tpu.evaluation.meters import ConfusionMeter
    m = ConfusionMeter(3)
    s = m.init()
    pred = jnp.array([[[0, 1], [2, 2]]])
    gt = jnp.array([[[0, 1], [2, 255]]])
    s = m.update(s, pred, gt)
    score = m.score(s)
    assert abs(score["mIoU"] - 1.0) < 1e-6
    s = m.update(s, jnp.array([[[1, 1], [1, 1]]]), jnp.array([[[0, 0], [0, 0]]]))
    assert m.score(s)["mIoU"] < 1.0


def test_normals_meter_zero_error():
    from mtt_tpu.evaluation.meters import NormalsMeter
    m = NormalsMeter()
    s = m.init()
    gt = np.zeros((1, 4, 4, 3), np.float32)
    gt[..., 0] = 1.0
    pred255 = (gt + 1.0) * 255 / 2.0
    s = m.update(s, jnp.asarray(pred255), jnp.asarray(gt))
    assert m.score(s)["mean"] < 1e-3


def test_normals_meter_90deg():
    from mtt_tpu.evaluation.meters import NormalsMeter
    m = NormalsMeter()
    s = m.init()
    gt = np.zeros((1, 2, 2, 3), np.float32); gt[..., 0] = 1.0
    pr = np.zeros((1, 2, 2, 3), np.float32); pr[..., 1] = 1.0
    s = m.update(s, jnp.asarray((pr + 1) * 255 / 2), jnp.asarray(gt))
    assert abs(m.score(s)["mean"] - 90.0) < 0.5


def test_saliency_meter_perfect():
    from mtt_tpu.evaluation.meters import SaliencyMeter
    m = SaliencyMeter()
    s = m.init()
    gt = np.zeros((1, 8, 8), np.float32); gt[0, :4] = 1
    pred = gt * 255.0
    s = m.update(s, jnp.asarray(pred), jnp.asarray(gt))
    assert abs(m.score(s)["maxF"] - 1.0) < 1e-6


def test_depth_meter_rmse():
    from mtt_tpu.evaluation.meters import DepthMeter
    m = DepthMeter()
    s = m.init()
    gt = np.full((1, 4, 4), 2.0, np.float32)
    pred = np.full((1, 4, 4), 3.0, np.float32)
    s = m.update(s, jnp.asarray(pred), jnp.asarray(gt))
    sc = m.score(s)
    assert abs(sc["rmse"] - 1.0) < 1e-5
    assert abs(sc["abs_rel"] - 0.5) < 1e-5


def test_get_output_shapes():
    from mtt_tpu.utils.postprocess import get_output
    x = jnp.zeros((2, 8, 8, 21))
    assert get_output(x, "semseg").shape == (2, 8, 8)
    assert get_output(jnp.zeros((2, 8, 8, 2)), "sal").shape == (2, 8, 8)
    assert get_output(jnp.zeros((2, 8, 8, 1)), "edge").shape == (2, 8, 8)
    n = get_output(jnp.ones((2, 8, 8, 3)), "normals")
    assert n.shape == (2, 8, 8, 3)
    assert float(jnp.abs(n - (1 / np.sqrt(3) + 1) * 255 / 2).max()) < 1e-3
