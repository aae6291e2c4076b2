"""Prediction saver + visualisation tests."""

import os

import numpy as np


def test_crop_padding_roundtrip():
    from mtt_tpu.evaluation.save_preds import crop_padding
    p = np.zeros((64, 64))
    p[2:62, 7:57] = 1
    out = crop_padding(p, (60, 50), (64, 64))
    assert out.shape == (60, 50)
    assert out.all()


def test_save_task_predictions(tmp_path):
    from mtt_tpu.evaluation.save_preds import save_task_predictions
    preds = np.random.default_rng(0).integers(0, 20, (2, 32, 32)).astype(np.float32)
    metas = [{"img_name": f"im{i}", "img_size": (30, 28)} for i in range(2)]
    save_task_predictions(str(tmp_path), "semseg", preds, metas)
    import cv2
    im = cv2.imread(str(tmp_path / "semseg" / "im0.png"), cv2.IMREAD_UNCHANGED)
    assert im.shape[:2] == (30, 28)


def test_save_det_predictions(tmp_path):
    from mtt_tpu.evaluation.save_preds import save_det_predictions
    import json
    decoded = {
        "boxes3d": np.tile(np.array([[1, 2, 20, 4, 2, 1.5, 0.1, 0.0, 0.5]],
                                    np.float32), (1, 3, 1)).reshape(1, 3, 9),
        "bboxes2d": np.zeros((1, 3, 4), np.float32),
        "scores": np.array([[0.9, 0.8, 0.1]], np.float32),
        "labels": np.array([[0, 2, 1]], np.int32),
        "valid": np.array([[True, True, False]]),
    }
    metas = [{"img_name": "frame0", "camera": {
        "fx": 2262.52, "fy": 2265.30, "u0": 1096.98, "v0": 513.137,
        "sensor_T_ISO_8855": [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 1.2]]}}]
    save_det_predictions(str(tmp_path), decoded, metas)
    with open(tmp_path / "3ddet" / "frame0.json") as f:
        data = json.load(f)
    assert len(data["objects"]) == 2
    assert data["objects"][0]["label"] == "car"
    assert len(data["objects"][0]["3d"]["rotation"]) == 4


def test_render_and_wireframe():
    from mtt_tpu.utils.visualization import draw_boxes3d, render_task
    img = np.zeros((128, 256, 3), np.uint8)
    K = np.array([[200.0, 0, 128], [0, 200, 64], [0, 0, 1]])
    boxes = np.array([[0.0, 0.0, 10.0, 4.0, 2.0, 1.5, 0, 0, 0.3]], np.float32)
    out = draw_boxes3d(img, boxes, K)
    assert out.sum() > 0  # something was drawn
    vis = render_task("semseg", np.zeros((16, 16)), "Cityscapes3D")
    assert vis.shape == (16, 16, 3)
    vis = render_task("depth", np.linspace(0, 10, 256).reshape(16, 16))
    assert vis.dtype == np.uint8
