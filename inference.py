#!/usr/bin/env python
"""Single-image inference + per-task visualisation CLI.

Equivalent of the reference demo entry (InvPT/inference.py:14-214,
TaskPrompter/inference.py:41-185): load a checkpoint, resize+normalise one
image, run the jitted forward, colormap every task prediction to PNG.

Usage:
    python inference.py --config_exp configs/pascal/taskprompter_vitBp16.yml \
        --image_path img.png [--ckpt_dir DIR] --output_dir out/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def label_colormap(n: int = 256) -> np.ndarray:
    """XOR-bit label colormap (reference vis scheme, inference.py:70-108)."""
    def bitget(v, i):
        return (v >> i) & 1
    cmap = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= bitget(c, 0) << (7 - j)
            g |= bitget(c, 1) << (7 - j)
            b |= bitget(c, 2) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


def visualize(task: str, pred: np.ndarray) -> np.ndarray:
    if task in ("semseg", "human_parts"):
        return label_colormap()[pred.astype(np.int32) % 256]
    if task in ("edge", "sal"):
        return np.repeat(pred.astype(np.uint8)[..., None], 3, -1)
    if task == "normals":
        return pred.astype(np.uint8)
    if task == "depth":
        d = pred.astype(np.float32)
        d = (255 * (d - d.min()) / max(d.max() - d.min(), 1e-6)).astype(np.uint8)
        return np.repeat(d[..., None], 3, -1)
    raise ValueError(task)


# Stuttgart camera calibration used by the reference's single-image 3D-det
# demo when no camera.json accompanies the input image
# (TaskPrompter/inference.py:15-52 — public calibration constants).
STUTTGART_CAMERA = {
    "fx": 2262.52, "fy": 2265.3017905988554,
    "u0": 1096.98, "v0": 513.137,
    "sensor_T_ISO_8855": [
        [0.9990881051503779, -0.01948468779721943,
         -0.03799085532693703, -1.6501524664770573],
        [0.019498764210995674, 0.9998098810245096, 0.0,
         -0.1331288872611436],
        [0.03798363254444427, -0.0007407747301939942,
         0.9992780868764849, -1.2836173638418473]],
}


def infer_3ddet(p, state, out, ori_img, scale_xy, output_dir):
    """Decode 3D detections from the head output and render wireframes on
    the original image (reference demo path, TaskPrompter/inference.py:
    118-164 + vis_pred_for_one_task -> bbox2fig)."""
    import cv2
    import jax
    import numpy as np

    from mtt_tpu.detection.det_model import decode_bboxes_single
    from mtt_tpu.utils.visualization import draw_boxes3d

    cam = STUTTGART_CAMERA
    K = np.array([[cam["fx"], 0, cam["u0"]],
                  [0, cam["fy"], cam["v0"]],
                  [0, 0, 1]], np.float32)
    det_cfg = p.det_cfg
    strides = tuple(det_cfg["strides"])
    cls, bbox, dirp, ctr = out["3ddet"]
    head_0 = ([c[0] for c in cls], [b[0] for b in bbox],
              [d[0] for d in dirp], [c[0] for c in ctr])
    # the demo resizes the input; centers decode back to original pixels
    dec = jax.device_get(jax.jit(
        lambda h: decode_bboxes_single(h, K, det_cfg, strides,
                                       scale_factor=scale_xy))(head_0))
    keep = dec["valid"] & (dec["scores"] > 0.3)
    vis = draw_boxes3d(ori_img, dec["boxes3d"], K, valid=keep)
    path = os.path.join(output_dir, "3ddet.png")
    cv2.imwrite(path, cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
    n = int(np.sum(keep))
    print(f"[inference] wrote {path} ({n} boxes above score 0.3)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_exp", required=True)
    ap.add_argument("--image_path", required=True)
    ap.add_argument("--ckpt_dir", default=None)
    ap.add_argument("--output_dir", default="inference_out")
    args = ap.parse_args()

    import cv2
    import jax

    from mtt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from mtt_tpu.config import create_config
    from mtt_tpu.models.wrappers import build_model
    from mtt_tpu.utils.postprocess import get_output
    from mtt_tpu.utils.train_utils import Trainer

    p = create_config(args.config_exp, {"run_mode": "infer"})
    model = build_model(p)

    ori_img = cv2.cvtColor(cv2.imread(args.image_path), cv2.COLOR_BGR2RGB)
    size = tuple(p.TEST.SCALE)
    img = cv2.resize(ori_img, size[::-1], interpolation=cv2.INTER_CUBIC)
    inp = img.astype(np.float32) / 255.0
    inp = (inp - np.array([0.485, 0.456, 0.406], np.float32)) / \
        np.array([0.229, 0.224, 0.225], np.float32)
    inp = inp[None]

    trainer = Trainer(p, model)
    state = trainer.init_state({"image": inp})
    if args.ckpt_dir:
        restored = trainer.restore_checkpoint(state, args.ckpt_dir)
        if restored is not None:
            state = restored
            print(f"[inference] loaded checkpoint step {int(state.step)}")
        else:
            print(f"[inference] WARNING: no checkpoint found under "
                  f"{args.ckpt_dir} — running with RANDOM weights")
    else:
        print("[inference] WARNING: --ckpt_dir not given — RANDOM weights")

    fwd = jax.jit(lambda s, x: model.apply(
        {"params": s.params, "batch_stats": s.batch_stats}, x, train=False))
    out = fwd(state, inp)

    os.makedirs(args.output_dir, exist_ok=True)
    for t in p.TASKS.NAMES:
        if t == "3ddet":
            scale_xy = np.array([img.shape[1] / ori_img.shape[1],
                                 img.shape[0] / ori_img.shape[0]],
                                np.float32)
            infer_3ddet(p, state, out, ori_img, scale_xy, args.output_dir)
            continue
        pred = np.asarray(jax.device_get(get_output(out[t], t)))[0]
        vis = visualize(t, pred)
        path = os.path.join(args.output_dir, f"{t}.png")
        cv2.imwrite(path, cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
        print(f"[inference] wrote {path}")


if __name__ == "__main__":
    main()
