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

    img = cv2.cvtColor(cv2.imread(args.image_path), cv2.COLOR_BGR2RGB)
    size = tuple(p.TEST.SCALE)
    img = cv2.resize(img, size[::-1], interpolation=cv2.INTER_CUBIC)
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
            continue
        pred = np.asarray(jax.device_get(get_output(out[t], t)))[0]
        vis = visualize(t, pred)
        path = os.path.join(args.output_dir, f"{t}.png")
        cv2.imwrite(path, cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
        print(f"[inference] wrote {path}")


if __name__ == "__main__":
    main()
