"""Deterministic synthetic multi-task dataset.

Stands in for PASCAL-Context / NYUD-v2 / Cityscapes-3D when the real data
is not on disk: procedurally generated images and per-task labels with the
same shapes/dtypes/ignore conventions as the real datasets. Used by the
test suite, the overfit integration test (the reference's sanity mechanism,
SURVEY.md §4 item 2), and bench.py.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


class SyntheticMT:
    def __init__(self, tasks: Sequence[str], num_outputs: Dict[str, int],
                 size: Tuple[int, int] = (512, 512), length: int = 64,
                 transform=None, seed: int = 0, max_boxes: int = 64):
        self.tasks = list(tasks)
        self.num_outputs = num_outputs
        self.size = tuple(size)
        self.length = length
        self.transform = transform
        self.seed = seed
        self.max_boxes = max_boxes

    def __len__(self):
        return self.length

    def __getitem__(self, idx, rng: Optional[np.random.Generator] = None):
        g = np.random.default_rng(self.seed * 100003 + idx)
        h, w = self.size
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        phase = g.uniform(0, 6.28, size=3).astype(np.float32)
        img = np.stack([
            127 + 120 * np.sin(xx / (17 + 5 * c) + phase[c]) *
            np.cos(yy / (23 + 3 * c) + phase[c]) for c in range(3)], -1)
        img = img.astype(np.float32)
        sample = {"image": img}
        blob = ((xx - g.uniform(0, w)) ** 2 + (yy - g.uniform(0, h)) ** 2) < \
            g.uniform(min(h, w) / 8, min(h, w) / 2) ** 2
        for t in self.tasks:
            if t in ("semseg", "human_parts"):
                k = self.num_outputs[t]
                lab = (np.floor(xx / w * k) + blob).clip(0, k - 1)
                sample[t] = lab.astype(np.float32)[..., None]
            elif t == "sal":
                sample[t] = blob.astype(np.float32)[..., None]
            elif t == "edge":
                e = np.abs(np.diff(blob.astype(np.float32), axis=0,
                                   prepend=0)) + \
                    np.abs(np.diff(blob.astype(np.float32), axis=1, prepend=0))
                sample[t] = (e > 0).astype(np.float32)[..., None]
            elif t == "normals":
                n = np.stack([np.sin(xx / 31), np.cos(yy / 37),
                              np.ones_like(xx)], -1)
                n /= np.linalg.norm(n, axis=-1, keepdims=True)
                sample[t] = n.astype(np.float32)
            elif t == "depth":
                sample[t] = (1.0 + 5.0 * (np.sin(xx / 41) * np.cos(yy / 43) + 1)
                             ).astype(np.float32)[..., None]
            elif t == "3ddet":
                M = self.max_boxes
                nb = int(g.integers(1, 6))
                det = {
                    "det_bboxes2d": np.zeros((M, 4), np.float32),
                    "det_labels": np.zeros((M,), np.int32),
                    "det_boxes3d": np.zeros((M, 9), np.float32),
                    "det_centers2d": np.zeros((M, 2), np.float32),
                    "det_depths": np.zeros((M,), np.float32),
                    "det_valid": np.zeros((M,), np.float32),
                }
                for i in range(nb):
                    cx2, cy2 = g.uniform(0.2 * w, 0.8 * w), g.uniform(0.3 * h, 0.9 * h)
                    bw, bh = g.uniform(20, 80), g.uniform(15, 60)
                    depth = g.uniform(5, 60)
                    det["det_bboxes2d"][i] = [cx2 - bw / 2, cy2 - bh / 2,
                                              cx2 + bw / 2, cy2 + bh / 2]
                    det["det_labels"][i] = g.integers(0, 6)
                    det["det_boxes3d"][i] = [
                        (cx2 - w / 2) * depth / 1000.0,
                        (cy2 - h / 2) * depth / 1000.0, depth,
                        g.uniform(2, 6), g.uniform(1.5, 2.5), g.uniform(1.2, 3),
                        g.uniform(-0.1, 0.1), g.uniform(-0.1, 0.1),
                        g.uniform(-np.pi, np.pi)]
                    det["det_centers2d"][i] = [cx2, cy2]
                    det["det_depths"][i] = depth
                    det["det_valid"][i] = 1.0
                sample.update(det)
        sample["meta"] = {"img_name": f"synth_{idx:06d}", "img_size": (h, w)}
        if "3ddet" in self.tasks:
            sample["meta"]["K_matrix"] = np.array(
                [[1000.0, 0, w / 2], [0, 1000.0, h / 2], [0, 0, 1]], np.float32)
            # official-format export/eval needs the camera intrinsics +
            # S<-V transform too (detection/export.py); identity vehicle
            # frame for synthetic data
            sample["meta"]["camera"] = {
                "fx": 1000.0, "fy": 1000.0, "u0": w / 2.0, "v0": h / 2.0,
                "sensor_T_ISO_8855": [[1, 0, 0, 0], [0, 1, 0, 0],
                                      [0, 0, 1, 0]]}
        if self.transform is not None:
            sample = self.transform(sample, rng or np.random.default_rng(idx))
        return sample
