"""Visualisation utilities: task colormaps + 3D box wireframes.

Equivalent of TaskPrompter/utils/visualization_utils.py:14-199 (Cityscapes
colormap, per-task prediction rendering, parallel saving) and the
bbox2fig 3D wireframe renderer (det_tools.py:355-478).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

import cv2
import numpy as np

# 19-class Cityscapes train palette (visualization_utils.py:14-39)
CITYSCAPES_PALETTE = np.array([
    [128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
    [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
    [107, 142, 35], [152, 251, 152], [70, 130, 180], [220, 20, 60],
    [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100], [0, 80, 100],
    [0, 0, 230], [119, 11, 32]], np.uint8)


def voc_colormap(n: int = 256) -> np.ndarray:
    """XOR-bit label colormap (InvPT/inference.py:70-108)."""
    cmap = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


def render_task(task: str, pred: np.ndarray, database: str = "PASCALContext"):
    """Post-processed prediction -> RGB uint8 visualisation."""
    if task == "semseg" and database == "Cityscapes3D":
        return CITYSCAPES_PALETTE[pred.astype(np.int32) % 19]
    if task in ("semseg", "human_parts"):
        return voc_colormap()[pred.astype(np.int32) % 256]
    if task in ("edge", "sal"):
        return np.repeat(pred.astype(np.uint8)[..., None], 3, -1)
    if task == "normals":
        return pred.astype(np.uint8)
    if task == "depth":
        d = pred.astype(np.float32)
        valid = (d > 0) & (d < 255)
        lo = d[valid].min() if valid.any() else 0.0
        hi = d[valid].max() if valid.any() else 1.0
        n = np.clip((d - lo) / max(hi - lo, 1e-6) * 255, 0, 255).astype(np.uint8)
        return cv2.applyColorMap(n, cv2.COLORMAP_PLASMA)[..., ::-1]
    raise ValueError(task)


_BOX_EDGES = [(0, 1), (1, 3), (3, 2), (2, 0),     # one face
              (4, 5), (5, 7), (7, 6), (6, 4),     # opposite face
              (0, 4), (1, 5), (2, 6), (3, 7)]


def draw_boxes3d(img: np.ndarray, boxes3d: np.ndarray, K: np.ndarray,
                 valid: Optional[np.ndarray] = None,
                 color=(0, 255, 90)) -> np.ndarray:
    """Wireframe-render S-frame boxes onto an RGB image (bbox2fig
    equivalent, det_tools.py:355-478)."""
    from mtt_tpu.detection.box3d import corners_3d

    out = img.copy()
    corners = np.asarray(corners_3d(boxes3d))      # (N,8,3)
    for n in range(corners.shape[0]):
        if valid is not None and not bool(valid[n]):
            continue
        c = corners[n]
        if (c[:, 2] <= 0.1).any():
            continue
        uv = (K @ c.T).T
        uv = (uv[:, :2] / uv[:, 2:3]).astype(np.int32)
        for a, b in _BOX_EDGES:
            cv2.line(out, tuple(uv[a]), tuple(uv[b]), color, 2)
    return out


def save_visualizations(save_dir: str, task: str, preds: np.ndarray,
                        metas: List[Dict], database: str = "PASCALContext",
                        workers: int = 8):
    import os
    out_dir = os.path.join(save_dir, f"vis_{task}")
    os.makedirs(out_dir, exist_ok=True)

    def _one(i):
        vis = render_task(task, np.asarray(preds[i]), database)
        cv2.imwrite(os.path.join(out_dir, metas[i]["img_name"] + ".png"),
                    cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))

    with ThreadPoolExecutor(workers) as pool:
        list(pool.map(_one, range(len(metas))))
