"""Prediction saving for external evaluation pipelines.

Equivalent of save_model_pred_for_one_task (InvPT/evaluation/
evaluate_utils.py:68-106; TaskPrompter adds the 3ddet JSON export at
:68-154): crops centre-padded predictions back to each sample's original
size, writes edge probability PNGs (consumed by the external SEISM odsF
pipeline), semseg/parts label PNGs, depth .npy, and 3ddet JSONs in the
official Cityscapes format.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

import cv2
import numpy as np


def crop_padding(pred: np.ndarray, orig_size, padded_size) -> np.ndarray:
    """Undo the centre padding of PadImage (evaluate_utils.py:84-99)."""
    oh, ow = int(orig_size[0]), int(orig_size[1])
    ph, pw = padded_size
    dh, dw = max(ph - oh, 0), max(pw - ow, 0)
    return pred[dh // 2:dh // 2 + oh, dw // 2:dw // 2 + ow]


def save_task_predictions(save_dir: str, task: str, preds: np.ndarray,
                          metas: List[Dict], workers: int = 8):
    """preds: post-processed batch (B,H,W[,C]); metas: per-sample dicts with
    img_name/img_size. Parallel PNG writing mirrors the reference's
    ThreadPoolExecutor saver (visualization_utils.py:160-198)."""
    out_dir = os.path.join(save_dir, task)
    os.makedirs(out_dir, exist_ok=True)
    padded = preds.shape[1:3]

    def _save(i):
        meta = metas[i]
        if meta.get("pad"):           # loader batch-padding sample
            return
        p = crop_padding(np.asarray(preds[i]), meta["img_size"], padded)
        name = meta["img_name"]
        if task == "edge":
            cv2.imwrite(os.path.join(out_dir, name + ".png"),
                        p.astype(np.uint8))
        elif task in ("semseg", "human_parts"):
            cv2.imwrite(os.path.join(out_dir, name + ".png"),
                        p.astype(np.uint8))
        elif task == "sal":
            cv2.imwrite(os.path.join(out_dir, name + ".png"),
                        p.astype(np.uint8))
        elif task == "normals":
            cv2.imwrite(os.path.join(out_dir, name + ".png"),
                        cv2.cvtColor(p.astype(np.uint8), cv2.COLOR_RGB2BGR))
        elif task == "depth":
            np.save(os.path.join(out_dir, name + ".npy"), p.astype(np.float32))
        else:
            raise ValueError(task)

    with ThreadPoolExecutor(workers) as pool:
        list(pool.map(_save, range(len(metas))))


def save_det_predictions(save_dir: str, decoded: Dict, metas: List[Dict]):
    """Write per-image official-format 3D detection JSONs
    (TaskPrompter/evaluation/evaluate_utils.py 3ddet branch)."""
    from mtt_tpu.detection.export import (bbox_to_json_objects,
                                          save_image_predictions)
    out_dir = os.path.join(save_dir, "3ddet")
    for i, meta in enumerate(metas):
        objs = bbox_to_json_objects(
            np.asarray(decoded["boxes3d"][i]),
            np.asarray(decoded["bboxes2d"][i]),
            np.asarray(decoded["scores"][i]),
            np.asarray(decoded["labels"][i]),
            np.asarray(decoded["valid"][i]),
            meta["camera"])
        save_image_predictions(out_dir, meta["img_name"], objs)
