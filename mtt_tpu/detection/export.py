"""Prediction export to the official Cityscapes-3D JSON format.

Equivalent of reference bbox2json (det_tools.py:249-303): decoded S-frame
boxes (center_S, dims LWH, ZXY-Euler rotation) are converted to V-frame
center + quaternion using the camera extrinsics and written per image as
{"objects": [{"2d": {"modal", "amodal"}, "3d": {"center", "dimensions",
"rotation"}, "score", "label"}]}.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from mtt_tpu.detection.cs_geometry import (EVAL_LABELS, box_s_to_v,
                                           euler_zxy_to_quat_s)


def bbox_to_json_objects(boxes3d: np.ndarray, bboxes2d: np.ndarray,
                         scores: np.ndarray, labels: np.ndarray,
                         valid: np.ndarray, camera: Dict) -> List[dict]:
    """Padded decode outputs -> list of official-format object dicts."""
    ext = np.asarray(camera["sensor_T_ISO_8855"], np.float64)
    out = []
    for i in range(len(scores)):
        if not bool(valid[i]):
            continue
        b = np.asarray(boxes3d[i], np.float64)
        q_s = euler_zxy_to_quat_s(b[6:9])
        c_v, q_v = box_s_to_v(b[:3], q_s, ext)
        bb = [float(x) for x in np.asarray(bboxes2d[i])]
        out.append({
            "2d": {"modal": bb, "amodal": bb},
            "3d": {
                "center": [float(x) for x in c_v],
                "dimensions": [float(x) for x in b[3:6]],
                "rotation": [float(x) for x in q_v],
                "format": "CRS_ISO8855",
            },
            "score": float(scores[i]),
            "label": EVAL_LABELS[int(labels[i])],
        })
    return out


def save_image_predictions(save_dir: str, img_name: str, objects: List[dict]):
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, img_name + ".json"), "w") as f:
        json.dump({"objects": objects}, f)
