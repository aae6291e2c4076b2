"""In-framework Cityscapes-3D detection evaluation driver.

Equivalent of the reference's eval_3ddet + DetMeter flow
(TaskPrompter/detection_toolbox/det_eval.py:20-97, utils/test_utils.py:47-52):
run the model over the val loader, decode fixed-capacity detections per
image, export official-format JSONs, then score with the in-repo
Box3dEvaluator (or the saved JSONs can be fed to the official
cityscapesscripts evaluator offline).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from mtt_tpu.detection.det_model import decode_bboxes_single
from mtt_tpu.detection.eval3d import Box3dEvaluator
from mtt_tpu.detection.export import bbox_to_json_objects, save_image_predictions
from mtt_tpu.detection.cs_geometry import EVAL_LABELS, box_s_to_v, \
    euler_zxy_to_quat_s


def _gt_objects_from_batch(batch, i) -> list:
    """Rebuild evaluator GT records from the padded det_* arrays."""
    out = []
    n = int(batch["det_valid"][i].sum())
    for j in range(batch["det_valid"].shape[1]):
        if not batch["det_valid"][i][j]:
            continue
        b3d = batch["det_boxes3d"][i][j]
        cam = batch["meta"][i]["camera"]
        q_s = euler_zxy_to_quat_s(b3d[6:9])
        c_v, q_v = box_s_to_v(b3d[:3], q_s, cam["sensor_T_ISO_8855"])
        x0, y0, x1, y1 = [float(x) for x in batch["det_bboxes2d"][i][j]]
        out.append({
            "label": EVAL_LABELS[int(batch["det_labels"][i][j])],
            # object dicts carry official-format xywh 2D boxes
            "2d": {"modal": [x0, y0, x1 - x0, y1 - y0]},
            "3d": {"center": [float(x) for x in c_v],
                   "dimensions": [float(x) for x in b3d[3:6]],
                   "rotation": [float(x) for x in q_v]},
        })
    return out


def evaluate_detection(p, trainer, state, val_loader,
                       save_dir: Optional[str] = None) -> Dict:
    """Full 3D-det eval pass. Returns the Box3dEvaluator result dict
    (mDS / mAP / per-class DDTP metrics)."""
    from mtt_tpu.data.loader import device_put_batch

    det_cfg = p.det_cfg
    strides = tuple(det_cfg["strides"])

    @jax.jit
    def fwd(state, image):
        out = trainer.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            image, train=False)
        return out["3ddet"]

    decode = jax.jit(lambda head_i, K: decode_bboxes_single(
        head_i, K, det_cfg, strides))

    ev = Box3dEvaluator(EVAL_LABELS,
                        min_iou=0.7)
    for batch in val_loader:
        dev = device_put_batch({"image": batch["image"]})
        cls, bbox, dirp, ctr = fwd(state, dev["image"])
        B = batch["image"].shape[0]
        for i in range(B):
            meta = batch["meta"][i]
            if meta.get("pad"):       # loader batch-padding sample
                continue
            K = np.asarray(meta["K_matrix"], np.float32)
            head_i = ([c[i] for c in cls], [b[i] for b in bbox],
                      [d[i] for d in dirp], [c[i] for c in ctr])
            dec = jax.device_get(decode(head_i, K))
            objs = bbox_to_json_objects(dec["boxes3d"], dec["bboxes2d"],
                                        dec["scores"], dec["labels"],
                                        dec["valid"], meta["camera"])
            if save_dir is not None:
                save_image_predictions(os.path.join(save_dir, "3ddet"),
                                       meta["img_name"], objs)
            ev.add_image(meta["img_name"], _gt_objects_from_batch(batch, i),
                         objs)
    return ev.evaluate()
