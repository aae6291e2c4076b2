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


def _local_rows(x) -> np.ndarray:
    """Host copy of THIS process's rows of a batch-sharded array.

    With nproc > 1 the jitted eval step returns global arrays (global
    batch = local batch x nproc, assembled by
    ``make_array_from_process_local_data``); plain ``x[i]`` indexes
    global row i — rank 0's shard — on every process. The addressable
    shards, concatenated in global-index order, are exactly the rows
    this process's host batch produced (the same order
    ``make_array_from_process_local_data`` consumed them in)."""
    if jax.process_count() == 1 or not hasattr(x, "addressable_shards"):
        return np.asarray(jax.device_get(x))
    shards = sorted(x.addressable_shards,
                    key=lambda s: (s.index[0].start or 0))
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


class DetRecordAccumulator:
    """Per-image detection record builder for the single-pass eval: the
    caller feeds it the 3ddet head outputs already computed by the shared
    test-phase forward (one forward per val image per eval — r2 weak #5
    was a second full pass here) plus the host batch; ``evaluate`` merges
    records across processes and scores once.
    """

    def __init__(self, p, save_dir: Optional[str] = None):
        det_cfg = p.det_cfg
        strides = tuple(det_cfg["strides"])
        self._decode = jax.jit(lambda head_i, K: decode_bboxes_single(
            head_i, K, det_cfg, strides))
        self.save_dir = save_dir
        self.records = []

    def decode_batch(self, head_out, batch):
        """Decode per-image detections from the shared-forward head
        outputs. Yields (local_index, meta, dec, objs) for every
        non-padding local sample; dec is the decoded array dict
        (boxes3d/bboxes2d/scores/labels/valid), objs the official-format
        JSON objects."""
        # pull the PROCESS-LOCAL rows to host first: head_out may be
        # global arrays under multi-process eval, and row i of the local
        # host batch pairs with local (not global) row i
        cls, bbox, dirp, ctr = [[_local_rows(a) for a in group]
                                for group in head_out]
        # meta carries the true local sample count; the device batch may
        # hold extra mesh-padding rows beyond it (pad_batch_to_multiple)
        B = min(len(batch["meta"]), cls[0].shape[0])
        for i in range(B):
            meta = batch["meta"][i]
            if meta.get("pad"):       # loader batch-padding sample
                continue
            K = np.asarray(meta["K_matrix"], np.float32)
            head_i = ([c[i] for c in cls], [b[i] for b in bbox],
                      [d[i] for d in dirp], [c[i] for c in ctr])
            dec = jax.device_get(self._decode(head_i, K))
            objs = bbox_to_json_objects(dec["boxes3d"], dec["bboxes2d"],
                                        dec["scores"], dec["labels"],
                                        dec["valid"], meta["camera"])
            yield i, meta, dec, objs

    def add_batch(self, head_out, batch):
        for i, meta, dec, objs in self.decode_batch(head_out, batch):
            if self.save_dir is not None:
                save_image_predictions(os.path.join(self.save_dir, "3ddet"),
                                       meta["img_name"], objs)
            self.records.append(
                (meta["img_name"], _gt_objects_from_batch(batch, i), objs))

    def evaluate(self) -> Dict:
        """Merge per-process records and score. With nproc > 1 every
        process writes its shard's records to a shared directory, process
        0 scores the union (reference rank-0 file-based eval,
        TaskPrompter/utils/test_utils.py:47-52) and the headline scalars
        are broadcast so every process reports the same merged mDS."""
        import json as _json

        nproc = jax.process_count()
        if nproc == 1:
            return self._score(self.records)

        from jax.experimental import multihost_utils
        merge_dir = self.save_dir or os.environ.get("MTT_DET_MERGE_DIR")
        if merge_dir is None:
            raise ValueError(
                "multi-process detection eval needs a shared save_dir "
                "(or MTT_DET_MERGE_DIR) to merge per-shard records")
        rec_dir = os.path.join(merge_dir, "det_records")
        os.makedirs(rec_dir, exist_ok=True)
        with open(os.path.join(rec_dir,
                               f"rank{jax.process_index()}.json"), "w") as f:
            _json.dump(self.records, f)
        multihost_utils.sync_global_devices("det_record_merge")
        scores = None
        if jax.process_index() == 0:
            merged = []
            for r in range(nproc):
                with open(os.path.join(rec_dir, f"rank{r}.json")) as f:
                    merged.extend(_json.load(f))
            scores = self._score(merged)
        import jax.numpy as jnp
        vals = jnp.zeros((2,), jnp.float32) if scores is None else \
            jnp.asarray([scores["mDetection_Score"], scores["mAP"]],
                        jnp.float32)
        vals = multihost_utils.broadcast_one_to_all(vals)
        if scores is None:
            scores = {"mDetection_Score": float(vals[0]),
                      "mAP": float(vals[1]), "merged_on_process": 0}
        return scores

    @staticmethod
    def _score(records) -> Dict:
        ev = Box3dEvaluator(EVAL_LABELS, min_iou=0.7)
        for name, gt, pred in records:
            ev.add_image(name, gt, pred)
        return ev.evaluate()


def evaluate_detection(p, trainer, state, val_loader,
                       save_dir: Optional[str] = None) -> Dict:
    """Standalone full 3D-det eval pass (own forward over the loader).
    Training-time evals use DetRecordAccumulator inside test_phase
    instead — one shared forward per image."""
    from mtt_tpu.data.loader import device_put_batch

    @jax.jit
    def fwd(state, image):
        out = trainer.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            image, train=False)
        return out["3ddet"]

    acc = DetRecordAccumulator(p, save_dir)
    for batch in val_loader:
        dev = device_put_batch({"image": batch["image"]})
        acc.add_batch(fwd(state, dev["image"]), batch)
    return acc.evaluate()
