"""Multi-task weighted-sum loss scheme.

Equivalent of MultiTaskLoss (InvPT/losses/loss_schemes.py:9-32): per-task
losses combined as total = sum_t w_t * L_t, with optional intermediate
supervision on the InvPT preliminary predictions (loss_schemes.py:25-31).
The TaskPrompter 3ddet route (TaskPrompter/losses/loss_schemes.py:30-35)
is handled by `mtt_tpu.detection.det_model.detection_loss`.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from mtt_tpu.losses.loss_functions import get_loss_fn


def build_criterion(p) -> Callable:
    """Returns criterion(pred, gt) -> dict of per-task losses + 'total'."""
    tasks = tuple(p.TASKS.NAMES)
    weights = {t: float(p["loss_kwargs"]["loss_weights"][t]) for t in tasks}
    inter_sup = bool(p.get("intermediate_supervision", False))
    loss_fns: Dict[str, Callable] = {}
    det_loss_fn = None
    for t in tasks:
        if t == "3ddet":
            from mtt_tpu.detection.det_model import build_detection_criterion
            det_loss_fn = build_detection_criterion(p)
        else:
            loss_fns[t] = get_loss_fn(t, p)

    def criterion(pred, gt):
        out = {}
        total = jnp.float32(0.0)
        for t in tasks:
            if t == "3ddet":
                lt = det_loss_fn(pred[t], gt)
            else:
                lt = loss_fns[t](pred[t], gt[t])
            out[t] = lt
            total = total + weights[t] * lt
        if inter_sup and "inter_preds" in pred:
            for t, v in pred["inter_preds"].items():
                lt = loss_fns[t](v, gt[t])
                out[f"inter_{t}"] = lt
                total = total + weights[t] * lt
        out["total"] = total
        return out

    return criterion
