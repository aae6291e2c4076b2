"""Optimizer + LR schedule factory (optax).

Equivalent of reference get_optimizer + PolynomialLR
(InvPT/utils/common_config.py:202-224, utils/train_utils.py:83-94):
Adam or SGD, single parameter group, per-iteration polynomial decay
lr * (1 - it/max_iter)^0.9. Torch-Adam style L2 (weight decay added to the
gradient before the moment updates), optional global-norm gradient clipping
(TaskPrompter train_utils.py:49).
"""

from __future__ import annotations

import optax


def poly_schedule(base_lr: float, max_iter: int, power: float = 0.9):
    def sched(step):
        frac = 1.0 - step / max_iter
        return base_lr * (frac ** power)
    return sched


def build_optimizer(p):
    kwargs = p.get("optimizer_kwargs", {})
    base_lr = float(kwargs.get("lr", 1e-4))
    wd = float(kwargs.get("weight_decay", 0.0))
    max_iter = int(p.get("max_iter", 40000))
    sched = poly_schedule(base_lr, max_iter) if p.get("scheduler") == "poly" \
        else base_lr

    chain = []
    clip = p.get("grad_clip_param")
    if clip:
        if isinstance(clip, str):
            import ast
            clip = ast.literal_eval(clip)  # YAML stores a dict literal
        chain.append(optax.clip_by_global_norm(float(clip["max_norm"])))
    if wd:
        chain.append(optax.add_decayed_weights(wd))
    name = p.get("optimizer", "adam")
    if name == "adam":
        chain.append(optax.scale_by_adam())
    elif name == "sgd":
        mom = float(kwargs.get("momentum", 0.9))
        chain.append(optax.trace(decay=mom, nesterov=kwargs.get("nesterov", False)))
    else:
        raise NotImplementedError(name)
    chain.append(optax.scale_by_learning_rate(sched))
    return optax.chain(*chain), sched
