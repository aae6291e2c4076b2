#!/usr/bin/env python
"""Headline benchmark: TaskPrompter-ViT-L PASCAL 5-task inference imgs/sec/chip.

Matches BASELINE.json's north-star metric. ``vs_baseline`` divides by
3x an estimated A100 PyTorch-eager reference throughput (the reference
publishes no throughput numbers — SURVEY.md §6; estimate documented below).

Env overrides: MTT_BENCH_BACKBONE (TaskPrompter_vitL|TaskPrompter_vitB),
MTT_BENCH_BATCH, MTT_BENCH_STEPS.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Estimated A100 PyTorch reference: ViT-L/16 @512^2 5-task TaskPrompter
# forward ~= 0.7 TFLOP/img; A100 fp16 eager at ~30-40% MXU utilisation
# ~= 110 TFLOP/s -> ~130 imgs/s. The BASELINE north star is 3x that per v5e
# chip at matched metrics.
A100_REF_IMGS_PER_SEC = 130.0
TARGET_MULTIPLIER = 3.0


def main():
    import jax
    import jax.numpy as jnp

    from mtt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from mtt_tpu.models.wrappers import TaskPrompterNet, TransformerNet
    from mtt_tpu.models.vit import build_vit

    model_kind = os.environ.get("MTT_BENCH_MODEL", "taskprompter")
    backbone = os.environ.get("MTT_BENCH_BACKBONE", "TaskPrompter_vitL")
    batch = int(os.environ.get("MTT_BENCH_BATCH", "8"))
    steps = int(os.environ.get("MTT_BENCH_STEPS", "20"))

    tasks = ("semseg", "human_parts", "sal", "edge", "normals")
    num_out = {"semseg": 21, "human_parts": 7, "sal": 2, "edge": 1,
               "normals": 3}
    if model_kind == "taskprompter":
        model = TaskPrompterNet(
            tasks=tasks, num_outputs=num_out, backbone_name=backbone,
            tar_dim=300, final_dim=350, use_ctr=True, chan_nheads=1,
            dtype=jnp.bfloat16)
        label = f"TaskPrompter-{backbone.replace('TaskPrompter_vit', 'ViT-')}"
    elif model_kind == "invpt":
        model = TransformerNet(
            tasks=tasks, num_outputs=num_out, backbone_name="vitL",
            embed_dim=512, pred_out=64, dtype=jnp.bfloat16)
        label = "InvPT-ViT-L"
    elif model_kind == "backbone":
        model = build_vit("vitL", (512, 512), dtype=jnp.bfloat16)
        label = "ViT-L-backbone-only"
    else:
        raise SystemExit(f"unknown MTT_BENCH_MODEL {model_kind}")

    x = jnp.zeros((batch, 512, 512, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=())(
        jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(v, inp):
        out = model.apply(v, inp, train=False)
        # scalar checksum forces full materialisation; device_get of it is a
        # reliable sync point even through remote-dispatch tunnels where
        # block_until_ready can return early
        leaves = jax.tree.leaves(out)
        return jnp.float32(sum(jnp.sum(l.astype(jnp.float32))
                               for l in leaves))

    chk = float(jax.device_get(fwd(variables, x)))  # compile + warm-up
    t0 = time.perf_counter()
    for i in range(steps):
        chk = fwd(variables, x)
    chk = float(jax.device_get(chk))
    dt = time.perf_counter() - t0
    assert np.isfinite(chk)
    imgs_per_sec = steps * batch / dt

    print(json.dumps({
        "metric": f"imgs/sec/chip ({label} PASCAL 5-task "
                  f"inference, bf16, batch {batch})",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec / (TARGET_MULTIPLIER * A100_REF_IMGS_PER_SEC), 4),
    }))


if __name__ == "__main__":
    main()
