#!/usr/bin/env python
"""Convert pretrained weights into framework checkpoints.

Two sources (reference weight flows, SURVEY.md §5 checkpoint/resume):
  * Google ViT .npz (the reference's backbone pretraining source,
    vit.py:410-488) -> backbone params inside a fresh orbax checkpoint;
  * released PyTorch .pth.tar full-model checkpoints -> backbone subtree
    mapped (decoder/head mapping: next round).

Usage:
  python tools/convert_checkpoint.py --config configs/pascal/taskprompter_vitBp16.yml \
      --npz ViT-B_16.npz --out work_dirs/converted_ckpt
  python tools/convert_checkpoint.py --config ... --torch model_best.pth.tar --out DIR
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--npz", default=None)
    ap.add_argument("--torch", dest="torch_path", default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    import numpy as np

    from mtt_tpu.config import create_config
    from mtt_tpu.models.wrappers import build_model
    from mtt_tpu.models import convert as C
    from mtt_tpu.utils.train_utils import Trainer

    p = create_config(args.config, {"run_mode": "infer"})
    model = build_model(p)
    h, w = p.TEST.SCALE
    x = np.zeros((1, h, w, 3), np.float32)
    trainer = Trainer(p, model)
    state = trainer.init_state({"image": x})
    params = jax.device_get(state.params)

    spec_depth = {"vitL": 24, "vitB": 12,
                  "TaskPrompter_vitL": 24, "TaskPrompter_vitB": 12}
    depth = spec_depth.get(p["backbone"], 12)
    grid = (h // 16, w // 16)

    bb = dict(params["backbone"])
    if args.npz:
        if p["model"] == "TaskPrompter":
            bb = C.load_vit_npz_taskprompter(args.npz, bb, depth, grid)
        else:
            bb = C.load_vit_npz(args.npz, bb, depth, grid)
        print(f"[convert] loaded npz backbone from {args.npz}")
    elif args.torch_path:
        import torch
        from mtt_tpu.models.convert_torch import convert_full_checkpoint
        sd = torch.load(args.torch_path, map_location="cpu",
                        weights_only=False)
        sd = sd.get("model", sd)
        sd = {k.replace("module.", ""): np.asarray(v) for k, v in sd.items()}
        variables = {"params": params,
                     "batch_stats": jax.device_get(state.batch_stats)}
        kind = p["model"]
        if kind == "TaskPrompter" and "swin" in p["backbone"].lower():
            kind = "TaskPrompterSwin"
        variables = convert_full_checkpoint(
            sd, variables, kind, list(p.TASKS.NAMES), depth,
            use_ctr=bool(p.get("use_ctr", False)))
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        trainer.save_checkpoint(state, args.out)
        print(f"[convert] mapped FULL torch checkpoint ({len(sd)} keys) "
              f"from {args.torch_path}; wrote {args.out}")
        return
    else:
        raise SystemExit("give --npz or --torch")

    params = dict(params)
    params["backbone"] = bb
    state = state.replace(params=params)
    trainer.save_checkpoint(state, args.out)
    print(f"[convert] wrote checkpoint to {args.out}")


if __name__ == "__main__":
    main()
