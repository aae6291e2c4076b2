#!/usr/bin/env python
"""Training / full-eval CLI.

Mirror of the reference entry point (InvPT/main.py:32-169 /
TaskPrompter/main.py) with a TPU-native runtime: no torch.distributed
launcher — multi-host attaches via jax.distributed.initialize(); the model
runs as one jitted SPMD program over a `data` mesh.

Usage:
    python main.py --config_exp configs/pascal/taskprompter_vitBp16.yml \
        --run_mode train [--overfit] [--max_iter N]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args():
    ap = argparse.ArgumentParser(description="TPU multi-task training")
    ap.add_argument("--config_exp", required=True)
    ap.add_argument("--run_mode", choices=["train", "infer"], default="train")
    ap.add_argument("--trained_model", default=None)
    ap.add_argument("--overfit", action="store_true",
                    help="64-image overfit sanity mode (reference SURVEY §4)")
    ap.add_argument("--max_iter", type=int, default=None)
    ap.add_argument("--val_interval", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="compute dtype (params stay fp32)")
    ap.add_argument("--debug_eval", action="store_true",
                    help="run a full eval pass before training (the "
                         "reference's DEBUG_FLAG smoke eval, main.py:136-142)")
    ap.add_argument("--vis", action="store_true",
                    help="save per-task visualisations during infer mode "
                         "(reference vis_phase, test_utils.py:57-79)")
    ap.add_argument("--multihost", action="store_true",
                    help="call jax.distributed.initialize() first")
    return ap.parse_args()


def main():
    args = parse_args()
    if args.multihost:
        import jax
        jax.distributed.initialize()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mtt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from mtt_tpu.config import create_config
    from mtt_tpu.models.wrappers import build_model
    from mtt_tpu.parallel.mesh import data_shard_info
    from mtt_tpu.utils import common_config as cc
    from mtt_tpu.utils.logger import install
    from mtt_tpu.utils.train_utils import Trainer, test_phase, train_phase

    p = create_config(args.config_exp, {"run_mode": args.run_mode})
    if args.max_iter:
        p["max_iter"] = args.max_iter
    if args.val_interval:
        p["val_interval"] = args.val_interval

    if jax.process_index() == 0 and args.run_mode != "infer":
        install(os.path.join(p["output_dir"], "log_file.txt"))
    print(f"[main] config {args.config_exp} tasks={p.TASKS.NAMES} "
          f"devices={len(jax.devices())} procs={jax.process_count()}")

    model = build_model(p, dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                        else jnp.float32)
    # trBatch/valBatch are per-device (reference: per-GPU); the loader yields
    # the host-local global batch for the SPMD step
    ndev = jax.local_device_count()
    p["trBatch"] = int(p["trBatch"]) * ndev
    p["valBatch"] = int(p["valBatch"]) * ndev
    train_tf, val_tf = cc.get_transformations(p)
    nshards, shard = data_shard_info()
    train_ds = cc.get_dataset(p, "train", train_tf, overfit=args.overfit)
    val_ds = cc.get_dataset(p, "val", val_tf, overfit=args.overfit)
    train_loader = cc.get_train_dataloader(p, train_ds, nshards, shard)
    val_loader = cc.get_test_dataloader(p, val_ds, nshards, shard)

    trainer = Trainer(p, model)
    t0 = time.time()
    sample = next(iter(val_loader))
    print(f"[main] first val batch ready in {time.time() - t0:.1f}s")
    t0 = time.time()
    state = trainer.init_state(sample, seed=args.seed)
    print(f"[main] state initialised in {time.time() - t0:.1f}s")

    restored = trainer.restore_checkpoint(state, p["checkpoint"])
    if restored is not None:
        state = restored
        print(f"[main] resumed from step {int(state.step)}")

    if args.run_mode == "train":
        if args.debug_eval:
            print("[main] debug smoke eval before training")
            print(json.dumps(test_phase(p, trainer, state, val_loader)))
        t0 = time.time()
        state, _ = train_phase(p, trainer, state, train_loader, val_loader,
                               rng=jax.random.PRNGKey(args.seed))
        print(f"[main] training done in {time.time() - t0:.1f}s")
    else:
        # test_phase runs the official 3D-det evaluation itself when the
        # task is configured (reference test_utils.py:47-52)
        scores = test_phase(p, trainer, state, val_loader)
        if args.vis:
            from mtt_tpu.data.loader import device_put_batch
            from mtt_tpu.utils.postprocess import get_output
            from mtt_tpu.utils.visualization import save_visualizations
            fwd = jax.jit(lambda s, x: {
                t: get_output(o, t) for t, o in trainer.model.apply(
                    {"params": s.params, "batch_stats": s.batch_stats},
                    x, train=False).items()
                if t in trainer.meter.tasks})
            for batch in val_loader:
                dev = device_put_batch({"image": batch["image"]})
                outs = jax.device_get(fwd(state, dev["image"]))
                for t, pred in outs.items():
                    save_visualizations(p["save_dir"], t, pred, batch["meta"],
                                        database=p["train_db_name"])
        print(json.dumps(scores, indent=2))


if __name__ == "__main__":
    main()
