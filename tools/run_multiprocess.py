#!/usr/bin/env python
"""Real >=2-process jax.distributed run of the CS3D pipeline on CPU.

Validates the multi-process story the 8-virtual-device dryrun cannot:
process-sharded train/val loaders, make_array_from_process_local_data
batch assembly, GSPMD gradient averaging across processes, on-device 2D
meters accumulating globally, and the detection-record merge that makes
every process report ONE merged mDS (detection/det_eval.py).

Parent mode spawns N children of this script, each a separate OS process
with its own jax runtime joined through jax.distributed.initialize.
Process 0 writes MULTIPROC_RUN.json at the repo root.

Usage: python tools/run_multiprocess.py [--nproc 2]
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(rank: int, nproc: int, port: int, out_dir: str):
    import jax
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=rank)
    assert jax.process_count() == nproc, jax.process_count()
    import numpy as np
    from tests.test_cs3d_e2e import cs3d_tiny_config
    from mtt_tpu.models.wrappers import TaskPrompterSwinNet
    from mtt_tpu.utils.train_utils import Trainer, train_phase, test_phase
    from mtt_tpu.data.synthetic import SyntheticMT
    from mtt_tpu.data.loader import MultiTaskLoader, device_put_batch
    from mtt_tpu.parallel.mesh import data_shard_info

    p = cs3d_tiny_config()
    p.det_cfg.test_cfg.nms_pre = 64
    p.det_cfg.test_cfg.max_per_img = 8
    p["save_dir"] = out_dir
    os.makedirs(out_dir, exist_ok=True)
    model = TaskPrompterSwinNet(
        tasks=tuple(p.TASKS.NAMES), num_outputs=dict(p.TASKS.NUM_OUTPUT),
        tar_dim=12, final_dim=20, chan_embed_dim=16, det_cfg=p.det_cfg,
        target_size=(32, 64), embed_dim=16, depths=(1, 1, 1, 1),
        num_heads=(2, 2, 2, 2), window_size=4)

    ds = SyntheticMT(p.TASKS.NAMES, dict(p.TASKS.NUM_OUTPUT), size=(64, 128),
                     length=6, max_boxes=p.det_cfg.max_boxes)
    base_get = ds.__getitem__

    def patched(idx, rng=None):
        s = base_get(idx, rng)
        s["meta"]["camera"] = {
            "fx": 1000.0, "fy": 1000.0, "u0": 64.0, "v0": 32.0,
            "sensor_T_ISO_8855": [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]]}
        # labels at the dd_label_map_size the pipeline trains against
        import cv2
        for k in ("semseg", "depth"):
            s[k] = cv2.resize(s[k][..., 0], (64, 32),
                              interpolation=cv2.INTER_NEAREST)[..., None]
        return s

    ds.__getitem__ = patched
    nshards, shard = data_shard_info()
    assert nshards == nproc and shard == rank
    # global batch 2 = 1 per process; loaders see only their shard
    train_loader = MultiTaskLoader(ds, batch_size=1, shuffle=True,
                                   num_workers=1, num_shards=nshards,
                                   shard_index=shard)
    val_loader = MultiTaskLoader(ds, batch_size=1, shuffle=False,
                                 drop_last=False, num_workers=1,
                                 num_shards=nshards, shard_index=shard)

    trainer = Trainer(p, model)
    sample = next(iter(train_loader))
    state = trainer.init_state(sample)
    import jax.numpy as jnp  # noqa: F401

    # two sharded train steps (GSPMD grad averaging across processes)
    rng = jax.random.PRNGKey(0)
    it = iter(train_loader)
    for _ in range(2):
        batch = device_put_batch(next(it), trainer.data_sharding)
        state, losses = trainer.train_step(state, batch, rng)
    total = float(losses["total"])
    assert np.isfinite(total)

    # sharded eval with global meters + merged detection records
    scores = test_phase(p, trainer, state, val_loader)
    mds = scores["3ddet"]["mDetection_Score"]
    if rank == 0:
        # exactly-once across shards: the merged det records must cover
        # every val image once (6 synthetic images, 2 shards)
        names = []
        for r in range(nproc):
            with open(os.path.join(out_dir, "det_records",
                                   f"rank{r}.json")) as f:
                names += [rec[0] for rec in json.load(f)]
        assert sorted(names) == sorted(set(names)) and len(names) == len(ds), \
            names
        with open(os.path.join(REPO, "MULTIPROC_RUN.json"), "w") as f:
            json.dump({"process_count": jax.process_count(),
                       "global_devices": jax.device_count(),
                       "train_loss": total,
                       "merged_det_records": len(names),
                       "mDetection_Score": mds,
                       "mAP": scores["3ddet"]["mAP"],
                       "semseg_mIoU": scores["semseg"]["mIoU"]}, f, indent=1)
    print(f"[rank {rank}] procs={jax.process_count()} loss={total:.4f} "
          f"merged mDS={mds:.4f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--child-rank", type=int, default=None)
    ap.add_argument("--port", type=int, default=52345)
    ap.add_argument("--out-dir", default="/tmp/mtt_multiproc")
    args = ap.parse_args()

    if args.child_rank is not None:
        child(args.child_rank, args.nproc, args.port, args.out_dir)
        return

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--nproc",
         str(args.nproc), "--child-rank", str(r), "--port", str(args.port),
         "--out-dir", args.out_dir], env=env)
        for r in range(args.nproc)]
    rcs = [pr.wait() for pr in procs]
    assert all(rc == 0 for rc in rcs), rcs
    with open(os.path.join(REPO, "MULTIPROC_RUN.json")) as f:
        print("MULTIPROC_RUN.json:", f.read())


if __name__ == "__main__":
    main()
