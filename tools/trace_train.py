#!/usr/bin/env python
"""Profile the TaskPrompter-ViT-L train step (fwd+bwd+adam) per-op.

Usage: python tools/trace_train.py [--steps 3] [--top 20]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import tempfile


def capture(tdir, steps):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mtt_tpu.config import create_config
    if os.environ.get("MTT_BENCH_MODEL") == "swin":
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools"))
        import bench_all
        import time as _t
        import jax as _j
        # reuse the harness: run its timed loop under the profiler
        import types
        def run():
            from mtt_tpu.utils.cache import enable_compilation_cache
            enable_compilation_cache()
            bench_all.bench_train_step_cs3d(steps=2)
        # simpler: inline profile around a fresh state
        from mtt_tpu.models.wrappers import build_model
        from mtt_tpu.utils.train_utils import Trainer
        REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        p = create_config(os.path.join(REPO, "configs/cityscapes3d/"
                                       "taskprompter_swinB.yml"),
                          {"run_mode": "train"})
        model = build_model(p, dtype=jnp.bfloat16)
        B, h, w = 1, 1024, 2048
        dh, dw = p["dd_label_map_size"]
        mb = p.det_cfg.max_boxes
        rng = np.random.default_rng(0)
        batch = {
            "image": rng.normal(size=(B, h, w, 3)).astype(np.float32),
            "semseg": rng.integers(0, 19, (B, dh, dw, 1)).astype(np.float32),
            "depth": np.abs(rng.normal(size=(B, dh, dw, 1))).astype(np.float32),
            "det_boxes3d": rng.normal(size=(B, mb, 9)).astype(np.float32),
            "det_bboxes2d": np.abs(rng.normal(size=(B, mb, 4)) * 100).astype(np.float32),
            "det_labels": rng.integers(0, 6, (B, mb)).astype(np.int32),
            "det_centers2d": np.abs(rng.normal(size=(B, mb, 2)) * 100).astype(np.float32),
            "det_depths": np.abs(rng.normal(size=(B, mb))).astype(np.float32),
            "det_valid": (rng.random((B, mb)) > 0.5).astype(np.float32),
        }
        trainer = Trainer(p, model)
        state = trainer.init_state(batch)
        key = jax.random.PRNGKey(0)
        batch = jax.device_put(batch, trainer.data_sharding)
        jax.block_until_ready(batch["image"])
        state, losses = trainer.train_step(state, batch, key)
        float(jax.device_get(losses["total"]))
        jax.profiler.start_trace(tdir)
        for _ in range(steps):
            state, losses = trainer.train_step(state, batch, key)
        float(jax.device_get(losses["total"]))
        jax.profiler.stop_trace()
        return
    from mtt_tpu.models.wrappers import build_model
    from mtt_tpu.utils.train_utils import Trainer
    from mtt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.environ.get("MTT_BENCH_MODEL") == "invpt":
        # InvPT-ViT-L NYUD train step — same workload as
        # tools/bench_all.py:bench_train_step_invpt_nyud
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from bench_all import _train_batch_for
        p = create_config(os.path.join(REPO, "configs/nyud/"
                                       "invpt_vitLp16.yml"),
                          {"run_mode": "train"})
        model = build_model(p, dtype=jnp.bfloat16)
        batch = _train_batch_for(p, 2, 448, 576, np.random.default_rng(0))
        trainer = Trainer(p, model)
        state = trainer.init_state(batch)
        key = jax.random.PRNGKey(0)
        batch = jax.device_put(batch, trainer.data_sharding)
        jax.block_until_ready(batch["image"])
        state, losses = trainer.train_step(state, batch, key)
        jax.block_until_ready(losses["total"])
        jax.profiler.start_trace(tdir)
        for _ in range(steps):
            state, losses = trainer.train_step(state, batch, key)
        float(jax.device_get(losses["total"]))
        jax.profiler.stop_trace()
        return
    p = create_config(os.path.join(REPO, "configs/pascal/"
                                   "taskprompter_vitLp16.yml"),
                      {"run_mode": "train"})
    model = build_model(p, dtype=jnp.bfloat16)
    B, h, w = 2, 512, 512
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(B, h, w, 3)).astype(np.float32),
        "semseg": rng.integers(0, 21, (B, h, w, 1)).astype(np.float32),
        "human_parts": rng.integers(0, 7, (B, h, w, 1)).astype(np.float32),
        "sal": (rng.random((B, h, w, 1)) > 0.5).astype(np.float32),
        "edge": (rng.random((B, h, w, 1)) > 0.9).astype(np.float32),
        "normals": rng.normal(size=(B, h, w, 3)).astype(np.float32),
    }
    trainer = Trainer(p, model)
    state = trainer.init_state(batch)
    key = jax.random.PRNGKey(0)
    batch = jax.device_put(batch, trainer.data_sharding)
    jax.block_until_ready(batch["image"])
    state, losses = trainer.train_step(state, batch, key)
    jax.block_until_ready(losses["total"])
    jax.profiler.start_trace(tdir)
    for _ in range(steps):
        state, losses = trainer.train_step(state, batch, key)
    float(jax.device_get(losses["total"]))
    jax.profiler.stop_trace()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--dir", default=None)
    ap.add_argument("--report-only", action="store_true")
    ap.add_argument("--cat", default=None)
    args = ap.parse_args()
    tdir = args.dir or tempfile.mkdtemp(prefix="mtt_trace_train_")
    if not args.report_only:
        capture(tdir, args.steps)
    from trace_ops import report
    report(tdir, args.steps, args.top, args.cat)
    print("trace dir:", tdir)
