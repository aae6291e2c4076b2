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
    from mtt_tpu.models.wrappers import build_model
    from mtt_tpu.utils.train_utils import Trainer
    from mtt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
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
