"""InvPT TransformerNet training: intermediate supervision + BN updates."""

import jax
import numpy as np

from mtt_tpu.config.config import Config


def test_invpt_train_step_with_intermediate_supervision():
    from mtt_tpu.models.wrappers import TransformerNet
    from mtt_tpu.utils.train_utils import Trainer

    tasks = ("semseg", "depth", "edge", "normals")
    num_out = {"semseg": 5, "depth": 1, "edge": 1, "normals": 3}
    p = Config({
        "train_db_name": "NYUD", "ignore_index": 255,
        "intermediate_supervision": True,
        "TASKS": Config(NAMES=list(tasks), NUM_OUTPUT=Config(num_out)),
        "loss_kwargs": {"loss_weights": {t: 1.0 for t in tasks}},
        "optimizer": "adam", "optimizer_kwargs": {"lr": 1e-3},
        "scheduler": "poly", "max_iter": 100, "edge_w": 0.95,
    })
    model = TransformerNet(tasks=tasks, num_outputs=num_out,
                           backbone_name="vitT", embed_dim=32, pred_out=16)
    rng = np.random.default_rng(0)
    B, h, w = 2, 64, 64
    batch = {
        "image": rng.normal(size=(B, h, w, 3)).astype(np.float32),
        "semseg": rng.integers(0, 5, (B, h, w, 1)).astype(np.float32),
        "depth": np.abs(rng.normal(size=(B, h, w, 1))).astype(np.float32) + 0.5,
        "edge": (rng.random((B, h, w, 1)) > 0.9).astype(np.float32),
        "normals": rng.normal(size=(B, h, w, 3)).astype(np.float32),
    }
    trainer = Trainer(p, model)
    state = trainer.init_state(batch)
    bs0 = jax.tree.leaves(state.batch_stats)
    assert len(bs0) > 0, "InvPT decoder must carry BatchNorm running stats"
    dev = {k: jax.device_put(v) for k, v in batch.items()}
    state, losses = trainer.train_step(state, dev, jax.random.PRNGKey(0))
    host = {k: float(v) for k, v in losses.items()}
    # intermediate supervision adds inter_<task> loss components
    for t in tasks:
        assert f"inter_{t}" in host, host.keys()
        assert np.isfinite(host[f"inter_{t}"])
    assert np.isfinite(host["total"])
    state, losses2 = trainer.train_step(state, dev, jax.random.PRNGKey(0))
    assert np.isfinite(float(losses2["total"]))
