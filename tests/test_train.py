"""Training-engine tests: jitted train step under an 8-device DP mesh,
loss decrease on synthetic overfit, checkpoint roundtrip, config parsing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtt_tpu.config.config import Config


def tiny_config(tmp_path=None):
    tasks = ("semseg", "depth", "edge", "normals")
    p = Config({
        "train_db_name": "NYUD", "val_db_name": "NYUD",
        "ignore_index": 255, "intermediate_supervision": False,
        "TASKS": Config(NAMES=list(tasks),
                        NUM_OUTPUT=Config({"semseg": 5, "depth": 1,
                                           "edge": 1, "normals": 3})),
        "loss_kwargs": {"loss_weights": {t: 1.0 for t in tasks}},
        "optimizer": "adam", "optimizer_kwargs": {"lr": 1e-3},
        "scheduler": "poly", "max_iter": 200, "edge_w": 0.95,
        "trBatch": 8, "valBatch": 8, "nworkers": 2,
        "TRAIN": Config(SCALE=(64, 64)), "TEST": Config(SCALE=(64, 64)),
    })
    return p


def _batch(B=8, h=64, w=64):
    rng = np.random.default_rng(0)
    return {
        "image": rng.normal(size=(B, h, w, 3)).astype(np.float32),
        "semseg": rng.integers(0, 5, size=(B, h, w, 1)).astype(np.float32),
        "depth": np.abs(rng.normal(size=(B, h, w, 1))).astype(np.float32) + 0.5,
        "edge": (rng.random((B, h, w, 1)) > 0.9).astype(np.float32),
        "normals": rng.normal(size=(B, h, w, 3)).astype(np.float32),
    }


def _model(p):
    from mtt_tpu.models.wrappers import TaskPrompterNet
    return TaskPrompterNet(
        tasks=tuple(p.TASKS.NAMES),
        num_outputs=dict(p.TASKS.NUM_OUTPUT),
        backbone_name="TaskPrompter_vitT", tar_dim=24, final_dim=28,
        use_ctr=False)


def test_train_step_decreases_loss_dp8():
    from mtt_tpu.parallel.mesh import make_mesh
    from mtt_tpu.utils.train_utils import Trainer

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    p = tiny_config()
    trainer = Trainer(p, _model(p), mesh=make_mesh(8))
    batch = _batch()
    state = trainer.init_state(batch)
    dev = {k: jax.device_put(v, trainer.data_sharding) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)
    state, l0 = trainer.train_step(state, dev, rng)  # state is donated
    l0 = jax.device_get(l0)
    for _ in range(8):
        state, losses = trainer.train_step(state, dev, rng)
    assert float(losses["total"]) < float(l0["total"])
    assert np.isfinite(float(losses["total"]))


def test_dp8_grads_match_single_device():
    """DP-8 numerical equivalence: the sharded step's loss AND gradients
    must equal a single-device computation on the identical global batch
    (the DDP grad-allreduce contract, InvPT/main.py:89) within fp
    reduction-order tolerance — liveness/finiteness alone cannot catch a
    sharding bug. (Adam-updated params are NOT compared: g/(|g|+eps)
    amplifies 1e-10-scale grad noise on near-zero bias grads into
    O(lr) param drift, measured and understood.)"""
    from mtt_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
    from mtt_tpu.losses.loss_schemes import build_criterion

    assert len(jax.devices()) >= 8
    p = tiny_config()
    model = _model(p)
    crit = build_criterion(p)
    batch = _batch()
    rng = jax.random.PRNGKey(7)

    def loss_fn(params, bstats, b):
        out, _ = model.apply(
            {"params": params, "batch_stats": bstats}, b["image"],
            train=True, mutable=["batch_stats"], rngs={"dropout": rng})
        return crit(out, b)["total"]

    results = []
    for n_dev in (8, 1):
        mesh = make_mesh(n_dev)
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), batch["image"], train=False)
        variables = jax.device_put(variables, replicated(mesh))
        dev = {k: jax.device_put(v, batch_sharding(mesh))
               for k, v in batch.items()}
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
            variables["params"], variables.get("batch_stats", {}), dev)
        results.append((float(loss), jax.device_get(grads)))
    (l8, g8), (l1, g1) = results
    assert l8 == pytest.approx(l1, rel=1e-5)
    for a, b in zip(jax.tree.leaves(g8), jax.tree.leaves(g1)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        tol = 1e-6 + 1e-4 * max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() <= tol, \
            f"grad diff {np.abs(a - b).max()} > {tol}"


def _assert_dp8_grads_match(model, p, batch, rel=1e-5, tol_scale=1e-4):
    """Shared DP-8-vs-1-device loss+grad equivalence harness (the DDP
    grad-allreduce contract, InvPT/main.py:89)."""
    from mtt_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
    from mtt_tpu.losses.loss_schemes import build_criterion

    assert len(jax.devices()) >= 8
    crit = build_criterion(p)
    rng = jax.random.PRNGKey(7)

    def loss_fn(params, bstats, b):
        out, _ = model.apply(
            {"params": params, "batch_stats": bstats}, b["image"],
            train=True, mutable=["batch_stats"], rngs={"dropout": rng})
        return crit(out, b)["total"]

    results = []
    for n_dev in (8, 1):
        mesh = make_mesh(n_dev)
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), batch["image"], train=False)
        variables = jax.device_put(variables, replicated(mesh))
        dev = {k: jax.device_put(v, batch_sharding(mesh))
               for k, v in batch.items() if hasattr(v, "shape")}
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
            variables["params"], variables.get("batch_stats", {}), dev)
        results.append((float(loss), jax.device_get(grads)))
    (l8, g8), (l1, g1) = results
    assert l8 == pytest.approx(l1, rel=rel)
    # tolerance keyed to the GLOBAL grad scale: a real sharding bug
    # (shard mispairing, per-shard BN moments) produces O(10%+) diffs on
    # the large leaves; per-leaf relative tolerances on near-zero-max
    # leaves only chase fp32 reduction-order noise (proven noise: the
    # diff collapses ~100x under JAX_ENABLE_X64)
    gscale = max(float(np.abs(np.asarray(b)).max())
                 for b in jax.tree.leaves(g1))
    tol = 1e-6 + tol_scale * max(gscale, 1e-3)
    for a, b in zip(jax.tree.leaves(g8), jax.tree.leaves(g1)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert np.abs(a - b).max() <= tol, \
            f"grad diff {np.abs(a - b).max()} > {tol}"


def test_dp8_grads_match_single_device_invpt():
    """DP-8 grad equivalence through the BatchNorm-everywhere InvPT
    decoder: under GSPMD the batch moments are GLOBAL (the SyncBN
    contract, InvPT/models/transformers/invpt.py:14) — a per-shard-
    moments bug would show up as an 8-vs-1-device grad difference, which
    the TaskPrompter-only test cannot catch (it has no BN).

    Tolerance note: BN amplifies fp32 reduction-order noise (moments are
    partial-sum-then-combine under DP-8 vs one flat reduction on 1
    device). Measured: max grad diff 5.7e-5 in f32 collapses ~100x to
    6e-7 when the same comparison runs under JAX_ENABLE_X64 — i.e. the
    difference is rounding, not a moments/sharding bug (a per-shard-
    moments bug would persist at any precision)."""
    from mtt_tpu.models.wrappers import TransformerNet

    tasks = ("semseg", "depth", "edge", "normals")
    p = tiny_config()
    p["intermediate_supervision"] = True
    model = TransformerNet(tasks=tasks,
                           num_outputs=dict(p.TASKS.NUM_OUTPUT),
                           backbone_name="vitT", embed_dim=32, pred_out=16)
    _assert_dp8_grads_match(model, p, _batch(), rel=1e-4, tol_scale=4e-3)


def test_dp8_grads_match_single_device_swin_det():
    """DP-8 grad equivalence through the Swin backbone + FCOS3D detection
    loss path (padded GT, per-sample target assignment, label-less
    masking) — exactly the per-sample-pairing territory where the r3
    det-eval mispairing bug lived."""
    from tests.test_cs3d_e2e import cs3d_tiny_config
    from mtt_tpu.models.wrappers import TaskPrompterSwinNet
    from mtt_tpu.data.synthetic import SyntheticMT
    from mtt_tpu.data.loader import collate
    import cv2

    p = cs3d_tiny_config()
    model = TaskPrompterSwinNet(
        tasks=tuple(p.TASKS.NAMES), num_outputs=dict(p.TASKS.NUM_OUTPUT),
        tar_dim=12, final_dim=20, chan_embed_dim=16, det_cfg=p.det_cfg,
        target_size=(32, 64), embed_dim=16, depths=(1, 1, 1, 1),
        num_heads=(2, 2, 2, 2), window_size=4)
    ds = SyntheticMT(p.TASKS.NAMES, dict(p.TASKS.NUM_OUTPUT),
                     size=(64, 128), length=8,
                     max_boxes=p.det_cfg.max_boxes)
    batch = collate([ds[i] for i in range(8)])
    for k in ("semseg", "depth"):
        v = batch[k]
        batch[k] = np.stack([
            cv2.resize(v[i, ..., 0], (64, 32),
                       interpolation=cv2.INTER_NEAREST)[..., None]
            for i in range(v.shape[0])])
    # focal/GIoU losses mix per-sample masked reductions: slightly wider
    # fp tolerance than the dense 2D tasks
    _assert_dp8_grads_match(model, p, batch, rel=2e-5, tol_scale=2e-4)


def test_checkpoint_roundtrip(tmp_path):
    from mtt_tpu.utils.train_utils import Trainer

    p = tiny_config()
    trainer = Trainer(p, _model(p))
    batch = _batch(B=2)
    state = trainer.init_state(batch)
    dev = {k: jax.device_put(v) for k, v in batch.items()}
    state, _ = trainer.train_step(state, dev, jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "ckpt")
    trainer.save_checkpoint(state, ckpt)
    restored = trainer.restore_checkpoint(state, ckpt)
    assert restored is not None
    assert int(restored.step) == int(state.step)
    leaves0 = jax.tree.leaves(state.params)
    leaves1 = jax.tree.leaves(restored.params)
    assert all(np.allclose(a, b) for a, b in zip(leaves0, leaves1))


def test_poly_schedule():
    from mtt_tpu.utils.optim import poly_schedule
    s = poly_schedule(1.0, 100)
    assert abs(s(0) - 1.0) < 1e-6
    assert s(50) == pytest.approx((1 - 0.5) ** 0.9)
    assert s(100) == pytest.approx(0.0)


def test_create_config_from_yaml(tmp_path):
    from mtt_tpu.config import create_config
    p = create_config("configs/pascal/taskprompter_vitBp16.yml",
                      {"run_mode": "infer"})
    # reference parse order: semseg, depth, human_parts, sal, normals, edge
    # (InvPT/utils/config.py:30-87)
    assert p.TASKS.NAMES == ["semseg", "human_parts", "sal", "normals", "edge"]
    assert p.TASKS.NUM_OUTPUT["semseg"] == 21
    assert p.TRAIN.SCALE == (512, 512)
    assert p["edge_w"] == 0.95
    p2 = create_config("configs/nyud/invpt_vitLp16.yml", {"run_mode": "infer"})
    assert p2.TASKS.NUM_OUTPUT["semseg"] == 40
    assert p2.TRAIN.SCALE == (448, 576)
    assert p2["intermediate_supervision"] is True


def test_eval_step_and_meters():
    from mtt_tpu.utils.train_utils import Trainer, test_phase
    from mtt_tpu.data.synthetic import SyntheticMT
    from mtt_tpu.data.transforms import ValTransforms
    from mtt_tpu.data.loader import MultiTaskLoader

    p = tiny_config()
    trainer = Trainer(p, _model(p))
    ds = SyntheticMT(p.TASKS.NAMES, dict(p.TASKS.NUM_OUTPUT), size=(64, 64),
                     length=4, transform=ValTransforms((64, 64)))
    loader = MultiTaskLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    state = trainer.init_state(_batch(B=2))
    scores = test_phase(p, trainer, state, loader)
    assert set(scores) == set(p.TASKS.NAMES)
    assert 0.0 <= scores["semseg"]["mIoU"] <= 1.0
    assert np.isfinite(scores["depth"]["rmse"])
