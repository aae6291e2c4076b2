"""End-to-end Cityscapes-3D style pipeline on synthetic data:
tiny Swin backbone + FCOS3D head + joint 2D/3D criterion, one train step."""

import jax
import jax.numpy as jnp
import numpy as np

from mtt_tpu.config.config import Config
from mtt_tpu.detection.det_params import default_det_params


def cs3d_tiny_config():
    tasks = ("semseg", "depth", "3ddet")
    det = default_det_params(6)
    det.feat_channels = 16
    det.cls_branch = (16, 8)
    det.reg_branch = ((16,),) * 5
    det.dir_branch = (16,)
    det.centerness_branch = (16,)
    det.norm_groups = 4
    det.neck.out_channels = 16
    det.max_boxes = 8
    det.strides = (8, 16, 32, 32, 64)
    p = Config({
        "train_db_name": "Cityscapes3D", "ignore_index": 255,
        "intermediate_supervision": False,
        "TASKS": Config(NAMES=list(tasks),
                        NUM_OUTPUT=Config({"semseg": 19, "depth": 1,
                                           "3ddet": 18})),
        "loss_kwargs": {"loss_weights": {"semseg": 100.0, "depth": 1.0,
                                         "3ddet": 1.0}},
        "optimizer": "adam", "optimizer_kwargs": {"lr": 1e-4},
        "scheduler": "poly", "max_iter": 100,
        "ignore_invalid_area_depth": True,
        "det_cfg": det,
        "dd_label_map_size": [32, 64],
    })
    return p


def _batch(p, B=2, h=64, w=128):
    from mtt_tpu.data.synthetic import SyntheticMT
    ds = SyntheticMT(p.TASKS.NAMES, dict(p.TASKS.NUM_OUTPUT), size=(h, w),
                     length=B, max_boxes=p.det_cfg.max_boxes)
    from mtt_tpu.data.loader import collate
    batch = collate([ds[i] for i in range(B)])
    # resize labels to dd size the way CS3DValTransforms would
    return batch


import pytest


@pytest.mark.parametrize("remat", [False, True])
def test_cs3d_joint_train_step(remat):
    from mtt_tpu.models.wrappers import TaskPrompterSwinNet
    from mtt_tpu.utils.train_utils import Trainer

    p = cs3d_tiny_config()
    model = TaskPrompterSwinNet(
        tasks=tuple(p.TASKS.NAMES), num_outputs=dict(p.TASKS.NUM_OUTPUT),
        tar_dim=12, final_dim=20, chan_embed_dim=16, det_cfg=p.det_cfg,
        target_size=(32, 64), embed_dim=16, depths=(1, 1, 1, 1),
        num_heads=(2, 2, 2, 2), window_size=4, remat=remat)
    trainer = Trainer(p, model)
    batch = _batch(p)
    # labels at dd size
    import cv2
    for k in ("semseg", "depth"):
        v = batch[k]
        batch[k] = np.stack([
            cv2.resize(v[i, ..., 0], (64, 32),
                       interpolation=cv2.INTER_NEAREST)[..., None]
            for i in range(v.shape[0])])
    state = trainer.init_state(batch)
    dev = {k: jax.device_put(v) for k, v in batch.items()
           if isinstance(v, np.ndarray)}
    state, losses = trainer.train_step(state, dev, jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["total"]))
    assert "3ddet" in losses and np.isfinite(float(losses["3ddet"]))
    state, losses2 = trainer.train_step(state, dev, jax.random.PRNGKey(0))
    assert np.isfinite(float(losses2["total"]))


def test_train_phase_det_vis(tmp_path):
    """Reference parity: train_phase dumps the first train batch's 3D-det
    predictions (official-format JSON per sample, wireframe PNG when a
    sample has predictions) under save_dir/train/3ddet with a b<epoch>_
    prefix (TaskPrompter/utils/train_utils.py:53-95)."""
    import os

    from mtt_tpu.data.loader import MultiTaskLoader
    from mtt_tpu.data.synthetic import SyntheticMT
    from mtt_tpu.models.wrappers import TaskPrompterSwinNet
    from mtt_tpu.utils.train_utils import Trainer, train_phase

    p = cs3d_tiny_config()
    p.det_cfg.test_cfg.nms_pre = 64
    p.det_cfg.test_cfg.max_per_img = 8
    p["save_dir"] = str(tmp_path)
    p["checkpoint"] = str(tmp_path / "ckpt")
    model = TaskPrompterSwinNet(
        tasks=tuple(p.TASKS.NAMES), num_outputs=dict(p.TASKS.NUM_OUTPUT),
        tar_dim=12, final_dim=20, chan_embed_dim=16, det_cfg=p.det_cfg,
        target_size=(32, 64), embed_dim=16, depths=(1, 1, 1, 1),
        num_heads=(2, 2, 2, 2), window_size=4)

    ds = SyntheticMT(p.TASKS.NAMES, dict(p.TASKS.NUM_OUTPUT), size=(64, 128),
                     length=4, max_boxes=p.det_cfg.max_boxes)
    base_get = ds.__getitem__

    def patched(idx, rng=None):
        s = base_get(idx, rng)
        s["meta"]["camera"] = {
            "fx": 1000.0, "fy": 1000.0, "u0": 64.0, "v0": 32.0,
            "sensor_T_ISO_8855": [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]]}
        import cv2
        for k in ("semseg", "depth"):
            s[k] = cv2.resize(s[k][..., 0], (64, 32),
                              interpolation=cv2.INTER_NEAREST)[..., None]
        return s

    ds.__getitem__ = patched
    loader = MultiTaskLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    trainer = Trainer(p, model)
    state = trainer.init_state(next(iter(loader)))
    train_phase(p, trainer, state, loader, val_loader=None, max_iter=2,
                val_interval=100)

    out_dir = tmp_path / "train" / "3ddet"
    jsons = sorted(f for f in os.listdir(out_dir) if f.endswith(".json"))
    # one JSON per sample of the first batch, epoch-0 prefix
    assert len(jsons) == 2 and all(f.startswith("b0_") for f in jsons)
    import json as _json
    with open(out_dir / jsons[0]) as f:
        d = _json.load(f)
    assert "objects" in d
