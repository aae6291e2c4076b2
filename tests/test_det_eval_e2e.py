"""End-to-end detection evaluation: tiny Swin -> decode -> export -> mDS."""

import numpy as np
import jax

from tests.test_cs3d_e2e import cs3d_tiny_config


def test_evaluate_detection_runs():
    from mtt_tpu.models.wrappers import TaskPrompterSwinNet
    from mtt_tpu.utils.train_utils import Trainer
    from mtt_tpu.detection.det_eval import evaluate_detection
    from mtt_tpu.data.synthetic import SyntheticMT
    from mtt_tpu.data.loader import MultiTaskLoader

    p = cs3d_tiny_config()
    p.det_cfg.test_cfg.nms_pre = 64
    p.det_cfg.test_cfg.max_per_img = 8
    model = TaskPrompterSwinNet(
        tasks=tuple(p.TASKS.NAMES), num_outputs=dict(p.TASKS.NUM_OUTPUT),
        tar_dim=12, final_dim=20, chan_embed_dim=16, det_cfg=p.det_cfg,
        target_size=(32, 64), embed_dim=16, depths=(1, 1, 1, 1),
        num_heads=(2, 2, 2, 2), window_size=4)

    ds = SyntheticMT(p.TASKS.NAMES, dict(p.TASKS.NUM_OUTPUT), size=(64, 128),
                     length=2, max_boxes=p.det_cfg.max_boxes)
    # synthetic meta lacks 'camera'; inject identity camera params
    base_get = ds.__getitem__

    def patched(idx, rng=None):
        s = base_get(idx, rng)
        s["meta"]["camera"] = {
            "fx": 1000.0, "fy": 1000.0, "u0": 64.0, "v0": 32.0,
            "sensor_T_ISO_8855": [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]]}
        return s

    ds.__getitem__ = patched
    loader = MultiTaskLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                             num_workers=1)
    batch = next(iter(loader))
    trainer = Trainer(p, model)
    state = trainer.init_state(batch)
    res = evaluate_detection(p, trainer, state, loader)
    assert "mDetection_Score" in res and np.isfinite(res["mDetection_Score"])
    assert "mAP" in res
