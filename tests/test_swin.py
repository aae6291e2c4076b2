"""TaskPrompter-Swin tests at tiny dimensions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_window_partition_roundtrip():
    from mtt_tpu.models.taskprompter_swin import (window_partition,
                                                  window_reverse)
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 3)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shifted_window_mask_shape():
    from mtt_tpu.models.taskprompter_swin import shifted_window_mask
    m = shifted_window_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}


def test_swin_backbone_outputs():
    from mtt_tpu.models.taskprompter_swin import TaskPrompterSwin
    tasks = ("semseg", "depth", "3ddet")
    m = TaskPrompterSwin(tasks=tasks, img_size=(64, 128), patch_size=4,
                         embed_dim=16, depths=(1, 1, 1, 1),
                         num_heads=(2, 2, 2, 2), window_size=4,
                         chan_embed_dim=16, tar_dim=12, final_dim=20)
    x = jnp.zeros((1, 64, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    # 2D task: fused at 2x the POST-merge stage-0 grid (16x32) — the
    # reference decodes after PatchMerging, backbone strides [8,16,32,32]
    # (common_config.py:36-38)
    assert out["semseg"].shape == (1, 16, 32, 20)
    # 3ddet: 4-scale list at post-merge grids (last two scales equal)
    assert isinstance(out["3ddet"], list) and len(out["3ddet"]) == 4
    assert out["3ddet"][0].shape == (1, 8, 16, 20)
    assert out["3ddet"][3].shape == (1, 2, 4, 20)


def test_swin_net_with_det_head():
    from mtt_tpu.models.wrappers import TaskPrompterSwinNet
    from mtt_tpu.detection.det_params import default_det_params
    det = default_det_params(3)
    det.feat_channels = 16
    det.cls_branch = (16, 8)
    det.reg_branch = ((16,),) * 5
    det.dir_branch = (16,)
    det.centerness_branch = (16,)
    det.norm_groups = 4
    det.neck.out_channels = 16
    tasks = ("semseg", "depth", "3ddet")
    m = TaskPrompterSwinNet(
        tasks=tasks, num_outputs={"semseg": 5, "depth": 1, "3ddet": 18},
        tar_dim=12, final_dim=20, chan_embed_dim=16, det_cfg=det,
        target_size=(32, 64), embed_dim=16, depths=(1, 1, 1, 1),
        num_heads=(2, 2, 2, 2), window_size=4)
    x = jnp.zeros((1, 96, 192, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out["semseg"].shape == (1, 32, 64, 5)
    cls, bbox, dirp, ctr = out["3ddet"]
    assert len(cls) == 5 and cls[0].shape[-1] == 3
