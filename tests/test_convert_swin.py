"""Round-trip coverage test for the TaskPrompter-Swin + FCOS3D converter.

A synthetic torch-layout state dict with the exact key names/shapes of the
reference Cityscapes-3D checkpoint (taskprompter_swin.py:236-655,
det_head.py:128-317, fpn.py:105-130, DEConvHead taskprompter.py:700-715)
is converted into a tiny TaskPrompterSwinNet; apply_entries fails loudly
on any unfilled model param or unconsumed torch key.
"""

import numpy as np
import pytest

from tests.test_cs3d_e2e import cs3d_tiny_config

TASKS = ("semseg", "depth", "3ddet")
NUM_OUT = {"semseg": 19, "depth": 1, "3ddet": 18}
E, CHAN, TAR, FIN = 16, 16, 12, 20
DEPTHS, HEADS = (1, 1, 1, 1), (2, 2, 2, 2)
RES = [(16, 32), (8, 16), (4, 8), (2, 4)]   # 64x128 input, patch 4
WINDOW = 4


def _rnd(rng, *shape):
    return rng.normal(size=shape).astype(np.float32) * 0.05


def _lin(sd, key, cin, cout, rng, bias=True):
    sd[key + ".weight"] = _rnd(rng, cout, cin)
    if bias:
        sd[key + ".bias"] = _rnd(rng, cout)


def _conv(sd, key, cin, cout, k, rng, bias=True):
    sd[key + ".weight"] = _rnd(rng, cout, cin, k, k)
    if bias:
        sd[key + ".bias"] = _rnd(rng, cout)


def _bn(sd, key, c, rng):
    sd[key + ".weight"] = np.abs(_rnd(rng, c)) + 1.0
    sd[key + ".bias"] = _rnd(rng, c)
    sd[key + ".running_mean"] = _rnd(rng, c)
    sd[key + ".running_var"] = np.abs(_rnd(rng, c)) + 1.0
    sd[key + ".num_batches_tracked"] = np.asarray(1)


def _ln(sd, key, c, rng):
    sd[key + ".weight"] = np.ones(c, np.float32) + _rnd(rng, c)
    sd[key + ".bias"] = _rnd(rng, c)


def make_swin_sd(rng, depths=DEPTHS):
    sd = {}
    T = len(TASKS)
    _conv(sd, "backbone.patch_embed.proj", 3, E, 4, rng)
    _ln(sd, "backbone.patch_embed.norm", E, rng)
    sd["backbone.task_prompts"] = _rnd(rng, T, E)
    dims = [E * 2 ** i for i in range(4)]
    for il in range(4):
        C = dims[il]
        H, W = RES[il]
        ws = min(WINDOW, H, W)
        px = H * W
        for d in range(depths[il]):
            tb = f"backbone.layers.{il}.blocks.{d}"
            _ln(sd, tb + ".norm1", C, rng)
            _ln(sd, tb + ".norm2", C, rng)
            sd[tb + ".attn.relative_position_bias_table"] = _rnd(
                rng, (2 * ws - 1) ** 2, HEADS[il])
            sd[tb + ".attn.relative_position_index"] = np.zeros(
                (ws * ws, ws * ws), np.int64)
            _lin(sd, tb + ".attn.qkv", C, 3 * C, rng)
            _lin(sd, tb + ".attn.proj", C, C, rng)
            _lin(sd, tb + ".token_trans", C, CHAN, rng)
            _lin(sd, tb + ".chan_q", CHAN, CHAN, rng)
            _lin(sd, tb + ".chan_kv", px, 2 * CHAN, rng)
            last_block = il == 3 and d == depths[il] - 1
            if not last_block:
                _lin(sd, tb + ".chan_proj", CHAN, CHAN, rng)
                _lin(sd, tb + ".token_trans1", CHAN, C, rng)
            _lin(sd, tb + ".mlp.fc1", C, 4 * C, rng)
            _lin(sd, tb + ".mlp.fc2", 4 * C, C, rng)
        if il < 3:
            td = f"backbone.layers.{il}.downsample"
            _ln(sd, td + ".norm", 4 * C, rng)
            _lin(sd, td + ".reduction", 4 * C, 2 * C, rng, bias=False)
            _lin(sd, td + ".process_chan_attn", C, 2 * C, rng, bias=False)
            _lin(sd, td + ".task_prompts_up", C, 2 * C, rng, bias=False)
            _conv(sd, td + ".spa_attn_ds", HEADS[il] * T, HEADS[il] * T,
                  3, rng)
    _ln(sd, "backbone.norm", dims[-1], rng)

    # decode consumes POST-merge features: backbone_channels =
    # [2C0, 2C1, 2C2, C3] (reference common_config.py:36)
    bb_ch = [dims[0] * 2, dims[1] * 2, dims[2] * 2, dims[3]]
    for il in range(4):
        C = bb_ch[il]
        for t in TASKS:
            _conv(sd, f"backbone.fea_decode_spa.{il}.{t}.0", C, TAR, 1, rng)
            _conv(sd, f"backbone.fea_decode_chan.{il}.{t}.0", C, TAR, 1, rng)
            _conv(sd, f"backbone.fea_fuse.{il}.{t}.0", 2 * TAR, FIN, 1, rng)
            _conv(sd, f"backbone.fea_fuse.{il}.{t}.1", FIN, FIN, 3, rng)
            _bn(sd, f"backbone.fea_fuse.{il}.{t}.2", FIN, rng)
            _conv(sd, f"backbone.fea_fuse.{il}.{t}.4", FIN, FIN, 3, rng)
    for t in ("semseg", "depth"):
        _conv(sd, f"backbone.multi_scale_fuse.{t}", FIN, FIN, 3, rng)

    # DEConvHead per 2D task (ConvTranspose k2 s2 -> BN -> conv3 -> BN)
    for t in ("semseg", "depth"):
        h = f"heads.{t}."
        sd[h + "mt_proj.0.weight"] = _rnd(rng, FIN, FIN // 2, 2, 2)  # (I,O,k,k)
        sd[h + "mt_proj.0.bias"] = _rnd(rng, FIN // 2)
        _bn(sd, h + "mt_proj.1", FIN // 2, rng)
        _conv(sd, h + "mt_proj.3", FIN // 2, FIN // 2, 3, rng)
        _bn(sd, h + "mt_proj.4", FIN // 2, rng)
        _conv(sd, h + "linear_pred", FIN // 2, NUM_OUT[t], 1, rng)

    # FCOS3D head (feat 16, groups 4, tiny branches; det_head.py:128-317)
    dh = "heads.3ddet."
    F = 16
    for i in range(4):
        _conv(sd, dh + f"neck.lateral_convs.{i}.conv", FIN, F, 1, rng)
        _conv(sd, dh + f"neck.fpn_convs.{i}.conv", F, F, 3, rng)
    _conv(sd, dh + "neck.fpn_convs.4.conv", F, F, 3, rng)

    def conv_gn(prefix, cin, cout, dcn=False):
        if dcn:
            _conv(sd, prefix + ".conv", cin, cout, 3, rng)
            _conv(sd, prefix + ".conv.conv_offset", cin, 27, 3, rng)
        else:
            _conv(sd, prefix + ".conv", cin, cout, 3, rng)
        _ln(sd, prefix + ".gn", cout, rng)

    for i in range(3):
        conv_gn(dh + f"cls_convs.{i}", F, F, dcn=i == 2)
        conv_gn(dh + f"reg_convs.{i}", F, F, dcn=i == 2)
    conv_gn(dh + "conv_cls_prev.0", F, 16)
    conv_gn(dh + "conv_cls_prev.1", 16, 8)
    _conv(sd, dh + "conv_cls", 8, 6, 1, rng)
    for gi, dims_g in enumerate((2, 1, 3, 3, 4)):
        conv_gn(dh + f"conv_reg_prevs.{gi}.0", F, 16)
        _conv(sd, dh + f"conv_regs.{gi}", 16, dims_g, 1, rng)
    conv_gn(dh + "conv_dir_cls_prev.0", F, 16)
    _conv(sd, dh + "conv_dir_cls", 16, 6, 1, rng)
    conv_gn(dh + "conv_centerness_prev.0", F, 16)
    _conv(sd, dh + "conv_centerness", 16, 1, 1, rng)
    for lvl in range(5):
        for j in range(4):
            sd[dh + f"scales.{lvl}.{j}.scale"] = np.asarray(1.0, np.float32)
    return sd


def test_swin_full_conversion():
    import jax
    import jax.numpy as jnp
    from mtt_tpu.models.convert_torch import (apply_entries,
                                              map_taskprompter_swin)
    from mtt_tpu.models.wrappers import TaskPrompterSwinNet

    p = cs3d_tiny_config()
    model = TaskPrompterSwinNet(
        tasks=TASKS, num_outputs=NUM_OUT,
        tar_dim=TAR, final_dim=FIN, chan_embed_dim=CHAN, det_cfg=p.det_cfg,
        target_size=(32, 64), embed_dim=E, depths=DEPTHS,
        num_heads=HEADS, window_size=WINDOW)
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    sd = make_swin_sd(np.random.default_rng(7))
    m = map_taskprompter_swin(
        sd, list(TASKS), depths=DEPTHS, num_outs=5, stacked_convs=3,
        cls_branch=(16, 8), reg_branch=((16,),) * 5, dir_branch=(16,),
        centerness_branch=(16,), scale_dim=4, n_fpn_in=4)
    out = apply_entries(dict(variables), m)

    y = model.apply({"params": out["params"],
                     "batch_stats": out["batch_stats"]}, x, train=False)
    assert y["semseg"].shape == (1, 32, 64, 19)
    cls_out, bbox_out, dir_out, ctr_out = y["3ddet"]
    assert len(cls_out) == 5
    for arr in (y["semseg"], y["depth"], cls_out[0], bbox_out[0]):
        assert np.isfinite(np.asarray(arr)).all()
    # spot checks
    got = np.asarray(out["params"]["backbone"]["layer2_block0"]["qkv"]["kernel"])
    np.testing.assert_allclose(
        got, sd["backbone.layers.2.blocks.0.attn.qkv.weight"].T, atol=0)
    sc = np.asarray(out["params"]["det_head"]["fcos3d"]["scales"])
    assert sc.shape == (5, 4)
