"""Checkpoint converter tests: synthetic npz in the Google ViT layout."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def make_npz(tmp_path, depth=4, C=64, grid=14, patch=16):
    rng = np.random.default_rng(0)
    d = {}
    d["embedding/kernel"] = rng.normal(size=(patch, patch, 3, C)).astype(np.float32)
    d["embedding/bias"] = rng.normal(size=(C,)).astype(np.float32)
    d["cls"] = rng.normal(size=(1, 1, C)).astype(np.float32)
    d["Transformer/posembed_input/pos_embedding"] = rng.normal(
        size=(1, grid * grid + 1, C)).astype(np.float32)
    d["Transformer/encoder_norm/scale"] = np.ones((C,), np.float32)
    d["Transformer/encoder_norm/bias"] = np.zeros((C,), np.float32)
    H = 4
    D = C // H
    for i in range(depth):
        bp = f"Transformer/encoderblock_{i}/"
        mh = bp + "MultiHeadDotProductAttention_1/"
        for ln in ("LayerNorm_0", "LayerNorm_2"):
            d[bp + ln + "/scale"] = np.ones((C,), np.float32)
            d[bp + ln + "/bias"] = np.zeros((C,), np.float32)
        for n in ("query", "key", "value"):
            d[mh + n + "/kernel"] = rng.normal(size=(C, H, D)).astype(np.float32) * 0.02
            d[mh + n + "/bias"] = np.zeros((H, D), np.float32)
        d[mh + "out/kernel"] = rng.normal(size=(H, D, C)).astype(np.float32) * 0.02
        d[mh + "out/bias"] = np.zeros((C,), np.float32)
        d[bp + "MlpBlock_3/Dense_0/kernel"] = rng.normal(size=(C, 4 * C)).astype(np.float32) * 0.02
        d[bp + "MlpBlock_3/Dense_0/bias"] = np.zeros((4 * C,), np.float32)
        d[bp + "MlpBlock_3/Dense_1/kernel"] = rng.normal(size=(4 * C, C)).astype(np.float32) * 0.02
        d[bp + "MlpBlock_3/Dense_1/bias"] = np.zeros((C,), np.float32)
    path = str(tmp_path / "vit.npz")
    np.savez(path, **d)
    return path, d


def test_load_npz_into_vit(tmp_path):
    from mtt_tpu.models.vit import build_vit
    from mtt_tpu.models.convert import load_vit_npz

    m = build_vit("vitT", (64, 64))  # grid 4x4 != npz 14x14 -> resampling
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    params = jax.device_get(variables["params"])
    npz_path, raw = make_npz(tmp_path)

    new = load_vit_npz(npz_path, params, depth=4, grid=(4, 4))
    np.testing.assert_array_equal(new["patch_embed"]["proj"]["kernel"],
                                  raw["embedding/kernel"])
    assert new["pos_embed"].shape == params["pos_embed"].shape
    qkv = new["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.shape == (64, 192)
    np.testing.assert_array_equal(
        qkv[:, :64],
        raw["Transformer/encoderblock_0/MultiHeadDotProductAttention_1/query/kernel"].reshape(64, 64))
    # model still runs with converted weights
    out, taps = m.apply({"params": new}, x)
    assert np.isfinite(np.asarray(out)).all()


def test_load_npz_into_taskprompter(tmp_path):
    from mtt_tpu.models.taskprompter import TaskPrompterViT
    from mtt_tpu.models.convert import load_vit_npz_taskprompter

    m = TaskPrompterViT(tasks=("semseg", "depth"), img_size=(64, 64),
                        select_list=(1, 2, 3), patch_size=16, embed_dim=64,
                        depth=4, num_heads=4, tar_dim=16, final_dim=16)
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    params = jax.device_get(variables["params"])
    npz_path, raw = make_npz(tmp_path)
    bb = load_vit_npz_taskprompter(npz_path, params, depth=4, grid=(4, 4))
    # prompt params untouched
    np.testing.assert_array_equal(bb["task_prompts"], params["task_prompts"])
    variables = {"params": bb, "batch_stats": variables.get("batch_stats", {})}
    out = m.apply(variables, x)
    assert np.isfinite(np.asarray(out["semseg"])).all()


def test_torch_backbone_mapping():
    from mtt_tpu.models.vit import build_vit
    from mtt_tpu.models.convert import load_torch_backbone

    m = build_vit("vitT", (64, 64))
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.device_get(m.init(jax.random.PRNGKey(0), x)["params"])
    rng = np.random.default_rng(1)
    C = 64
    sd = {
        "backbone.patch_embed.proj.weight": rng.normal(size=(C, 3, 16, 16)).astype(np.float32),
        "backbone.patch_embed.proj.bias": np.zeros((C,), np.float32),
        "backbone.blocks.0.attn.qkv.weight": rng.normal(size=(3 * C, C)).astype(np.float32),
        "backbone.blocks.0.attn.qkv.bias": np.zeros((3 * C,), np.float32),
        "backbone.norm.weight": np.ones((C,), np.float32),
        "backbone.norm.bias": np.zeros((C,), np.float32),
    }
    new = load_torch_backbone(sd, params, depth=4, grid=(4, 4))
    np.testing.assert_array_equal(
        new["patch_embed"]["proj"]["kernel"],
        np.transpose(sd["backbone.patch_embed.proj.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        new["blocks_0"]["attn"]["qkv"]["kernel"],
        sd["backbone.blocks.0.attn.qkv.weight"].T)
    out, _ = m.apply({"params": new}, x)
    assert np.isfinite(np.asarray(out)).all()
