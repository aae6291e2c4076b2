"""Round-trip tests for the full torch-checkpoint converter.

Synthetic torch-layout state dicts are generated (numpy) with the exact
key names and shapes of the reference checkpoints (module trees read from
taskprompter.py:168-367 / transformer_net.py / transformer_decoder.py /
invpt.py:419-545), then converted; apply_entries fails loudly if any model
param stays unfilled or any torch key is unconsumed, so a green test means
100% coverage in both directions (VERDICT.md item 5).
"""

import numpy as np
import pytest

TASKS = ("semseg", "edge")
NUM_OUT = {"semseg": 5, "edge": 1}
E, DEPTH, HEADS, GRID = 64, 4, 4, 4       # ViT-T at 64x64, patch 16
PX = GRID * GRID
TAR, FIN = 24, 28                          # tar_dim / final_embed_dim


def _rnd(rng, *shape):
    return rng.normal(size=shape).astype(np.float32) * 0.05


def _add_bn(sd, key, c, rng):
    sd[key + ".weight"] = np.abs(_rnd(rng, c)) + 1.0
    sd[key + ".bias"] = _rnd(rng, c)
    sd[key + ".running_mean"] = _rnd(rng, c)
    sd[key + ".running_var"] = np.abs(_rnd(rng, c)) + 1.0
    sd[key + ".num_batches_tracked"] = np.asarray(1)


def _add_ln(sd, key, c, rng):
    sd[key + ".weight"] = np.ones(c, np.float32) + _rnd(rng, c)
    sd[key + ".bias"] = _rnd(rng, c)


def _add_lin(sd, key, cin, cout, rng):
    sd[key + ".weight"] = _rnd(rng, cout, cin)
    sd[key + ".bias"] = _rnd(rng, cout)


def _add_conv(sd, key, cin, cout, k, rng, bias=True):
    sd[key + ".weight"] = _rnd(rng, cout, cin, k, k)
    if bias:
        sd[key + ".bias"] = _rnd(rng, cout)


def make_taskprompter_sd(rng):
    sd = {}
    _add_conv(sd, "backbone.patch_embed.proj", 3, E, 16, rng)
    sd["backbone.pos_embed"] = _rnd(rng, 1, PX + 1, E)
    sd["backbone.task_prompts"] = _rnd(rng, len(TASKS), E)
    for i in range(DEPTH):
        b = f"backbone.blocks.{i}"
        _add_ln(sd, b + ".norm1", E, rng)
        _add_ln(sd, b + ".norm2", E, rng)
        _add_lin(sd, b + ".attn.qkv", E, 3 * E, rng)
        _add_lin(sd, b + ".attn.proj", E, E, rng)
        _add_lin(sd, b + ".attn.token_trans", E, PX, rng)
        _add_lin(sd, b + ".attn.token_trans1", PX, E, rng)
        _add_lin(sd, b + ".mlp.fc1", E, 4 * E, rng)
        _add_lin(sd, b + ".mlp.fc2", 4 * E, E, rng)
    _add_ln(sd, "backbone.norm", E, rng)
    for il in range(4):
        for t in TASKS:
            _add_conv(sd, f"backbone.fea_decode_spa.{il}.{t}.0", E, TAR, 1, rng)
            _add_conv(sd, f"backbone.fea_decode_chan.{il}.{t}.0", E, TAR, 1, rng)
            _add_conv(sd, f"backbone.fea_fuse.{il}.{t}.0", 2 * TAR, FIN, 1, rng)
            _add_conv(sd, f"backbone.fea_fuse.{il}.{t}.1", FIN, FIN, 3, rng)
            _add_bn(sd, f"backbone.fea_fuse.{il}.{t}.2", FIN, rng)
            _add_conv(sd, f"backbone.fea_fuse.{il}.{t}.4", FIN, FIN, 1, rng)
            _add_conv(sd, f"backbone.ctr_attn_conv.{il}.{t}.0", HEADS, HEADS,
                      1, rng)
            _add_conv(sd, f"backbone.ctr_attn_conv.{il}.{t}.2", HEADS, 1,
                      1, rng)
    for t in TASKS:
        _add_conv(sd, f"heads.{t}.mt_proj.0", FIN, FIN, 3, rng)
        _add_bn(sd, f"heads.{t}.mt_proj.1", FIN, rng)
        _add_conv(sd, f"heads.{t}.linear_pred", FIN, NUM_OUT[t], 1, rng)
    return sd


def test_taskprompter_full_conversion():
    import jax
    import jax.numpy as jnp
    from mtt_tpu.models.convert_torch import convert_full_checkpoint
    from mtt_tpu.models.wrappers import TaskPrompterNet

    model = TaskPrompterNet(
        tasks=TASKS, num_outputs=NUM_OUT, backbone_name="TaskPrompter_vitT",
        tar_dim=TAR, final_dim=FIN, use_ctr=True, chan_nheads=1)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    sd = make_taskprompter_sd(np.random.default_rng(0))
    out = convert_full_checkpoint(sd, dict(variables), "TaskPrompter",
                                  list(TASKS), DEPTH, heads=HEADS,
                                  use_ctr=True)
    # converted tree must run
    y = model.apply({"params": out["params"],
                     "batch_stats": out["batch_stats"]}, x, train=False)
    for t in TASKS:
        assert y[t].shape == (1, 64, 64, NUM_OUT[t])
        assert np.isfinite(np.asarray(y[t])).all()
    # spot-check an actual weight landed (not init): attn proj of block 0
    got = np.asarray(out["params"]["backbone"]["blocks_0"]["proj"]["kernel"])
    want = sd["backbone.blocks.0.attn.proj.weight"].T
    np.testing.assert_allclose(got, want, atol=0)
    # qkv columns must be HEAD-MAJOR reordered
    got = np.asarray(out["params"]["backbone"]["blocks_0"]["qkv"]["kernel"])
    w = sd["backbone.blocks.0.attn.qkv.weight"].T
    D = E // HEADS
    want = w.reshape(E, 3, HEADS, D).transpose(0, 2, 1, 3).reshape(E, 3 * E)
    np.testing.assert_allclose(got, want, atol=0)


def test_taskprompter_conversion_fails_loudly_on_missing():
    import jax
    import jax.numpy as jnp
    from mtt_tpu.models.convert_torch import convert_full_checkpoint
    from mtt_tpu.models.wrappers import TaskPrompterNet

    model = TaskPrompterNet(
        tasks=TASKS, num_outputs=NUM_OUT, backbone_name="TaskPrompter_vitT",
        tar_dim=TAR, final_dim=FIN, use_ctr=True, chan_nheads=1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    sd = make_taskprompter_sd(np.random.default_rng(0))
    del sd["backbone.blocks.0.attn.qkv.bias"]
    with pytest.raises(KeyError):
        convert_full_checkpoint(sd, dict(variables), "TaskPrompter",
                                list(TASKS), DEPTH, heads=HEADS)


# ---------------------------------------------------------------------------
# InvPT TransformerNet
# ---------------------------------------------------------------------------

EMB = 32          # p.embed_dim (decoder)
PRED = 8          # PRED_OUT_NUM_CONSTANT
D0 = EMB + PRED   # stage-0 dim (embed_dim_with_pred)


def make_invpt_sd(rng):
    sd = {}
    T = len(TASKS)
    _add_conv(sd, "backbone.patch_embed.proj", 3, E, 16, rng)
    sd["backbone.pos_embed"] = _rnd(rng, 1, PX + 1, E)
    sd["backbone.cls_token"] = _rnd(rng, 1, 1, E)
    for i in range(DEPTH):
        b = f"backbone.blocks.{i}"
        _add_ln(sd, b + ".norm1", E, rng)
        _add_ln(sd, b + ".norm2", E, rng)
        _add_lin(sd, b + ".attn.qkv", E, 3 * E, rng)
        _add_lin(sd, b + ".attn.proj", E, E, rng)
        _add_lin(sd, b + ".mlp.fc1", E, 4 * E, rng)
        _add_lin(sd, b + ".mlp.fc2", 4 * E, E, rng)
    _add_ln(sd, "backbone.norm", E, rng)

    d = "multi_task_decoder."
    dims = (D0, D0 // 2, D0 // 4)
    # scale_embed: ConvTranspose2d(E, dims[2]) + Conv2d(E, dims[1]) +
    # Conv2d(E, dims[0]) (unused downstream) + None
    sd[d + "scale_embed.0.weight"] = _rnd(rng, E, dims[2], 3, 3)  # (I,O,k,k)
    sd[d + "scale_embed.0.bias"] = _rnd(rng, dims[2])
    _add_conv(sd, d + "scale_embed.1", E, dims[1], 3, rng)
    _add_conv(sd, d + "scale_embed.2", E, dims[0], 3, rng)
    for t in TASKS:
        for j, (ci, co) in enumerate(((E, E), (E, EMB))):
            _add_conv(sd, d + f"preliminary_decoder.{t}.{j}.conv", ci, co,
                      3, rng, bias=False)
            _add_bn(sd, d + f"preliminary_decoder.{t}.{j}.bn1", co, rng)
        _add_conv(sd, d + f"intermediate_head.{t}", EMB, NUM_OUT[t], 1, rng)
        _add_conv(sd, d + f"invpt.mix_proj.{t}.0", EMB + NUM_OUT[t], D0,
                  1, rng)
        _add_conv(sd, d + f"invpt.mt_proj.{t}.0", D0, D0, 3, rng)
        _add_bn(sd, d + f"invpt.mt_proj.{t}.1", D0, rng)
    for i in range(3):
        st = d + f"invpt.invpt_stages.{i}."
        dim = dims[i]
        if i > 0:
            cin = dims[i - 1]
            for ti in range(T):
                pe = st + f"patch_embed.{ti}.proj"
                sd[pe + ".1.weight"] = _rnd(rng, dim, cin, 3, 3)
                _add_bn(sd, pe + ".2", dim, rng)
                sd[pe + ".4.weight"] = _rnd(rng, dim, dim, 3, 3)
                _add_bn(sd, pe + ".5", dim, rng)
        blk = st + "blocks.0."
        _add_ln(sd, blk + "norm1", dim, rng)
        _add_ln(sd, blk + "norm2", dim, rng)
        _add_lin(sd, blk + "mlp.fc1", dim, 4 * dim, rng)
        _add_lin(sd, blk + "mlp.fc2", 4 * dim, dim, rng)
        for ti in range(T):
            sd[blk + f"attn.conv_proj_q.{ti}.conv.weight"] = _rnd(
                rng, dim, 1, 3, 3)
            _add_bn(sd, blk + f"attn.conv_proj_q.{ti}.bn", dim, rng)
        for name in ("proj_q", "proj_k", "proj_v", "proj"):
            _add_lin(sd, blk + "attn." + name, dim, dim, rng)
        _add_conv(sd, blk + "attn.fuse_attn", 4, 2, 1, rng)  # 2 heads
        _add_ln(sd, d + f"invpt.norm_mts.{i}", dim * T, rng)
        for ti in range(T):
            _add_conv(sd, d + f"invpt.redu_chan.{i}.{ti}", dim, D0, 1, rng)
    _add_ln(sd, d + "invpt.norm_mt", dims[2] * T, rng)
    for t in TASKS:
        _add_conv(sd, f"heads.{t}.linear_pred", D0, NUM_OUT[t], 1, rng)
    return sd


def test_transformer_net_full_conversion():
    import jax
    import jax.numpy as jnp
    from mtt_tpu.models.convert_torch import convert_full_checkpoint
    from mtt_tpu.models.wrappers import TransformerNet

    model = TransformerNet(
        tasks=TASKS, num_outputs=NUM_OUT, backbone_name="vitT",
        embed_dim=EMB, pred_out=PRED, mtt_downsample=2)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    sd = make_invpt_sd(np.random.default_rng(1))
    out = convert_full_checkpoint(sd, dict(variables), "TransformerNet",
                                  list(TASKS), DEPTH, heads=HEADS)
    y = model.apply({"params": out["params"],
                     "batch_stats": out["batch_stats"]}, x, train=False)
    for t in TASKS:
        assert y[t].shape == (1, 64, 64, NUM_OUT[t])
        assert np.isfinite(np.asarray(y[t])).all()
    got = np.asarray(
        out["params"]["decoder"]["stage_1"]["attn"]["fuse_attn_kernel"])
    want = sd["multi_task_decoder.invpt.invpt_stages.1.blocks.0.attn."
              "fuse_attn.weight"][:, :, 0, 0]
    np.testing.assert_allclose(got, want, atol=0)


def test_convtranspose_semantics():
    """flax ConvTranspose + our weight transform must reproduce torch
    ConvTranspose2d(k=3, stride=2, padding=1, output_padding=1) — the
    reference scale_embed[0] (transformer_decoder.py:65)."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from flax import linen as nn
    from mtt_tpu.models.convert_torch import _conv_t

    rng = np.random.default_rng(2)
    cin, cout = 6, 4
    x = rng.normal(size=(1, cin, 8, 8)).astype(np.float32)
    m = torch.nn.ConvTranspose2d(cin, cout, 3, stride=2, padding=1,
                                 output_padding=1)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()

    fl = nn.ConvTranspose(cout, (3, 3), strides=(2, 2),
                          padding=((1, 2), (1, 2)))
    params = {
        "kernel": jnp.asarray(_conv_t(m.weight.detach().numpy())),
        "bias": jnp.asarray(m.bias.detach().numpy()),
    }
    got = fl.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
