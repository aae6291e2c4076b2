"""Shape/forward tests for the model families at tiny dimensions."""

import jax
import jax.numpy as jnp
import pytest

TASKS4 = ("semseg", "depth", "edge", "normals")
NUM_OUT = {"semseg": 5, "depth": 1, "edge": 1, "normals": 3}


def test_vit_backbone_taps():
    from mtt_tpu.models.vit import build_vit
    m = build_vit("vitT", (64, 64))
    x = jnp.zeros((2, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    final, taps = m.apply(params, x)
    assert final.shape == (2, 16, 64)
    assert len(taps) == 4
    for t in taps:
        assert t.shape == (2, 16, 64)


def test_invpt_decoder_shapes():
    from mtt_tpu.models.invpt import InvPTDecoder
    dec = InvPTDecoder(tasks=TASKS4, num_outputs=NUM_OUT, embed_dim=32,
                       pred_out=16, backbone_dim=64, mtt_downsample=2)
    taps = [jnp.ones((2, 64, 64)) for _ in range(4)]  # grid 8x8, dim 64
    variables = dec.init(jax.random.PRNGKey(0), taps, (8, 8))
    out, inter = dec.apply(variables, taps, (8, 8))
    # h0 = 4 -> final 32x32, channel D = 48
    for t in TASKS4:
        assert out[t].shape == (2, 32, 32, 48)
        assert inter[t].shape == (2, 4, 4, NUM_OUT[t])


def test_invpt_decoder_train_mode_updates_bn():
    from mtt_tpu.models.invpt import InvPTDecoder
    dec = InvPTDecoder(tasks=("semseg", "depth"), num_outputs=NUM_OUT,
                       embed_dim=32, pred_out=16, backbone_dim=64)
    taps = [jnp.ones((1, 16, 64)) for _ in range(4)]
    variables = dec.init(jax.random.PRNGKey(0), taps, (4, 4))
    (out, inter), mutated = dec.apply(
        variables, taps, (4, 4), train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
    assert "batch_stats" in mutated


def test_transformer_net_end_to_end():
    from mtt_tpu.models.wrappers import TransformerNet
    m = TransformerNet(tasks=TASKS4, num_outputs=NUM_OUT, backbone_name="vitT",
                       embed_dim=32, pred_out=16)
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    for t in TASKS4:
        assert out[t].shape == (1, 64, 64, NUM_OUT[t])
        assert out["inter_preds"][t].shape == (1, 64, 64, NUM_OUT[t])


@pytest.mark.parametrize("use_ctr,chan_nheads", [(True, 1), (False, 4)])
def test_taskprompter_net(use_ctr, chan_nheads):
    from mtt_tpu.models.wrappers import TaskPrompterNet
    m = TaskPrompterNet(tasks=TASKS4, num_outputs=NUM_OUT,
                        backbone_name="TaskPrompter_vitT", tar_dim=24,
                        final_dim=28, use_ctr=use_ctr, chan_nheads=chan_nheads)
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    for t in TASKS4:
        assert out[t].shape == (1, 64, 64, NUM_OUT[t])


def test_taskprompter_prompts_affect_output():
    """Prompts must influence patch tokens through the joint attention."""
    from mtt_tpu.models.taskprompter import TaskPrompterViT
    m = TaskPrompterViT(tasks=("semseg", "depth"), img_size=(32, 32),
                        select_list=(1, 2, 3), patch_size=16, embed_dim=32,
                        depth=4, num_heads=4, tar_dim=16, final_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    out1 = m.apply(variables, x)
    pert = jax.tree.map(lambda a: a, variables)
    pert["params"]["task_prompts"] = variables["params"]["task_prompts"] + 1.0
    out2 = m.apply(pert, x)
    assert float(jnp.abs(out1["semseg"] - out2["semseg"]).max()) > 1e-6


def test_upsample_matmul_matches_jax_image_resize():
    """interpolate()'s matmul path must equal jax.image.resize 'linear'
    for upsampling (the model's 2x/4x upsamples ride this path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mtt_tpu.models.layers import interpolate

    rng = np.random.default_rng(0)
    for (h, w, oh, ow) in [(32, 32, 128, 128), (8, 8, 16, 16),
                           (16, 24, 33, 50), (128, 128, 512, 512)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, 5)).astype(np.float32))
        ref = jax.image.resize(x, (2, oh, ow, 5), method="linear")
        got = interpolate(x, (oh, ow))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_up4_head_path_matches_materialized(monkeypatch):
    """MTT_HEAD_UP4=1 routes ConvHead through the low-res composite
    upsample+conv (layers.up4_conv3x3_*); same param tree, same math as
    the default materialized path — in eval AND train mode (BN stats)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mtt_tpu.models.wrappers import TaskPrompterNet

    tasks = ("semseg", "edge")
    model = TaskPrompterNet(tasks=tasks,
                            num_outputs={"semseg": 5, "edge": 1},
                            backbone_name="TaskPrompter_vitT", tar_dim=24,
                            final_dim=28, use_ctr=False, drop_path_rate=0.0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    monkeypatch.setenv("MTT_HEAD_IMPL", "dense")
    v = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(v, x, train=False)
    ref_tr, mut_ref = model.apply(v, x, train=True, mutable=["batch_stats"],
                                  rngs={"dropout": jax.random.PRNGKey(1)})
    for impl in ("phase", "factored"):
        monkeypatch.setenv("MTT_HEAD_IMPL", impl)
        got = model.apply(v, x, train=False)
        got_tr, mut_got = model.apply(v, x, train=True,
                                      mutable=["batch_stats"],
                                      rngs={"dropout": jax.random.PRNGKey(1)})
        for t in tasks:
            np.testing.assert_allclose(got[t], ref[t], atol=2e-5, rtol=1e-5,
                                       err_msg=f"{impl}:{t}")
            np.testing.assert_allclose(got_tr[t], ref_tr[t], atol=2e-5,
                                       rtol=1e-5, err_msg=f"{impl}:{t}")
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
            mut_ref["batch_stats"], mut_got["batch_stats"])


def test_bench_numerator_counts_reference_head_composition():
    """The per-config FLOP numerator must model the REFERENCE's head
    composition (conv3x3 on the materialised 4x-upsampled map,
    taskprompter.py:411-421,688-698), not this repo's factored up4 head
    (~8.7x fewer FLOPs, identical math): counting our own algorithmic
    saving shrinks tflop_per_img and inflates the A100 target (r5
    PERF.md "numerator drift": NYUD lost 15.7%, ViT-B a third)."""
    import numpy as np
    import bench
    from mtt_tpu.models.wrappers import TaskPrompterNet

    assert bench._XLA_IMPL_ENV.get("MTT_HEAD_IMPL") == "dense"

    tasks = ("semseg", "edge")
    model = TaskPrompterNet(tasks=tasks,
                            num_outputs={"semseg": 5, "edge": 1},
                            backbone_name="TaskPrompter_vitT", tar_dim=24,
                            final_dim=28, use_ctr=False, drop_path_rate=0.0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 64, 3)),
                    jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    # xla_flops forces the dense composition regardless of ambient env
    f_ref = bench.xla_flops(lambda vv, i: model.apply(vv, i, train=False),
                            v, x)
    import os
    saved = os.environ.get("MTT_HEAD_IMPL")
    os.environ["MTT_HEAD_IMPL"] = "factored"
    try:
        f_fac = float(jax.jit(
            lambda vv, i: model.apply(vv, i, train=False)
        ).lower(v, x).compile().cost_analysis().get("flops", -1.0))
    finally:
        if saved is None:
            os.environ.pop("MTT_HEAD_IMPL", None)
        else:
            os.environ["MTT_HEAD_IMPL"] = saved
    # reference composition strictly outweighs the factored lowering by
    # the naive-head delta: 2*(4g)^2*9*C^2 per task dominates tiny grids
    g2, C = (64 // 16) ** 2, 28
    naive_heads = 2 * 16 * g2 * 9 * C * C * len(tasks)
    assert f_ref > f_fac, (f_ref, f_fac)
    assert f_ref - f_fac > 0.5 * naive_heads, (f_ref, f_fac, naive_heads)
