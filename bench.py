#!/usr/bin/env python
"""Headline benchmark: TaskPrompter-ViT-L PASCAL 5-task inference imgs/sec/chip.

Matches BASELINE.json's north star: >= 3x the A100-PyTorch reference
throughput per v5e chip. The reference publishes no throughput numbers
(SURVEY.md par.6) and no GPU is reachable here, so the denominator is a
documented FLOP-based derivation applied PER CONFIG to that config's own
measured forward cost (r3 VERDICT weak #1: a fixed ViT-L denominator
flattered ViT-B 3x and understated InvPT):

  * Forward cost: XLA cost_analysis of the REFERENCE's operator
    composition for this workload (the Pallas kernels hide FLOPs from
    cost_analysis, so the count comes from an all-XLA lowering via the
    impl env switches). The counting lowering also forces
    MTT_HEAD_IMPL=dense: the reference applies each ConvHead's 3x3 conv
    to the 4x-UPSAMPLED feature map (taskprompter.py:411-421,688-698);
    this repo's factored/fused up4 head computes the identical math with
    ~8.7x fewer head FLOPs, and counting THOSE would silently credit our
    algorithmic win to the A100 reference (shrinking tflop_per_img
    inflates the imgs/s target; the r4 NYUD/ViT-B entries lost 13-33%
    of their numerator exactly this way while the headline was pinned to
    the pre-factoring count of 1.006 — the live dense-composition count
    reproduces it at 1.007, docs/PERF.md r5 numerator section).
  * Reference precision: the published recipe is plain fp32 eager — no
    autocast/GradScaler anywhere (SURVEY.md par.2.5); torch>=1.12 also
    disables TF32 matmuls by default. Faithful A100 ceiling: 19.5 TF/s
    fp32 * ~60% eager efficiency.
  * Generous denominator (used for vs_baseline): assume the operator
    enables TF32 matmuls (156 TF/s peak); multi-task eager models
    realistically sustain ~30% -> 46.8 TF/s. Then
        a100_imgs_per_sec = 46.8 / tflop_per_img
        target            = 3 * a100_imgs_per_sec
        vs_baseline       = measured / target.
    (A hypothetical fp16-AMP port would be ~2.3x faster, but that is a
    different program than the reference.)

The JSON line also reports the chip roofline fraction: measured bf16
matmul peak on this v5e is 195.7 TF/s (tools/microbench3.py).

Env overrides: MTT_BENCH_MODEL (taskprompter|invpt|backbone),
MTT_BENCH_BACKBONE, MTT_BENCH_DB (pascal|nyud), MTT_BENCH_BATCH,
MTT_BENCH_STEPS.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

A100_EAGER_TFLOPS = 46.8         # 156 TF/s TF32 peak * 0.30 eager efficiency
TARGET_MULTIPLIER = 3.0
V5E_BF16_PEAK_TFLOPS = 195.7     # measured, tools/microbench3.py matmuls_x24
FALLBACK_TFLOP_PER_IMG = 1.006   # headline reference-composition count,
                                 # kept as a floor should cost_analysis fail

# reference dataset recipes (configs/*: input scale + task set)
_DBS = {
    "pascal": dict(
        size=(512, 512),
        tasks=("semseg", "human_parts", "sal", "edge", "normals"),
        num_out={"semseg": 21, "human_parts": 7, "sal": 2, "edge": 1,
                 "normals": 3}),
    # NYUD-v2: 448x576 crop, 4 tasks, 40-class semseg
    # (InvPT/configs/nyud/nyud_vitLp16.yml, utils/config.py:112-124)
    "nyud": dict(
        size=(448, 576),
        tasks=("semseg", "depth", "edge", "normals"),
        num_out={"semseg": 40, "depth": 1, "edge": 1, "normals": 3}),
}

_XLA_IMPL_ENV = {"MTT_ATTN_IMPL": "xla", "MTT_MLP_IMPL": "xla",
                 "MTT_LN_IMPL": "xla", "MTT_DECODE_IMPL": "xla",
                 "MTT_HEAD_KERNEL_IMPL": "xla", "MTT_TAIL_IMPL": "xla",
                 # reference head composition: upsample4 -> conv3x3 at
                 # full resolution (see module docstring) — the factored
                 # up4 head must not shrink the reference's modeled cost
                 "MTT_HEAD_IMPL": "dense"}


def xla_flops(fn, *args) -> float:
    """FLOPs of fn(*args) from an all-XLA lowering (cost_analysis cannot
    see inside Pallas custom calls; the impl env switches are read at
    trace time)."""
    import jax
    saved = {k: os.environ.get(k) for k in _XLA_IMPL_ENV}
    os.environ.update(_XLA_IMPL_ENV)
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    finally:
        for k, old in saved.items():
            if old is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = old
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", -1.0))


def derive(imgs_per_sec: float, tflop_per_img: float) -> dict:
    """Per-config honest baseline: the SAME A100-eager derivation the
    headline uses, applied to this config's own FLOP count."""
    if tflop_per_img <= 0:
        return {"vs_baseline": None}
    a100 = A100_EAGER_TFLOPS / tflop_per_img
    achieved = imgs_per_sec * tflop_per_img
    vs = imgs_per_sec / (TARGET_MULTIPLIER * a100)
    # Sensitivity of the one unmeasured constant (the 0.30 eager factor):
    # vs_baseline scales as 0.30/f. Literature anchor: timm's published
    # A100 inference tables put vit_large_patch16_384 fp32 eager at
    # ~100-130 imgs/s (~19-25 TF/s achieved = factor 0.12-0.16 of the
    # TF32 peak), so 0.30 is ~2x GENEROUS to the reference; the faithful
    # reading of the published recipe (fp32, TF32 off, 19.5 TF/s x 0.6
    # eager = 11.7 TF/s) is ~4x easier than the committed target.
    return {
        "vs_baseline": round(vs, 4),
        "tflop_per_img": round(tflop_per_img, 4),
        "achieved_tflops": round(achieved, 1),
        "roofline_fraction": round(achieved / V5E_BF16_PEAK_TFLOPS, 4),
        "a100_ref_derivation": (
            f"{tflop_per_img:.4g} TFLOP/img / (156 TF/s TF32 * 0.30 eager"
            f" = 46.8 TF/s) = {a100:.1f} imgs/s; x3 target = "
            f"{TARGET_MULTIPLIER * a100:.1f}"),
        "vs_baseline_sensitivity": {
            "eager_0.20": round(vs * 0.30 / 0.20, 4),
            "eager_0.30": round(vs, 4),
            "eager_0.40": round(vs * 0.30 / 0.40, 4),
            "fp32_faithful_11.7TFs": round(vs * A100_EAGER_TFLOPS / 11.7, 4),
        },
    }


def main():
    import jax
    import jax.numpy as jnp

    from mtt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from mtt_tpu.models.wrappers import TaskPrompterNet, TransformerNet
    from mtt_tpu.models.vit import build_vit

    model_kind = os.environ.get("MTT_BENCH_MODEL", "taskprompter")
    backbone = os.environ.get("MTT_BENCH_BACKBONE", "TaskPrompter_vitL")
    db = os.environ.get("MTT_BENCH_DB", "pascal")
    batch = int(os.environ.get("MTT_BENCH_BATCH", "8"))
    steps = int(os.environ.get("MTT_BENCH_STEPS", "20"))

    rec = _DBS[db]
    tasks, num_out = rec["tasks"], rec["num_out"]
    h, w = rec["size"]
    if model_kind == "taskprompter":
        model = TaskPrompterNet(
            tasks=tasks, num_outputs=num_out, backbone_name=backbone,
            tar_dim=300, final_dim=350, use_ctr=True, chan_nheads=1,
            dtype=jnp.bfloat16)
        label = f"TaskPrompter-{backbone.replace('TaskPrompter_vit', 'ViT-')}"
    elif model_kind == "invpt":
        model = TransformerNet(
            tasks=tasks, num_outputs=num_out, backbone_name="vitL",
            embed_dim=512, pred_out=64, dtype=jnp.bfloat16)
        label = "InvPT-ViT-L"
    elif model_kind == "backbone":
        model = build_vit("vitL", (h, w), dtype=jnp.bfloat16)
        label = "ViT-L-backbone-only"
    else:
        raise SystemExit(f"unknown MTT_BENCH_MODEL {model_kind}")

    x = jnp.zeros((batch, h, w, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=())(
        jax.random.PRNGKey(0), x)
    # params in bf16 for inference: halves the HBM weight traffic per step
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, variables)

    @jax.jit
    def fwd(v, inp):
        out = model.apply(v, inp, train=False)
        # scalar checksum forces full materialisation; device_get of it is a
        # reliable sync point even through remote-dispatch tunnels where
        # block_until_ready can return early
        leaves = jax.tree.leaves(out)
        return jnp.float32(sum(jnp.sum(l.astype(jnp.float32))
                               for l in leaves))

    is_headline = (model_kind == "taskprompter" and backbone.endswith("vitL")
                   and db == "pascal")
    tflop_per_img = FALLBACK_TFLOP_PER_IMG if is_headline else 0.0
    try:
        f = xla_flops(lambda v, i: model.apply(v, i, train=False),
                      variables, x)
        if f / batch / 1e12 > tflop_per_img:
            tflop_per_img = f / batch / 1e12
    except Exception:  # noqa: BLE001 - cost_analysis is best-effort
        pass

    chk = float(jax.device_get(fwd(variables, x)))  # compile + warm-up
    # the warm-up traced the real (Pallas-default) path: if any fused
    # kernel gate silently rejected a flagship shape, the bench must say
    # so instead of publishing a number that quietly lost the kernel
    from mtt_tpu.kernels.fallback_log import fallbacks_seen
    fb = fallbacks_seen()
    if fb and jax.default_backend() == "tpu" \
            and os.environ.get("MTT_ALLOW_FALLBACK") != "1":
        raise SystemExit(
            f"[bench] fused-kernel fallback on benched shapes: {fb} "
            f"(set MTT_ALLOW_FALLBACK=1 to bench anyway)")
    # best of 3 timing windows: single-window numbers drift ~1% with
    # chip/tunnel contention and the round record is one bench run
    best_dt = None
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(steps):
            chk = fwd(variables, x)
        chk = float(jax.device_get(chk))
        dt = time.perf_counter() - t0
        best_dt = dt if best_dt is None else min(best_dt, dt)
    dt = best_dt
    assert np.isfinite(chk)
    imgs_per_sec = steps * batch / dt

    dbl = "PASCAL 5-task" if db == "pascal" else "NYUD 4-task"
    print(json.dumps({
        "metric": f"imgs/sec/chip ({label} {dbl} "
                  f"inference, bf16, batch {batch})",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec/chip",
        **derive(imgs_per_sec, tflop_per_img),
    }))


if __name__ == "__main__":
    main()
