#!/usr/bin/env python
"""Decompose TaskPrompter-ViT-L inference cost on the attached TPU.

Times (a) the full 5-task model, (b) the prompted backbone incl. decode,
(c) a plain ViT-L (24 blocks, no prompts/decode), under selectable
attention impls, and prints the XLA cost_analysis FLOP count — the
rigorous denominator for bench.py's roofline math (VERDICT.md item 10).

Usage: python tools/perf_probe.py [--batch 8] [--steps 10]
       [--which full,backbone,vit] [--attn pallas,xla]
"""

from __future__ import annotations

import argparse
import sys
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import os
import time


def time_fn(fn, args, steps):
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    chk = float(jax.device_get(fn(*args)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jax.device_get(out))
    dt = (time.perf_counter() - t0) / steps
    return dt, compile_s


def flops_of(fn, args):
    import jax
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", -1.0))
    except Exception as e:  # noqa: BLE001
        return f"cost_analysis failed: {e}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--which", default="full,vit")
    ap.add_argument("--attn", default="pallas")
    ap.add_argument("--backbone", default="TaskPrompter_vitL")
    ap.add_argument("--flops", action="store_true",
                    help="also run cost_analysis (extra compile)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mtt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from mtt_tpu.models.taskprompter import TASKPROMPTER_VIT_SPECS, TaskPrompterViT
    from mtt_tpu.models.vit import build_vit
    from mtt_tpu.models.wrappers import TaskPrompterNet

    tasks = ("semseg", "human_parts", "sal", "edge", "normals")
    num_out = {"semseg": 21, "human_parts": 7, "sal": 2, "edge": 1,
               "normals": 3}
    B = args.batch
    x = jnp.zeros((B, 512, 512, 3), jnp.float32)
    results = {}

    for attn in args.attn.split(","):
        os.environ["MTT_ATTN_IMPL"] = attn
        for which in args.which.split(","):
            key = f"{which}/{attn}"
            if which == "full":
                model = TaskPrompterNet(
                    tasks=tasks, num_outputs=num_out,
                    backbone_name=args.backbone, tar_dim=300, final_dim=350,
                    use_ctr=True, chan_nheads=1, dtype=jnp.bfloat16)
            elif which == "backbone":
                spec = TASKPROMPTER_VIT_SPECS[args.backbone]
                model = TaskPrompterViT(
                    tasks=tasks, img_size=(512, 512), chan_nheads=1,
                    prompt_len=1, tar_dim=300, final_dim=350, use_ctr=True,
                    dtype=jnp.bfloat16, **spec)
            elif which == "vit":
                suffix = args.backbone.split("vit")[-1]
                model = build_vit("vit" + suffix, (512, 512),
                                  dtype=jnp.bfloat16)
            else:
                raise SystemExit(f"unknown which {which}")

            variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

            @jax.jit
            def fwd(v, inp):
                out = model.apply(v, inp, train=False)
                return jnp.float32(sum(jnp.sum(l.astype(jnp.float32))
                                       for l in jax.tree.leaves(out)))

            dt, compile_s = time_fn(fwd, (variables, x), args.steps)
            entry = {"sec/step": round(dt, 4),
                     "imgs/sec": round(B / dt, 2),
                     "compile_s": round(compile_s, 1)}
            if args.flops:
                f = flops_of(lambda v, inp: model.apply(v, inp, train=False),
                             (variables, x))
                entry["flops"] = f
                if isinstance(f, float) and f > 0:
                    entry["tflop/img"] = round(f / B / 1e12, 4)
                    entry["achieved_tflops"] = round(f / B / dt / 1e12 * B, 1)
            results[key] = entry
            print(json.dumps({key: entry}), flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
