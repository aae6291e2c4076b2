#!/usr/bin/env python
"""Capture a jax.profiler trace of the bench forward and print a per-step
op-level cost breakdown (parses the xplane proto directly — the
tensorboard_plugin_profile converter is incompatible with this TF build).

Usage: python tools/trace_ops.py [--steps 3] [--top 25]
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import glob
import re
import shutil
import subprocess
import tempfile
from collections import defaultdict


def capture(tdir: str, steps: int):
    import jax
    import jax.numpy as jnp
    from mtt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from mtt_tpu.models.wrappers import TaskPrompterNet, TransformerNet

    from bench import _DBS
    rec = _DBS[os.environ.get("MTT_BENCH_DB", "pascal")]
    tasks, num_out = rec["tasks"], rec["num_out"]
    bh, bw = rec["size"]
    if os.environ.get("MTT_BENCH_MODEL") == "swin":
        from mtt_tpu.config import create_config
        from mtt_tpu.models.wrappers import build_model
        p = create_config(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs/cityscapes3d/taskprompter_swinB.yml"),
            {"run_mode": "infer"})
        model = build_model(p, dtype=jnp.bfloat16)
        x = jnp.zeros((1, 1024, 2048, 3), jnp.float32)
        v = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), x, train=False)
        v = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                         if hasattr(a, "dtype") and a.dtype == jnp.float32
                         else a, v)

        @jax.jit
        def fwd(v, inp):
            out = model.apply(v, inp, train=False)
            return jnp.float32(sum(jnp.sum(l.astype(jnp.float32))
                                   for l in jax.tree.leaves(out)))

        float(jax.device_get(fwd(v, x)))
        jax.profiler.start_trace(tdir)
        for _ in range(steps):
            r = fwd(v, x)
        float(jax.device_get(r))
        jax.profiler.stop_trace()
        return
    if os.environ.get("MTT_BENCH_MODEL") == "invpt":
        model = TransformerNet(
            tasks=tasks, num_outputs=num_out, backbone_name="vitL",
            embed_dim=512, pred_out=64, dtype=jnp.bfloat16)
    else:
        model = TaskPrompterNet(
            tasks=tasks, num_outputs=num_out,
            backbone_name=os.environ.get("MTT_BENCH_BACKBONE",
                                         "TaskPrompter_vitL"),
            tar_dim=300, final_dim=350, use_ctr=True, chan_nheads=1,
            dtype=jnp.bfloat16)
    x = jnp.zeros((int(os.environ.get("MTT_BENCH_BATCH", "8")),
                   bh, bw, 3), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    v = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                     if a.dtype == jnp.float32 else a, v)

    @jax.jit
    def fwd(v, inp):
        out = model.apply(v, inp, train=False)
        return jnp.float32(sum(jnp.sum(l.astype(jnp.float32))
                               for l in jax.tree.leaves(out)))

    float(jax.device_get(fwd(v, x)))
    jax.profiler.start_trace(tdir)
    for _ in range(steps):
        r = fwd(v, x)
    float(jax.device_get(r))
    jax.profiler.stop_trace()


def report(tdir: str, steps: int, top: int, cat_filter=None):
    # import of tf must happen in a clean env (PYTHONPATH sitecustomize adds
    # 30s+); caller handles that
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    f = glob.glob(tdir + "/**/*.xplane.pb", recursive=True)[0]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(f, "rb").read())
    p = [pl for pl in xs.planes if pl.name == "/device:TPU:0"][0]
    line = [l for l in p.lines if l.name == "XLA Ops"][0]
    agg = defaultdict(float)
    cnt = defaultdict(int)
    per_op = defaultdict(float)
    for ev in line.events:
        md = p.event_metadata[ev.metadata_id]
        m = re.match(r"%([a-zA-Z\-_]+)", md.name)
        cat = m.group(1).rstrip(".0123456789") if m else md.name[:20]
        agg[cat] += ev.duration_ps / 1e9 / steps
        cnt[cat] += 1
        per_op[md.name.split(" = ")[0]] += ev.duration_ps / 1e9 / steps
    print("== per-step by category (ms) ==")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{v:8.2f}  x{cnt[k]//steps:<5} {k}")
    print("total", round(sum(agg.values()), 1), "ms/step")
    print(f"== top {top} ops (ms/step) ==")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v:8.3f}  {k}")
    if cat_filter:
        # per-op drilldown for one category incl. every stat the profiler
        # attached (expression/provenance), to find the producing source line
        stat_md = p.stat_metadata
        seen = {}
        tot = defaultdict(float)
        for ev in line.events:
            md = p.event_metadata[ev.metadata_id]
            if not md.name.lstrip("%").startswith(cat_filter):
                continue
            key = md.name.split(" = ")[0]
            tot[key] += ev.duration_ps / 1e9 / steps
            if key not in seen:
                stats = {}
                for st in list(ev.stats) + list(md.stats):
                    nm = stat_md[st.metadata_id].name
                    val = (st.str_value or st.int64_value or st.uint64_value
                           or st.double_value or
                           st.ref_value and stat_md[st.ref_value].name)
                    stats[nm] = val
                seen[key] = (md.display_name, stats)
        print(f"== drilldown: {cat_filter} ==")
        for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
            dn, stats = seen[k]
            print(f"{v:8.3f}  {k}  dn={dn}")
            for sk, sv in stats.items():
                print(f"           {sk}: {str(sv)[:220]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dir", default=None)
    ap.add_argument("--report-only", action="store_true")
    ap.add_argument("--cat", default=None)
    args = ap.parse_args()
    tdir = args.dir or tempfile.mkdtemp(prefix="mtt_trace_")
    if not args.report_only:
        capture(tdir, args.steps)
    report(tdir, args.steps, args.top, args.cat)
    print("trace dir:", tdir)
