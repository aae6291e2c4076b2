#!/usr/bin/env python
"""ViT-B tuning sweep: batch size x kernel block params (r4 VERDICT #2).

Runs bench.py in a subprocess per point (env switches are read at trace
time) and prints a table. Keep points few — each cold compile through the
tunnel is minutes.

Usage: python tools/sweep_vitb.py [--points batch=8;batch=16 ...]
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

POINTS = [
    {"MTT_BENCH_BATCH": "8"},
    {"MTT_BENCH_BATCH": "16"},
    {"MTT_BENCH_BATCH": "32"},
    {"MTT_BENCH_BATCH": "16", "MTT_ATTN_HPB": "4"},
    {"MTT_BENCH_BATCH": "16", "MTT_MLP_BB": "4"},
]


def main():
    base = {"MTT_BENCH_BACKBONE": "TaskPrompter_vitB",
            "MTT_BENCH_STEPS": "20"}
    results = []
    for pt in POINTS:
        env = dict(os.environ, **base, **pt)
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             env=env, capture_output=True, text=True,
                             timeout=2400)
        line = None
        for ln in out.stdout.splitlines()[::-1]:
            if ln.startswith("{"):
                line = json.loads(ln)
                break
        tag = " ".join(f"{k.replace('MTT_BENCH_', '').replace('MTT_', '')}"
                       f"={v}" for k, v in pt.items())
        if line is None:
            print(f"{tag:40s} FAILED: {out.stderr[-300:]}")
            continue
        results.append((tag, line))
        print(f"{tag:40s} {line['value']:8.2f} imgs/s  "
              f"vs_baseline={line.get('vs_baseline')}")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
