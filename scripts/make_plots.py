#!/usr/bin/env python
"""Benchmark comparison plots: murb-tpu measurements vs the reference tables.

Analogue of the reference's scripts/make_plots.py (hard-coded benchmark
tables -> figures).  The reference numbers below are its published results
(Report.pdf Tables 1-5 via scripts/make_plots.py in the reference repo);
murb-tpu numbers come from BENCH_r*.json files in the repo root (written by
the driver from bench.py) plus optional --extra "label:fps" pairs.

Usage: python scripts/make_plots.py [outdir]
"""
import glob
import json
import os
import sys

# Reference published rows: (label, FPS, ref-GFlop/s) -- N=200k unless noted.
REFERENCE_ROWS = [
    ("4090 gpu+tile+full N=200k", 40.1, 29_880.0),
    ("4090 gpu+tile+full200k N=200k", 40.5, 30_170.0),
    ("4090 gpu+tile+full N=500k", 7.8, 36_322.0),
    ("iml cpu+omp 12t N=30k", 27.3, 458.2),
]


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "."
    os.makedirs(outdir, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ours = []
    for path in sorted(glob.glob("BENCH_r*.json")):
        try:
            with open(path) as f:
                d = json.load(f)
            rnd = path.split("BENCH_r")[1].split(".")[0]
            ours.append((f"v5e tpu+proxy r{rnd} N=200k", d.get("fps", 0),
                         d.get("value", 0)))
            if "fps_exact_allpairs" in d:
                ours.append((f"v5e tpu+hybrid r{rnd} N=200k",
                             d["fps_exact_allpairs"],
                             d.get("ref_gflops_exact_allpairs", 0)))
        except (json.JSONDecodeError, KeyError):
            continue
    if not ours:
        print("no BENCH_r*.json found; run `python bench.py > BENCH_r0.json`")

    rows = REFERENCE_ROWS + ours
    labels = [r[0] for r in rows]
    gflops = [r[2] for r in rows]
    colors = ["#888888"] * len(REFERENCE_ROWS) + ["#2077b4"] * len(ours)

    fig, ax = plt.subplots(figsize=(9, 0.5 * len(rows) + 2))
    ax.barh(range(len(rows)), gflops, color=colors)
    ax.set_yticks(range(len(rows)))
    ax.set_yticklabels(labels, fontsize=9)
    ax.set_xlabel("ref-GFlop/s (20*N^2/step, 1024^3 divisor)")
    ax.set_xscale("log")
    ax.set_title("all-pairs N-body throughput: reference (grey) vs murb-tpu (blue)")
    ax.invert_yaxis()
    fig.tight_layout()
    out = os.path.join(outdir, "bench_comparison.png")
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
