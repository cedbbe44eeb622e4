#!/usr/bin/env bash
# End-to-end showcase: generate a two-galaxy merger, simulate it with
# per-galaxy conserved-quantity tracking, record the trajectory, and render
# frames + metric plots.  Exercises the whole stack: native .tab parser,
# multi-galaxy tracking engine, proxy-validated kernels, trajectory writer,
# offline renderer, history CSV + plots.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${OUT:-/tmp/murb_demo}
I=${I:-60}
mkdir -p "$OUT"

echo "== 1. generate initial conditions (81,920 bodies)"
python scripts/make_two_galaxy_tab.py "$OUT/milkyway_andromeda.tab"

echo "== 2. simulate with per-galaxy tracking + trajectory recording"
# CLI-default physics IS merger-correct in the .tab's scaled units
# (1 kpc |-> 1e9 m: soft=2e8 is 0.2 kpc, dt=3600 is ~3% of a rotation
# period; see make_two_galaxy_tab.py docstring)
python -m murb_tpu -n 81920 -i "$I" -s mw+andromeda \
  --scheme-file "$OUT/milkyway_andromeda.tab" \
  --im gpu+tracking+multi --nv --gf -v \
  --csv "$OUT/metrics.csv" \
  --dump-traj "$OUT/run.traj" --dump-every 5 \
  --ite-chunk 5

echo "== 3. render"
python scripts/render_trajectory.py "$OUT/run.traj" "$OUT/frames" \
  --gif "$OUT/merger.gif" --elev 60 --azim 20
python scripts/plot_history_metrics.py "$OUT/metrics.csv" "$OUT/metrics"

echo "demo artifacts in $OUT"
