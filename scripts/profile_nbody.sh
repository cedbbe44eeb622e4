#!/usr/bin/env bash
# Profiling driver -- the analogue of the reference's nbody_profiling.sh
# (RUN / NSYS / NCU modes, ref: scripts/nbody_profiling.sh:64-108).  On TPU
# the profiler is jax.profiler/XProf: MODE=TRACE captures a device trace
# viewable in tensorboard; MODE=RUN is a plain timed run.
set -euo pipefail
cd "$(dirname "$0")/.."

MODE=${MODE:-RUN}          # RUN | TRACE
N=${N:-30000}
I=${I:-50}
IM=${IM:-tpu+hybrid}
OUT=${OUT:-/tmp/murb_trace}

case "$MODE" in
  RUN)
    python -m murb_tpu -n "$N" -i "$I" --im "$IM" --nv --gf --scan
    ;;
  TRACE)
    python -m murb_tpu -n "$N" -i "$I" --im "$IM" --nv --gf --profile "$OUT"
    echo "view with: tensorboard --logdir $OUT"
    ;;
  *)
    echo "unknown MODE=$MODE (RUN|TRACE)" >&2; exit 1;;
esac
