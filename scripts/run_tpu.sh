#!/usr/bin/env bash
# Launch recipes for a TPU VM -- the analogue of the reference's Slurm batch
# scripts (scripts/run_cpu.sh / run_gpu.sh): environment setup + the
# benchmark command lines used for the published tables.
set -euo pipefail
cd "$(dirname "$0")/.."

N=${N:-30000}
I=${I:-100}
IM=${IM:-tpu+hybrid}

# Persistent XLA compile cache (first kernel compile is ~10-40 s).
export MURB_COMPILE_CACHE="${MURB_COMPILE_CACHE:-$HOME/.cache/murb_tpu_xla}"

echo "== murb-tpu run: N=$N I=$I IM=$IM"
python -m murb_tpu -n "$N" -i "$I" --im "$IM" --nv --gf --scan

echo "== headline benchmark (N=200k vs RTX-4090 reference row)"
python bench.py
