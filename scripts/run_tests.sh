#!/usr/bin/env bash
# Two-phase test job, the analogue of the reference's run_tests.sh (CPU build
# + GPU build each running the same Catch2 suite, ref: scripts/run_tests.sh:27-52):
# phase 1 runs the whole pytest suite on the forced 8-device CPU mesh, phase 2
# re-runs the device-sensitive files on the real TPU chip.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== phase 1: CPU mesh (8 virtual devices), fast gate =="
python -m pytest tests/ -q -p no:cacheprovider

echo "== phase 1b: CPU mesh, slow-marked tests =="
MURB_TEST_SLOW=1 python -m pytest tests/ -q -m slow -p no:cacheprovider

echo "== phase 2: real TPU =="
MURB_TEST_TPU=1 python -m pytest \
  tests/test_oracle.py tests/test_proxy.py tests/test_fmm.py \
  tests/test_validate.py tests/test_state.py tests/test_integrators.py \
  tests/test_engines_differential.py tests/test_metrics.py \
  -q -p no:cacheprovider
