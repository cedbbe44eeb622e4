#!/usr/bin/env bash
# Multi-host launch for the distributed engines (the analogue of the
# reference's `srun -n 4 ./bin/murb ... --im mpi`, ref: README.md:93-95).
#
# On a real multi-host TPU pod slice, run the same command on every host;
# jax.distributed autodetects the coordinator from the TPU metadata, so no
# env is needed:
#     python -m murb_tpu -n 200000 -i 100 --im shard+proxy --nv --gf --scan
#
# Elsewhere (CPU smoke runs, GPU-style clusters), murb brings the runtime
# up from MURB_COORDINATOR / MURB_NUM_PROCESSES / MURB_PROCESS_ID
# (murb_tpu/parallel/mesh.py:maybe_init_distributed).  This script
# demonstrates that path locally: NPROC processes on this machine, each
# with 4 virtual CPU devices, one shard+proxy run across all of them.
set -euo pipefail

NPROC=${NPROC:-2}
PORT=${PORT:-$(python - <<'EOF'
import socket
s = socket.socket(); s.bind(("localhost", 0)); print(s.getsockname()[1])
EOF
)}
N=${N:-10000}
ITERS=${ITERS:-10}
IM=${IM:-shard+proxy}

echo "coordinator localhost:$PORT, $NPROC processes, --im $IM"
pids=()
for ((i = 0; i < NPROC; i++)); do
    MURB_COORDINATOR="localhost:$PORT" \
    MURB_NUM_PROCESSES="$NPROC" \
    MURB_PROCESS_ID="$i" \
    MURB_FORCE_CPU=1 \
    XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=4" \
    python -m murb_tpu -n "$N" -i "$ITERS" --im "$IM" --nv --gf --scan &
    pids+=($!)
done
rc=0
for p in "${pids[@]}"; do wait "$p" || rc=$?; done
exit $rc
