"""Worker process for the multi-host smoke test (not a pytest module).

Usage: python multihost_worker.py <process_id> <num_processes> <port>

Brings up the JAX distributed runtime through the SAME env-driven entry
point the CLI uses (murb_tpu.parallel.mesh.maybe_init_distributed), forces
the CPU platform with 4 virtual devices, and runs one step of shard+proxy
and shard+ring over the resulting 2-process x 4-device global mesh.  Both
processes print a jit-computed global checksum per engine; the parent test
asserts the processes agree and exit cleanly.

This executes the multi-node capability the reference only documents
(srun -n 4, ref: README.md:93-95) and never tests.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["MURB_COORDINATOR"] = f"localhost:{port}"
os.environ["MURB_NUM_PROCESSES"] = str(nproc)
os.environ["MURB_PROCESS_ID"] = str(pid)
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = f"{flags} --xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")  # before any backend use

from murb_tpu.parallel.mesh import maybe_init_distributed

assert maybe_init_distributed(), "coordinator env not picked up"
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, jax.devices()
assert len(jax.local_devices()) == 4

import jax.numpy as jnp

from murb_tpu.core.init import SCHEMES
from murb_tpu.models import create_engine

global_sum = jax.jit(jnp.sum)

for tag in ("shard+proxy", "shard+ring"):
    bodies = SCHEMES["galaxy"](1024, 7)  # same seed on every process
    engine = create_engine(tag, bodies, soft=2.0e8, dt=3600.0)
    engine.compute_one_iteration()
    engine.block_until_ready()
    # a cross-process reduction: identical (replicated) on every host
    chk = float(global_sum(engine.bodies.qx))
    assert chk == chk, "NaN checksum"  # finite
    print(f"CHECKSUM {tag} {chk:.10e}", flush=True)

print("WORKER_DONE", flush=True)
