"""Device mesh helpers for the distributed engines."""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "sh"


def make_mesh(shards: int = 0, axis: str = SHARD_AXIS) -> Mesh:
    """1-D mesh over the first ``shards`` local devices (0 = all).

    The reference's multi-process axis is a 1-D MPI rank decomposition
    (ref: src/murb/implem/SimulationNBodyMultiNode.cpp:76-91); its TPU-native
    analogue is a 1-D mesh whose neighbor hops ride the ICI torus.
    """
    devs = jax.devices()
    d = shards or len(devs)
    if d > len(devs):
        raise ValueError(f"requested {d} shards but only {len(devs)} devices")
    return Mesh(np.asarray(devs[:d]), (axis,))


def shard_state(state, mesh: Mesh, axis: str = SHARD_AXIS):
    """Place every leaf of the body state block-sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), state)


def replicate_state(state, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), state)


def maybe_init_distributed() -> bool:
    """Multi-host bring-up: initialize the JAX distributed runtime when the
    environment names a coordinator.  The same mesh/collective code then
    spans hosts, with ICI inside a slice and DCN between slices -- the
    multi-node capability the reference reaches with mpirun/srun
    (ref: README.md:93-95), minus the MPI plumbing.

    Env: MURB_COORDINATOR (host:port), MURB_NUM_PROCESSES, MURB_PROCESS_ID.
    Returns True if initialization happened.
    """
    import os

    coord = os.environ.get("MURB_COORDINATOR")
    if not coord:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ.get("MURB_NUM_PROCESSES", "1")),
        process_id=int(os.environ.get("MURB_PROCESS_ID", "0")),
    )
    return True
