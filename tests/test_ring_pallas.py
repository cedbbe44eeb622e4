"""Pipelined RDMA ring kernel tests (ops/ring_pallas.py).

Runs on the forced CPU mesh via Pallas *TPU interpret mode*, which simulates
HBM/VMEM, remote DMAs, and semaphores -- including a cross-core race
detector.  This validates the overlap protocol's synchronization exactly
(the thing ppermute gave us for free), not just the numerics.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from murb_tpu import G
from murb_tpu.core.init import SCHEMES
from murb_tpu.models import create_engine
from murb_tpu.ops.naive import acc_naive
from murb_tpu.ops.ring_pallas import acc_ring_pipelined
from murb_tpu.parallel.mesh import SHARD_AXIS, make_mesh

from conftest import assert_within_rel

SOFT = 2.0e8
DT = 3600.0


def _skip_interpret_on_tpu():
    """The TPU-interpret simulator (simulated HBM/VMEM/DMAs/semaphores +
    vector-clock race detection) is meant to run on CPU; on the real TPU
    backend the simulation itself gets lowered to the chip and its
    compile runs for 25+ minutes before the relay gives up (measured).
    The protocol validation lives in the CPU suite; the real kernel's
    on-chip execution is covered by
    test_engine_ring_pipelined_matches_ppermute."""
    if jax.default_backend() == "tpu":
        pytest.skip("TPU-interpret simulation runs on the CPU suite")


def _ring_accel(s, gm, d, interp):
    mesh = make_mesh(d)
    fn = jax.shard_map(
        functools.partial(acc_ring_pipelined, soft=SOFT,
                          axis_name=SHARD_AXIS, n_devices=d,
                          interpret=interp),
        mesh=mesh, in_specs=P(SHARD_AXIS), out_specs=P(SHARD_AXIS),
        check_vma=False,
    )
    return fn(s.qx, s.qy, s.qz, gm)


@pytest.mark.parametrize("d", [1, 2, 4])
def test_ring_pipelined_matches_oracle(d, n_devices):
    """Every ring length (incl. the degenerate D=1 no-RDMA case and the
    D=2 no-capacity-handshake case) reproduces the full all-pairs sum."""
    if d > n_devices:
        pytest.skip("not enough devices")
    _skip_interpret_on_tpu()
    s = SCHEMES["galaxy"](1024, 7)
    gm = jnp.asarray(G, s.qx.dtype) * s.m
    ref = acc_naive(s.qx, s.qy, s.qz, gm, SOFT)
    a = _ring_accel(s, gm, d, pltpu.InterpretParams())
    for c in ("ax", "ay", "az"):
        assert_within_rel(np.asarray(getattr(a, c)),
                          np.asarray(getattr(ref, c)),
                          1e-5, f"ring d={d} {c}", rms_floor=1e-7)


def test_ring_pipelined_race_free(n_devices):
    """The interpreter's vector-clock race detector must stay silent: the
    send/recv/capacity semaphore protocol fully orders every cross-device
    buffer access."""
    _skip_interpret_on_tpu()
    d = min(4, n_devices)
    s = SCHEMES["random"](512, 3)
    gm = jnp.asarray(G, s.qx.dtype) * s.m
    a = _ring_accel(s, gm, d, pltpu.InterpretParams(detect_races=True))
    assert np.all(np.isfinite(np.asarray(a.ax)))


def test_engine_ring_pipelined_matches_ppermute(n_devices):
    """The fused-kernel ring engine lands on the ppermute engine's
    trajectory."""
    d = min(4, n_devices)
    bodies = SCHEMES["galaxy"](1024, 9)
    a = create_engine("shard+ring", bodies, soft=SOFT, dt=DT, shards=d,
                      ring_impl="ppermute")
    b = create_engine("shard+ring", bodies, soft=SOFT, dt=DT, shards=d,
                      ring_impl="pipelined")
    assert b.ring_impl == "pipelined"
    for _ in range(2):
        a.compute_one_iteration()
        b.compute_one_iteration()
    da, db = a.bodies.unpadded(), b.bodies.unpadded()
    for c in ("qx", "qy", "qz"):
        assert_within_rel(db[c], da[c], 1e-5, f"ring engines {c}",
                          rms_floor=1e-7)
