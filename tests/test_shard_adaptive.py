"""shard+adaptive differential tests on the forced 8-device CPU mesh.

The mode distributes the occupied-cell sparse solver (ops/sparse_fmm.py)
with sub-O(N) communication (parallel/shard_adaptive.py); the reference
covers this cell only by brute force
(ref: src/murb/implem/SimulationNBodyMultiNode.cpp:94-148).  Every test
runs the real collective step under shard_map and checks against the
exact single-device oracle.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from murb_tpu.core.init import SCHEMES
from murb_tpu.core.state import BodyState
from murb_tpu.models import create_engine

from conftest import assert_within_rel

SOFT = 2.0e8
DT = 3600.0


def _two_cluster_state(n=4000, seed=0):
    """Clustered wide box: soft (2e8) four orders below the box (1e12) --
    the geometry the dense hierarchy cannot meet and the adaptive solver
    exists for (test_sparse_fmm's regime at engine scale)."""
    rng = np.random.default_rng(seed)
    q = np.concatenate([
        rng.normal(0, 1.0, (n // 2, 3)) * 1e10 + [-5e11, 0.0, 0.0],
        rng.normal(0, 1.0, (n - n // 2, 3)) * 1e10 + [5e11, 1e11, -5e10],
    ]).astype(np.float32)
    m = (rng.uniform(0.5, 2.0, n) * 1e30).astype(np.float32)
    v = rng.normal(0.0, 10.0, (n, 3)).astype(np.float32)
    return BodyState.from_arrays(
        m, np.full(n, 1e8, np.float32), q[:, 0], q[:, 1], q[:, 2],
        v[:, 0], v[:, 1], v[:, 2])


def test_shard_adaptive_matches_oracle_two_cluster(n_devices):
    """3 oracle-locked steps on the clustered wide box (the mode's home
    regime): force error under the adaptive solver's 1e-4 contract keeps
    the trajectory inside 1e-3."""
    bodies = _two_cluster_state()
    ref = create_engine("cpu+naive", bodies, soft=SOFT, dt=DT)
    tgt = create_engine("shard+adaptive", bodies, soft=SOFT, dt=DT,
                        shards=n_devices)
    assert tgt.tag == "shard+adaptive"
    for i in range(3):
        ref.compute_one_iteration()
        tgt.compute_one_iteration()
        a, b = ref.bodies.unpadded(), tgt.bodies.unpadded()
        for c in ("qx", "qy", "qz"):
            # rms_floor 5e-6: positions near the box center (|q| ~ 1e8
            # vs rms ~ 7e10) are cancellation-dominated -- dt^2-summed
            # solver error (~6e-6 of typical accelerations, inside the
            # 1e-4 force contract) exceeds their tiny relative scale.
            assert_within_rel(b[c], a[c], 1e-3,
                              f"shard+adaptive iter {i} {c}",
                              rms_floor=5e-6)


def test_shard_adaptive_matches_oracle_galaxy(n_devices):
    """Compact distributions must stay correct too (the planner picks a
    shallow geometry; the P2P near field carries most of the answer).
    Small n + explicit geometry: the compact galaxy otherwise plans a
    fat near field whose CPU-mesh compile dominated the whole suite
    (92 s measured)."""
    bodies = SCHEMES["galaxy"](512, 123)
    ref = create_engine("cpu+naive", bodies, soft=SOFT, dt=DT)
    tgt = create_engine("shard+adaptive", bodies, soft=SOFT, dt=DT,
                        shards=n_devices, m=6, levels=4)
    for i in range(2):
        ref.compute_one_iteration()
        tgt.compute_one_iteration()
    a, b = ref.bodies.unpadded(), tgt.bodies.unpadded()
    for c in ("qx", "qy", "qz"):
        assert_within_rel(b[c], a[c], 2e-3, f"galaxy {c}", rms_floor=1e-6)


def test_shard_fmm_promotes_clustered_wide_box_to_adaptive(n_devices):
    """shard+fmm auto-promotes to the adaptive mode when the dense
    hierarchy cannot meet tol on the box (required order > 16) -- the
    same policy rung as the single-chip CLI ladder (cli.py)."""
    bodies = _two_cluster_state(n=1000, seed=9)
    tgt = create_engine("shard+fmm", bodies, soft=SOFT, dt=DT,
                        shards=n_devices)
    assert tgt.mode == "adaptive"
    assert tgt.tag == "shard+adaptive"
    assert tgt.adaptive_plan is not None


def test_shard_adaptive_identity_and_health(n_devices):
    """One engine, two contracts (shared build: the shard_map compile
    dominates this suite's wall time).  (a) The engine Morton-permutes
    residence internally; the observation surface (bodies property ->
    unpadded()) must return the ORIGINAL body order (per-body
    trajectories / CSV / checkpoints).  (b) proxy_health reports the
    planned capacities as healthy at build and carries the measured
    validation error."""
    bodies = _two_cluster_state(n=2000, seed=3)
    m0 = np.asarray(bodies.m[:bodies.n]).copy()
    tgt = create_engine("shard+adaptive", bodies, soft=SOFT, dt=DT,
                        shards=n_devices)
    np.testing.assert_array_equal(np.asarray(tgt.bodies.unpadded()["m"]),
                                  m0)
    tgt.compute_one_iteration()
    np.testing.assert_array_equal(np.asarray(tgt.bodies.unpadded()["m"]),
                                  m0)
    h = tgt.proxy_health()
    assert h["using_adaptive"] and h["ok"]
    assert h["strays"] <= h["stray_cap"]
    assert h["exports"] <= h["export_cap"]
    assert h["local_cells"] <= h["local_cap"]
    assert h["global_cells"] <= h["global_cap"]
    assert h["out_of_box"] == 0
    assert 0 < tgt.validated_err <= 1e-4


def test_shard_adaptive_stray_completion(n_devices):
    """Stray targets (bodies whose cell left their shard's key range)
    get exact psum'd near-field rows.  Plan at q0, then evaluate the
    SAME compiled step at a drifted q1 where a block of bodies has
    crossed into another shard's region -- the acceleration must still
    match the exact oracle (the halo pool alone cannot see a stray's
    interior-range sources)."""
    from jax.sharding import PartitionSpec as P

    from murb_tpu.core.state import BodyState
    from murb_tpu.ops.naive import acc_naive
    from murb_tpu.parallel.mesh import SHARD_AXIS, make_mesh, shard_state
    from murb_tpu.parallel.shard_adaptive import (
        make_local_step,
        plan_shard_adaptive,
    )

    rng = np.random.default_rng(11)
    n, npad = 2000, 2048
    q0 = np.concatenate([
        rng.normal(0, 1.0, (n // 2, 3)) * 1e10 + [-5e11, 0.0, 0.0],
        rng.normal(0, 1.0, (n - n // 2, 3)) * 1e10 + [5e11, 0.0, 0.0],
    ]).astype(np.float32)
    m = (rng.uniform(0.5, 2.0, n) * 1e30).astype(np.float32)
    st = BodyState.from_arrays(
        m, np.ones(n, np.float32), q0[:, 0], q0[:, 1], q0[:, 2],
        np.zeros(n, np.float32), np.zeros(n, np.float32),
        np.zeros(n, np.float32), pad_multiple=npad)
    plan, perm = plan_shard_adaptive(
        q0, npad, n_devices, 6, active=np.ones(n, bool))

    # drift: teleport 8 bodies from cluster A deep into cluster B --
    # their Morton cells now live in a far shard's range
    import dataclasses
    qx = np.asarray(st.qx).copy()
    qy = np.asarray(st.qy).copy()
    qz = np.asarray(st.qz).copy()
    movers = np.arange(8)
    qx[movers] = 5e11 + rng.normal(0, 1.0, 8).astype(np.float32) * 1e10
    st = dataclasses.replace(st, qx=jnp.asarray(qx), qy=jnp.asarray(qy),
                             qz=jnp.asarray(qz))
    fields = ("m", "r", "qx", "qy", "qz", "vx", "vy", "vz")
    stp = dataclasses.replace(
        st, **{k: getattr(st, k)[np.asarray(perm)] for k in fields})

    mesh = make_mesh(n_devices)
    stp = shard_state(stp, mesh)
    step = make_local_step(plan, SOFT, DT, axis_name=SHARD_AXIS,
                           integrate=False)
    fn = jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=P(SHARD_AXIS),
        out_specs=(P(SHARD_AXIS), P(SHARD_AXIS)), check_vma=False))
    _, acc = fn(stp)

    inv = np.empty_like(perm)
    inv[perm] = np.arange(npad)
    ax = np.asarray(acc.ax)[inv][:n]
    ay = np.asarray(acc.ay)[inv][:n]
    az = np.asarray(acc.az)[inv][:n]
    from murb_tpu import G
    ref = acc_naive(st.qx, st.qy, st.qz,
                    jnp.asarray(G, st.qx.dtype) * st.m, SOFT)
    scale = float(np.sqrt(np.mean(np.asarray(ref.ax)[:n] ** 2
                                  + np.asarray(ref.ay)[:n] ** 2
                                  + np.asarray(ref.az)[:n] ** 2)))
    for got, want in ((ax, ref.ax), (ay, ref.ay), (az, ref.az)):
        err = np.abs(got - np.asarray(want)[:n])
        assert err.max() <= 1e-3 * scale, err.max() / scale


def test_shard_adaptive_replan_fires_and_stays_locked(n_devices):
    """The mid-run re-plan contract (parallel/shard_adaptive.py:18-19,
    round-4 verdict item 2): a bulk-drifting cluster leaves the FROZEN
    planned box within a few steps; with ``adapt_every`` set the engine
    must (a) honor the knob (not silently drop it), (b) fire
    maybe_adapt -- rebuilding plan/residence/step from the gathered
    state -- and (c) keep the trajectory oracle-locked through the
    re-plans.  Drift speed is tuned so the box is exceeded by only a
    few percent between checks (a body far outside the frozen box
    extrapolates the Chebyshev basis -- the error the re-plan exists to
    prevent).  The drift points OUTWARD (-x from the -x cluster): at
    this degenerate scale every per-shard stray/export capacity
    saturates above nloc, so out_of_box is the counter a bulk drift can
    actually trip -- exactly the Chebyshev-extrapolation hazard."""
    import dataclasses

    bodies = _two_cluster_state(n=2000, seed=5)
    n = bodies.n
    # bulk -x velocity on cluster A (at -5e11): ~1.1e11/step vs the
    # plan's ~1.6e11 -x box margin -- out_of_box trips by step ~2
    vx = np.asarray(bodies.vx).copy()
    vx[: n // 2] -= 3.0e7
    bodies = dataclasses.replace(bodies, vx=jnp.asarray(vx))

    ref = create_engine("cpu+naive", bodies, soft=SOFT, dt=DT)
    tgt = create_engine("shard+adaptive", bodies, soft=SOFT, dt=DT,
                        shards=n_devices, adapt_every=1)
    assert tgt.adapt_every == 1          # the knob must not be dropped
    plan0 = tgt.adaptive_plan

    steps = 5
    ref.run(steps)
    tgt.run(steps)                        # segmented: re-plan checkpoints
    assert tgt.adaptive_plan is not plan0, "re-plan never fired"
    assert tgt.adaptive_plan.c != plan0.c or tgt.adaptive_plan.h != plan0.h

    a, b = ref.bodies.unpadded(), tgt.bodies.unpadded()
    for c in ("qx", "qy", "qz"):
        assert_within_rel(b[c], a[c], 2e-3, f"replan {c}", rms_floor=5e-6)

    # after a re-plan at the drifted state the plan must be healthy again
    tgt.maybe_adapt()
    assert tgt.proxy_health()["ok"]
