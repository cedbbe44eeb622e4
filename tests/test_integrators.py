"""Integrator tests: leapfrog phase semantics + conservation quality.

The reference ships a leapfrog whose report concedes it misbehaves (Report.pdf
section 5; CLI arg-order bug SURVEY.md 2.10.1).  These tests pin down what a
*correct* phase-split leapfrog must do: match KDK leapfrog trajectories and
conserve energy better than explicit Euler.
"""
import numpy as np
import pytest

from murb_tpu.core import metrics
from murb_tpu.core.init import SCHEMES
from murb_tpu.models import create_engine

from conftest import assert_within_rel

SOFT = 2.0e8
DT = 3600.0


def _energy(engine):
    return float(metrics.total_energy(engine.bodies, SOFT, out_dtype=np.float64))


def test_leapfrog_first_phase_keeps_state():
    """Iteration 0 leaves the visible state at (x_0, v_0)
    (ref: devLeapfrogFirst comment, CUDABodies.cu:223-243)."""
    bodies = SCHEMES["random"](256, 2)
    e = create_engine("tpu+leapfrog", bodies, soft=SOFT, dt=DT, num_iterations=4)
    before = e.bodies.unpadded()
    e.compute_one_iteration()
    after = e.bodies.unpadded()
    np.testing.assert_array_equal(before["qx"], after["qx"])
    np.testing.assert_array_equal(before["vx"], after["vx"])


def test_leapfrog_matches_kdk_trajectory():
    """After k middle iterations the phase-split scheme equals KDK leapfrog at
    the same time points (same method, different bookkeeping)."""
    n, iters = 512, 6
    bodies = SCHEMES["random"](n, 5)
    # num_iterations = iters + 2 keeps every compared iteration in the
    # middle phase (the final phase applies the v_last ~= v_{last-1/2}
    # approximation, ref: CUDABodies.cu:302-324, tested separately).
    lf = create_engine("tpu+leapfrog", bodies, soft=SOFT, dt=DT,
                       num_iterations=iters + 2)
    kdk = create_engine("tpu+kdk", bodies, soft=SOFT, dt=DT)

    # leapfrog visible state after iteration k (k >= 1 middle phases) is
    # (x_k, v_k); kdk after k steps is also (x_k, v_k).
    lf.compute_one_iteration()           # first phase: still (x0, v0)
    for k in range(1, iters + 1):
        lf.compute_one_iteration()
        kdk.compute_one_iteration()
        a, b = lf.bodies.unpadded(), kdk.bodies.unpadded()
        # middle-phase bookkeeping is bitwise-identical to KDK
        np.testing.assert_array_equal(a["qx"], b["qx"], f"leapfrog vs kdk q iter {k}")
        np.testing.assert_array_equal(a["vx"], b["vx"], f"leapfrog vs kdk v iter {k}")


def test_leapfrog_conserves_energy_better_than_euler():
    n, iters = 512, 50
    bodies = SCHEMES["galaxy"](n, 9)
    eu = create_engine("cpu+naive", bodies, soft=SOFT, dt=DT * 50)
    lf = create_engine("tpu+kdk", bodies, soft=SOFT, dt=DT * 50)
    e0 = _energy(eu)
    eu.run(iters)
    lf.run(iters)
    drift_euler = abs(_energy(eu) - e0)
    drift_leap = abs(_energy(lf) - e0)
    assert drift_leap <= drift_euler * 1.5, (drift_leap, drift_euler)


def test_leapfrog_run_matches_stepwise():
    """run(n)'s fused middle-phase fori_loop lands on the stepwise trajectory."""
    bodies = SCHEMES["random"](256, 11)
    iters = 6
    a = create_engine("tpu+leapfrog", bodies, soft=SOFT, dt=DT,
                      num_iterations=iters)
    b = create_engine("tpu+leapfrog", bodies, soft=SOFT, dt=DT,
                      num_iterations=iters)
    for _ in range(iters):
        a.compute_one_iteration()
    b.run(iters)
    da, db = a.bodies.unpadded(), b.bodies.unpadded()
    for c in ("qx", "vx"):
        assert_within_rel(db[c], da[c], 1e-6, f"leapfrog run vs stepwise {c}")


def test_leapfrog_tracking_matches_untracked_trajectory():
    """The fused metrics must not perturb the integrator."""
    bodies = SCHEMES["random"](512, 5)
    iters = 6
    a = create_engine("tpu+leapfrog", bodies, soft=SOFT, dt=DT,
                      num_iterations=iters)
    b = create_engine("tpu+leapfrog+tracking", bodies, soft=SOFT, dt=DT,
                      num_iterations=iters)
    a.run(iters)
    b.run(iters)
    da, db = a.bodies.unpadded(), b.bodies.unpadded()
    np.testing.assert_array_equal(db["qx"], da["qx"])
    np.testing.assert_array_equal(db["vx"], da["vx"])


def test_leapfrog_tracking_run_matches_stepwise_history():
    bodies = SCHEMES["random"](512, 7)
    iters = 7
    a = create_engine("tpu+leapfrog+tracking", bodies, soft=SOFT, dt=DT,
                      num_iterations=iters)
    b = create_engine("tpu+leapfrog+tracking", bodies, soft=SOFT, dt=DT,
                      num_iterations=iters)
    for _ in range(iters):
        a.compute_one_iteration()
    b.run(iters)
    np.testing.assert_allclose(b.history.energies, a.history.energies,
                               rtol=1e-5)
    np.testing.assert_allclose(b.history.density_centers,
                               a.history.density_centers, rtol=1e-4)


def test_leapfrog_tracking_drift_vs_euler_tracking():
    """The completed reference capability (leapfrog + metrics, disabled in
    the reference): symplectic drift must not exceed Euler-tracking drift.
    Uses an amplified timestep so Euler drifts measurably."""
    n, iters = 512, 40
    bodies = SCHEMES["galaxy"](n, 9)
    eu = create_engine("tpu+tracking", bodies, soft=SOFT, dt=DT * 50,
                       num_iterations=iters)
    lf = create_engine("tpu+leapfrog+tracking", bodies, soft=SOFT,
                       dt=DT * 50, num_iterations=iters)
    eu.run(iters)
    lf.run(iters)
    # both histories start from (x0, v0): row 0 of the leapfrog history is
    # the first phase (visible state unchanged)
    e_eu, e_lf = eu.history.energies, lf.history.energies
    drift_euler = abs(e_eu[-1] - e_eu[0])
    drift_leap = abs(e_lf[-1] - e_lf[0])
    assert drift_leap <= drift_euler * 1.5, (drift_leap, drift_euler)


def test_leapfrog_last_phase():
    bodies = SCHEMES["random"](256, 4)
    iters = 3
    e = create_engine("tpu+leapfrog", bodies, soft=SOFT, dt=DT,
                      num_iterations=iters)
    for _ in range(iters):
        e.compute_one_iteration()
    # after the last phase the visible state took the buffered values;
    # nothing NaN, positions moved
    d = e.bodies.unpadded()
    assert np.all(np.isfinite(d["qx"]))
    before = bodies.unpadded()
    assert np.any(d["qx"] != before["qx"])


def test_yoshida4_conserves_energy_better_than_kdk():
    """The 4th-order triple-jump's energy drift must sit well below the
    2nd-order KDK's at the same (large) dt -- the O(dt^4) vs O(dt^2) gap."""
    n, iters = 512, 50
    bodies = SCHEMES["galaxy"](n, 9)
    kdk = create_engine("tpu+kdk", bodies, soft=SOFT, dt=DT * 50)
    y4 = create_engine("tpu+yoshida4", bodies, soft=SOFT, dt=DT * 50)
    e0 = _energy(kdk)
    kdk.run(iters)
    y4.run(iters)
    drift_kdk = abs(_energy(kdk) - e0)
    drift_y4 = abs(_energy(y4) - e0)
    assert drift_y4 < drift_kdk * 0.2, (drift_y4, drift_kdk)


def test_yoshida4_matches_kdk_at_small_dt():
    """Both integrate the same flow: trajectories agree at small dt."""
    bodies = SCHEMES["random"](256, 4)
    kdk = create_engine("tpu+kdk", bodies, soft=SOFT, dt=DT)
    y4 = create_engine("tpu+yoshida4", bodies, soft=SOFT, dt=DT)
    kdk.run(10)
    y4.run(10)
    a, b = kdk.bodies.unpadded(), y4.bodies.unpadded()
    assert_within_rel(b["qx"], a["qx"], 1e-5, "yoshida4 vs kdk qx")
    assert_within_rel(b["vx"], a["vx"], 1e-3, "yoshida4 vs kdk vx",
                      rms_floor=1e-5)


def test_yoshida4_run_matches_stepwise():
    bodies = SCHEMES["random"](256, 6)
    a = create_engine("tpu+yoshida4", bodies, soft=SOFT, dt=DT)
    b = create_engine("tpu+yoshida4", bodies, soft=SOFT, dt=DT)
    for _ in range(4):
        a.compute_one_iteration()
    b.run(4)
    da, db = a.bodies.unpadded(), b.bodies.unpadded()
    assert_within_rel(db["qx"], da["qx"], 1e-6, "yoshida4 run vs stepwise")
