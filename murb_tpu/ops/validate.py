"""Measured-order selection: make the fast solvers' accuracy contract
real instead of theoretical.

The Chebyshev order bound (ops/proxy.required_order) assumes an error
prefactor of 1; the measured prefactor is ~0.1-0.3 for uniform boxes
(ops/fmm.FMM_ERR_PREFACTOR) but blows past 1000 for adversarial mass
distributions -- two dense clusters in a wide box measure 3e-3 max
relative force error at the order the UNcalibrated bound certifies for
1e-4 (scripts/order_calib_probe3.py).  No static formula is robust to
the distribution, so the engines validate instead: take the calibrated
pick as the initial guess, measure the true error of the configured
solver against an exact strided-sample sweep (one cheap O(sample x N)
rectangle), and escalate order/depth until the target is met.

The common schemes pass on the first try, so the only extra work on the
happy path is one solver dispatch + the sample sweep (the solver compile
is the same executable the run needs anyway).  Escalation -- and its
extra compiles -- is paid only by distributions that genuinely need it,
which is exactly the honest trade.

The reference has no counterpart: its Barnes-Hut file is an empty TODO
(ref: src/murb/implem/SimulationNBodyBarnesHut.* absent) and its accuracy
checking lives in offline Catch2 tolerances (ref:
tests/test_SimulationNBody.cpp), not in the production path.
"""
from __future__ import annotations

import numpy as np

__all__ = ["measured_force_error", "escalate_config", "descend_config",
           "validate_config", "certified_half"]

#: error statistic floor: per-body relative error with tiny-force bodies
#: floored at 1e-6 of the system's max force norm -- the same convention
#: as bench.py's force_error and the order probes.
FLOOR_FRAC = 1e-6

#: escalation bounds: hierarchy order grows to 12 (the m^6 M2L cost wall,
#: measured 25 ms/step at m=12 N=200k) before trading order for depth.
_MAX_HIER_M = 12
_MAX_LEVELS = 4
_MAX_TRIALS = 6


def measured_force_error(qx, qy, qz, gm, soft, acc_fn,
                         sample: int = 512) -> float:
    """Max net-relative force error of ``acc_fn`` on a strided sample.

    ``acc_fn(qx, qy, qz, gm) -> Accel`` is the configured fast solver
    (heavy corrections and all); the reference values are one exact
    rectangular sweep over ``sample`` strided massive rows (row 0
    included: the schemes' heavy central body).  Ghost-padded rows
    (gm == 0) are excluded from the statistic.  Cost: one solver
    dispatch + O(sample * N) exact work.
    """
    import jax
    import jax.numpy as jnp

    from murb_tpu.ops.naive import acc_rect_jchunked as acc_rect

    n = int(qx.shape[0])
    k = min(int(sample), n)
    idx = jnp.asarray(np.linspace(0, n - 1, k).astype(np.int64))

    a = acc_fn(qx, qy, qz, gm)
    ax, ay, az = (np.asarray(v)[np.asarray(idx)]
                  for v in (a.ax, a.ay, a.az))

    # the exact reference sweep runs in float64 where the platform allows
    # (CPU with x64 enabled): a same-precision reference shares the
    # solver's fp32 rounding noise and under-reports the true error
    rq = (qx, qy, qz, gm)
    if jax.config.jax_enable_x64 and jax.default_backend() != "tpu":
        rq = tuple(v.astype(jnp.float64) for v in rq)
    r = acc_rect(rq[0][idx], rq[1][idx], rq[2][idx], *rq, soft)
    rx, ry, rz = (np.asarray(v) for v in (r.ax, r.ay, r.az))
    rn = np.sqrt(rx * rx + ry * ry + rz * rz)
    sel = np.asarray(gm[idx]) > 0
    if not np.any(sel):
        return 0.0
    floor = np.maximum(rn, max(float(rn[sel].max()), 1e-300) * FLOOR_FRAC)
    err = np.sqrt((ax - rx) ** 2 + (ay - ry) ** 2 + (az - rz) ** 2) / floor
    return float(err[sel].max())


def escalate_config(m: int, levels: int, cells: int, half: float,
                    soft: float, tol: float) -> tuple[int, int, int]:
    """One escalation step: the next (m, levels, cells) to try when the
    measured error missed ``tol``.

    Ladder: single-cell/octant grows by 4 orders (lane-aligned picks)
    until the hierarchy switchover at m > 20; the hierarchy grows by 2
    orders to the m^6 cost wall at m = 12, then trades order for depth
    (one level deeper resolves concentrated mass into smaller cells --
    the physical fix for clustered distributions -- and restarts from
    that depth's calibrated order, floored above the failing order's
    progression).
    """
    from murb_tpu.ops.fmm import fmm_order, required_levels

    if levels == 0:
        if m + 4 <= 20:
            return m + 4, 0, cells
        lv = max(required_levels(half, soft), 2)
        return fmm_order(half, soft, lv, tol), lv, 1
    if m + 2 <= _MAX_HIER_M:
        return m + 2, levels, 1
    lv = min(levels + 1, _MAX_LEVELS)
    if lv == levels:                       # depth exhausted: keep growing m
        return m + 2, levels, 1
    return max(fmm_order(half, soft, lv, tol), 6), lv, 1


#: descent floors: the cheapest configs worth measuring.  Single-cell m=8
#: is the smallest lane-friendly basis (512 nodes) that ever meets 1e-4 on
#: the production boxes; the hierarchy's finest cells restore a ~ 1, where
#: m=6 is the smallest order the depth-cost policy ever emits.
_MIN_CELL_M = 8
_MIN_HIER_M = 6


def descend_config(m: int, levels: int,
                   cells: int) -> tuple[int, int, int] | None:
    """One descent step: the next CHEAPER (m, levels, cells) to try when
    the measured error beat ``tol`` with room to spare, or None at the
    floor.  Mirrors escalate_config's rungs (single-cell/octant by 4
    lane-aligned orders, hierarchy by 2) without changing depth -- the
    depth pick is the cost model's job, not the accuracy contract's."""
    if levels == 0:
        return (m - 4, 0, cells) if m - 4 >= _MIN_CELL_M else None
    return (m - 2, levels, 1) if m - 2 >= _MIN_HIER_M else None


#: extrapolation trust region for certified_half: the rho^-m model is
#: anchored at ONE measurement, so never certify growth past this factor
#: of the measured box no matter how far below tol the error sits (errors
#: at the fp32 floor would otherwise certify ~6x growth).  3x is still
#: twice the headroom of the old static 1.5x growth margin.
_CERT_GROWTH_CAP = 3.0


def certified_half(m: int, levels: int, half: float, err: float,
                   soft: float, tol: float,
                   cap: float = _CERT_GROWTH_CAP) -> float:
    """Largest box half-extent a MEASURED config stays inside ``tol`` for.

    The static bound and the measurement agree on the convergence LAW --
    err ~ C * rho^-m with rho = a + sqrt(1 + a^2), a = soft/h_eff (the
    finest-cell scale h_eff = half / 2^levels is what fmm_order bounds) --
    and disagree only on the prefactor C.  The measurement pins C at the
    current box, so growth headroom follows by inverting the law:
    rho(half') = rho(half) * (err / tol)^(1/m).  A descended order
    (descend_config) therefore gets exactly the certification its
    measured error supports instead of the static margin it deliberately
    sits below; an out-of-contract measurement (err > tol) certifies
    LESS than the current box, which proxy_health reports as not-ok.

    Extrapolation is capped at ``cap * half`` (model trust region).
    """
    import math

    h_eff = max(half, 1e-30) / 2 ** levels
    a_now = max(soft / h_eff, 1e-6)
    rho_now = a_now + math.sqrt(1.0 + a_now * a_now)
    target_rho = rho_now * (max(err, 1e-30) / tol) ** (1.0 / max(m, 1))
    if target_rho <= 1.0 + 1e-9:
        return cap * half
    a_t = (target_rho - 1.0 / target_rho) / 2.0
    return min((soft / a_t) * 2 ** levels, cap * half)


def validate_config(qx, qy, qz, gm, soft, tol, m: int, levels: int,
                    cells: int, half: float, make_acc_fn,
                    sample: int = 512, max_trials: int = _MAX_TRIALS,
                    descend: bool = True, warn=print):
    """Escalate (m, levels, cells) until the measured error meets ``tol``
    -- then, if the INITIAL pick already met it, descend while cheaper
    configs still do.

    ``make_acc_fn(m, levels, cells) -> acc_fn`` builds the solver for a
    trial config.  Returns ``(m, levels, cells, measured_err)`` -- the
    cheapest config meeting tol, or (with a warning) the best one tried.

    Descent only runs off the first trial: after an escalation the
    config one rung down is the one that just failed.  The static bound
    over-provisions uniform boxes by 1-2 rungs (measured: the N=200k
    galaxy's m=16 pick is matched at 3.2e-5 by m=12 at ~13% less step
    time), so paying a couple of ctor-time dispatches here buys the
    whole run's steady-state rate.
    """
    best = None
    for trial in range(max_trials):
        err = measured_force_error(qx, qy, qz, gm, soft,
                                   make_acc_fn(m, levels, cells),
                                   sample=sample)
        if best is None or err < best[3]:
            best = (m, levels, cells, err)
        if err <= tol:
            if descend and trial == 0:
                for _ in range(max_trials):
                    down = descend_config(m, levels, cells)
                    if down is None:
                        break
                    derr = measured_force_error(
                        qx, qy, qz, gm, soft, make_acc_fn(*down),
                        sample=sample)
                    if derr > tol:
                        break
                    (m, levels, cells), err = down, derr
            return m, levels, cells, err
        m, levels, cells = escalate_config(m, levels, cells, half, soft,
                                           tol)
    warn(f"WARNING: fast-solver validation missed tol={tol:.1e} after "
         f"{max_trials} escalations; keeping the best config "
         f"m={best[0]} levels={best[1]} cells={best[2]} "
         f"(measured err {best[3]:.1e})")
    return best
