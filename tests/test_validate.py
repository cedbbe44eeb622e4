"""Measured-order selection (ops/validate): the accuracy contract is
enforced by measurement, not by the theoretical bound.

Background (measured on-chip, scripts/order_error_probe.py +
order_calib_probe2/3.py): the Chebyshev error prefactor is ~0.1-0.3 for
uniform boxes but >1000x larger for concentrated two-cluster
distributions -- at matched half/soft the SAME order that leaves a
uniform box at the fp32 error floor misses tol by 26x on two clusters.
No static order formula survives that, so ProxyEngine validates its
pick against an exact strided sample and escalates until tol holds.
"""
import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from murb_tpu import G
from murb_tpu.core.init import SCHEMES
from murb_tpu.core.state import BodyState
from murb_tpu.models import create_engine
from murb_tpu.ops import fmm
from murb_tpu.ops.naive import acc_naive
from murb_tpu.ops.validate import (descend_config, escalate_config,
                                   measured_force_error, validate_config)

SOFT = 2.0e8
DT = 3600.0


def _two_clusters(n=16384, seed=3, centers=90.0, sigma=10.0):
    """Two dense Gaussian clusters in a wide box -- the adversarial case
    for Chebyshev interpolation (concentrated mass in finest cells).
    Measured on this exact construction (CPU jnp path): the calibrated
    static pick (m=8, L=2) errs 2.6e-3, m=10 errs 2.9e-4, m=12 reaches
    2.7e-5 -- only the measured escalation finds the honest config."""
    rng = np.random.default_rng(seed)
    q = np.concatenate([
        rng.normal(-centers, sigma, (n // 2, 3)),
        rng.normal(+centers, sigma, (n // 2, 3)),
    ]).astype(np.float32)
    m = rng.uniform(0.5, 2.0, n).astype(np.float32)
    z = np.zeros(n, np.float32)
    bodies = BodyState.from_arrays(m, np.full(n, 0.5, np.float32),
                                   q[:, 0], q[:, 1], q[:, 2], z, z, z)
    half = float(np.abs(q).max())
    return bodies, half / 3.325        # match the probes' half/soft ratio


def test_measured_error_exact_is_zero():
    s = SCHEMES["random"](512, 2)
    gm = jnp.asarray(G, s.qx.dtype) * s.m
    err = measured_force_error(
        s.qx, s.qy, s.qz, gm, SOFT,
        lambda a, b, c, g: acc_naive(a, b, c, g, SOFT))
    # vs the f64 reference this measures only the fp32 kernel's own
    # rounding noise
    assert err < 1e-5


def test_measured_error_sees_proxy_error():
    s = SCHEMES["random"](2048, 2)
    gm = jnp.asarray(G, s.qx.dtype) * s.m
    lo = measured_force_error(
        s.qx, s.qy, s.qz, gm, SOFT,
        lambda a, b, c, g: fmm.acc_fmm(a, b, c, g, SOFT, m=6, levels=2))
    hi = measured_force_error(
        s.qx, s.qy, s.qz, gm, SOFT,
        lambda a, b, c, g: fmm.acc_fmm(a, b, c, g, SOFT, m=10, levels=2))
    assert hi < lo                      # spectral convergence, measured
    assert lo > 1e-5                    # m=6 is genuinely off the floor


def test_escalation_ladder():
    """Single-cell grows lane-aligned to 20 then jumps to the hierarchy;
    the hierarchy grows to the m^6 wall at 12 then trades order for
    depth; depth is capped."""
    m, lv, c = escalate_config(16, 0, 1, 6e8, SOFT, 1e-4)
    assert (m, lv) == (20, 0)
    m, lv, c = escalate_config(20, 0, 1, 6e8, SOFT, 1e-4)
    assert lv >= 2                      # switched to the hierarchy
    m, lv, c = escalate_config(10, 2, 1, 6e8, SOFT, 1e-4)
    assert (m, lv) == (12, 2)
    m, lv, c = escalate_config(12, 2, 1, 6e8, SOFT, 1e-4)
    assert lv == 3 and m >= 6           # order-for-depth trade
    m, lv, c = escalate_config(12, 4, 1, 6e8, SOFT, 1e-4)
    assert lv == 4 and m == 14          # depth capped, order keeps growing


def test_random_box_meets_tol():
    """Uniform box: the engine must end at a config whose MEASURED error
    meets tol, within one rung of the calibrated static pick in either
    direction (m=8 sits right at the 1e-4 contract at this N -- the f64
    reference resolves its true error to ~1.1e-4, so one escalation or
    one descent are both legitimate measured outcomes; anything further
    means the calibration broke)."""
    bodies = SCHEMES["random"](16384, 1)
    e = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT)
    assert e.using_proxy and e.levels == 2
    static = fmm.fmm_order(6.65e8, SOFT, 2)
    assert static - 2 <= e.m <= static + 2
    assert e.validated_err is not None and e.validated_err <= e.tol


@pytest.mark.slow
def test_two_cluster_box_escalates_to_tol():
    """The adversarial distribution: the static pick misses tol by >20x;
    the engine must escalate until the measured contract holds."""
    bodies, soft = _two_clusters()
    static_m = fmm.fmm_order(bodies.qx.max() * 1.02, soft, 2)
    e = create_engine("tpu+proxy", bodies, soft=soft, dt=1.0,
                      cost_slack=1e9)   # isolate accuracy from the cost cut
    assert e.using_proxy
    assert (e.m, e.levels) > (static_m, 2 - 1)   # genuinely escalated
    assert e.validated_err is not None and e.validated_err <= e.tol
    # and the final config really delivers on a FRESH sample
    gm = jnp.asarray(G, bodies.qx.dtype) * bodies.m
    err = measured_force_error(
        bodies.qx, bodies.qy, bodies.qz, gm, soft,
        lambda a, b, c, g: fmm.acc_fmm(a, b, c, g, soft, m=e.m,
                                       levels=e.levels),
        sample=777)
    assert err <= 2 * e.tol


def test_validate_config_warns_and_keeps_best(capsys):
    """An impossible tolerance must terminate with the best-tried config
    and a loud warning, not loop."""
    s = SCHEMES["random"](2048, 5)
    gm = jnp.asarray(G, s.qx.dtype) * s.m
    m, lv, c, err = validate_config(
        s.qx, s.qy, s.qz, gm, SOFT, 1e-12, 6, 2, 1, 6.65e8,
        lambda m, lv, c: (lambda a, b, cc, g: fmm.acc_fmm(
            a, b, cc, g, SOFT, m=m, levels=lv)),
        max_trials=2)
    assert err > 1e-12
    assert "WARNING" in capsys.readouterr().out


def test_sharded_engine_validates_too(n_devices):
    """The distributed fast modes carry the same measured contract: the
    adversarial box must escalate shard+fmm's order before the sharded
    step is compiled."""
    if n_devices < 4:
        pytest.skip("needs multi-device")  # chip suite runs on 1 real TPU
    bodies, soft = _two_clusters(n=8192)
    e = create_engine("shard+fmm", bodies, soft=soft, dt=1.0, shards=4)
    assert e.validated_err is not None and e.validated_err <= 1e-4
    assert e.fmm_m > 8                  # static calibrated pick was 8
    # and it exposes the same health contract as the single-chip engine:
    # the validated config is certified at the current box
    health = e.proxy_health()
    assert health is not None and health["ok"] and health["levels"] > 0
    assert e.validated_half is not None


def test_certified_half_model():
    """certified_half inverts the rho^-m convergence law around the
    measured point: err==tol certifies exactly the measured box, smaller
    errors buy capped growth headroom, an out-of-contract measurement
    certifies LESS than the measured box (health must flag it)."""
    from murb_tpu.ops.validate import certified_half

    half, soft, tol = 1e9, 2e8, 1e-4
    assert certified_half(12, 0, half, tol, soft, tol) == \
        pytest.approx(half, rel=1e-6)
    c = certified_half(12, 0, half, 1e-5, soft, tol)
    assert half < c <= 3.0 * half
    assert certified_half(12, 0, half, 1e-12, soft, tol) == 3.0 * half
    assert certified_half(12, 0, half, 1e-3, soft, tol) < half
    # hierarchy: the law applies at the finest-cell scale but the
    # certified extent is a whole-box half-extent
    c2 = certified_half(8, 2, half, 1e-5, soft, tol)
    assert half < c2 <= 3.0 * half
    # the same measured error implies a smaller prefactor at lower order,
    # which buys MORE growth headroom (observable below the cap: use a
    # box where a=soft/half is large enough that certification doesn't
    # saturate at 3x)
    tight = 4e8
    lo = certified_half(8, 0, tight, 1e-5, soft, tol)
    hi = certified_half(16, 0, tight, 1e-5, soft, tol)
    assert tight < hi < lo < 3.0 * tight


def test_descent_ladder():
    """descend_config mirrors escalate_config's rungs downward and stops
    at the floors (single-cell m=8, hierarchy m=6)."""
    assert descend_config(16, 0, 1) == (12, 0, 1)
    assert descend_config(12, 0, 1) == (8, 0, 1)
    assert descend_config(8, 0, 1) is None
    assert descend_config(10, 2, 1) == (8, 2, 1)
    assert descend_config(8, 3, 1) == (6, 3, 1)
    assert descend_config(6, 2, 1) is None


def test_descent_only_off_first_trial():
    """After an escalation the config one rung down just FAILED -- descent
    must not re-adopt it.  Simulated with a fake error schedule."""
    errs = {16: 3e-4, 20: 5e-5}          # single cell: 16 fails, 20 passes

    def fake_make(m, lv, c):
        return (m, lv, c)

    import murb_tpu.ops.validate as V

    real = V.measured_force_error
    try:
        V.measured_force_error = (
            lambda qx, qy, qz, gm, soft, cfg, sample=512: errs[cfg[0]])
        m, lv, c, err = validate_config(
            None, None, None, None, SOFT, 1e-4, 16, 0, 1, 2e8, fake_make)
    finally:
        V.measured_force_error = real
    assert (m, lv) == (20, 0) and err == 5e-5


def test_galaxy_descends_below_static_bound():
    """The galaxy single-cell pick over-provisions (measured: m=12 matches
    m=16's contract at ~13% less step time at N=200k).  The engine must
    descend to a cheaper measured-valid order, and the descended config
    must NOT trip proxy_health (the measured contract replaces the static
    bound) nor churn maybe_adapt."""
    from murb_tpu.ops.proxy import half_extent, required_order

    bodies = SCHEMES["galaxy"](8192, 11)
    e = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT)
    assert e.using_proxy and e.levels == 0
    half = half_extent(bodies.unpadded())
    static = (required_order(half * 1.5, SOFT, 1e-4, margin=0) + 3) // 4 * 4
    assert e.m < static                   # genuinely descended
    assert e.validated_err is not None and e.validated_err <= e.tol
    assert e.proxy_health()["ok"]
    assert e.maybe_adapt() is False


def test_validate_off_keeps_static_pick():
    bodies, soft = _two_clusters(n=8192)
    e = create_engine("tpu+proxy", bodies, soft=soft, dt=1.0,
                      cost_slack=1e9, validate=False)
    assert e.validated_err is None
    assert (e.m, e.levels) == (8, 2)    # the (unvalidated) static pick
