"""Per-galaxy tracking engine tests (MultiGalaxySimulationHistory wiring)."""
import numpy as np
import pytest

from murb_tpu.core.init import SCHEMES, milkyway_andromeda_masks
from murb_tpu.models import create_engine

SOFT = 2.0e8
DT = 3600.0


def _half_masks(npad, n):
    a = np.zeros(npad, np.float32)
    b = np.zeros(npad, np.float32)
    a[: n // 2] = 1.0
    b[n // 2 : n] = 1.0
    return [a, b]


def test_per_galaxy_metrics_sum_to_density_weighted_global():
    bodies = SCHEMES["random"](512, 3)
    iters = 3
    e = create_engine(
        "tpu+tracking+multi", bodies, soft=SOFT, dt=DT,
        num_iterations=iters, masks=_half_masks(bodies.npad, bodies.n),
    )
    for _ in range(iters):
        e.compute_one_iteration()
    hist = e.finalize_history()
    # global = sum of galaxies (ref aggregation semantics)
    total = hist.galaxies[0].energies + hist.galaxies[1].energies
    np.testing.assert_allclose(hist.energies, total, rtol=1e-12)
    assert np.all(np.isfinite(hist.energies))
    # per-galaxy KE+intra-PE are nonzero and distinct
    assert not np.allclose(hist.galaxies[0].energies,
                           hist.galaxies[1].energies)


def test_scan_run_matches_stepwise():
    bodies = SCHEMES["random"](512, 4)
    iters = 4
    masks = _half_masks(bodies.npad, bodies.n)
    a = create_engine("tpu+tracking+multi", bodies, soft=SOFT, dt=DT,
                      num_iterations=iters, masks=masks)
    b = create_engine("tpu+tracking+multi", bodies, soft=SOFT, dt=DT,
                      num_iterations=iters, masks=masks)
    for _ in range(iters):
        a.compute_one_iteration()
    b.run(iters)
    for g in range(2):
        np.testing.assert_allclose(
            b.history.galaxies[g].energies,
            a.history.galaxies[g].energies, rtol=1e-5,
        )


def test_mw_andromeda_masks_partition():
    npad, n = 1024, 1000
    mw, andromeda = milkyway_andromeda_masks(npad, n)
    both = mw + andromeda
    assert np.all(both[:n] == 1.0)      # every real body in exactly one galaxy
    assert np.all(both[n:] == 0.0)      # ghosts in neither


def test_finalize_history_idempotent():
    bodies = SCHEMES["random"](512, 3)
    e = create_engine("tpu+tracking+multi", bodies, num_iterations=2,
                      masks=_half_masks(bodies.npad, bodies.n))
    e.run(2)
    h1 = e.finalize_history().energies.copy()
    h2 = e.finalize_history().energies.copy()
    np.testing.assert_array_equal(h1, h2)


def test_fused_adaptive_rejected_with_masks():
    """fused_adaptive still lacks per-galaxy weight channels through the
    sparse slot tables / P2P bricks; the ctor must say so loudly
    (fused_proxy_m AND fused_fmm are supported now -- round-5 lift of
    the hierarchy restriction, ops/fmm.force_and_potential_fmm_pergal)."""
    bodies = SCHEMES["random"](512, 3)
    with pytest.raises(ValueError, match="ADAPTIVE"):
        create_engine("tpu+tracking+multi", bodies, num_iterations=2,
                      masks=_half_masks(bodies.npad, bodies.n),
                      fused_adaptive=object())


def test_fused_exact_step_matches_unfused():
    """The one-sweep fused force+per-galaxy-potential step
    (ops/hybrid.acc_phi_rows_hybrid) must reproduce the unfused
    force-then-phi_rows engine within kernel accuracy."""
    bodies = SCHEMES["random"](1024, 5)
    iters = 2
    masks = _half_masks(bodies.npad, bodies.n)
    a = create_engine("tpu+tracking+multi", bodies, soft=SOFT, dt=DT,
                      num_iterations=iters, masks=masks)          # unfused
    b = create_engine("tpu+tracking+multi", bodies, soft=SOFT, dt=DT,
                      num_iterations=iters, masks=masks,
                      fused_exact=True)
    assert not a._use_fused_exact() and b._use_fused_exact()
    a.run(iters)
    b.run(iters)
    for g in range(2):
        np.testing.assert_allclose(
            b.history.galaxies[g].energies,
            a.history.galaxies[g].energies, rtol=2e-3,
        )
        np.testing.assert_allclose(
            b.history.galaxies[g].ang_momentums,
            a.history.galaxies[g].ang_momentums, rtol=2e-3,
        )


def test_fused_fmm_pergal_engine_matches_exact_metrics():
    """fused_fmm in the multi engine (round-5: masked weight channels
    through P2M/M2M/M2L/L2L, ops/fmm.force_and_potential_fmm_pergal):
    per-galaxy energies from the one-pass hierarchy must match the exact
    masked-sweep engine at the hierarchy's accuracy."""
    bodies = SCHEMES["galaxy"](2048, 9)
    iters = 2
    masks = _half_masks(bodies.npad, bodies.n)
    a = create_engine("tpu+tracking+multi", bodies, soft=SOFT, dt=DT,
                      num_iterations=iters, masks=masks)          # exact
    b = create_engine("tpu+tracking+multi", bodies, soft=SOFT, dt=DT,
                      num_iterations=iters, masks=masks,
                      fused_fmm=(10, 2))
    a.run(iters)
    b.run(iters)
    for g in range(2):
        np.testing.assert_allclose(
            b.history.galaxies[g].energies,
            a.history.galaxies[g].energies, rtol=5e-3,
        )
        np.testing.assert_allclose(
            b.history.galaxies[g].ang_momentums,
            a.history.galaxies[g].ang_momentums, rtol=5e-3,
        )


def test_fused_proxy_pergal_engine_matches_exact_metrics():
    """fused_proxy_m in the multi engine: per-galaxy energies from the
    per-galaxy proxy pass must match the exact masked-sweep engine at
    the proxy's accuracy."""
    bodies = SCHEMES["galaxy"](2048, 9)
    iters = 2
    masks = _half_masks(bodies.npad, bodies.n)
    a = create_engine("tpu+tracking+multi", bodies, soft=SOFT, dt=DT,
                      num_iterations=iters, masks=masks)          # exact
    b = create_engine("tpu+tracking+multi", bodies, soft=SOFT, dt=DT,
                      num_iterations=iters, masks=masks,
                      fused_proxy_m=16)
    a.run(iters)
    b.run(iters)
    for g in range(2):
        np.testing.assert_allclose(
            b.history.galaxies[g].energies,
            a.history.galaxies[g].energies, rtol=5e-3,
        )


def test_multigalaxy_proxy_metrics_plumbed():
    """metrics_method='proxy' must actually engage for the multi engine."""
    bodies = SCHEMES["galaxy"](512, 3)
    masks = _half_masks(bodies.npad, bodies.n)
    a = create_engine("tpu+tracking+multi", bodies, num_iterations=2,
                      masks=masks)
    b = create_engine("tpu+tracking+multi", bodies, num_iterations=2,
                      masks=masks, metrics_method="proxy", metrics_proxy_m=16)
    assert b._metrics_method == "proxy"
    a.run(2)
    b.run(2)
    for g in range(2):
        np.testing.assert_allclose(b.history.galaxies[g].energies,
                                   a.history.galaxies[g].energies, rtol=1e-3)


def test_multigalaxy_masks_survive_ctor_repad():
    """Masks are built at the caller's npad; the tracking ctor may repad the
    state to a divisor-rich boundary.  The zero-extended masks must keep the
    per-galaxy aggregation exact."""
    bodies = SCHEMES["galaxy"](8200, 7)
    masks = _half_masks(bodies.npad, bodies.n)
    e = create_engine("tpu+tracking+multi", bodies, soft=SOFT, dt=DT,
                      num_iterations=2, masks=masks,
                      metrics_method="proxy", metrics_proxy_m=16)
    assert e._state.npad % 2048 == 0 and e._state.npad > bodies.npad
    assert all(m.shape[0] == e._state.npad for m in e.masks)
    e.run(2)
    hist = e.finalize_history()
    total = hist.galaxies[0].energies + hist.galaxies[1].energies
    np.testing.assert_allclose(hist.energies, total, rtol=1e-12)
    assert np.all(np.isfinite(hist.energies))


def test_fused_phi_rows_matches_masked_sweeps():
    """The one-sweep multi-row potential path (ops/hybrid.phi_rows) must
    reproduce the per-galaxy masked-sweep metrics it replaces."""
    import jax.numpy as jnp

    from murb_tpu.core import metrics as M
    from murb_tpu.models import create_engine

    n = 1024
    bodies = SCHEMES["random"](n, 5)
    half = np.zeros(bodies.npad, np.float32)
    half[: n // 2] = 1.0
    other = np.zeros(bodies.npad, np.float32)
    other[n // 2: n] = 1.0
    masks = [jnp.asarray(half), jnp.asarray(other)]

    eng = create_engine("tpu+tracking+multi", bodies, soft=2e8, dt=3600.0,
                        num_iterations=2, masks=masks)
    es, ls, dcs = eng._metrics(eng._state)

    # reference: the unfused masked-sweep path
    ref = [M.all_metrics(eng._state, eng.soft,
                         out_dtype=eng._metric_dtype, mask=m,
                         scales=eng._mscales) for m in eng.masks]
    for g in range(2):
        assert float(es[g]) == pytest.approx(float(ref[g][0]), rel=1e-4)
        assert float(ls[g]) == pytest.approx(float(ref[g][1]), rel=1e-5)
        np.testing.assert_allclose(np.asarray(dcs[g]),
                                   np.asarray(ref[g][2]), rtol=1e-5)


def test_acc_phi_rows_hybrid_matches_split_kernels():
    """The fused force+multi-row-potential kernel must reproduce the
    separate hybrid force kernel and phi_rows sweep it fuses (same
    per-pair math, same split tiers -> tight agreement), and the naive
    oracle at kernel accuracy."""
    import jax.numpy as jnp

    from murb_tpu import G
    from murb_tpu.ops.hybrid import acc_hybrid, acc_phi_rows_hybrid, phi_rows
    from murb_tpu.ops.naive import acc_naive

    from conftest import assert_within_rel

    n = 1024
    bodies = SCHEMES["random"](n, 13)
    gm = jnp.asarray(np.float32(G) * np.asarray(bodies.m))
    rows = jnp.stack([gm * jnp.asarray(m) for m in
                      _half_masks(bodies.npad, n)])

    acc, phi = acc_phi_rows_hybrid(bodies.qx, bodies.qy, bodies.qz, gm,
                                   rows, SOFT)
    acc_ref = acc_hybrid(bodies.qx, bodies.qy, bodies.qz, gm, SOFT,
                         passes=2)
    phi_ref = phi_rows(bodies.qx, bodies.qy, bodies.qz, rows, SOFT)
    assert_within_rel(np.asarray(acc.ax), np.asarray(acc_ref.ax), 1e-6,
                      "fused ax vs hybrid", rms_floor=1e-6)
    assert_within_rel(np.asarray(phi), np.asarray(phi_ref), 1e-6,
                      "fused phi vs phi_rows", rms_floor=1e-6)

    oracle = acc_naive(bodies.qx, bodies.qy, bodies.qz, gm, SOFT)
    assert_within_rel(np.asarray(acc.ax), np.asarray(oracle.ax), 2e-4,
                      "fused ax vs naive", rms_floor=2e-4)
