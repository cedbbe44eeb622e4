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


def test_fused_rejected_with_masks():
    import pytest

    bodies = SCHEMES["random"](512, 3)
    with pytest.raises(ValueError, match="fused_proxy_m"):
        create_engine("tpu+tracking+multi", bodies, num_iterations=2,
                      masks=_half_masks(bodies.npad, bodies.n),
                      fused_proxy_m=16)


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
