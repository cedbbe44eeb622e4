"""Multi-level Chebyshev hierarchy (bbFMM) tests: ops/fmm.py.

The reference's tree code never existed (SURVEY.md section 2.2: the
"BarnersHut" file duplicates Naive); these tests validate the delivered
capability against the naive oracle with the differential-test discipline of
src/test/implem/test_SimulationNBody.cpp.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from murb_tpu import G
from murb_tpu.core.init import SCHEMES
from murb_tpu.models import create_engine
from murb_tpu.ops import fmm
from murb_tpu.ops.naive import acc_naive

from conftest import assert_within_rel

SOFT = 2.0e8
DT = 3600.0


def _rel_force_err(a, ref, m):
    """Relative force error with the oracle's own magnitude floor."""
    sel = np.asarray(m) > 0
    rn = np.sqrt(np.asarray(ref.ax) ** 2 + np.asarray(ref.ay) ** 2
                 + np.asarray(ref.az) ** 2)
    err = np.sqrt(
        (np.asarray(a.ax) - np.asarray(ref.ax)) ** 2
        + (np.asarray(a.ay) - np.asarray(ref.ay)) ** 2
        + (np.asarray(a.az) - np.asarray(ref.az)) ** 2
    )
    return (err / np.maximum(rn, rn.max() * 1e-6))[sel]


def _forces(scheme, n, seed, *, m, levels):
    s = SCHEMES[scheme](n, seed)
    gm = jnp.asarray(G, s.qx.dtype) * s.m
    ref = acc_naive(s.qx, s.qy, s.qz, gm, SOFT)
    a = fmm.acc_fmm(s.qx, s.qy, s.qz, gm, SOFT, m=m, levels=levels)
    return _rel_force_err(a, ref, s.m), s


# ----------------------------------------------------------- force accuracy
@pytest.mark.parametrize("levels,m,cap", [(2, 12, 1e-4), (3, 8, 1e-4)])
def test_fmm_random_force_accuracy(levels, m, cap):
    """The random scheme's wide box (the single-level solver's blind spot)
    must converge at every depth.  Force components go through M2L directly
    (measured ~3e-6 max at L=2, m=12); the caps leave regression headroom."""
    rel, _ = _forces("random", 1024, 3, m=m, levels=levels)
    assert rel.max() < cap, rel.max()
    assert np.percentile(rel, 99) < cap / 2


@pytest.mark.parametrize("levels,m", [(1, 12), (2, 10)])
def test_fmm_galaxy_force_accuracy(levels, m):
    """Galaxy scheme: heavy central body exercises the exact-correction
    path through the hierarchy (L=1 is the two-cell base case)."""
    rel, _ = _forces("galaxy", 1024, 5, m=m, levels=levels)
    assert rel.max() < 1e-4, rel.max()


def test_fmm_order_convergence():
    """Error must drop with m (spectral convergence)."""
    rel_lo, _ = _forces("random", 512, 7, m=8, levels=2)
    rel_hi, _ = _forces("random", 512, 7, m=12, levels=2)
    assert np.percentile(rel_hi, 99) < np.percentile(rel_lo, 99)


def test_fmm_padding_tail():
    """N=1025: the ghost-padded tail must contribute exactly nothing
    (the reference's padding edge case, test_SimulationNBody.cpp:76-81)."""
    rel, s = _forces("random", 1025, 1, m=8, levels=2)
    assert s.npad > s.n
    assert rel.max() < 1e-3


# --------------------------------------------------------------- components
def test_m2m_preserves_far_potential():
    """A parent expansion built by M2M must reproduce the children's far
    field: evaluate both against a distant target cluster."""
    rng = np.random.default_rng(0)
    m, C = 10, 2
    c = jnp.zeros(3)
    h = jnp.ones(3) * 1.0e9
    n = 256
    q = rng.uniform(-1e9, 1e9, (3, n)).astype(np.float32)
    gm = rng.uniform(0.5, 2.0, n).astype(np.float32)
    w_fine = fmm.p2m_grid(*(jnp.asarray(x) for x in q), jnp.asarray(gm),
                          c, h, m=m, C=C)
    w_root = fmm.m2m(w_fine, m=m, C=C)                     # (1, m^3)

    # evaluate the root expansion at distant probes vs the exact sum
    t = np.asarray(fmm._cheb_nodes(m))
    nodes = np.stack(np.meshgrid(*(np.asarray(c)[d] + np.asarray(h)[d] * t
                                   for d in range(3)), indexing="ij"),
                     0).reshape(3, -1)
    probes = rng.uniform(5e9, 8e9, (3, 32)).astype(np.float32)
    soft = 2.0e8

    def pot(px, srcs, ws):
        d2 = sum((probes[d][:, None] - srcs[d][None, :]) ** 2
                 for d in range(3)) + soft ** 2
        return (ws[None, :] / np.sqrt(d2)).sum(1)

    phi_exact = pot(probes, q, gm)
    phi_m2m = pot(probes, nodes, np.asarray(w_root).reshape(-1))
    np.testing.assert_allclose(phi_m2m, phi_exact, rtol=1e-4)


def test_l2l_interpolates_smooth_field():
    """L2L on a smooth node field must match direct evaluation at the
    child nodes."""
    m, C = 10, 2
    t = np.asarray(fmm._cheb_nodes(m))
    # parent cells of a C=2 grid on [-1, 1]^3: centers at +-0.5, halfwidth .5
    f = lambda x, y, z: np.sin(1.3 * x) * np.cos(0.7 * y) + 0.2 * z ** 3

    def grid_vals(C_):
        cs = 2.0 / C_
        vals = np.zeros((C_, C_, C_, m, m, m), np.float64)
        for ix in range(C_):
            for iy in range(C_):
                for iz in range(C_):
                    x = -1 + cs * (ix + 0.5) + cs / 2 * t
                    y = -1 + cs * (iy + 0.5) + cs / 2 * t
                    z = -1 + cs * (iz + 0.5) + cs / 2 * t
                    vals[ix, iy, iz] = f(x[:, None, None], y[None, :, None],
                                         z[None, None, :])
        return vals.reshape(C_ ** 3, m ** 3)

    parent = jnp.asarray(grid_vals(C).astype(np.float32))
    child = fmm.l2l(parent, m=m, C=C)                      # ((2C)^3, m^3)
    np.testing.assert_allclose(np.asarray(child), grid_vals(2 * C),
                               rtol=2e-4, atol=2e-5)


def test_level_consistency():
    """Different depths must agree with each other (the pair decomposition
    across levels is exact, only interpolation error differs)."""
    s = SCHEMES["random"](512, 11)
    gm = jnp.asarray(G, s.qx.dtype) * s.m
    a2 = fmm.acc_fmm(s.qx, s.qy, s.qz, gm, SOFT, m=10, levels=2)
    a3 = fmm.acc_fmm(s.qx, s.qy, s.qz, gm, SOFT, m=10, levels=3)
    rel = _rel_force_err(a2, a3, s.m)
    assert rel.max() < 1e-4


def _interpret():
    """interpret=True only off-TPU: on the TPU backend the XLA algebraic
    simplifier folds the bf16x3 split pattern ah@bh + ah@bl + al@bh back
    into a single re-rounded dot (~3e-3 error, measured), which Mosaic
    never does to the real compiled kernel (measured 2.8e-5).  On the
    chip suite (MURB_TEST_TPU=1) these tests therefore exercise the REAL
    kernels."""
    import jax

    return jax.default_backend() != "tpu"


def test_fused_grid_anterpolation_matches_jnp():
    """Pallas extended-basis P2M/L2P (ops/fmm_pallas.py; interpret on CPU,
    real kernels on the chip suite) reproduce the jnp segment-sum /
    gather formulation."""
    from murb_tpu.ops import fmm_pallas as fp
    from murb_tpu.ops.proxy import bounding_box

    m, C = 8, 4
    s = SCHEMES["random"](512, 3)
    gm = jnp.asarray(G, s.qx.dtype) * s.m
    c, h = bounding_box(s.qx, s.qy, s.qz, gm > 0)

    w1 = fmm.p2m_grid(s.qx, s.qy, s.qz, gm, c, h, m=m, C=C)
    w2 = fp.p2m_grid_fused(s.qx, s.qy, s.qz, gm, c, h, m=m, C=C,
                           block=256, interpret=_interpret())
    # bf16x3 contraction: ~1e-5 of max, an order under the solver tolerance
    np.testing.assert_allclose(
        np.asarray(w2), np.asarray(w1),
        atol=float(jnp.max(jnp.abs(w1))) * 3e-5)

    rng = np.random.default_rng(0)
    fields = tuple(jnp.asarray(rng.normal(size=(C ** 3, m ** 3)),
                               jnp.float32) for _ in range(3))
    a1 = fmm.l2p_grid(s.qx, s.qy, s.qz, c, h, fields, m=m, C=C)
    a2 = fp.l2p_grid_fused(s.qx, s.qy, s.qz, c, h, fields, m=m, C=C,
                           block=256, interpret=_interpret())
    for k in range(3):
        np.testing.assert_allclose(
            np.asarray(a2[k]), np.asarray(a1[k]),
            atol=float(jnp.max(jnp.abs(a1[k]))) * 5e-5)


@pytest.mark.slow
def test_fused_m2l_matches_jnp():
    """Pallas fused M2L (interpret mode) reproduces the jnp level sweep for
    every (subset, with_phi) variant, including a non-tile-divisible
    node count (m^3 = 64 vs 125)."""
    from murb_tpu.ops import fmm_pallas as fp

    rng = np.random.default_rng(7)
    hl = jnp.asarray([1.5e9, 1.1e9, 0.9e9], jnp.float32)
    # (5,4): non-tile-divisible node count; (3,8): cell-tiled grid (nc=2)
    for (m, C, tile), exact in (((4, 4, 64), True), ((4, 4, 64), False),
                                ((5, 4, 64), True), ((3, 8, 16), True)):
        if not exact and not _interpret():
            continue  # bf16-split interpret is invalid on the TPU backend
            # (see _interpret); the split tier's on-chip accuracy is
            # covered by scripts/m2l_tier_probe.py + bench force errors
        w = jnp.asarray(rng.normal(size=(C ** 3, m ** 3)), jnp.float32)
        for subset in ("expand", "near", "far"):
            for with_phi in (False, True):
                ref = fmm.m2l_level(w, hl, SOFT, m=m, C=C,
                                    subset=subset, with_phi=with_phi)
                got = fp.m2l_level_fused(w, hl, SOFT, m=m, C=C,
                                         subset=subset,
                                         with_phi=with_phi, tile=tile,
                                         interpret=True, exact_dots=exact)
                assert len(got) == len(ref)
                for a, b in zip(got, ref):
                    scale = float(jnp.max(jnp.abs(b))) or 1.0
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(b), atol=scale * 1e-5,
                        rtol=1e-4)


def test_m2l_subset_split_is_exact():
    """expand = near + far must hold PAIRWISE (same offsets, just split) --
    the identity that licenses the mixed-precision level sweep."""
    rng = np.random.default_rng(3)
    m, C = 4, 4
    hl = jnp.asarray([1.0e9, 1.0e9, 1.0e9], jnp.float32)
    w = jnp.asarray(rng.normal(size=(C ** 3, m ** 3)), jnp.float32)
    full = fmm.m2l_level(w, hl, SOFT, m=m, C=C, subset="expand")
    near = fmm.m2l_level(w, hl, SOFT, m=m, C=C, subset="near")
    far = fmm.m2l_level(w, hl, SOFT, m=m, C=C, subset="far")
    for a, b, c in zip(full, near, far):
        scale = float(jnp.max(jnp.abs(a)))
        np.testing.assert_allclose(np.asarray(b) + np.asarray(c),
                                   np.asarray(a), atol=scale * 1e-6)
    # offset-list sanity: the canonical lists partition (343 = 27 + 316)
    exp_o, _ = fmm._offsets_paired(*fmm._SUBSETS["expand"])
    near_o, _ = fmm._offsets_paired(*fmm._SUBSETS["near"])
    far_o, _ = fmm._offsets_paired(*fmm._SUBSETS["far"])
    assert len(exp_o) == len(near_o) + len(far_o)
    key = lambda os: {tuple(o) for o in os.tolist()}
    assert key(exp_o) == key(near_o) | key(far_o)


def test_fmm_m2l_dots_tiers():
    """All three m2l_dots tiers agree within the solver tolerance on the
    jnp path (the on-chip speed/accuracy ladder is recorded by
    scripts/m2l_tier_probe.py; on CPU the fused sweeps gate out, so this
    validates plumbing, and test_fused_mixed_composition covers the
    mixed-tier fused composition in interpret mode)."""
    s = SCHEMES["random"](1024, 9)
    gm = jnp.asarray(G, s.qx.dtype) * s.m
    ref = acc_naive(s.qx, s.qy, s.qz, gm, SOFT)
    # on the chip suite the real fused kernels run: the bf16-split tiers
    # carry cancellation-amplified error (measured ~2-6e-4 max on-chip,
    # scripts/m2l_tier_probe.py) -- tier-specific caps
    for dots, cap in (("fp32", 1e-4), ("mixed", 1e-3), ("bf16x3", 1e-3)):
        a = fmm.acc_fmm(s.qx, s.qy, s.qz, gm, SOFT, m=10, levels=2,
                        m2l_dots=dots)
        rel = _rel_force_err(a, ref, s.m)
        assert rel.max() < cap, (dots, rel.max())


def test_fused_mixed_composition():
    """The mixed tier's fused composition (near subset at exact dots +
    far subset at bf16x3, summed) reproduces the full expand sweep --
    in interpret mode, for both field counts, so a branch bug surfaces
    on CPU instead of after a 10-minute remote compile."""
    from murb_tpu.ops import fmm_pallas as fp

    if not _interpret():
        pytest.skip("bf16-split interpret is invalid on the TPU backend "
                    "(see _interpret); mixed-tier accuracy on-chip is "
                    "recorded by scripts/m2l_tier_probe.py")
    rng = np.random.default_rng(11)
    m, C, tile = 4, 4, 64
    hl = jnp.asarray([1.2e9, 1.0e9, 0.8e9], jnp.float32)
    w = jnp.asarray(rng.normal(size=(C ** 3, m ** 3)), jnp.float32)
    for with_phi in (False, True):
        full = fmm.m2l_level(w, hl, SOFT, m=m, C=C, subset="expand",
                             with_phi=with_phi)
        near = fp.m2l_level_fused(w, hl, SOFT, m=m, C=C, subset="near",
                                  with_phi=with_phi, tile=tile,
                                  interpret=True, exact_dots=True)
        far = fp.m2l_level_fused(w, hl, SOFT, m=m, C=C, subset="far",
                                 with_phi=with_phi, tile=tile,
                                 interpret=True, exact_dots=False)
        assert len(near) == len(far) == len(full) == (4 if with_phi else 3)
        for a, b, c in zip(near, far, full):
            scale = float(jnp.max(jnp.abs(c))) or 1.0
            np.testing.assert_allclose(
                np.asarray(a) + np.asarray(b), np.asarray(c),
                atol=scale * 2e-3)  # far shell rides bf16x3


def test_fused_m2l_tile_eligibility():
    import jax

    from murb_tpu.ops.fmm_pallas import m2l_fused_tile

    if jax.default_backend() == "tpu":
        assert m2l_fused_tile(10, 4, 3) in (128, 256)
    else:
        assert m2l_fused_tile(10, 4, 3) is None  # non-TPU -> never fused


def test_fmm_fused_block_eligibility():
    import jax

    from murb_tpu.ops.fmm_pallas import fmm_fused_block

    if jax.default_backend() == "tpu":
        assert fmm_fused_block(2048, 10, 4) is not None
        # 4-field force+potential variant: tighter width cap (cm 40 vs 48)
        assert fmm_fused_block(2048, 12, 4, nf=4) is None
        assert fmm_fused_block(2048, 12, 4) is not None
        # lane-misaligned n never fuses
        assert fmm_fused_block(2049, 10, 4) is None
    else:
        assert fmm_fused_block(2048, 10, 4) is None  # non-TPU -> never


# ------------------------------------------------------------------ engine
def test_hierarchy_ladder_drops_lossy_dots_tier(monkeypatch):
    """Dense-path mirror of the adaptive tier-drop: a lossy m2l_dots
    whose rounding floor misses tol steps toward fp32 instead of
    shipping the miss (CPU runs every tier at full fp32, so the tier
    error is injected by patching acc_fmm)."""
    import murb_tpu.ops.fmm as fmm_mod
    from murb_tpu.models.engines import ProxyEngine

    real = fmm_mod.acc_fmm
    scale = {"bf16x3": 3e-3, "mixed": 1e-3, "fp32": 0.0}

    def fake(qx, qy, qz, gm, soft, *, m, levels, m2l_dots="fp32", **kw):
        a = real(qx, qy, qz, gm, soft, m=m, levels=levels,
                 m2l_dots=m2l_dots, **kw)
        f = 1.0 + scale[m2l_dots]
        return type(a)(ax=a.ax * f, ay=a.ay * f, az=a.az * f)

    monkeypatch.setattr(fmm_mod, "acc_fmm", fake)
    # auto policy at this box: m=8 L=2, on-proxy -- explicit m/levels
    # would SKIP validation (user override contract), so rely on auto
    bodies = SCHEMES["random"](8192, 11)
    e = ProxyEngine(bodies, soft=SOFT, dt=DT,
                    m2l_dots="bf16x3", tol=1e-4, validate=True)
    assert e.levels >= 1                  # stayed on the hierarchy
    assert e.m2l_dots == "fp32"           # stepped bf16x3 -> mixed -> fp32
    assert e.validated_err is not None and e.validated_err <= 1e-4


def test_proxy_engine_auto_selects_fmm_for_random_at_scale():
    """VERDICT round-1 'done' criterion: the random scheme at production N
    auto-selects the hierarchical mode (no exact fallback).  Construction
    only -- the N=200k step itself is benchmarked on hardware."""
    bodies = SCHEMES["random"](200_000, 1)
    # validate=False: this tests the STATIC policy pick; measured-order
    # validation would run a full 200k solve on the CPU backend
    e = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT,
                      validate=False)
    assert e.levels >= 2
    assert e.using_proxy


def test_proxy_engine_depth_cost_tradeoff():
    """The auto policy sweeps depth with a measurement-calibrated cost
    model: at the N=200k random box (m=6, L=3) and (m=10, L=2) measured
    EQUAL on-chip (the flop win is eaten by per-sweep fixed costs), so
    the policy must keep the shallower, more-accurate grid there -- but
    a decisively wider box must deepen past required_levels instead of
    letting m (and its m^6 M2L term) blow up."""
    from murb_tpu.ops.fmm import required_levels

    bodies = SCHEMES["random"](200_000, 1)
    e = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT,
                      validate=False)
    from murb_tpu.ops.proxy import half_extent

    half = half_extent(bodies.unpadded())
    assert e.levels == required_levels(half, SOFT)  # tie -> shallow wins

    # a box 2x wider (lmin=3): the minimum-depth grid needs m=10 and its
    # m^6 node work dominates; the sweep must deepen to L=4 (m=6)
    wide_half = half * 2.0
    lmin_wide = required_levels(wide_half, SOFT)
    m_wide, l_wide = e._best_depth(wide_half)
    assert l_wide > lmin_wide
    from murb_tpu.ops.fmm import fmm_order

    assert m_wide == fmm_order(wide_half, SOFT, l_wide)
    assert m_wide < fmm_order(wide_half, SOFT, lmin_wide)


def test_proxy_engine_m2l_dots_knob():
    """The M2L tier is a first-class engine/CLI knob; bad tiers fail fast."""
    bodies = SCHEMES["random"](1024, 1)
    e = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT, levels=2, m=8,
                      m2l_dots="bf16x3")
    e.run(1)  # jnp fallback path on CPU; knob is a no-op there but threads
    assert e.m2l_dots == "bf16x3"
    with pytest.raises(ValueError, match="m2l_dots"):
        create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT,
                      m2l_dots="fp16")


def test_proxy_engine_small_n_random_prefers_exact():
    """At small N the cost model must keep the exact kernel (the M2L node
    work would dwarf the direct sum)."""
    bodies = SCHEMES["random"](2048, 1)
    e = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT)
    assert not e.using_proxy


def test_proxy_engine_galaxy_stays_single_level():
    """The galaxy box still fits a single global expansion -- the fast path
    must not regress to the hierarchy."""
    bodies = SCHEMES["galaxy"](2048, 5)
    e = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT)
    assert e.levels == 0 and e.cells == 1 and e.using_proxy


def test_proxy_engine_fmm_trajectory_vs_oracle():
    """Explicit hierarchical mode tracks the oracle within the reference's
    random-scheme tolerance (1e-3, test_SimulationNBody.cpp:76-81)."""
    bodies = SCHEMES["random"](1024, 1)
    e = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT, m=8, levels=2)
    assert e.levels == 2 and e.using_proxy
    ref = create_engine("cpu+naive", bodies, soft=SOFT, dt=DT)
    for i in range(3):
        ref.compute_one_iteration()
        e.compute_one_iteration()
        a, b = ref.bodies.unpadded(), e.bodies.unpadded()
        for c in ("qx", "qy", "qz"):
            assert_within_rel(b[c], a[c], 1e-3, f"fmm iter {i} {c}",
                              rms_floor=1e-6)


def test_proxy_health_reports_fmm_mode():
    bodies = SCHEMES["random"](1024, 1)
    e = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT, m=12, levels=2)
    h = e.proxy_health()
    assert h["levels"] == 2 and h["using_proxy"] and h["ok"]


@pytest.mark.slow
def test_adaptive_order_expanding_system():
    """An expanding system must keep force error <= tol across the
    transition: --adapt-every re-derives the order/mode from the current
    box and rebuilds the step mid-run (instead of the round-1 behavior of
    warning after the run)."""
    import dataclasses

    bodies = SCHEMES["random"](1024, 3)
    # shrink the box to ~2e8 half-width and expand radially ~3x by step 9
    # (velocities are fixed, so growth is linear in the step count)
    scale = 0.30
    rate = 2.0 / (9.0 * DT)
    fields = {k: getattr(bodies, k) * scale for k in ("qx", "qy", "qz")}
    fields.update({f"v{d}": fields[f"q{d}"] * rate for d in "xyz"})
    b = dataclasses.replace(bodies, **fields)

    e = create_engine("tpu+proxy", b, soft=SOFT, dt=DT, adapt_every=3,
                      cost_slack=1e9)
    assert e.levels == 0 and e.using_proxy   # starts single-level
    m0 = e.m
    e.run(12)
    assert (e.levels, e.m) != (0, m0)        # reconfigured mid-run
    e.maybe_adapt()                          # settle any trailing growth
    assert e.proxy_health()["ok"]

    # force error at the expanded state stays within the 1e-3 tolerance
    d = e.bodies
    gm = jnp.asarray(G, d.qx.dtype) * d.m
    ref = acc_naive(d.qx, d.qy, d.qz, gm, SOFT)
    a = fmm.acc_fmm(d.qx, d.qy, d.qz, gm, SOFT, m=e.m,
                    levels=max(e.levels, 1))
    rel = _rel_force_err(a, ref, d.m)
    assert rel.max() < 1e-3, rel.max()


def test_maybe_adapt_no_churn_when_valid():
    """A valid configuration is never rebuilt (no compile oscillation)."""
    bodies = SCHEMES["galaxy"](1024, 5)
    e = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT, adapt_every=2)
    cfg = (e.m, e.levels, e.cells, e.using_proxy)
    e.run(4)
    assert not e.maybe_adapt()
    assert (e.m, e.levels, e.cells, e.using_proxy) == cfg


def test_required_levels_policy():
    assert fmm.required_levels(1.0e8, SOFT) == 1          # small box
    assert fmm.required_levels(6.6e8, SOFT) == 2          # random scheme
    assert fmm.required_levels(1.0e11, SOFT) == 4         # capped
