"""Adaptive (occupied-cell) hierarchy: ops/sparse_fmm.py.

Differential discipline as everywhere: the jnp naive kernel is the
oracle.  The distributions are chosen to exercise what the dense
hierarchy cannot solve (clustered cores at soft << box / 2^Lmax) and the
multi-level sparse chain (several sparse levels, dense handoff, parity
telescoping)."""
import jax.numpy as jnp
import numpy as np
import pytest

from murb_tpu.ops.naive import acc_naive, acc_rect
from murb_tpu.ops.sparse_fmm import (
    SparsePlan,
    acc_adaptive,
    best_adaptive_plan,
    force_and_potential_adaptive,
    level_stats,
    plan_adaptive,
)


def _max_rel_err(a, r, gm):
    an = np.stack([np.asarray(a.ax), np.asarray(a.ay), np.asarray(a.az)], 1)
    rn = np.stack([np.asarray(r.ax), np.asarray(r.ay), np.asarray(r.az)], 1)
    nrm = np.linalg.norm(rn, axis=1)
    sel = np.asarray(gm) > 0
    e = np.linalg.norm(an - rn, axis=1)
    return float((e[sel] / np.maximum(nrm[sel], nrm[sel].max() * 1e-6)).max())


def _pad(q, m, npad):
    n = len(m)
    qp = np.zeros((npad, 3), np.float32)
    qp[:n] = q
    gm = np.zeros(npad, np.float32)
    gm[:n] = m
    return (jnp.asarray(qp[:, 0]), jnp.asarray(qp[:, 1]),
            jnp.asarray(qp[:, 2]), jnp.asarray(gm))


def _two_clusters(n=4000, npad=4096, seed=0, heavy=False):
    rng = np.random.default_rng(seed)
    q = np.concatenate([
        rng.normal(0, 1.0, (n // 2, 3)) + [-50.0, 0.0, 0.0],
        rng.normal(0, 1.0, (n - n // 2, 3)) + [50.0, 10.0, -5.0],
    ]).astype(np.float32)
    m = rng.uniform(0.5, 2.0, n).astype(np.float32)
    if heavy:
        m[0] = 5e5
    return _pad(q, m, npad), q


@pytest.mark.parametrize("dense_levels,levels", [(2, 4), (3, 5), (2, 6)])
def test_adaptive_clustered_wide_box(dense_levels, levels):
    """Deep sparse chains solve the soft-4-orders-below-box two-cluster
    case the dense hierarchy's cost model rejects."""
    (qx, qy, qz, gm), q = _two_clusters()
    ref = acc_naive(qx, qy, qz, gm, 0.01)
    plan = plan_adaptive(q, int(qx.shape[0]), 6, dense_levels, levels)
    a = acc_adaptive(qx, qy, qz, gm, 0.01, plan)
    assert _max_rel_err(a, ref, gm) <= 1e-4


@pytest.mark.slow
def test_adaptive_uniform_converges_with_order():
    rng = np.random.default_rng(1)
    n, npad = 4000, 4096
    q = rng.uniform(-100, 100, (n, 3)).astype(np.float32)
    m = rng.uniform(0.5, 2.0, n).astype(np.float32)
    qx, qy, qz, gm = _pad(q, m, npad)
    ref = acc_naive(qx, qy, qz, gm, 0.5)
    errs = []
    for order in (4, 8):
        plan = plan_adaptive(q, npad, order, 2, 4)
        errs.append(_max_rel_err(
            acc_adaptive(qx, qy, qz, gm, 0.5, plan), ref, gm))
    assert errs[1] <= 1e-4
    assert errs[1] < errs[0] / 10


def test_adaptive_fused_force_and_potential():
    (qx, qy, qz, gm), q = _two_clusters(n=2000, npad=2048)
    soft = 0.01
    plan = plan_adaptive(q, 2048, 6, 2, 5)
    a, phi = force_and_potential_adaptive(qx, qy, qz, gm, soft, plan)
    ref = acc_naive(qx, qy, qz, gm, soft)
    assert _max_rel_err(a, ref, gm) <= 1e-4

    qp = np.stack([np.asarray(qx), np.asarray(qy), np.asarray(qz)], 1)
    gmn = np.asarray(gm)
    d2 = ((qp[None] - qp[:, None]) ** 2).sum(-1) + soft ** 2
    ref_phi = (gmn[None, :] / np.sqrt(d2)).sum(1)  # includes self Gm/eps
    sel = gmn > 0
    np.testing.assert_allclose(np.asarray(phi)[sel], ref_phi[sel],
                               rtol=2e-4)


def test_adaptive_heavy_split():
    (qx, qy, qz, gm), q = _two_clusters(n=2000, npad=2048, heavy=True)
    ref = acc_naive(qx, qy, qz, gm, 0.01)
    plan = plan_adaptive(q, 2048, 6, 2, 5)
    a = acc_adaptive(qx, qy, qz, gm, 0.01, plan, heavy_k=1)
    assert _max_rel_err(a, ref, gm) <= 1e-4


def test_m2l_rank_compression_accuracy():
    """The shared-basis compressed far sweep (explicit m2l_rank > 0)
    stays inside the solver's 1e-4 error contract and matches the
    uncompressed sweep to the truncation level -- force AND potential
    fields.  The distribution must be LARGE enough that some level's
    occupied capacity crosses the cap >= 2*rank engagement gate
    (asserted): the original 2k-body version compared identical paths."""
    from murb_tpu.ops.sparse_fmm import _resolve_rank

    rng = np.random.default_rng(7)
    n, npad = 30_000, 30_720
    q = np.concatenate([
        rng.normal(0, 5.0, (n // 2, 3)) + [-75.0, 0.0, 0.0],
        rng.normal(0, 5.0, (n - n // 2, 3)) + [75.0, 20.0, -10.0],
    ]).astype(np.float32)
    m = (rng.uniform(0.5, 2.0, n) * 1e10).astype(np.float32)
    qp = np.zeros((npad, 3), np.float32)
    qp[:n] = q
    gp = np.zeros(npad, np.float32)
    gp[:n] = m
    qx, qy, qz, gm = (jnp.asarray(v)
                      for v in (qp[:, 0], qp[:, 1], qp[:, 2], gp))
    soft = 0.02
    full = plan_adaptive(q, npad, 6, 2, 6, m2l_rank=0)
    comp = plan_adaptive(q, npad, 6, 2, 6, m2l_rank=128)
    assert full.m2l_rank == 0 and comp.m2l_rank == 128
    assert _resolve_rank(comp, comp.cell_caps[-1]) == 128, comp.cell_caps
    a_f, phi_f = force_and_potential_adaptive(qx, qy, qz, gm, soft, full)
    a_c, phi_c = force_and_potential_adaptive(qx, qy, qz, gm, soft, comp)
    # exact reference on a strided sample (the full 30k^2 rect is slow)
    idx = np.arange(0, n, 97)
    ref = acc_rect(qx[idx], qy[idx], qz[idx], qx, qy, qz, gm, soft)
    sc = float(np.sqrt(np.asarray(ref.ax) ** 2 + np.asarray(ref.ay) ** 2
                       + np.asarray(ref.az) ** 2).max())
    de = np.sqrt(
        (np.asarray(a_c.ax)[idx] - np.asarray(ref.ax)) ** 2
        + (np.asarray(a_c.ay)[idx] - np.asarray(ref.ay)) ** 2
        + (np.asarray(a_c.az)[idx] - np.asarray(ref.az)) ** 2)
    assert de.max() / sc <= 1e-4
    # compressed-vs-full: truncation only, and NONZERO (proof the
    # compressed path actually ran)
    sel = np.asarray(gm) > 0
    diff = 0.0
    for d in ("ax", "ay", "az"):
        fn = np.asarray(getattr(a_f, d))[sel]
        cn = np.asarray(getattr(a_c, d))[sel]
        scale = np.abs(fn).max()
        diff = max(diff, np.abs(fn - cn).max() / scale)
    assert 0.0 < diff <= 2e-4, diff
    np.testing.assert_allclose(np.asarray(phi_c)[sel],
                               np.asarray(phi_f)[sel], rtol=2e-3)


def test_m2l_rank_default_gating():
    """Compression is DEFAULT-OFF at every order (measured round 4:
    residuals accumulate to ~1e-4-class at flagship scale --
    default_m2l_rank docstring); explicit ranks are honored, levels
    under the cap crossover fall back to the uncompressed sweep (via
    _resolve_rank)."""
    from murb_tpu.ops.sparse_fmm import (_M2L_RANKS, _resolve_rank,
                                         default_m2l_rank)

    assert all(default_m2l_rank(m) == 0 for m in (4, 6, 8, 10, 12))
    assert _M2L_RANKS == {8: 384, 10: 640, 12: 896}  # explicit tier
    plan = SparsePlan(m=8, dense_levels=2, levels=4, cell_caps=(64,),
                      p2p_pmax=64)
    assert plan.m2l_rank == -1
    assert _resolve_rank(plan, 4096) == 0             # default: off
    exp = plan._replace(m2l_rank=384)
    assert _resolve_rank(exp, 4096) == 384
    assert _resolve_rank(exp, 500) == 0               # cap < 2*rank
    assert _resolve_rank(plan._replace(m2l_rank=64), 4096) == 64


def test_best_plan_is_argmin_of_cost_model():
    """best_adaptive_plan returns the cheapest geometry its cost model
    sees.  (Which depth wins is distribution- and N-dependent: POINT-like
    clusters keep their intra-cluster pairs at any depth, so shallow
    wins at small N; depth pays off once cells resolve the cores --
    measured on the 82k merger, ROADMAP.)"""
    from murb_tpu.ops.sparse_fmm import plan_cost_ms

    (_, q) = _two_clusters()
    plan, cost = best_adaptive_plan(q, 4096, 6)
    assert np.isfinite(cost) and cost > 0
    best = min(plan_cost_ms(q, 4096, 6, Ld, L)
               for Ld in (2, 3) for L in range(Ld + 1, 10))
    assert cost == best
    assert plan_cost_ms(q, 4096, 6, plan.dense_levels,
                        plan.levels) == best


def test_windowed_anterpolation_matches_segment_sum():
    """p2m_window / l2p_window against a direct numpy segment
    reduction, including the edge cases of the window property: chunks
    spanning many slots, the active->dump transition chunk, and
    capacity-overflow slots (must be dropped, never corrupt real
    rows)."""
    import jax

    from murb_tpu.ops.p2p import morton_key
    from murb_tpu.ops.proxy import _basis
    from murb_tpu.ops.sparse_fmm import (
        _occupied_and_slots,
        l2p_window,
        p2m_window,
    )

    rng = np.random.default_rng(3)
    n, npad, m, L = 1500, 2048, 4, 5
    C = 2 ** L
    q = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32) * 40.0
    gm = rng.uniform(0.5, 2.0, npad).astype(np.float32)
    gm[n:] = 0.0
    qp = np.zeros((npad, 3), np.float32)
    qp[:n] = q
    c = jnp.zeros(3, jnp.float32)
    h = jnp.full(3, 50.0, jnp.float32)

    qx, qy, qz = (jnp.asarray(qp[:, i]) for i in range(3))
    from murb_tpu.ops.p2p import _cell_ixyz

    cx, cy, cz = _cell_ixyz(qx, qy, qz, c, h, C)
    key = jnp.where(jnp.asarray(gm) > 0, morton_key(cx, cy, cz, C),
                    np.iinfo(np.int32).max)
    perm = jnp.argsort(key)
    key_s = key[perm]
    xs, ys, zs = qx[perm], qy[perm], qz[perm]
    gs = jnp.asarray(gm)[perm]

    for cap_mode in ("roomy", "overflow"):
        n_occ = int(len(np.unique(np.asarray(key)[:n])))
        cap = n_occ + 7 if cap_mode == "roomy" else max(n_occ // 2, 4)
        cells, slots = jax.jit(
            lambda k: _occupied_and_slots(k, cap))(key_s)
        w = jax.jit(lambda *a: p2m_window(*a, c, h, slots, cap, m=m,
                                          C=C, chunk=256))(xs, ys, zs, gs)
        assert w.shape == (cap + 1, m ** 3)

        # numpy reference: exact per-slot segment sums
        lo = np.asarray(c - h)
        cs = np.asarray(2.0 * h / C)
        u = (np.asarray([xs, ys, zs]).T - lo) / cs
        ci = np.clip(np.floor(u), 0, C - 1)
        t = 2.0 * (u - ci) - 1.0
        bas = [np.asarray(_basis(jnp.asarray(t[:, d]), m)) for d in range(3)]
        outer = np.einsum("bu,bv,bw->buvw", bas[0] * np.asarray(gs)[:, None],
                          bas[1], bas[2]).reshape(npad, m ** 3)
        sl = np.asarray(slots)
        ref = np.zeros((cap, m ** 3), np.float32)
        for i in range(npad):
            if sl[i] < cap and gs[i] > 0:
                ref[sl[i]] += outer[i]
        np.testing.assert_allclose(np.asarray(w)[:cap], ref, atol=1e-4,
                                   rtol=1e-4)

        # l2p: random fields, dump row zero; dump/overflow bodies read 0
        f = rng.normal(0, 1, (cap + 1, m ** 3)).astype(np.float32)
        f[cap] = 0.0
        vals = jax.jit(lambda *a: l2p_window(
            *a, c, h, slots, (jnp.asarray(f),), m=m, C=C, chunk=256))(
            xs, ys, zs)[0]
        rows = np.where((sl < cap)[:, None], f[np.minimum(sl, cap)], 0.0)
        bout = np.einsum("bu,bv,bw->buvw", bas[0], bas[1],
                         bas[2]).reshape(npad, m ** 3)
        ref_v = np.sum(rows * bout, axis=1)
        np.testing.assert_allclose(np.asarray(vals), ref_v, atol=1e-4,
                                   rtol=1e-3)


def test_level_stats_replicates_capacity_needs():
    """The planner's occupied-cell counts are self-consistent: the
    differential tests above run with capacities sized from exactly
    these counts, so drops would already surface as force errors."""
    (_, q) = _two_clusters(n=2000, npad=2048)
    stats = level_stats(q, 2, 5)
    assert len(stats) == 3
    for nc, lvl in zip(stats, (3, 4, 5)):
        assert 0 < nc <= 2 ** (3 * lvl)
    # deeper levels split cells, never merge them
    assert stats == sorted(stats)


def _cluster_bodies(n=2000, seed=7):
    from murb_tpu.core.state import BodyState

    rng = np.random.default_rng(seed)
    q = np.concatenate([
        rng.normal(0, 1.0, (n // 2, 3)) + [-50.0, 0.0, 0.0],
        rng.normal(0, 1.0, (n - n // 2, 3)) + [50.0, 10.0, -5.0],
    ]).astype(np.float32)
    v = rng.normal(0, 1e-3, (n, 3)).astype(np.float32)
    # masses ~1e10 make G*m order-1 in these model units, so a few
    # dt=1e-3 steps move bodies measurably (a vacuous trajectory
    # comparison would pass on frozen positions)
    m = (rng.uniform(0.5, 2.0, n) * 1e10).astype(np.float32)
    r = np.ones(n, np.float32)
    return BodyState.from_arrays(m, r, q[:, 0], q[:, 1], q[:, 2],
                                 v[:, 0], v[:, 1], v[:, 2])


def test_proxy_engine_adaptive_trajectory_matches_oracle():
    """--im tpu+proxy --near adaptive through the ENGINE: trajectories
    track the naive oracle on the clustered wide box (the repo's
    standard differential discipline, ref test_SimulationNBody.cpp)."""
    from murb_tpu.models.engines import NaiveEngine, ProxyEngine

    soft, dt = 0.01, 1e-3
    ref = NaiveEngine(_cluster_bodies(), soft=soft, dt=dt)
    eng = ProxyEngine(_cluster_bodies(), soft=soft, dt=dt,
                      near="adaptive", validate=True)
    assert eng.near_mode == "adaptive"
    assert eng.using_proxy
    assert eng.validated_err is not None and eng.validated_err <= 1e-4
    for _ in range(3):
        ref.compute_one_iteration()
        eng.compute_one_iteration()
    a = eng.bodies.unpadded()
    b = ref.bodies.unpadded()
    for k in ("qx", "qy", "qz"):
        np.testing.assert_allclose(a[k], b[k], rtol=1e-3, atol=1e-6)


def test_adaptive_ladder_drops_lossy_dots_tier(monkeypatch):
    """A lossy m2l_dots tier whose rounding floor misses tol must be
    stepped toward fp32 BEFORE the ladder burns m-escalation rungs (the
    same discipline as the compression drop: the floor does not shrink
    with m).  CPU runs every tier at full fp32, so the tier error is
    injected by patching acc_adaptive."""
    import murb_tpu.ops.sparse_fmm as sf_mod
    from murb_tpu.models.engines import ProxyEngine

    real = sf_mod.acc_adaptive
    scale = {"bf16x3": 3e-3, "mixed": 1e-3, "fp32": 0.0}

    def fake(qx, qy, qz, gm, soft, plan, *, heavy_k, m2l_dots="fp32",
             **kw):
        acc = real(qx, qy, qz, gm, soft, plan, heavy_k=heavy_k,
                   m2l_dots=m2l_dots, **kw)
        f = 1.0 + scale[m2l_dots]
        return type(acc)(ax=acc.ax * f, ay=acc.ay * f, az=acc.az * f)

    monkeypatch.setattr(sf_mod, "acc_adaptive", fake)
    static = ProxyEngine(_cluster_bodies(), soft=0.01, dt=1e-3,
                         near="adaptive", validate=False)
    eng = ProxyEngine(_cluster_bodies(), soft=0.01, dt=1e-3,
                      near="adaptive", validate=True, m2l_dots="bf16x3",
                      tol=1e-4)
    assert eng.m2l_dots == "fp32"          # stepped bf16x3 -> mixed -> fp32
    assert eng.validated_err is not None and eng.validated_err <= 1e-4
    assert eng.m <= static.m               # no escalation rungs burned


def test_proxy_engine_adaptive_health_contract():
    from murb_tpu.models.engines import ProxyEngine

    eng = ProxyEngine(_cluster_bodies(), soft=0.01, dt=1e-3,
                      near="adaptive", validate=False)
    h = eng.proxy_health()
    assert h["near"] == "adaptive"
    assert h["ok"]
    assert h["required_m_now"] == eng.m  # scale-free accuracy
    assert len(h["n_cells_now"]) == len(h["cell_caps"])


def test_proxy_engine_auto_declines_adaptive_at_small_n():
    """near='auto' only leaves the exact kernel when the measured-rate
    cost model says the adaptive solver actually wins; at 2k bodies the
    exact sweep is microseconds, so the clustered box (which the interp
    policy rejects) must land on the exact fallback, not on a slower
    fast path."""
    from murb_tpu.models.engines import ProxyEngine

    eng = ProxyEngine(_cluster_bodies(), soft=0.01, dt=1e-3, near="auto")
    assert eng.near_mode == "interp"
    assert not eng.using_proxy  # honest exact fallback


def test_plan_is_static_and_hashable():
    """SparsePlan must stay a valid jit static argument."""
    (_, q) = _two_clusters(n=2000, npad=2048)
    plan = plan_adaptive(q, 2048, 6, 2, 5)
    assert isinstance(hash(plan), int)
    assert plan == SparsePlan(*plan)


def _interpret():
    """interpret=True only off-TPU (the test_fmm pattern): the XLA
    simplifier de-splits bf16 Dekker dots on the TPU backend; the chip
    suite (MURB_TEST_TPU=1) exercises the REAL kernels."""
    import jax

    return jax.default_backend() != "tpu"


def _sorted_window_case(seed, n, C, cap, ghosts=True):
    import jax.numpy as jnp

    from murb_tpu.ops import sparse_fmm as sf

    rng = np.random.default_rng(seed)
    q = rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    g = rng.uniform(0.5, 2.0, n).astype(np.float32)
    if ghosts:
        g[-n // 16:] = 0.0
    c = jnp.zeros(3, jnp.float32)
    h = jnp.ones(3, jnp.float32)
    qx, qy, qz = (jnp.asarray(q[:, i]) for i in range(3))
    gj = jnp.asarray(g)
    cx, cy, cz = sf._body_cells(qx, qy, qz, c, h, C)
    key = jnp.where(gj > 0, sf.morton_key(cx, cy, cz, C), sf._BIG)
    perm = jnp.argsort(key)
    xs, ys, zs, gs = (v[perm] for v in (qx, qy, qz, gj))
    cells, slots = sf._occupied_and_slots(key[perm], cap)
    return (xs, ys, zs, gs), c, h, slots


@pytest.mark.parametrize("n,m,C,cap,B", [
    (512, 4, 8, 64, 256),       # capacity overflow: in-window dump rows
    (2048, 6, 16, 300, 256),    # multi-chunk carries
    (2048, 6, 16, 300, 512),
])
def test_p2m_window_pallas_matches_jnp(n, m, C, cap, B):
    """The Pallas sorted-segment P2M (ops/anterp_pallas; interpret on
    CPU, real kernel on the chip suite) reproduces the jnp windowed
    scan on every real slot row at the bf16x3 contraction class.  The
    dump row (never read by any consumer) is zero in the kernel and
    accumulated by the scan -- compared rows exclude it."""
    from murb_tpu.ops import anterp_pallas as ap
    from murb_tpu.ops import sparse_fmm as sf

    (xs, ys, zs, gs), c, h, slots = _sorted_window_case(n, n, C, cap)
    w1 = sf.p2m_window(xs, ys, zs, gs, c, h, slots, cap, m=m, C=C,
                       chunk=B)
    w2 = ap.p2m_window_pallas(xs, ys, zs, gs, c, h, slots, cap=cap,
                              m=m, C=C, B=B, interpret=_interpret())
    scale = float(jnp.max(jnp.abs(w1[:cap])))
    np.testing.assert_allclose(np.asarray(w2[:cap]),
                               np.asarray(w1[:cap]),
                               atol=scale * 3e-5)


@pytest.mark.parametrize("nf", [3, 4])
def test_l2p_window_pallas_matches_jnp(nf):
    """The Pallas sorted-segment L2P gather reproduces the jnp windowed
    scan for force-only and force+phi field counts."""
    from murb_tpu.ops import anterp_pallas as ap
    from murb_tpu.ops import sparse_fmm as sf

    n, m, C, cap, B = 2048, 6, 16, 300, 256
    (xs, ys, zs, _gs), c, h, slots = _sorted_window_case(7, n, C, cap)
    rng = np.random.default_rng(8)
    fields = tuple(
        jnp.asarray(rng.normal(size=(cap + 1, m ** 3)), jnp.float32)
        .at[cap].set(0.0) for _ in range(nf))
    v1 = sf.l2p_window(xs, ys, zs, c, h, slots, fields, m=m, C=C,
                       chunk=B)
    v2 = ap.l2p_window_pallas(xs, ys, zs, c, h, slots, fields, cap=cap,
                              m=m, C=C, B=B, interpret=_interpret())
    for k in range(nf):
        scale = float(jnp.max(jnp.abs(v1[k])))
        np.testing.assert_allclose(np.asarray(v2[k]), np.asarray(v1[k]),
                                   atol=scale * 3e-5)


def test_m2l_scan_chunk_matches_unchunked(monkeypatch):
    """MURB_M2L_SCAN_CHUNK batches CH offsets per scan step with local
    accumulation (carry-traffic lever); the gather/dot forms per offset
    are unchanged, so CH = 5 (which pads: 158 % 5 != 0, and both mixed
    shells 49/109 pad too) must reproduce CH = 1 to fp32 roundoff."""
    from murb_tpu.ops.sparse_fmm import best_adaptive_plan, solve_adaptive

    rng = np.random.default_rng(3)
    n = 4096
    q = np.concatenate([
        rng.normal(0, 0.02, (n // 2, 3)) - 0.4,
        rng.normal(0, 0.02, (n - n // 2, 3)) + 0.4,
    ]).astype(np.float32)
    g = rng.uniform(0.5, 2.0, n).astype(np.float32)
    plan, _ = best_adaptive_plan(q, n, 6)
    qx, qy, qz = (jnp.asarray(q[:, i]) for i in range(3))
    gj = jnp.asarray(g)
    kw = dict(heavy_k=1, heavy_factor=64.0, with_phi=True)
    a_1, p_1 = solve_adaptive(qx, qy, qz, gj, 1e-3, plan, **kw)
    monkeypatch.setenv("MURB_M2L_SCAN_CHUNK", "5")
    a_5, p_5 = solve_adaptive(qx, qy, qz, gj, 1e-3, plan, **kw)
    s = float(jnp.max(jnp.linalg.norm(a_1, axis=1)))
    assert float(jnp.max(jnp.abs(a_5 - a_1))) <= 1e-5 * s
    assert float(jnp.max(jnp.abs(p_5 - p_1))) \
        <= 1e-5 * float(jnp.max(jnp.abs(p_1)))
    # mixed tier composes with chunking (padding exercised on both shells)
    a_m, _ = solve_adaptive(qx, qy, qz, gj, 1e-3, plan,
                            m2l_dots="mixed", **kw)
    assert float(jnp.max(jnp.abs(a_m - a_1))) <= 1e-5 * s


def test_m2l_mixed_tier_partitions_offsets_exactly():
    """The mixed dot tier splits the canonical list into |o|_inf = 2 and
    >= 3 shells and sums two scans; on the CPU backend every precision
    is full fp32, so the split must reproduce the single-sweep solve to
    fp32 roundoff -- a partition test (each offset exactly once)."""
    import jax

    from murb_tpu.ops.sparse_fmm import best_adaptive_plan, solve_adaptive

    rng = np.random.default_rng(0)
    n = 4096
    q = np.concatenate([
        rng.normal(0, 0.02, (n // 2, 3)) - 0.4,
        rng.normal(0, 0.02, (n - n // 2, 3)) + 0.4,
    ]).astype(np.float32)
    g = rng.uniform(0.5, 2.0, n).astype(np.float32)
    plan, _ = best_adaptive_plan(q, n, 6)
    qx, qy, qz = (jnp.asarray(q[:, i]) for i in range(3))
    gj = jnp.asarray(g)
    kw = dict(heavy_k=1, heavy_factor=64.0, with_phi=True)
    a_f, p_f = solve_adaptive(qx, qy, qz, gj, 1e-3, plan,
                              m2l_dots="fp32", **kw)
    a_m, p_m = solve_adaptive(qx, qy, qz, gj, 1e-3, plan,
                              m2l_dots="mixed", **kw)
    s = float(jnp.max(jnp.linalg.norm(a_f, axis=1)))
    assert float(jnp.max(jnp.abs(a_m - a_f))) <= 1e-5 * s
    assert float(jnp.max(jnp.abs(p_m - p_f))) \
        <= 1e-5 * float(jnp.max(jnp.abs(p_f)))
