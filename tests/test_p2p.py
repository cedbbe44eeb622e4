"""Adaptive near-field (P2P) stage: ops/p2p.py + the near="p2p" hierarchy.

The capability under test is the one the interp-only hierarchy cannot
provide: fast solving of CLUSTERED distributions whose box-to-softening
ratio explodes the dense grid (the merger workload, ROADMAP "remaining").
Differential discipline follows the repo standard: the jnp naive kernel
is the oracle (ref test pattern: src/test/implem/test_SimulationNBody.cpp).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from murb_tpu.ops.fmm import acc_fmm, force_and_potential_fmm
from murb_tpu.ops.naive import acc_naive
from murb_tpu.ops.p2p import (
    estimate_brick_pairs,
    morton_key,
    p2p_sweep,
    size_pmax,
)
from murb_tpu.ops.proxy import bounding_box


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


def _two_clusters(n=4000, npad=4096, seed=0):
    """Two tight clusters in a wide box: soft << box/2^L for any feasible
    dense-grid depth -- the distribution the interp near-field cannot
    cover (required_levels ~ 13)."""
    rng = np.random.default_rng(seed)
    q = np.concatenate([
        rng.normal(0, 1.0, (n // 2, 3)) + [-50.0, 0.0, 0.0],
        rng.normal(0, 1.0, (n - n // 2, 3)) + [50.0, 10.0, -5.0],
    ]).astype(np.float32)
    m = rng.uniform(0.5, 2.0, n).astype(np.float32)
    return _pad(q, m, npad), q


def _uniform(n=4000, npad=4096, seed=1):
    rng = np.random.default_rng(seed)
    q = rng.uniform(-100, 100, (n, 3)).astype(np.float32)
    m = rng.uniform(0.5, 2.0, n).astype(np.float32)
    return _pad(q, m, npad), q


def test_morton_key_orders_locally():
    """Morton keys of adjacent cells differ less than far cells on average
    (sanity: interleave bit order y-major matches the docstring)."""
    cx, cy, cz = (jnp.asarray(v) for v in ([0, 0, 1], [0, 0, 1], [0, 1, 1]))
    k = np.asarray(morton_key(cx, cy, cz, 4))
    assert k[0] == 0
    assert k[0] < k[1] < k[2]


@pytest.mark.slow
def test_p2p_sweep_matches_bruteforce_nearfield():
    """The P2P stage is EXACT on the 27-neighborhood pair set (the
    brick-pair superset is pruned by the in-kernel cell-offset mask)."""
    (qx, qy, qz, gm), q = _two_clusters()
    npad = int(qx.shape[0])
    soft = 0.01
    C = 8
    c, h = bounding_box(qx, qy, qz, gm > 0)
    h = jnp.full_like(h, jnp.max(h))  # the p2p-mode isotropic box
    pmax = size_pmax(estimate_brick_pairs(q, npad, 3))
    acc, phi, n_pairs = p2p_sweep(qx, qy, qz, gm, c, h, soft, C=C,
                                  pmax=pmax, with_phi=True)
    assert int(n_pairs) <= pmax

    qp = np.stack([np.asarray(qx), np.asarray(qy), np.asarray(qz)], 1)
    gmn = np.asarray(gm)
    lo = np.asarray(c - h)
    cs = np.asarray(2.0 * h / C)
    ci = np.clip(np.floor((qp - lo) / cs), 0, C - 1).astype(int)
    d = qp[None, :, :] - qp[:, None, :]
    d2 = (d ** 2).sum(-1) + soft ** 2
    near = (np.abs(ci[None, :, :] - ci[:, None, :]).max(-1) <= 1)
    act = (gmn > 0)
    w = np.where(near & act[None, :] & act[:, None],
                 gmn[None, :] * d2 ** -1.5, 0.0)
    ref = (w[:, :, None] * d).sum(1)
    ref_phi = np.where(near & act[None, :] & act[:, None],
                       gmn[None, :] / np.sqrt(d2), 0.0).sum(1)

    sel = act
    scale = np.linalg.norm(ref[sel], axis=1).max()
    assert np.linalg.norm(np.asarray(acc)[sel] - ref[sel],
                          axis=1).max() <= 2e-5 * scale
    # phi includes the Gm_i/eps self term, same convention as the exact
    # tile sweep (ref: SimulationNBodyCUDAPropertyTracking.cu:296-302)
    np.testing.assert_allclose(np.asarray(phi)[sel], ref_phi[sel],
                               rtol=3e-5)


@pytest.mark.parametrize("levels,m", [(2, 6), (3, 6), (4, 6)])
def test_fmm_p2p_clustered_wide_box(levels, m):
    """near='p2p' covers the distribution the interp hierarchy rejects:
    two point-like clusters, soft 4 orders below the box scale."""
    (qx, qy, qz, gm), q = _two_clusters()
    ref = acc_naive(qx, qy, qz, gm, 0.01)
    pmax = size_pmax(estimate_brick_pairs(q, int(qx.shape[0]), levels))
    a = acc_fmm(qx, qy, qz, gm, 0.01, m=m, levels=levels, near="p2p",
                p2p_pmax=pmax)
    assert _max_rel_err(a, ref, gm) <= 1e-4


def test_fmm_p2p_uniform_converges_with_order():
    (qx, qy, qz, gm), q = _uniform()
    ref = acc_naive(qx, qy, qz, gm, 0.5)
    pmax = size_pmax(estimate_brick_pairs(q, int(qx.shape[0]), 2))
    errs = [
        _max_rel_err(
            acc_fmm(qx, qy, qz, gm, 0.5, m=m, levels=2, near="p2p",
                    p2p_pmax=pmax),
            ref, gm)
        for m in (4, 8)
    ]
    assert errs[1] <= 1e-4
    assert errs[1] < errs[0] / 10  # genuine spectral convergence


def test_fmm_p2p_fused_force_and_potential():
    """The tracking entry point: phi rides the same pass; compare against
    the exact potential (self-term compensated identically on both
    sides by NOT compensating either)."""
    (qx, qy, qz, gm), q = _two_clusters(n=2000, npad=2048)
    soft = 0.01
    pmax = size_pmax(estimate_brick_pairs(q, int(qx.shape[0]), 3))
    a, phi = force_and_potential_fmm(qx, qy, qz, gm, soft, m=6, levels=3,
                                     near="p2p", p2p_pmax=pmax)
    ref = acc_naive(qx, qy, qz, gm, soft)
    assert _max_rel_err(a, ref, gm) <= 1e-4

    qp = np.stack([np.asarray(qx), np.asarray(qy), np.asarray(qz)], 1)
    gmn = np.asarray(gm)
    d2 = ((qp[None] - qp[:, None]) ** 2).sum(-1) + soft ** 2
    ref_phi = (gmn[None, :] / np.sqrt(d2)).sum(1)  # includes self Gm/eps
    sel = gmn > 0
    np.testing.assert_allclose(np.asarray(phi)[sel], ref_phi[sel],
                               rtol=2e-4)


def test_p2p_heavy_split_correction():
    """A dominant central mass goes through the heavy path (exact as
    source AND target) while the swarm runs P2P + far field."""
    rng = np.random.default_rng(3)
    n, npad = 2000, 2048
    q = np.concatenate([
        np.zeros((1, 3)),
        rng.normal(0, 1.0, (n // 2 - 1, 3)) + [-50.0, 0.0, 0.0],
        rng.normal(0, 1.0, (n - n // 2, 3)) + [50.0, 0.0, 0.0],
    ]).astype(np.float32)
    m = rng.uniform(0.5, 2.0, n).astype(np.float32)
    m[0] = 5e5
    qx, qy, qz, gm = _pad(q, m, npad)
    ref = acc_naive(qx, qy, qz, gm, 0.01)
    pmax = size_pmax(estimate_brick_pairs(q, npad, 3))
    a = acc_fmm(qx, qy, qz, gm, 0.01, m=6, levels=3, near="p2p",
                p2p_pmax=pmax, heavy_k=1)
    assert _max_rel_err(a, ref, gm) <= 1e-4


def test_p2p_pair_capacity_reported():
    """n_pairs is the TRUE count even when it exceeds pmax (the health
    signal engines rebuild on); dropped pairs mean the result is stale,
    so the count must not silently clamp."""
    (qx, qy, qz, gm), q = _two_clusters(n=2000, npad=2048)
    c, h = bounding_box(qx, qy, qz, gm > 0)
    h = jnp.full_like(h, jnp.max(h))
    true_pairs = estimate_brick_pairs(q, 2048, 3)
    small = max(true_pairs // 2 // 128 * 128, 128)
    _acc, _phi, n_pairs = p2p_sweep(qx, qy, qz, gm, c, h, 0.01, C=8,
                                    pmax=small)
    # the true count, not clamped to capacity (tolerance: a boundary
    # body may cell-hop between host-f32 and accelerator rounding)
    assert abs(int(n_pairs) - true_pairs) <= max(0.02 * true_pairs, 4)
    assert int(n_pairs) > small


def test_p2p_pallas_matches_jnp_sweep():
    """The block-sparse Pallas kernel (ops/p2p_pallas) reproduces the
    jnp sweep bit-closely: same near-pair set (in-kernel mask), same
    self-pair conventions; runs interpreted off-TPU, the real kernel on
    the chip suite."""
    from murb_tpu.ops.p2p_pallas import acc_p2p_pallas, size_pmax_runs

    (qx, qy, qz, gm), q = _two_clusters()
    npad = int(qx.shape[0])
    soft = 0.01
    C = 8
    c, h = bounding_box(qx, qy, qz, gm > 0)
    h = jnp.full_like(h, jnp.max(h))
    est = estimate_brick_pairs(q, npad, 3)
    ref_acc, ref_phi, np1 = p2p_sweep(qx, qy, qz, gm, c, h, soft, C=C,
                                      pmax=size_pmax(est), with_phi=True)
    a, phi, np2 = acc_p2p_pallas(qx, qy, qz, gm, c, h, soft, C=C,
                                 pmax=size_pmax_runs(est, npad // 128),
                                 with_phi=True)
    assert int(np1) == int(np2)
    an = np.stack([np.asarray(a.ax), np.asarray(a.ay), np.asarray(a.az)], 1)
    rn = np.asarray(ref_acc)
    nrm = np.linalg.norm(rn, axis=1)
    sel = np.asarray(gm) > 0
    err = (np.linalg.norm(an - rn, axis=1)
           / np.maximum(nrm, nrm[sel].max() * 1e-6))[sel].max()
    assert err <= 1e-5
    np.testing.assert_allclose(np.asarray(phi)[sel],
                               np.asarray(ref_phi)[sel], rtol=1e-5)


@pytest.mark.slow
def test_p2p_pallas_double_buffer_race_free():
    """The kernel's double-buffered source-DMA protocol (two buffers,
    two semaphores, start-ahead one grid step) is clean under the
    Pallas TPU interpret-mode race detector, and still matches the jnp
    sweep.  CPU-only: the TPU-interpret simulator is not meant to be
    lowered to the chip (see tests/test_ring_pallas.py)."""
    if jax.default_backend() == "tpu":
        pytest.skip("interpret-mode simulator runs on CPU only")
    from jax.experimental.pallas import tpu as pltpu
    from murb_tpu.ops.p2p_pallas import acc_p2p_pallas, size_pmax_runs

    (qx, qy, qz, gm), q = _two_clusters(n=1000, npad=1024)
    npad = int(qx.shape[0])
    soft = 0.01
    C = 8
    c, h = bounding_box(qx, qy, qz, gm > 0)
    h = jnp.full_like(h, jnp.max(h))
    est = estimate_brick_pairs(q, npad, 3)
    ref_acc, _, np1 = p2p_sweep(qx, qy, qz, gm, c, h, soft, C=C,
                                pmax=size_pmax(est))
    a, _, np2 = acc_p2p_pallas(
        qx, qy, qz, gm, c, h, soft, C=C,
        pmax=size_pmax_runs(est, npad // 128),
        interpret=pltpu.InterpretParams(detect_races=True))
    assert int(np1) == int(np2)
    an = np.stack([np.asarray(a.ax), np.asarray(a.ay), np.asarray(a.az)], 1)
    rn = np.asarray(ref_acc)
    nrm = np.linalg.norm(rn, axis=1)
    sel = np.asarray(gm) > 0
    err = (np.linalg.norm(an - rn, axis=1)
           / np.maximum(nrm, nrm[sel].max() * 1e-6))[sel].max()
    assert err <= 1e-5


def test_estimate_matches_device_count():
    """The host-side sizing replica agrees with the in-jit count (same
    sort, same sentinel handling) -- pmax sizing is only meaningful if
    the two structures coincide."""
    (qx, qy, qz, gm), q = _uniform(n=3000, npad=3072)
    c, h = bounding_box(qx, qy, qz, gm > 0)
    h = jnp.full_like(h, jnp.max(h))
    est = estimate_brick_pairs(q, 3072, 2)
    _a, _p, n_pairs = p2p_sweep(qx, qy, qz, gm, c, h, 0.5, C=4,
                                pmax=size_pmax(est))
    assert abs(int(n_pairs) - est) <= max(0.02 * est, 4)


def test_build_pair_runs_oracle():
    """The scatter-free select-rank construction of build_pair_runs
    (ops/p2p_pallas) reproduces the straightforward run-padded list on
    random adjacency matrices, including the dropped-pairs overflow
    case (sb is truncated, n_padded still reports the true need)."""
    from murb_tpu.ops.p2p_pallas import build_pair_runs

    rng = np.random.default_rng(7)
    G = 32
    for B, dens, pm_frac in ((8, 0.5, 2.0), (64, 0.1, 2.0),
                             (64, 0.9, 2.0), (128, 0.05, 0.5)):
        adj = rng.random((B, B)) < dens
        adj |= np.eye(B, dtype=bool)                  # self pairs
        counts = adj.sum(1)
        padded = (counts + G - 1) // G * G
        starts = np.concatenate([[0], np.cumsum(padded)[:-1]])
        n_padded = int(padded.sum())
        pmax = max(int(n_padded * pm_frac) // G * G, G)

        ref = np.full(n_padded, -1, np.int64)
        for t in range(B):
            (js,) = np.nonzero(adj[t])
            ref[starts[t]:starts[t] + len(js)] = js
        ref_tb = np.repeat(np.arange(B), padded // G)

        tb, sb, npd = jax.jit(build_pair_runs, static_argnums=(1,))(
            jnp.asarray(adj), pmax)
        assert int(npd) == n_padded
        k = min(pmax, n_padded)
        np.testing.assert_array_equal(np.asarray(sb)[:k], ref[:k])
        np.testing.assert_array_equal(
            np.asarray(tb)[:k // G], ref_tb[:k // G])
        if pmax > n_padded:                            # capacity tail
            assert (np.asarray(sb)[n_padded:] == -1).all()
            assert (np.asarray(tb)[n_padded // G:] == B - 1).all()
