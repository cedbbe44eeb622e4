"""Chebyshev proxy solver tests: force accuracy, trajectories, fallback."""
import numpy as np
import pytest

from murb_tpu import G
from murb_tpu.core.init import SCHEMES
from murb_tpu.models import create_engine
from murb_tpu.ops.naive import acc_naive
from murb_tpu.ops.proxy import acc_proxy, required_order

from conftest import assert_within_rel

SOFT = 2.0e8
DT = 3600.0


def test_required_order_scaling():
    # galaxy-like box (halfwidth ~ eps): small m; random-like box: large m
    assert required_order(2e8, SOFT) <= 16
    assert required_order(6.6e8, SOFT) > 24
    assert required_order(1e8, SOFT) < required_order(1e9, SOFT)


def test_proxy_force_accuracy_galaxy():
    s = SCHEMES["galaxy"](2048, 123)
    gm = np.float32(G) * s.m
    ref = acc_naive(s.qx, s.qy, s.qz, gm, SOFT)
    got = acc_proxy(s.qx, s.qy, s.qz, gm, SOFT, m=16)
    for name, g, r in (("ax", got.ax, ref.ax), ("az", got.az, ref.az)):
        assert_within_rel(np.asarray(g), np.asarray(r), 2e-3, f"proxy {name}",
                          rms_floor=2e-4)


def test_proxy_heavy_body_force_exact():
    """The central body's force comes from the exact k x N sweep."""
    s = SCHEMES["galaxy"](1024, 7)
    gm = np.float32(G) * s.m
    ref = acc_naive(s.qx, s.qy, s.qz, gm, SOFT)
    got = acc_proxy(s.qx, s.qy, s.qz, gm, SOFT, m=12, heavy_k=1)
    # body 0 is the heavy one: must match the oracle to fp32 rounding
    for g, r in ((got.ax[0], ref.ax[0]), (got.ay[0], ref.ay[0])):
        np.testing.assert_allclose(float(g), float(r), rtol=1e-4)


@pytest.mark.parametrize("n,n_ite", [(2048, 4), (2049, 3)])
def test_proxy_trajectory_galaxy(n, n_ite):
    """The reference's own galaxy differential cases, via the fast solver."""
    bodies = SCHEMES["galaxy"](n, 123)
    ref = create_engine("cpu+naive", bodies, soft=SOFT, dt=DT)
    tgt = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT)
    assert tgt.using_proxy, f"expected proxy mode, got m={tgt.m}"
    for i in range(n_ite + 1):
        if i > 0:
            ref.compute_one_iteration()
            tgt.compute_one_iteration()
        a, b = ref.bodies.unpadded(), tgt.bodies.unpadded()
        e = 1e-1 if i > 0 else 0.0
        for c in ("qx", "qy", "qz"):
            assert_within_rel(b[c], a[c], e, f"proxy galaxy iter {i} {c}")


def test_proxy_mid_box_high_order():
    """m=28 on a ~3x-galaxy-sized box (exercises the chunked large-P M2L)."""
    import dataclasses

    import jax.numpy as jnp

    s = SCHEMES["galaxy"](1024, 11)
    scale = jnp.asarray(3.0, s.dtype)
    s = dataclasses.replace(s, qx=s.qx * scale, qy=s.qy * scale,
                            qz=s.qz * scale)
    gm = np.float32(G) * s.m
    ref = acc_naive(s.qx, s.qy, s.qz, gm, SOFT)
    got = acc_proxy(s.qx, s.qy, s.qz, gm, SOFT, m=28)
    assert_within_rel(np.asarray(got.ax), np.asarray(ref.ax), 5e-3,
                      "proxy m=28 ax", rms_floor=5e-4)


@pytest.mark.slow
def test_proxy_two_level_covers_random_scheme():
    """Explicit octant decomposition matches the oracle on the random scheme
    within the reference tolerance (the auto policy only picks it when the
    cost model favors it, i.e. at large N)."""
    bodies = SCHEMES["random"](2048, 123)
    tgt = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT, m=20, cells=2)
    assert tgt.using_proxy and tgt.cells == 2
    ref = create_engine("cpu+naive", bodies, soft=SOFT, dt=DT)
    for _ in range(2):
        ref.compute_one_iteration()
        tgt.compute_one_iteration()
    a, b = ref.bodies.unpadded(), tgt.bodies.unpadded()
    assert_within_rel(b["qx"], a["qx"], 1e-3, "proxy two-level qx")
    assert_within_rel(b["qz"], a["qz"], 1e-3, "proxy two-level qz")


def test_proxy_auto_policy():
    """Auto selection: small-N random -> exact fallback (cost model);
    galaxy -> single-level proxy."""
    rnd = create_engine("tpu+proxy", SCHEMES["random"](2048, 1),
                        soft=SOFT, dt=DT)
    assert not rnd.using_proxy          # node sweep would dwarf direct sum
    gal = create_engine("tpu+proxy", SCHEMES["galaxy"](2048, 1),
                        soft=SOFT, dt=DT)
    assert gal.using_proxy and gal.cells == 1


@pytest.mark.slow
def test_proxy_two_level_force_accuracy():
    s = SCHEMES["random"](2048, 5)
    gm = np.float32(G) * s.m
    ref = acc_naive(s.qx, s.qy, s.qz, gm, SOFT)
    got = acc_proxy(s.qx, s.qy, s.qz, gm, SOFT, m=20, cells=2)
    assert_within_rel(np.asarray(got.ax), np.asarray(ref.ax), 5e-3,
                      "two-level ax", rms_floor=5e-4)


def test_octant_grid_anterpolation_correspondence():
    """The C=2 extended-basis grid P2M (ops/fmm_pallas.py, the TPU fast
    path inside _two_level) is the per-octant masked P2M: cell id
    (cx*2+cy)*2+cz must line up with the octants list order (x-major,
    low-to-high), with identical in-octant Chebyshev coordinates."""
    import jax.numpy as jnp

    from murb_tpu.ops import fmm
    from murb_tpu.ops.proxy import bases, bounding_box, p2m

    m = 6
    s = SCHEMES["random"](512, 9)
    gm = jnp.asarray(np.float32(G) * s.m)
    c, h = bounding_box(s.qx, s.qy, s.qz, gm > 0)
    half = 0.5 * h

    w_grid = fmm.p2m_grid(s.qx, s.qy, s.qz, gm, c, h, m=m, C=2)  # (8, m^3)

    o = 0
    for ox in (-1, 1):
        for oy in (-1, 1):
            for oz in (-1, 1):
                co = jnp.stack([c[0] + ox * half[0], c[1] + oy * half[1],
                                c[2] + oz * half[2]])
                mx = (s.qx > c[0]) if ox > 0 else (s.qx <= c[0])
                my = (s.qy > c[1]) if oy > 0 else (s.qy <= c[1])
                mz = (s.qz > c[2]) if oz > 0 else (s.qz <= c[2])
                gm_o = gm * (mx & my & mz).astype(gm.dtype)
                sx, syz = bases(s.qx, s.qy, s.qz, co, half, m)
                w_oct = p2m(sx, syz, gm_o, m)
                scale = float(jnp.max(jnp.abs(w_oct))) or 1.0
                # 1e-4 of max: the two jnp formulations differ in fp32
                # reduction order and transcendental rounding, which the
                # TPU backend stretches to ~3e-5 (measured on-chip)
                np.testing.assert_allclose(
                    np.asarray(w_grid[o]), np.asarray(w_oct),
                    atol=scale * 1e-4,
                    err_msg=f"octant {o} ({ox},{oy},{oz})")
                o += 1


def test_proxy_falls_back_when_capped():
    """An artificially tiny max_m forces the exact-kernel fallback."""
    bodies = SCHEMES["random"](1024, 123)
    tgt = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT, max_m=8)
    assert not tgt.using_proxy
    ref = create_engine("cpu+naive", bodies, soft=SOFT, dt=DT)
    ref.compute_one_iteration()
    tgt.compute_one_iteration()
    a, b = ref.bodies.unpadded(), tgt.bodies.unpadded()
    assert_within_rel(b["qx"], a["qx"], 1e-3, "proxy fallback qx")


def test_proxy_scan_run_matches_stepwise():
    bodies = SCHEMES["galaxy"](1024, 3)
    a = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT)
    b = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT)
    for _ in range(4):
        a.compute_one_iteration()
    b.run(4)
    da, db = a.bodies.unpadded(), b.bodies.unpadded()
    assert_within_rel(db["qx"], da["qx"], 1e-6, "proxy scan vs stepwise")


def test_fused_pallas_stages_match_xla(n_devices):
    """Interpret-mode parity: the Pallas-fused P2M/L2P must reproduce the
    XLA stages (the fused path is TPU-gated, so without this the CPU suite
    would never execute those kernels).  On the chip suite the REAL
    kernels run instead: interpret=True on the TPU backend de-splits the
    bf16x3 dots (XLA folds ah@bh + ah@bl + al@bh into one re-rounded
    dot, ~3e-3 error; Mosaic never does this to compiled kernels)."""
    import jax
    import jax.numpy as jnp

    interpret = jax.default_backend() != "tpu"

    from murb_tpu.ops.proxy import bases, bounding_box, l2p, p2m
    from murb_tpu.ops.proxy_pallas import l2p_fused_multi, p2m_fused
    from murb_tpu.ops.common import Accel

    m = 12
    s = SCHEMES["galaxy"](512, 17)
    gm = np.float32(G) * s.m
    c, h = bounding_box(s.qx, s.qy, s.qz, jnp.asarray(gm) > 0)

    sx, syz = bases(s.qx, s.qy, s.qz, c, h, m)
    w_ref = np.asarray(p2m(sx, syz, jnp.asarray(gm), m))
    w_fused = np.asarray(
        p2m_fused(s.qx, s.qy, s.qz, jnp.asarray(gm), c, h, m=m, block=256,
                  interpret=interpret)
    )
    np.testing.assert_allclose(w_fused, w_ref, rtol=1e-4,
                               atol=1e-6 * np.abs(w_ref).max())

    # synthetic node fields for L2P parity
    rng = np.random.default_rng(0)
    fields = tuple(jnp.asarray(rng.normal(size=m**3).astype(np.float32))
                   for _ in range(3))
    ref = np.asarray(l2p(sx, syz, Accel(*fields), m))
    got = l2p_fused_multi(s.qx, s.qy, s.qz, c, h, fields, m=m, block=256,
                          interpret=interpret)
    got = np.stack([np.asarray(g) for g in got], axis=1)
    np.testing.assert_allclose(got, ref, rtol=1e-4,
                               atol=1e-5 * np.abs(ref).max())


def test_pergal_proxy_matches_fused_and_masked_exact():
    """force_and_potential_proxy_pergal: the acc must match the plain
    fused pass, the per-galaxy phis must SUM to the plain pass's total
    phi (linearity), and each galaxy's phi must match an exact masked
    potential sweep at proxy accuracy."""
    import jax.numpy as jnp

    from murb_tpu.ops.proxy import (
        force_and_potential_proxy,
        force_and_potential_proxy_pergal,
    )

    n = 2048
    s = SCHEMES["galaxy"](n, 11)
    gm = jnp.asarray(np.float32(G) * np.asarray(s.m))
    masks = np.zeros((2, s.npad), np.float32)
    masks[0, : n // 2] = 1.0
    masks[1, n // 2: n] = 1.0
    masks = jnp.asarray(masks)

    acc_ref, phi_ref = force_and_potential_proxy(
        s.qx, s.qy, s.qz, gm, SOFT, m=12)
    acc, phi_gal = force_and_potential_proxy_pergal(
        s.qx, s.qy, s.qz, gm, masks, SOFT, m=12)

    assert phi_gal.shape == (2, s.npad)
    for name, g, r in (("ax", acc.ax, acc_ref.ax), ("az", acc.az,
                                                    acc_ref.az)):
        assert_within_rel(np.asarray(g), np.asarray(r), 1e-5,
                          f"pergal {name}", rms_floor=1e-5)
    # linearity: galaxy phis partition the total potential
    assert_within_rel(np.asarray(phi_gal[0] + phi_gal[1]),
                      np.asarray(phi_ref), 1e-4, "pergal phi sum",
                      rms_floor=1e-4)
    # each galaxy row vs an exact masked potential sweep (self term
    # included in both, like the reference's tile sweep)
    q = np.stack([np.asarray(s.qx), np.asarray(s.qy), np.asarray(s.qz)], 1)
    soft2 = np.float32(SOFT) ** 2
    d2 = ((q[None, :, :] - q[:, None, :]) ** 2).sum(-1) + soft2
    inv = 1.0 / np.sqrt(d2)
    for gal in range(2):
        exact = inv @ (np.asarray(gm) * np.asarray(masks[gal]))
        assert_within_rel(np.asarray(phi_gal[gal]), exact, 5e-3,
                          f"pergal phi[{gal}] vs exact", rms_floor=5e-4)
