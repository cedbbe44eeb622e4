"""Initializer tests: determinism by seed, distribution parity, file loader."""
import numpy as np
import pytest

from murb_tpu.core.init import (
    init_galaxy,
    init_milkyway_andromeda,
    init_random,
    make_bodies,
)


def test_galaxy_deterministic_by_seed():
    a = init_galaxy(500, 42).unpadded()
    b = init_galaxy(500, 42).unpadded()
    c = init_galaxy(500, 43).unpadded()
    np.testing.assert_array_equal(a["qx"], b["qx"])
    assert np.any(a["qx"] != c["qx"])


def test_galaxy_distribution_parity():
    """Distribution invariants of the reference initGalaxy
    (ref: src/common/core/Bodies.cpp:158-214)."""
    d = init_galaxy(5000, 1).unpadded()
    # central heavy body at rest at the origin
    assert d["m"][0] == np.float32(2.0e24)
    assert d["qx"][0] == 0 and d["vy"][0] == 0
    # other masses uniform in (0, 5e20]
    assert np.all(d["m"][1:] <= 5.0e20) and np.all(d["m"][1:] >= 0)
    # radius = m * 2.5e-15
    np.testing.assert_allclose(d["r"][1:], d["m"][1:] * 2.5e-15, rtol=1e-6)
    # distance to center in [1e8, 2e8]
    dist = np.sqrt(d["qx"][1:] ** 2 + d["qy"][1:] ** 2 + d["qz"][1:] ** 2)
    assert dist.min() >= 0.99e8 and dist.max() <= 2.01e8
    # tangential velocity: v = (qy, -qx, 0) * 4e-6
    np.testing.assert_allclose(d["vx"][1:], d["qy"][1:] * 4e-6, rtol=1e-5)
    np.testing.assert_allclose(d["vy"][1:], -d["qx"][1:] * 4e-6, rtol=1e-5)
    assert np.all(d["vz"][1:] == 0)


def test_random_distribution_parity():
    """ref: src/common/core/Bodies.cpp:217-257."""
    d = init_random(5000, 1).unpadded()
    assert np.all(d["m"] <= 5.0e21) and np.all(d["m"] >= 0)
    np.testing.assert_allclose(d["r"], d["m"] * 0.5e-14, rtol=1e-6)
    assert np.abs(d["qx"]).max() <= 5.0e8 * 1.33
    assert d["qz"].min() >= -15.0e8 and d["qz"].max() <= -5.0e8
    assert np.abs(d["vx"]).max() <= 1.0e2


def test_make_bodies_factory():
    s = make_bodies(100, "galaxy", 9)
    assert s.n == 100
    s = make_bodies(100, "random", 9)
    assert s.n == 100
    with pytest.raises(FileNotFoundError):
        make_bodies(100, "mw+andromeda", 9, scheme_file="/nonexistent.tab")


def test_milkyway_andromeda_loader(tmp_path):
    """Synthetic .tab file exercising the index-range rescaling
    (ref: src/common/core/Bodies.cpp:111-148)."""
    n = 8
    rows = np.arange(n * 7, dtype=np.float64).reshape(n, 7) + 1.0
    path = tmp_path / "mw.tab"
    np.savetxt(path, rows)
    s = init_milkyway_andromeda(str(path))
    d = s.unpadded()
    assert s.n == n
    # with n=8 < 16384 every body is in the Milky Way disk range
    np.testing.assert_allclose(d["m"], rows[:, 0] * 4.5e10, rtol=1e-6)
    np.testing.assert_allclose(d["qx"], rows[:, 1] * 4.0, rtol=1e-6)
    np.testing.assert_allclose(d["vz"], rows[:, 6] * 220.0, rtol=1e-6)
    assert np.all(d["r"] == np.float32(1e5))


def test_milkyway_andromeda_rescale_ranges(tmp_path):
    """Rows past the MW ranges get Andromeda scaling."""
    from murb_tpu.core.init import _is_milky_way

    idx = np.array([0, 16383, 16384, 32767, 32768, 40959, 40960, 49152, 65535, 65536])
    mw = _is_milky_way(idx)
    #       disk     disk-end  A-disk    A-end     bulge     bulge-end A-bulge   halo      halo-end  A-halo
    expect = [True,  True,     False,    False,    True,     True,     False,    True,     True,     False]
    np.testing.assert_array_equal(mw, expect)
