"""Native runtime component tests: tab parser, CSV writer, trajectory dump.

Each runs against the C++ library when g++ is available AND against the
pure-python fallback (MURB_NO_NATIVE), so both paths stay correct.
"""
import os
import subprocess

import numpy as np
import pytest

import murb_tpu.native as native
from murb_tpu.io import TrajectoryWriter, read_trajectory


def _native_available():
    return native.get_lib() is not None


def test_native_builds():
    """g++ is in this image; the library must build."""
    assert _native_available(), "libmurbnative.so failed to build"


def test_parse_tab_matches_numpy(tmp_path):
    rows = np.random.default_rng(0).normal(size=(500, 7)) * 1e5
    path = tmp_path / "t.tab"
    np.savetxt(path, rows, fmt="%.10g")
    got = native.parse_tab(str(path))
    np.testing.assert_allclose(got, np.loadtxt(path), rtol=1e-12)


def test_parse_tab_blank_lines_and_errors(tmp_path):
    path = tmp_path / "t.tab"
    path.write_text("1 2 3 4 5 6 7\n\n   \n8 9 10 11 12 13 14\n")
    got = native.parse_tab(str(path))
    assert got.shape == (2, 7)
    assert got[1, 0] == 8.0
    bad = tmp_path / "bad.tab"
    bad.write_text("1 2 3\n")
    with pytest.raises(ValueError, match="malformed"):
        native.parse_tab(str(bad))
    with pytest.raises(FileNotFoundError):
        native.parse_tab(str(tmp_path / "missing.tab"))


def test_native_csv_matches_python(tmp_path):
    from murb_tpu.core.history import SimulationHistory

    h = SimulationHistory(3)
    for i in range(3):
        h.set_energy_at(i, -1.23456789e40 * (i + 1))
        h.set_ang_momentum_at(i, 9.87e45)
        h.set_density_center_at(i, [i * 1.0, -i * 2.0, 3.5])
    p_native = tmp_path / "n.csv"
    h.save_metrics_to_csv(str(p_native))
    h2 = SimulationHistory.load_metrics_from_csv(str(p_native))
    np.testing.assert_allclose(h2.energies, h.energies, rtol=1e-15)
    np.testing.assert_allclose(h2.density_centers, h.density_centers,
                               rtol=1e-15)


@pytest.mark.parametrize("force_fallback", [False, True])
def test_trajectory_roundtrip(tmp_path, force_fallback, monkeypatch):
    if force_fallback:
        monkeypatch.setattr("murb_tpu.io.get_lib", lambda: None)
    path = str(tmp_path / f"t_{force_fallback}.traj")
    n = 100
    rng = np.random.default_rng(1)
    frames = [rng.normal(size=(3, n)).astype(np.float32) for _ in range(4)]
    w = TrajectoryWriter(path, n)
    for k, f in enumerate(frames):
        w.append(k * 10, f[0], f[1], f[2])
    dropped = w.close()
    assert dropped == 0
    idx, pos = read_trajectory(path)
    np.testing.assert_array_equal(idx, [0, 10, 20, 30])
    assert pos.shape == (4, n, 3)
    np.testing.assert_allclose(pos[2][:, 1], frames[2][1], rtol=0)


def test_now_us_monotonicish():
    a = native.now_us()
    b = native.now_us()
    assert b >= a


def test_cli_dump_traj(tmp_path, capsys):
    from murb_tpu.cli import main

    path = str(tmp_path / "run.traj")
    rc = main(["-n", "300", "-i", "4", "--im", "cpu+optim", "--nv",
               "--dump-traj", path, "--dump-every", "2"])
    out = capsys.readouterr().out
    assert rc == 0 and "Trajectory written" in out
    idx, pos = read_trajectory(path)
    assert pos.shape[1] == 300
    # frame 0 (the initial conditions) is always recorded
    assert list(idx) == [0, 2, 4]


def test_cli_dump_traj_with_ite_chunk(tmp_path):
    """--ite-chunk must not skip --dump-every record points."""
    from murb_tpu.cli import main

    path = str(tmp_path / "chunked.traj")
    rc = main(["-n", "300", "-i", "6", "--im", "cpu+optim", "--nv",
               "--dump-traj", path, "--dump-every", "2", "--ite-chunk", "4"])
    assert rc == 0
    idx, _pos = read_trajectory(path)
    assert list(idx) == [0, 2, 4, 6]


@pytest.mark.parametrize("force_fallback", [False, True])
def test_trajectory_short_frame_rejected(tmp_path, force_fallback,
                                         monkeypatch):
    """A frame shorter than n_bodies must raise, not corrupt the stream
    (native path: OOB memcpy; fallback: desynchronized stride)."""
    if force_fallback:
        monkeypatch.setattr("murb_tpu.io.get_lib", lambda: None)
    path = str(tmp_path / f"short_{force_fallback}.traj")
    w = TrajectoryWriter(path, 100)
    short = np.zeros(50, np.float32)
    full = np.zeros(100, np.float32)
    with pytest.raises(ValueError, match="elements"):
        w.append(0, short, full, full)
    w.append(0, full, full, full)  # writer still usable afterwards
    assert w.close() == 0
    idx, pos = read_trajectory(path)
    assert list(idx) == [0] and pos.shape == (1, 100, 3)
