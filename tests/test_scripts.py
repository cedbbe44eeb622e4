"""Ops-script smoke tests (the L6 layer: energy report, plots, IC generator)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, **kw):
    env = dict(os.environ)
    env.setdefault("MPLBACKEND", "Agg")
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, cwd=REPO, env=env, timeout=300, **kw)


def test_energy_report(tmp_path):
    """Power-log integration parity: constant 50 W for 10 s = 500 J."""
    log = tmp_path / "power.csv"
    rows = ["timestamp_s,channel,watts"]
    for t in range(11):
        rows.append(f"{t}.0,chip,50.0")
        rows.append(f"{t}.0,host,20.0")
    log.write_text("\n".join(rows) + "\n")
    r = _run(["scripts/energy_report.py", str(log),
              "--t0", "0", "--t1", "10", "--frames", "100"])
    assert r.returncode == 0, r.stderr
    chip = [l for l in r.stdout.splitlines() if l.startswith("chip")][0]
    cols = chip.split()
    assert abs(float(cols[1]) - 500.0) < 1e-6      # joules
    assert abs(float(cols[2]) - 50.0) < 1e-6       # mean W
    assert abs(float(cols[3]) - 10.0 / 50.0) < 1e-3  # FPS/W
    assert abs(float(cols[4]) - 5.0) < 1e-6        # J/frame


def test_measure_energy_collection(tmp_path):
    """The collection driver samples while the workload runs, writes the
    CSV schema energy_report expects, and chains into the report."""
    out = tmp_path / "power.csv"
    env = dict(os.environ)
    env["MURB_ENERGY_CMD"] = \
        f'{sys.executable} -c "import time; time.sleep(1.2)"'
    env["MURB_ENERGY_DEVICES"] = "1"   # skip jax init in the sampler
    # the remainder args after -- are passed to the (stubbed) workload
    r = subprocess.run(
        [sys.executable, "scripts/measure_energy.py", "--source", "tdp",
         "--tdp-watts", "123", "--interval", "0.2", "--out", str(out),
         "--", "-n", "64", "-i", "10"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "power source: tdp" in r.stdout
    assert "UPPER BOUND" in r.stdout           # the fallback is labeled
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "timestamp_s,channel,watts"
    assert len(lines) >= 4                     # ~5 samples in 1.2 s
    t, ch, w = lines[1].split(",")
    assert ch.startswith("tdp_bound") and float(w) >= 123.0
    # report table produced for the -i frame count
    assert "J/frame" in r.stdout and "10 frames" in r.stdout


def test_serve_trajectory_playback(tmp_path):
    """Recorded MURBTRAJ frames replay through the live-viewer server."""
    from murb_tpu.io import TrajectoryWriter

    path = tmp_path / "run.traj"
    w = TrajectoryWriter(str(path), 32)
    rng = np.random.default_rng(0)
    for f in range(4):
        q = rng.normal(size=(3, 32)).astype(np.float32)
        w.append(f * 5, q[0], q[1], q[2])
    w.close()

    r = _run(["scripts/serve_trajectory.py", str(path),
              "--port", "0", "--fps", "50"])
    assert r.returncode == 0, r.stderr
    assert "4 frames x 32 bodies" in r.stdout
    assert "played 4 frames" in r.stdout


def test_two_galaxy_generator_layout(tmp_path):
    out = tmp_path / "mw.tab"
    r = _run(["scripts/make_two_galaxy_tab.py", str(out), "--seed", "3"])
    assert r.returncode == 0, r.stderr
    data = np.loadtxt(out)
    assert data.shape == (81920, 7)
    # Andromeda's disk (second interleaved block) is offset from the origin
    mw_disk = data[:16384, 1:4]
    a_disk = data[16384:32768, 1:4]
    assert np.linalg.norm(a_disk.mean(0)) > np.linalg.norm(mw_disk.mean(0)) + 10


def test_plot_history_metrics(tmp_path):
    pytest.importorskip("matplotlib")
    csv = tmp_path / "m.csv"
    lines = ["iteration,energy,ang_momentum,density_center_x,"
             "density_center_y,density_center_z"]
    for i in range(5):
        lines.append(f"{i},{-1e29 * (1 + 1e-5 * i)},3e34,{i},0,0")
    csv.write_text("\n".join(lines) + "\n")
    r = _run(["scripts/plot_history_metrics.py", str(csv),
              str(tmp_path / "out")])
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "out_metrics.png").exists()


def test_make_plots(tmp_path):
    pytest.importorskip("matplotlib")
    bench = {"metric": "ref_gflops_n200k_galaxy", "value": 123456.0,
             "fps": 321.0, "fps_exact_allpairs": 5.5,
             "ref_gflops_exact_allpairs": 4100.0}
    with open(os.path.join(REPO, "BENCH_rTEST.json"), "w") as f:
        json.dump(bench, f)
    try:
        r = _run(["scripts/make_plots.py", str(tmp_path)])
        assert r.returncode == 0, r.stderr
        assert (tmp_path / "bench_comparison.png").exists()
    finally:
        os.remove(os.path.join(REPO, "BENCH_rTEST.json"))
