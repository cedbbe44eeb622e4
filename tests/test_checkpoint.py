"""Checkpoint / resume tests (capability absent from the reference --
SURVEY.md section 5)."""
import numpy as np
import pytest

from murb_tpu.core.checkpoint import load_state, save_state
from murb_tpu.core.init import SCHEMES
from murb_tpu.models import create_engine

from conftest import assert_within_rel

SOFT = 2.0e8
DT = 3600.0


def test_roundtrip(tmp_path):
    s = SCHEMES["galaxy"](300, 5)
    path = str(tmp_path / "ckpt.npz")
    save_state(path, s, iteration=7, dt=1800.0, soft=1e8,
               extra={"note": np.array([1, 2, 3])})
    s2, meta = load_state(path)
    assert s2.n == s.n and s2.padding == s.padding
    np.testing.assert_array_equal(np.asarray(s2.qx), np.asarray(s.qx))
    np.testing.assert_array_equal(np.asarray(s2.m), np.asarray(s.m))
    assert meta["iteration"] == 7
    assert meta["dt"] == 1800.0 and meta["soft"] == 1e8
    np.testing.assert_array_equal(meta["note"], [1, 2, 3])


def test_future_version_rejected(tmp_path):
    s = SCHEMES["random"](100, 1)
    path = str(tmp_path / "ckpt.npz")
    save_state(path, s)
    data = dict(np.load(path))
    data["__version__"] = np.int64(99)
    np.savez(path, **data)
    with pytest.raises(ValueError, match="format version"):
        load_state(path)


def test_resume_continues_trajectory(tmp_path):
    """run(4) == run(2) + checkpoint + resume + run(2)."""
    bodies = SCHEMES["random"](512, 9)
    a = create_engine("xla+chunked", bodies, soft=SOFT, dt=DT)
    a.run(4)

    b = create_engine("xla+chunked", bodies, soft=SOFT, dt=DT)
    b.run(2)
    path = str(tmp_path / "mid.npz")
    save_state(path, b.bodies, iteration=2, dt=DT, soft=SOFT)
    restored, meta = load_state(path)
    c = create_engine("xla+chunked", restored, soft=meta["soft"], dt=meta["dt"])
    c.run(2)

    da, dc = a.bodies.unpadded(), c.bodies.unpadded()
    for k in ("qx", "qy", "qz", "vx"):
        assert_within_rel(dc[k], da[k], 1e-6, f"resume {k}")


def test_cli_save_and_load(tmp_path, capsys):
    from murb_tpu.cli import main

    path = str(tmp_path / "cli.npz")
    rc = main(["-n", "300", "-i", "2", "--im", "cpu+optim", "--nv",
               "--save-state", path])
    assert rc == 0
    rc = main(["-n", "300", "-i", "1", "--im", "cpu+optim", "--nv",
               "--load-state", path])
    out = capsys.readouterr().out
    assert rc == 0 and "Resumed state from" in out


def test_cli_resume_carries_physics_and_iteration(tmp_path, capsys):
    """--load-state defaults dt/soft to the checkpoint's values (unless
    explicitly overridden) and a later --save-state carries the cumulative
    iteration count."""
    from murb_tpu.cli import main

    p1 = str(tmp_path / "c1.npz")
    rc = main(["-n", "300", "-i", "2", "--im", "cpu+optim", "--nv",
               "--dt", "1800", "--soft", "1e8", "--save-state", p1])
    assert rc == 0
    capsys.readouterr()

    p2 = str(tmp_path / "c2.npz")
    rc = main(["-n", "300", "-i", "3", "--im", "cpu+optim", "--nv",
               "--load-state", p1, "--save-state", p2])
    assert rc == 0
    out = capsys.readouterr().out
    assert "dt=1800" in out and "soft=1e+08" in out
    _, meta = load_state(p2)
    assert meta["iteration"] == 5            # 2 saved + 3 run
    assert meta["dt"] == 1800.0 and meta["soft"] == 1e8

    # an explicit CLI flag still wins over the checkpoint value
    rc = main(["-n", "300", "-i", "1", "--im", "cpu+optim", "--nv",
               "--load-state", p1, "--dt", "900"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "dt=900" in out and "soft=1e+08" in out


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from murb_tpu.core.checkpoint import load_state_orbax, save_state_orbax

    s = SCHEMES["galaxy"](300, 5)
    path = str(tmp_path / "orbax_ckpt")
    save_state_orbax(path, s, iteration=3, dt=1800.0, soft=1e8)
    s2, meta = load_state_orbax(path)
    assert s2.n == s.n and s2.padding == s.padding
    np.testing.assert_array_equal(np.asarray(s2.qx), np.asarray(s.qx))
    assert meta["iteration"] == 3 and meta["dt"] == 1800.0


def test_async_checkpoint_writer(tmp_path):
    """Write-behind periodic checkpointing: the written file resumes
    exactly, the write is atomic (no .tmp survivor), and busy-skip
    accounting works."""
    from murb_tpu.core.checkpoint import AsyncCheckpointWriter, load_state
    from murb_tpu.core.init import init_random

    s = init_random(256, 3)
    path = str(tmp_path / "run.npz")
    w = AsyncCheckpointWriter(path)
    assert w.save(s, iteration=7, dt=1800.0, soft=1e8)
    w.flush()
    assert w.written == 1 and not (tmp_path / "run.npz.tmp").exists()
    restored, meta = load_state(path)
    assert int(meta["iteration"]) == 7 and float(meta["dt"]) == 1800.0
    np.testing.assert_array_equal(np.asarray(restored.qx), np.asarray(s.qx))


def test_cli_save_every_periodic(tmp_path):
    """--save-every K writes a resumable checkpoint mid-run and the final
    synchronous save still lands (flush-before-overwrite)."""
    from murb_tpu.cli import main
    from murb_tpu.core.checkpoint import load_state

    path = str(tmp_path / "p.npz")
    rc = main(["-n", "300", "-i", "6", "--im", "cpu+optim", "--nv",
               "--save-state", path, "--save-every", "2"])
    assert rc == 0
    _, meta = load_state(path)
    assert int(meta["iteration"]) == 6  # the final save wins

    # --save-every without --save-state is a clean error
    rc = main(["-n", "300", "-i", "2", "--im", "cpu+optim", "--nv",
               "--save-every", "2"])
    assert rc == 1
