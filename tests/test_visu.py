"""Offline visualization tests: palette parity, projection, frame output."""
import os

import numpy as np
import pytest

from murb_tpu.core.init import SCHEMES
from murb_tpu.visu import (
    OfflineSpheresVisu,
    SpheresVisuNo,
    create_visu,
    cyberpunk_colors,
    project,
)


def test_cyberpunk_palette_parity():
    """Vectorized palette matches the reference's scalar two-pass logic
    (ref: OGLSpheresVisuGS.cpp:86-172) on hand-computed cases."""
    # three bodies: slow, mid, fast
    vx = np.array([0.0, 5.0, 10.0])
    vy = np.zeros(3)
    vz = np.zeros(3)
    c = cyberpunk_colors(vx, vy, vz, time_s=0.0)
    # slow body: deep space blue
    np.testing.assert_allclose(c[0], [0.0, 0.02, 0.1], atol=1e-6)
    # fast body (t=1, beat_pulse at time 0 is ((sin0+1)/2)^8 = 1/256)
    beat = ((np.sin(0.0) + 1) / 2) ** 8
    np.testing.assert_allclose(c[2], [min(0.8 + beat * 0.2, 1.0), 1.0, 1.0],
                               atol=1e-6)
    assert np.all(c >= 0.0) and np.all(c <= 1.0)


def test_projection():
    qx, qy, qz = np.array([1.0]), np.array([2.0]), np.array([3.0])
    # top-down: u=x, v=y
    u, v = project(qx, qy, qz, 0.0, 90.0)
    np.testing.assert_allclose([u[0], v[0]], [1.0, 2.0], atol=1e-6)
    # side view (elev=0): v = -z
    u, v = project(qx, qy, qz, 0.0, 0.0)
    np.testing.assert_allclose(v[0], -3.0, atol=1e-6)
    # azimuth 90: x' = y
    u, v = project(qx, qy, qz, 90.0, 90.0)
    np.testing.assert_allclose(u[0], 2.0, atol=1e-6)


def test_offline_renderer_writes_frames(tmp_path):
    pytest.importorskip("matplotlib")
    visu = OfflineSpheresVisu(str(tmp_path), width=200, height=150,
                              elev=45.0)
    state = SCHEMES["galaxy"](128, 1)
    visu.refresh_display(state, time_s=0.0)
    visu.refresh_display(state, time_s=1.0)
    files = sorted(os.listdir(tmp_path))
    assert files == ["frame_000000.png", "frame_000001.png"]


def test_create_visu_headless_default():
    from murb_tpu.utils.args import MurbConfig

    cfg = MurbConfig(n_bodies=10, n_iterations=1, visu_enable=False)
    assert isinstance(create_visu(cfg), SpheresVisuNo)
