"""Body state container tests (analogue of test_CUDABodies.cpp host/device
round-trips, ref: src/test/implem/test_CUDABodies.cpp:23-75)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from murb_tpu.core.init import init_galaxy, init_random
from murb_tpu.core.integrators import euler_update
from murb_tpu.core.state import BodyState
from murb_tpu.ops.common import Accel


def test_padding_to_multiple():
    for n, expect in [(1, 256), (255, 256), (256, 256), (257, 512), (2049, 2304)]:
        s = init_random(n, 1)
        assert s.n == n
        assert s.npad == expect
        assert s.padding == expect - n


def test_ghosts_have_zero_mass():
    s = init_galaxy(300, 7)
    m = np.asarray(s.m)
    assert np.all(m[300:] == 0.0)
    assert np.all(np.asarray(s.r)[300:] == 0.0)
    # ghost positions are scattered (visual parity), not all zero
    assert np.any(np.asarray(s.qx)[300:] != 0.0)


def test_unpadded_roundtrip():
    s = init_random(100, 3)
    d = s.unpadded()
    assert all(v.shape == (100,) for v in d.values())
    np.testing.assert_array_equal(d["qx"], np.asarray(s.qx)[:100])


def test_allocated_bytes():
    s = init_random(256, 0)
    assert s.allocated_bytes == 8 * 256 * 4


def test_repad():
    s = init_random(100, 0)          # npad 256
    s2 = s.repad(512)
    assert s2.npad == 512 and s2.n == 100
    np.testing.assert_array_equal(np.asarray(s2.qx)[:256], np.asarray(s.qx))
    assert np.all(np.asarray(s2.m)[256:] == 0.0)
    # already-aligned repad is a no-op object
    assert s.repad(128) is s


def test_state_is_pytree():
    s = init_random(64, 0)
    leaves = jax.tree.leaves(s)
    assert len(leaves) == 8
    s2 = jax.tree.map(lambda a: a * 2, s)
    assert isinstance(s2, BodyState)
    assert s2.n == s.n


def test_integrator_state_update_shapes():
    """4-step synthetic-acceleration integration (analogue of the CUDABodies
    integrator-equivalence test, ref: test_CUDABodies.cpp:44-75)."""
    s = init_random(64, 5)
    acc = Accel(
        jnp.ones_like(s.qx) * 1e-6,
        jnp.ones_like(s.qx) * -2e-6,
        jnp.zeros_like(s.qx),
    )
    ref = {k: np.asarray(v, np.float64) for k, v in s.unpadded().items()}
    dt = 3600.0
    cur = s
    for _ in range(4):
        cur = euler_update(cur, acc, dt)
        # numpy reference of the exact Euler formula (ref: Bodies.cpp:259-278)
        for c, a in (("x", 1e-6), ("y", -2e-6), ("z", 0.0)):
            adt = a * dt
            ref[f"q{c}"] = ref[f"q{c}"] + (ref[f"v{c}"] + adt * 0.5) * dt
            ref[f"v{c}"] = ref[f"v{c}"] + adt
    got = cur.unpadded()
    for c in "xyz":
        np.testing.assert_allclose(got[f"q{c}"], ref[f"q{c}"], rtol=2e-5)
        np.testing.assert_allclose(got[f"v{c}"], ref[f"v{c}"], rtol=2e-5)


def test_astype():
    s = init_random(64, 5)
    s64 = s.astype(jnp.float64)
    assert s64.qx.dtype in (jnp.float64, jnp.float32)  # x64 flag dependent
    s16 = s.astype(jnp.bfloat16)
    assert s16.qx.dtype == jnp.bfloat16
