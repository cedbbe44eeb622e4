"""Test configuration: deterministic 8-device CPU mesh.

The reference runs one Catch2 suite against whichever implementation the
build enables (ref: scripts/run_tests.sh:27-52).  Here the suite runs on a
forced 8-device CPU host platform so multi-chip sharding is exercised without
TPU hardware (the reference has *no* distributed tests -- SURVEY.md section 4).
Pallas kernels run in interpreter mode on CPU (auto-detected by the kernels);
the real-TPU compile path is exercised by bench.py / __graft_entry__.py.

Set MURB_TEST_TPU=1 to run the suite on the real TPU backend instead.
"""
from __future__ import annotations

import os
import sys

# Must happen before any jax backend initialization.
if os.environ.get("MURB_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if os.environ.get("MURB_TEST_TPU") != "1":
    # The axon TPU plugin force-selects itself via jax.config at import time;
    # env JAX_PLATFORMS=cpu is not enough (see sitecustomize).  This is.
    jax.config.update("jax_platforms", "cpu")
    # The reference computes history metrics in double (ref: main.cpp:247-248);
    # on the CPU test platform honor f64 metric dtype requests.
    jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("MURB_TEST_TPU") == "1":
    # Chip suite: share the CLI/bench persistent compile cache -- remote
    # compiles through the relay run minutes per shape, and without this
    # every suite run recompiles every kernel from scratch.
    from murb_tpu.cli import enable_compile_cache

    enable_compile_cache()
    # x64 so the fp64 tests exercise real f64 state on the chip (XLA:TPU
    # emulates f64; Pallas kernels are x64-proof via common.BlockSpec /
    # f32_inputs).  Without this, .astype(float64) silently yields f32 and
    # the fp64 differential tests would compare fp32 against itself.
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def assert_within_rel(actual, expected, eps, msg="", rms_floor=0.0):
    """Catch2 WithinRel semantics: |a-b| <= eps * max(|a|, |b|)
    (ref: src/test/implem/test_SimulationNBody.cpp:48-70).

    ``rms_floor``: optional absolute tolerance of ``rms_floor * rms(expected)``
    for elements whose value is cancellation-dominated (accelerations summing
    to ~0 are fp32 reduction-order noise, not kernel error).
    """
    actual = np.asarray(actual, dtype=np.float64)
    expected = np.asarray(expected, dtype=np.float64)
    scale = np.maximum(np.abs(actual), np.abs(expected))
    atol = rms_floor * float(np.sqrt(np.mean(expected**2))) if rms_floor else 0.0
    bad = np.abs(actual - expected) > eps * scale + atol + 1e-300
    if np.any(bad):
        idx = np.argwhere(bad)[:5]
        detail = "; ".join(
            f"[{tuple(i)}] {actual[tuple(i)]!r} vs {expected[tuple(i)]!r}"
            for i in idx
        )
        raise AssertionError(
            f"{msg}: {bad.sum()}/{bad.size} elements beyond rel eps={eps}: {detail}"
        )


def pytest_collection_modifyitems(config, items):
    """Keep the default CPU gate fast: tests marked ``slow`` (interpret-mode
    Pallas ring/P2P sweeps, the two-process multihost test, ...) only run
    with MURB_TEST_SLOW=1 (run_tests.sh phase 1b) or on the chip suite
    (MURB_TEST_TPU=1), so `pytest -q` stays a quick iteration gate without
    losing coverage anywhere that matters."""
    if os.environ.get("MURB_TEST_SLOW") == "1" \
            or os.environ.get("MURB_TEST_TPU") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow: run with MURB_TEST_SLOW=1 (run_tests.sh phase 1b)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def n_devices():
    return len(jax.devices())
