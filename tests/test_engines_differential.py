"""End-to-end differential trajectory tests: every engine vs the naive oracle.

Direct port of the reference test strategy (ref:
src/test/implem/test_SimulationNBody.cpp:28-88): run the oracle and the target
side by side; iteration 0 must be *exactly* equal (shared seeded init);
subsequent iterations must track within WithinRel eps -- 1e-3 for the random
scheme, 1e-1 for the chaotic galaxy scheme; body counts 2048 and 2049
exercise the padding/tail path.
"""
import numpy as np
import pytest

from murb_tpu.core.init import SCHEMES
from murb_tpu.models import create_engine

from conftest import assert_within_rel

SOFT = 2.0e8
DT = 3600.0


def run_differential(target_tag, n, n_ite, scheme, eps, **kw):
    bodies = SCHEMES[scheme](n, 123)
    ref = create_engine("cpu+naive", bodies, soft=SOFT, dt=DT)
    tgt = create_engine(target_tag, bodies, soft=SOFT, dt=DT,
                        num_iterations=n_ite, **kw)

    for i in range(n_ite + 1):
        if i > 0:
            ref.compute_one_iteration()
            tgt.compute_one_iteration()
        a = ref.bodies.unpadded()
        b = tgt.bodies.unpadded()
        e = eps if i > 0 else 0.0
        for c in ("qx", "qy", "qz"):
            assert_within_rel(b[c], a[c], e, f"{target_tag} {scheme} iter {i} {c}")


# --- the reference's exact four cases, for each TPU-native fast path -------
CASES = [
    (2048, 1, "random", 1e-3),
    (2049, 3, "random", 1e-3),
    (2048, 4, "galaxy", 1e-1),
    (2049, 3, "galaxy", 1e-1),
]


@pytest.mark.parametrize("n,n_ite,scheme,eps", CASES)
def test_chunked_correctness(n, n_ite, scheme, eps):
    run_differential("xla+chunked", n, n_ite, scheme, eps)


@pytest.mark.parametrize("n,n_ite,scheme,eps", CASES)
def test_pallas_tile_correctness(n, n_ite, scheme, eps):
    run_differential("tpu+tile", n, n_ite, scheme, eps)


@pytest.mark.parametrize("n,n_ite,scheme,eps", CASES)
def test_mxu_correctness(n, n_ite, scheme, eps):
    run_differential("tpu+mxu", n, n_ite, scheme, eps)


@pytest.mark.parametrize("n,n_ite,scheme,eps", CASES)
def test_hybrid_correctness(n, n_ite, scheme, eps):
    """Flagship kernel under the reference aliases (single-pass bf16 W)."""
    run_differential("gpu+tile+full", n, n_ite, scheme, eps)


def test_hybrid_two_pass_correctness():
    run_differential("tpu+hybrid", 2049, 3, "random", 1e-3, passes=2)


def test_nop_engine_is_inert():
    bodies = SCHEMES["random"](256, 1)
    e = create_engine("cpu+nop", bodies, soft=SOFT, dt=DT)
    before = e.bodies.unpadded()
    e.compute_one_iteration()
    after = e.bodies.unpadded()
    np.testing.assert_array_equal(before["qx"], after["qx"])


def test_scan_run_matches_stepwise():
    """run(n) (single lax.scan dispatch) must land on the same trajectory as
    n compute_one_iteration calls."""
    bodies = SCHEMES["random"](512, 3)
    a = create_engine("xla+chunked", bodies, soft=SOFT, dt=DT, chunk=256)
    b = create_engine("xla+chunked", bodies, soft=SOFT, dt=DT, chunk=256)
    for _ in range(5):
        a.compute_one_iteration()
    b.run(5)
    da, db = a.bodies.unpadded(), b.bodies.unpadded()
    for c in ("qx", "qy", "qz", "vx"):
        assert_within_rel(db[c], da[c], 1e-6, f"scan vs stepwise {c}")


def test_unknown_tag_raises():
    bodies = SCHEMES["random"](256, 1)
    with pytest.raises(ValueError, match="does not exist"):
        create_engine("gpu+doesnotexist", bodies)


def test_proxy_engine_default_soft_dt():
    """ProxyEngine must work with the interface defaults (regression:
    None soft/dt used to reach float())."""
    bodies = SCHEMES["galaxy"](512, 1)
    e = create_engine("tpu+proxy", bodies)
    e.compute_one_iteration()
    assert e.soft == 2.0e8 and e.dt == 3600.0


def test_unknown_engine_option_raises():
    from murb_tpu.models.engines import HybridEngine

    bodies = SCHEMES["random"](256, 1)
    with pytest.raises(TypeError, match="unknown engine option"):
        HybridEngine(bodies, pases=1)


def test_accelerations_message_after_fast_run():
    bodies = SCHEMES["random"](256, 1)
    e = create_engine("xla+chunked", bodies)
    e.run(2)
    with pytest.raises(RuntimeError, match="not materialized"):
        _ = e.accelerations


@pytest.mark.parametrize("n", [1, 2, 3])
def test_tiny_body_counts(n):
    """Degenerate sizes must not crash any main engine (padding covers the
    lane alignment; softening keeps the self-term finite)."""
    bodies = SCHEMES["galaxy"](n, 1)
    for tag in ("cpu+naive", "xla+chunked", "tpu+tile", "tpu+hybrid",
                "tpu+proxy", "tpu+kdk"):
        e = create_engine(tag, bodies, soft=SOFT, dt=DT)
        e.compute_one_iteration()
        d = e.bodies.unpadded()
        assert np.all(np.isfinite(d["qx"])), (tag, n)
