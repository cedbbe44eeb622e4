"""Numerical-error diagnosis tests (the CADNA-analogue capability)."""
import numpy as np

from murb_tpu.core.init import SCHEMES
from murb_tpu.numerics import (
    report,
    significant_digits,
    significant_digits_vs_reference,
    stochastic_ensemble_digits,
)


def test_significant_digits_formula():
    a = np.array([1.0, 1.0, 1.0])
    b = np.array([1.0, 1.0 + 1e-6, 2.0])
    d = significant_digits(a, b)
    assert d[0] == 15.0                  # identical -> max digits
    assert 5.5 < d[1] < 6.5              # 1e-6 spread -> ~6 digits
    assert d[2] < 1.0                    # totally different -> ~0


def test_vs_reference_digits_reasonable():
    bodies = SCHEMES["random"](256, 3)
    d = significant_digits_vs_reference(bodies, 3)
    # fp32 trajectories should agree with fp64 to at least ~2 digits after
    # 3 steps on the smooth random scheme (median well above that)
    assert np.median(d["qx"]) > 4.0
    assert d["qx"].min() >= 0.0
    txt = report(d)
    assert "qx" in txt and "median" in txt


def test_stochastic_ensemble_digits():
    bodies = SCHEMES["random"](256, 5)
    d = stochastic_ensemble_digits(bodies, 2, replicas=3)
    # one-ulp perturbations after 2 steps: positions still highly reproducible
    assert np.median(d["qx"]) > 5.0


def test_engine_assert_finite():
    import dataclasses

    import jax.numpy as jnp
    import pytest

    from murb_tpu.models import create_engine

    bodies = SCHEMES["random"](256, 1)
    e = create_engine("xla+chunked", bodies)
    e.compute_one_iteration()
    e.assert_finite()  # healthy state passes
    e._state = dataclasses.replace(
        e._state, qx=e._state.qx.at[0].set(jnp.nan)
    )
    with pytest.raises(FloatingPointError, match="non-finite"):
        e.assert_finite()
