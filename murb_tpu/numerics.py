"""Floating-point error diagnosis: the TPU-native CADNA analogue.

The reference scaffolds CADNA (stochastic arithmetic: run each operation with
randomized rounding and estimate the number of significant digits) but never
got it working -- all calls are commented out (ref:
src/murb/implem/SimulationNBodyNaiveCadna.cpp:11-21, 81-87;
cmake/Modules/FindCADNA.cmake; Report.pdf: "unsuccessful due to compilation
problems").

Instrumenting individual fp ops is hostile to XLA, so this module applies the
same *estimator* at the trajectory level, two ways:

  * ``significant_digits_vs_reference`` -- run the engine in fp32 and compare
    against an fp64 run of the same seeded system (CPU; TPU has no native
    f64): per-quantity significant decimal digits, the number CADNA would
    report.
  * ``stochastic_ensemble_digits`` -- CESTAC-style: run K replicas whose
    initial state is perturbed by one ulp with random sign (the stochastic-
    rounding proxy), and estimate digits from the ensemble spread.  Runs on
    TPU as-is; measures the *simulation's* sensitivity to rounding, which
    for a chaotic N-body system is the quantity that actually matters.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from murb_tpu.core.state import BodyState
from murb_tpu.models import create_engine


def significant_digits(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Common significant decimal digits between two estimates (CADNA's
    C_r formula: log10 |mean / spread|, clipped to [0, 15])."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mean = 0.5 * (a + b)
    spread = np.abs(a - b)
    with np.errstate(divide="ignore", invalid="ignore"):
        digits = np.log10(np.abs(mean) / np.where(spread == 0, np.nan, spread))
    digits = np.where(spread == 0, 15.0, digits)
    digits = np.where(np.isfinite(digits), digits, 0.0)
    return np.clip(digits, 0.0, 15.0)


def _run(tag: str, bodies: BodyState, iters: int, soft, dt, **kw):
    eng = create_engine(tag, bodies, soft=soft, dt=dt, num_iterations=iters,
                        **kw)
    eng.run(iters)
    return eng.bodies.unpadded()


def significant_digits_vs_reference(
    bodies: BodyState, iters: int, *, tag: str = "xla+chunked",
    soft: float = 2.0e8, dt: float = 3600.0,
) -> dict[str, np.ndarray]:
    """fp32-vs-fp64 digit estimate per coordinate (CPU-oriented: f64 needs
    the x64 flag and a CPU backend)."""
    lo = _run(tag, bodies.astype(jnp.float32), iters, soft, dt)
    hi = _run(tag, bodies.astype(jnp.float64), iters, soft, dt)
    return {
        k: significant_digits(lo[k], hi[k])
        for k in ("qx", "qy", "qz", "vx", "vy", "vz")
    }


def _ulp_perturb(state: BodyState, key) -> BodyState:
    """Flip each position/velocity by +-1 ulp with random sign."""
    fields = {}
    for i, name in enumerate(("qx", "qy", "qz", "vx", "vy", "vz")):
        a = getattr(state, name)
        k = jax.random.fold_in(key, i)
        up = jax.random.bernoulli(k, 0.5, a.shape)
        fields[name] = jnp.where(
            up,
            jnp.nextafter(a, jnp.asarray(jnp.inf, a.dtype)),
            jnp.nextafter(a, jnp.asarray(-jnp.inf, a.dtype)),
        )
    return dataclasses.replace(state, **fields)


def stochastic_ensemble_digits(
    bodies: BodyState, iters: int, *, replicas: int = 3,
    tag: str = "xla+chunked", soft: float = 2.0e8, dt: float = 3600.0,
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """CESTAC-style ensemble digit estimate (runs on any backend)."""
    assert replicas >= 2
    runs = []
    key = jax.random.PRNGKey(seed)
    for r in range(replicas):
        start = bodies if r == 0 else _ulp_perturb(bodies, jax.random.fold_in(key, r))
        runs.append(_run(tag, start, iters, soft, dt))
    out = {}
    for k in ("qx", "qy", "qz", "vx", "vy", "vz"):
        stack = np.stack([np.asarray(r[k], np.float64) for r in runs])
        mean = stack.mean(axis=0)
        spread = stack.std(axis=0) * np.sqrt(max(len(runs) - 1, 1))
        with np.errstate(divide="ignore", invalid="ignore"):
            digits = np.log10(np.abs(mean) / np.where(spread == 0, np.nan, spread))
        digits = np.where(spread == 0, 15.0, digits)
        digits = np.where(np.isfinite(digits), digits, 0.0)
        out[k] = np.clip(digits, 0.0, 15.0)
    return out


def report(digits: dict[str, np.ndarray]) -> str:
    lines = ["quantity  min   p5    median  mean"]
    for k, d in digits.items():
        lines.append(
            f"{k:8s} {d.min():5.1f} {np.percentile(d, 5):5.1f} "
            f"{np.median(d):6.1f} {d.mean():6.1f}"
        )
    return "\n".join(lines)
