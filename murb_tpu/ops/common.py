"""Shared kernel helpers: FLOPs model, acceleration container, block utils."""
from __future__ import annotations

import sys
from typing import NamedTuple

import jax
import jax.numpy as jnp

_FP32_NOTIFIED: set[str] = set()


def notify_fp32_compute(kernel: str, dtype) -> None:
    """Honesty notice for fp64 state entering an fp32 compute path.

    The TPU has no f64 vector unit, so every Pallas kernel computes its
    sweep in fp32 (2-pass bf16 MXU weights where applicable) regardless of
    the state dtype.  The reference instantiates all engines for float AND
    double (ref: src/murb/implem/SimulationNBodyNaive.cpp instantiations);
    here ``--precision fp64`` is bit-honest only on the jnp paths
    (cpu+naive / xla+chunked / the un-fused proxy stages under x64) --
    anything touching a Pallas kernel carries ~1e-6 relative force error.
    Printed once per kernel tag so frame loops aren't spammed; fires at
    trace time (dtype is static under jit)."""
    if kernel in _FP32_NOTIFIED:
        return
    try:
        if jnp.dtype(dtype) != jnp.float64:
            return
    except TypeError:
        return
    _FP32_NOTIFIED.add(kernel)
    print(
        f"[murb-tpu] note: {kernel} computes in fp32 internally (the TPU "
        f"has no f64 vector unit); fp64 state is down-cast for the sweep "
        f"(~1e-6 relative force error). For bit-honest fp64 use the jnp "
        f"engines (--im cpu+naive / cpu+optim).",
        file=sys.stderr,
    )


class Accel(NamedTuple):
    """SoA accelerations, the analogue of ``accSoA_t<T>``
    (ref: src/common/core/Bodies.hpp:44-56)."""

    ax: jax.Array
    ay: jax.Array
    az: jax.Array


def flops_per_iteration(n: int) -> int:
    """The reference's fixed accounting: 20 flops per interaction, N^2
    interactions (ref: src/murb/implem/SimulationNBodyNaive.cpp:15).  Every
    implementation reports this same model so GFlop/s are comparable."""
    return 20 * n * n


def pick_block(npad: int, target: int, minimum: int = 128) -> int:
    """Largest power-of-two block <= target that divides ``npad``.

    State padding guarantees npad % 256 == 0, so this always returns >= 128
    for the default pad multiple.
    """
    b = target
    while b >= minimum:
        if npad % b == 0:
            return b
        b //= 2
    return minimum


def centered(qx, qy, qz, gm):
    """Subtract the Gm-weighted mean position.

    Centering shrinks |q|^2 before squared-distance arithmetic, cutting fp32
    cancellation in the MXU (norm-expansion) kernels.  Pure translation:
    forces are invariant.
    """
    w = gm / jnp.maximum(jnp.sum(gm), jnp.asarray(1.0, gm.dtype))
    cx = jnp.sum(w * qx)
    cy = jnp.sum(w * qy)
    cz = jnp.sum(w * qz)
    return qx - cx, qy - cy, qz - cz
