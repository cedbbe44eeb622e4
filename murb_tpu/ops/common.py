"""Shared kernel helpers: FLOPs model, acceleration container, block utils."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


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
