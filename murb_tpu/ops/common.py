"""Shared kernel helpers: FLOPs model, acceleration container, block utils."""
from __future__ import annotations

import sys
from typing import NamedTuple

import jax
import jax.numpy as jnp

_FP32_NOTIFIED: set[str] = set()


def notify_fp32_compute(kernel: str, dtype, detail: str | None = None) -> None:
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
    detail = detail or (
        "fp64 state is down-cast for the sweep (~1e-6 relative force error)"
    )
    print(
        f"[murb-tpu] note: {kernel} computes in fp32 internally (the TPU "
        f"has no f64 vector unit); {detail}. For bit-honest fp64 use the "
        f"jnp engines (--im cpu+naive / cpu+optim).",
        file=sys.stderr,
    )


def BlockSpec(shape, index_map=None, **kw):
    """``pl.BlockSpec`` with an x64-proof index map.

    Under ``jax_enable_x64`` (the ``--precision fp64`` path) Python int
    literals in index maps trace as i64 while grid indices stay i32; Mosaic
    then fails to legalize the mixed-type index tuple
    ("failed to legalize operation 'func.return' ... (i32, i64)", measured
    on jax 0.9.0 / v5e).  Casting every returned index to int32 keeps the
    kernels compilable regardless of the x64 flag."""
    from jax.experimental import pallas as pl

    if index_map is not None:
        f = index_map

        def index_map(*args):
            out = f(*args)
            if not isinstance(out, tuple):
                out = (out,)
            return tuple(jnp.int32(x) for x in out)

    return pl.BlockSpec(shape, index_map, **kw)


def bsplit(x32, terms: int = 2):
    """Dekker split of an fp32 array into ``terms`` bf16 parts summing (in
    fp32) back to it: 2 terms ~ 16 mantissa bits, 3 terms exact (3x8-bit
    mantissas cover fp32's 24).  MUST run inside a Pallas kernel: an
    XLA-level split is folded away by the algebraic simplifier's
    upcast-of-downcast elision (the CLAUDE.md `_bsplit` hazard); Mosaic
    never folds in-kernel splits."""
    parts = []
    r = x32
    for _ in range(terms - 1):
        h = r.astype(jnp.bfloat16)
        parts.append(h)
        r = r - h.astype(jnp.float32)
    parts.append(r.astype(jnp.bfloat16))
    return tuple(parts)


def f32_inputs(*arrays):
    """Round f64 arrays to fp32 in XLA before they enter a Pallas kernel:
    Mosaic has no f64 VMEM operands (measured: remote-compile failure on
    f64 refs, v5e).  This is a one-way downcast of already-f64 state -- not
    a Dekker split -- so the upcast-of-downcast elision hazard (CLAUDE.md)
    has nothing to fold."""
    return tuple(a.astype(jnp.float32) if a.dtype == jnp.float64 else a
                 for a in arrays)


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
