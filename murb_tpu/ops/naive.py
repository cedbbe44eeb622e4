"""Naive all-pairs kernels in pure jnp: the differential-test oracle.

The TPU-native analogue of ``SimulationNBodyNaive`` (ref:
src/murb/implem/SimulationNBodyNaive.cpp:34-53): for every pair (i, j)

    a_i += G * m_j * r_ij / (|r_ij|^2 + eps^2)^{3/2}

Softening keeps the j == i self-term and all zero-mass ghost contributions
exactly zero, so no masking is needed (same property the reference's tile
kernels rely on, ref: src/murb/implem/SimulationNBodyCUDATile.cu:138-143).

Two variants:
  * ``acc_naive``   -- one (N, N) broadcast; O(N^2) memory.  The oracle for
                       every differential test; fine up to N ~ 8k.
  * ``acc_chunked`` -- i-chunked ``lax.map`` over the same math; O(chunk * N)
                       memory.  XLA fuses the inner elementwise chain onto the
                       VPU; this is the "optimized CPU family" analogue
                       (cpu+optim/cpu+simd/cpu+omp collapse into this one
                       jitted path, ref SURVEY.md section 7).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from murb_tpu.ops.common import Accel


def _pair_weights(dx, dy, dz, gm_j, soft2):
    """w_ij = G*m_j / (|r_ij|^2 + eps^2)^{3/2} via rsqrt (no pow)."""
    d2 = dx * dx + dy * dy + dz * dz + soft2
    inv = jax.lax.rsqrt(d2)
    return gm_j * (inv * inv * inv)


def acc_naive(qx, qy, qz, gm, soft) -> Accel:
    """Full-broadcast all-pairs accelerations. Arrays are (npad,)."""
    dtype = qx.dtype
    soft2 = jnp.asarray(soft, dtype) ** 2
    dx = qx[None, :] - qx[:, None]
    dy = qy[None, :] - qy[:, None]
    dz = qz[None, :] - qz[:, None]
    w = _pair_weights(dx, dy, dz, gm[None, :], soft2)
    return Accel(
        ax=jnp.sum(w * dx, axis=1),
        ay=jnp.sum(w * dy, axis=1),
        az=jnp.sum(w * dz, axis=1),
    )


def acc_chunked(qx, qy, qz, gm, soft, *, chunk: int = 1024) -> Accel:
    """i-chunked all-pairs accelerations with O(chunk * N) live memory."""
    npad = qx.shape[0]
    chunk = min(chunk, npad)
    if npad % chunk != 0:
        from murb_tpu.ops.common import pick_block

        chunk = pick_block(npad, chunk)
    assert npad % chunk == 0, (npad, chunk)
    dtype = qx.dtype
    soft2 = jnp.asarray(soft, dtype) ** 2

    qi = jnp.stack([qx, qy, qz], axis=0).reshape(3, npad // chunk, chunk)
    qi = jnp.moveaxis(qi, 1, 0)  # (nchunk, 3, chunk)

    def one_chunk(qc):
        dx = qx[None, :] - qc[0][:, None]
        dy = qy[None, :] - qc[1][:, None]
        dz = qz[None, :] - qc[2][:, None]
        w = _pair_weights(dx, dy, dz, gm[None, :], soft2)
        return (
            jnp.sum(w * dx, axis=1),
            jnp.sum(w * dy, axis=1),
            jnp.sum(w * dz, axis=1),
        )

    ax, ay, az = jax.lax.map(one_chunk, qi)
    return Accel(ax=ax.reshape(npad), ay=ay.reshape(npad), az=az.reshape(npad))


def acc_rect_jchunked(qxi, qyi, qzi, qxj, qyj, qzj, gmj, soft, *,
                      chunk: int = 262_144) -> Accel:
    """j-chunked rectangular sweep with O(ni * chunk) live memory.

    The plain ``acc_rect`` broadcast materializes (ni, nj) intermediates;
    at validation scale that kills the chip (measured: 76 GB of HBM at
    ni=512, nj=20M -- XLA does not stream the multi-consumer broadcast).
    A ``lax.scan`` over j-chunks caps the live set; bitwise-same math."""
    nj = qxj.shape[0]
    chunk = min(chunk, nj)
    if nj % chunk != 0:
        from murb_tpu.ops.common import pick_block

        chunk = pick_block(nj, chunk)
    if nj % chunk != 0:
        # nj has no power-of-two divisor >= 128: scan the divisible prefix,
        # sweep the short tail with the plain broadcast, sum the halves
        main = (nj // chunk) * chunk
        sl = slice(main, nj)
        tail = acc_rect(qxi, qyi, qzi, qxj[sl], qyj[sl], qzj[sl],
                        gmj[sl], soft)
        if main == 0:
            return tail
        head = acc_rect_jchunked(qxi, qyi, qzi, qxj[:main], qyj[:main],
                                 qzj[:main], gmj[:main], soft, chunk=chunk)
        return Accel(head.ax + tail.ax, head.ay + tail.ay,
                     head.az + tail.az)
    dtype = qxi.dtype
    soft2 = jnp.asarray(soft, dtype) ** 2
    ni = qxi.shape[0]

    qj = jnp.stack([qxj, qyj, qzj, gmj]).reshape(4, nj // chunk, chunk)
    qj = jnp.moveaxis(qj, 1, 0)  # (nchunk, 4, chunk)
    zeros = jnp.zeros((ni,), dtype)

    def body(carry, qc):
        dx = qc[0][None, :] - qxi[:, None]
        dy = qc[1][None, :] - qyi[:, None]
        dz = qc[2][None, :] - qzi[:, None]
        w = _pair_weights(dx, dy, dz, qc[3][None, :], soft2)
        return (carry[0] + jnp.sum(w * dx, axis=1),
                carry[1] + jnp.sum(w * dy, axis=1),
                carry[2] + jnp.sum(w * dz, axis=1)), None

    (ax, ay, az), _ = jax.lax.scan(body, (zeros, zeros, zeros), qj)
    return Accel(ax=ax, ay=ay, az=az)


def acc_rect(qxi, qyi, qzi, qxj, qyj, qzj, gmj, soft) -> Accel:
    """Rectangular broadcast sweep: accelerations of the i-set due to the
    j-set.  Small-shape building block for the distributed engines."""
    dtype = qxi.dtype
    soft2 = jnp.asarray(soft, dtype) ** 2
    dx = qxj[None, :] - qxi[:, None]
    dy = qyj[None, :] - qyi[:, None]
    dz = qzj[None, :] - qzi[:, None]
    w = _pair_weights(dx, dy, dz, gmj[None, :], soft2)
    return Accel(
        ax=jnp.sum(w * dx, axis=1),
        ay=jnp.sum(w * dy, axis=1),
        az=jnp.sum(w * dz, axis=1),
    )
