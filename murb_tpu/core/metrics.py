"""Conserved-quantity metrics: total energy, angular momentum, density center.

TPU-native rebuild of the reference's metrics kernel + CUB reduction
(ref: src/murb/implem/SimulationNBodyCUDAPropertyTracking.cu:217-304,
334-369): pure jnp reductions that XLA fuses into the step; when run under
``lax.scan`` the per-iteration history lands in device memory as scan ``ys``
with no per-iteration device-to-host copies (the reference copies the history
D2H every iteration, ref: SimulationNBodyCUDAPropertyTracking.cu:131).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from murb_tpu import G


class MetricScales(NamedTuple):
    """Static unit scales for dimensionless on-device metric reductions.

    Device dtypes cannot hold merger-scale metric magnitudes: fp32 tops out
    at ~3.4e38 and XLA:TPU's "f64" is double-single EMULATION -- full f64
    precision but fp32 RANGE (measured: 1e20*1e20 -> nan on the chip).  At
    the scaled-unit two-galaxy ICs (masses ~7e26 kg) the energy total is
    ~1e41 and per-body m*(q x v) terms are ~4e42 -- unrepresentable on
    device in any dtype.  So the reductions run on m/m0, q/q0, v/v0 and the
    host multiplies the scale back in real float64
    (``energy_scale`` / ``ang_momentum_scale``)."""

    m0: float
    q0: float
    v0: float

    @property
    def energy_scale(self) -> float:
        return self.m0 * self.v0 ** 2

    @property
    def ang_momentum_scale(self) -> float:
        return self.m0 * self.q0 * self.v0


UNIT_SCALES = MetricScales(1.0, 1.0, 1.0)


def metric_scales(state) -> MetricScales:
    """Host-side scales from a state's current magnitudes (masses are
    constant in-run; position/velocity magnitudes are stable enough that
    init-time scales keep every reduction far inside fp32 range)."""
    import numpy as np

    d = state.unpadded()
    mx = lambda *ks: max(float(np.abs(d[k]).max()) for k in ks)
    return MetricScales(max(mx("m"), 1.0), max(mx("qx", "qy", "qz"), 1.0),
                        max(mx("vx", "vy", "vz"), 1.0))


def _scaled_energy(m, per_body, scales, out_dtype):
    """(m/m0) * per_body / v0^2 -- the shared energy-unit reduction form.
    TWO factors, never one fused constant: 1/(m0*v0^2) itself underflows
    the fp32-range emulated f64 on TPU (flushed to 0, measured)."""
    im = jnp.asarray(1.0 / scales.m0, out_dtype)
    iv2 = jnp.asarray(1.0 / scales.v0 ** 2, out_dtype)
    return ((m.astype(out_dtype) * im) * per_body) * iv2


def potential_energy_per_body(qx, qy, qz, m, gm, soft, *, chunk: int = 1024,
                              out_dtype=jnp.float32,
                              method: str = "exact",
                              proxy_m: int = 16,
                              scales: MetricScales = UNIT_SCALES) -> jax.Array:
    """PE_i = -m_i * sum_j Gm_j * rsqrt(|r_ij|^2 + eps^2), self-term removed.

    Mirrors the reference's tile sweep which includes j == i and then
    compensates with ``+ m_i*Gm_i*rsqrt(eps^2)`` (ref:
    SimulationNBodyCUDAPropertyTracking.cu:271-302).  Chunked over i to keep
    memory O(chunk * N).

    ``method="proxy"`` computes the sweep via the Chebyshev proxy in
    O(N*m^3) (same validity rules as the force solver -- caller picks
    ``proxy_m`` from the box).
    """
    npad = qx.shape[0]
    if method == "proxy":
        from murb_tpu.ops.proxy import potential_proxy

        sweep = potential_proxy(qx, qy, qz, gm, soft, m=proxy_m).astype(out_dtype)
        soft2 = jnp.asarray(soft, qx.dtype) ** 2
        self_term = gm.astype(out_dtype) * jax.lax.rsqrt(soft2).astype(out_dtype)
        return -_scaled_energy(m, sweep - self_term, scales, out_dtype)
    chunk = min(chunk, npad)
    if npad % chunk != 0:
        from murb_tpu.ops.common import pick_block

        chunk = pick_block(npad, chunk)
    assert npad % chunk == 0
    dtype = qx.dtype
    soft2 = jnp.asarray(soft, dtype) ** 2

    qi = jnp.stack([qx, qy, qz], axis=0).reshape(3, npad // chunk, chunk)
    qi = jnp.moveaxis(qi, 1, 0)

    def one_chunk(qc):
        dx = qx[None, :] - qc[0][:, None]
        dy = qy[None, :] - qc[1][:, None]
        dz = qz[None, :] - qc[2][:, None]
        inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + soft2)
        return jnp.sum(gm[None, :].astype(out_dtype) * inv.astype(out_dtype), axis=1)

    sweep = jax.lax.map(one_chunk, qi).reshape(npad)
    self_term = gm.astype(out_dtype) * jax.lax.rsqrt(soft2).astype(out_dtype)
    return -_scaled_energy(m, sweep - self_term, scales, out_dtype)


def kinetic_energy_per_body(m, vx, vy, vz, out_dtype=jnp.float32,
                            scales: MetricScales = UNIT_SCALES) -> jax.Array:
    # scale v BEFORE squaring so |v| up to fp32-max stays in range; the
    # result (m/m0)*(v/v0)^2 is already in energy units of m0*v0^2
    iv = jnp.asarray(1.0 / scales.v0, out_dtype)
    im = jnp.asarray(1.0 / scales.m0, out_dtype)
    vx, vy, vz = (a.astype(out_dtype) * iv for a in (vx, vy, vz))
    return (m.astype(out_dtype) * im) * (vx * vx + vy * vy + vz * vz)


def total_energy(state, soft, *, chunk: int = 1024, out_dtype=jnp.float32,
                 method: str = "exact", proxy_m: int = 16,
                 scales: MetricScales = UNIT_SCALES):
    """E = sum_i (PE_i/2 + KE_i/2) with KE_i = m_i |v_i|^2 (the reference halves
    both: PE for double counting, KE for the 1/2 m v^2 factor, ref:
    SimulationNBodyCUDAPropertyTracking.cu:296-302)."""
    pe = potential_energy_per_body(
        state.qx, state.qy, state.qz, state.m,
        jnp.asarray(G, state.dtype) * state.m, soft,
        chunk=chunk, out_dtype=out_dtype, method=method, proxy_m=proxy_m,
        scales=scales,
    )
    ke = kinetic_energy_per_body(state.m, state.vx, state.vy, state.vz,
                                 out_dtype, scales=scales)
    half = jnp.asarray(0.5, out_dtype)
    return jnp.sum(pe * half + ke * half)


def angular_momentum(state, out_dtype=jnp.float32,
                     scales: MetricScales = UNIT_SCALES):
    """|sum_i m_i (q_i x v_i)| -- scalar magnitude, matching the reference's
    scalar ``angMomentums`` series (ref: src/common/core/SimulationHistory.hpp:14;
    the reference declares the GPU kernel via COMPUTE_ANGMOMENTUM_METRIC but
    never implements it -- this completes the capability)."""
    m = state.m.astype(out_dtype) * jnp.asarray(1.0 / scales.m0, out_dtype)
    iq = jnp.asarray(1.0 / scales.q0, out_dtype)
    iv = jnp.asarray(1.0 / scales.v0, out_dtype)
    qx, qy, qz = (a.astype(out_dtype) * iq
                  for a in (state.qx, state.qy, state.qz))
    vx, vy, vz = (a.astype(out_dtype) * iv
                  for a in (state.vx, state.vy, state.vz))
    lx = jnp.sum(m * (qy * vz - qz * vy))
    ly = jnp.sum(m * (qz * vx - qx * vz))
    lz = jnp.sum(m * (qx * vy - qy * vx))
    # |L| ~ 1e33 overflows fp32 when squared; rescale before the norm so the
    # magnitude survives in any dtype (TPU has no native f64).
    s = jnp.maximum(jnp.maximum(jnp.abs(lx), jnp.abs(ly)),
                    jnp.maximum(jnp.abs(lz), jnp.asarray(1e-30, out_dtype)))
    nx, ny, nz = lx / s, ly / s, lz / s
    return s * jnp.sqrt(nx * nx + ny * ny + nz * nz)


def density_center(state, out_dtype=jnp.float32,
                   scales: MetricScales = UNIT_SCALES):
    """Mass-weighted mean position, shape (3,) (ref data model:
    src/common/core/SimulationHistory.hpp:15 ``densityCenters``)."""
    m = state.m.astype(out_dtype) * jnp.asarray(1.0 / scales.m0, out_dtype)
    total = jnp.maximum(jnp.sum(m), jnp.asarray(1e-30, out_dtype))
    return jnp.stack([
        jnp.sum(m * state.qx.astype(out_dtype)) / total,
        jnp.sum(m * state.qy.astype(out_dtype)) / total,
        jnp.sum(m * state.qz.astype(out_dtype)) / total,
    ])


def energy_from_phi(state, phi, soft, out_dtype=jnp.float32,
                    scales: MetricScales = UNIT_SCALES):
    """Total energy given a precomputed potential sweep phi_i = sum_j Gm_j *
    rsqrt(d^2+eps^2) (self term included; compensated here exactly like the
    reference kernel).  Used by the fused proxy tracking path."""
    gm = jnp.asarray(G, state.dtype) * state.m
    soft2 = jnp.asarray(soft, state.dtype) ** 2
    self_term = gm.astype(out_dtype) * jax.lax.rsqrt(soft2).astype(out_dtype)
    pe = -_scaled_energy(state.m, phi.astype(out_dtype) - self_term,
                         scales, out_dtype)
    ke = kinetic_energy_per_body(state.m, state.vx, state.vy, state.vz,
                                 out_dtype, scales=scales)
    half = jnp.asarray(0.5, out_dtype)
    return jnp.sum(pe * half + ke * half)


def all_metrics(state, soft, *, chunk: int = 1024, out_dtype=jnp.float32,
                mask=None, method: str = "exact", proxy_m: int = 16,
                scales: MetricScales = UNIT_SCALES):
    """(energy, angular momentum, density center) fused in one jitted call --
    the analogue of COMPUTE_ALL_METRIC (ref:
    SimulationNBodyCUDAPropertyTracking.cu:4-7).

    ``mask`` (npad,) of 0/1 restricts the metrics to a body subset (used by
    the multi-galaxy tracking engine; masked bodies act like zero-mass
    ghosts, so intra-subset PE is exact and cross-galaxy PE is excluded --
    matching the reference's per-galaxy-then-sum aggregation model,
    ref: SimulationHistory.cpp:153-184)."""
    if mask is not None:
        import dataclasses

        state = dataclasses.replace(state, m=state.m * mask.astype(state.dtype))
    return (
        total_energy(state, soft, chunk=chunk, out_dtype=out_dtype,
                     method=method, proxy_m=proxy_m, scales=scales),
        angular_momentum(state, out_dtype, scales=scales),
        density_center(state, out_dtype, scales=scales),
    )
