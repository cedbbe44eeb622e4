"""Time integrators: explicit Euler and phase-split leapfrog.

Euler is the reference's one-step scheme (ref:
src/common/core/Bodies.cpp:259-278, 18 flops/body):

    q += (v + a*dt/2) * dt ;  v += a*dt

Leapfrog is the reference's device 3-phase split (one force evaluation per
iteration, carry = (x_n, v_{n-1/2}); derivation comment at ref:
src/common/core/CUDABodies.cu:172-212, kernels at 216-324):

    first  (n=0):      v_{1/2}   = v_0 + a(x_0)*dt/2 ; x_1 = x_0 + v_{1/2}*dt
    middle (0<n<last): v_n       = v_{n-1/2} + a(x_n)*dt/2      (observable)
                       v_{n+1/2} = v_n       + a(x_n)*dt/2
                       x_{n+1}   = x_n + v_{n+1/2}*dt
    last:              v_last ~= v_{last-1/2} ; x_last from buffer

Unlike the reference (whose CLI wires the leapfrog constructor arguments in
the wrong order -- softening and iteration count swapped at ref:
src/murb/main.cpp:257-261 -- and whose report concedes the integrator
misbehaves), the phase index here is explicit and tested for energy
conservation.  The three-buffer scheme is expressed as a scan carry /
functional update, never as in-place mutation.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from murb_tpu.core.state import BodyState
from murb_tpu.ops.common import Accel


# --------------------------------------------------------------------- Euler
def euler_update(state: BodyState, acc: Accel, dt) -> BodyState:
    """Explicit Euler update of positions then velocities (ref: Bodies.cpp:259-278)."""
    dt = jnp.asarray(dt, state.dtype)
    half = jnp.asarray(0.5, state.dtype)
    ax_dt = acc.ax * dt
    ay_dt = acc.ay * dt
    az_dt = acc.az * dt
    return dataclasses.replace(
        state,
        qx=state.qx + (state.vx + ax_dt * half) * dt,
        qy=state.qy + (state.vy + ay_dt * half) * dt,
        qz=state.qz + (state.vz + az_dt * half) * dt,
        vx=state.vx + ax_dt,
        vy=state.vy + ay_dt,
        vz=state.vz + az_dt,
    )


# ------------------------------------------------------------------ Leapfrog
class LeapfrogAux(NamedTuple):
    """Scan-carried scratch: v_{n+1/2} and x_{n+1} (the TPU-native analogue of
    ``devIntermVelocities`` / ``devNextPositions``, ref: CUDABodies.hpp:24-65)."""

    vhx: jax.Array
    vhy: jax.Array
    vhz: jax.Array
    nqx: jax.Array
    nqy: jax.Array
    nqz: jax.Array

    @classmethod
    def zeros_like(cls, state: BodyState) -> "LeapfrogAux":
        z = jnp.zeros_like(state.qx)
        return cls(z, z, z, z, z, z)


def leapfrog_positions(state: BodyState, aux: LeapfrogAux, iteration: int):
    """Positions at which to evaluate the force for a given phase: x_0 for the
    first iteration, the x_{n} buffer afterwards (ref:
    SimulationNBodyCUDALeapfrog.cu:335-346)."""
    if iteration == 0:
        return state.qx, state.qy, state.qz
    return aux.nqx, aux.nqy, aux.nqz


def leapfrog_first(state: BodyState, aux: LeapfrogAux, acc: Accel, dt):
    """Phase 0 (ref kernel devLeapfrogFirst, CUDABodies.cu:216-244): visible
    state stays (x_0, v_0); buffers receive v_{1/2} and x_1."""
    dt = jnp.asarray(dt, state.dtype)
    half_dt = dt * jnp.asarray(0.5, state.dtype)
    vhx = state.vx + acc.ax * half_dt
    vhy = state.vy + acc.ay * half_dt
    vhz = state.vz + acc.az * half_dt
    return state, LeapfrogAux(
        vhx=vhx, vhy=vhy, vhz=vhz,
        nqx=state.qx + vhx * dt,
        nqy=state.qy + vhy * dt,
        nqz=state.qz + vhz * dt,
    )


def leapfrog_middle(state: BodyState, aux: LeapfrogAux, acc: Accel, dt):
    """Phase n (ref kernel devLeapfrogMiddle, CUDABodies.cu:247-299): visible
    state becomes (x_n, v_n); buffers advance to v_{n+1/2}, x_{n+1}.
    ``acc`` must be evaluated at x_n = aux.nq*."""
    dt = jnp.asarray(dt, state.dtype)
    half_dt = dt * jnp.asarray(0.5, state.dtype)
    vx_n = aux.vhx + acc.ax * half_dt
    vy_n = aux.vhy + acc.ay * half_dt
    vz_n = aux.vhz + acc.az * half_dt
    vhx = vx_n + acc.ax * half_dt
    vhy = vy_n + acc.ay * half_dt
    vhz = vz_n + acc.az * half_dt
    new_state = dataclasses.replace(
        state,
        qx=aux.nqx, qy=aux.nqy, qz=aux.nqz,
        vx=vx_n, vy=vy_n, vz=vz_n,
    )
    return new_state, LeapfrogAux(
        vhx=vhx, vhy=vhy, vhz=vhz,
        nqx=aux.nqx + vhx * dt,
        nqy=aux.nqy + vhy * dt,
        nqz=aux.nqz + vhz * dt,
    )


def leapfrog_last(state: BodyState, aux: LeapfrogAux):
    """Final phase (ref kernel devLeapfrogLast, CUDABodies.cu:302-324):
    v_last ~= v_{last-1/2}, x_last from the position buffer."""
    new_state = dataclasses.replace(
        state,
        qx=aux.nqx, qy=aux.nqy, qz=aux.nqz,
        vx=aux.vhx, vy=aux.vhy, vz=aux.vhz,
    )
    return new_state, aux


def yoshida4_step(state: BodyState, acc_fn, dt) -> BodyState:
    """4th-order symplectic integrator (Yoshida 1990 triple-jump): the
    drift-kick chain c1 D, d1 K, c2 D, d2 K, c3 D, d3 K, c4 D with

        w1 = 1 / (2 - 2^(1/3)),  w0 = -2^(1/3) * w1
        c1 = c4 = w1/2,  c2 = c3 = (w0 + w1)/2,  d1 = d3 = w1,  d2 = w0

    Three force evaluations per step buy an O(dt^4) energy error -- the
    high-accuracy option above the reference-shaped leapfrog family (no
    reference counterpart; its report concedes even leapfrog misbehaves).
    """
    dtb = jnp.asarray(dt, state.dtype)
    cbrt2 = 2.0 ** (1.0 / 3.0)
    w1 = 1.0 / (2.0 - cbrt2)
    w0 = -cbrt2 * w1
    cs = (w1 / 2.0, (w0 + w1) / 2.0, (w0 + w1) / 2.0, w1 / 2.0)
    ds = (w1, w0, w1)

    qx, qy, qz = state.qx, state.qy, state.qz
    vx, vy, vz = state.vx, state.vy, state.vz
    for k in range(4):
        c = jnp.asarray(cs[k], state.dtype) * dtb
        qx = qx + vx * c
        qy = qy + vy * c
        qz = qz + vz * c
        if k < 3:
            a = acc_fn(qx, qy, qz)
            d = jnp.asarray(ds[k], state.dtype) * dtb
            vx = vx + a.ax * d
            vy = vy + a.ay * d
            vz = vz + a.az * d
    return dataclasses.replace(state, qx=qx, qy=qy, qz=qz,
                               vx=vx, vy=vy, vz=vz)


def kdk_step(state: BodyState, acc_fn, dt) -> BodyState:
    """Textbook kick-drift-kick leapfrog (two force evaluations per step).

    Not present in the reference; provided as the numerically-clean
    symplectic option (tag ``tpu+kdk``) next to the reference-shaped
    phase-split scheme above.
    """
    dt = jnp.asarray(dt, state.dtype)
    half_dt = dt * jnp.asarray(0.5, state.dtype)
    a0 = acc_fn(state.qx, state.qy, state.qz)
    vhx = state.vx + a0.ax * half_dt
    vhy = state.vy + a0.ay * half_dt
    vhz = state.vz + a0.az * half_dt
    qx = state.qx + vhx * dt
    qy = state.qy + vhy * dt
    qz = state.qz + vhz * dt
    a1 = acc_fn(qx, qy, qz)
    return dataclasses.replace(
        state,
        qx=qx, qy=qy, qz=qz,
        vx=vhx + a1.ax * half_dt,
        vy=vhy + a1.ay * half_dt,
        vz=vhz + a1.az * half_dt,
    )
