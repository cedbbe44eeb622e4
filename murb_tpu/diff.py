"""Differentiable simulation: gradients through trajectories, vmap ensembles.

A capability the reference's architecture cannot express: because every
murb-tpu step is a pure function of a `BodyState` pytree (no in-place CUDA
buffers, ref: src/common/core/CUDABodies.cu device mutation), whole
trajectories compose with JAX's transforms --

  * ``jax.grad`` through ``rollout`` gives the adjoint of the simulation:
    d(loss on the final state)/d(initial positions / velocities / masses /
    dt / softening) in one backward pass, with `jax.checkpoint`
    rematerialization so memory stays O(N) instead of O(N * steps).
  * ``jax.vmap`` over a stacked `BodyState` batch runs an ensemble of
    universes in one dispatch -- perturbation studies / IC fitting at the
    cost of one wide kernel instead of B sequential runs.

Gradients flow through the *jnp* force paths (`acc_naive` / `acc_chunked` /
the Chebyshev proxy's jnp stages): Pallas kernels define no VJP, so
``method='hybrid'`` etc. are deliberately absent.  The proxy path is itself
differentiable (anterpolation, node sweep, and interpolation are polynomial
algebra), and its force error ~1e-5 carries to the gradient, so `proxy` is
the production choice at large N; `chunked` is the exact O(N^2) adjoint.

Typical use::

    from murb_tpu.diff import rollout, target_loss

    def loss(v0):
        st = dataclasses.replace(state0, vx=v0[0], vy=v0[1], vz=v0[2])
        final = rollout(st, steps=100, dt=3600.0, soft=2e8)
        return target_loss(final, target_positions)

    g = jax.grad(loss)(v0)
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp

from murb_tpu import G
from murb_tpu.core.integrators import euler_update, kdk_step, yoshida4_step
from murb_tpu.core.state import BodyState
from murb_tpu.ops.common import Accel


def _acc_method(method: str, soft, **kw) -> Callable:
    if method == "naive":
        from murb_tpu.ops.naive import acc_naive

        return lambda qx, qy, qz, gm: acc_naive(qx, qy, qz, gm, soft)
    if method == "chunked":
        from murb_tpu.ops.naive import acc_chunked

        chunk = kw.pop("chunk", 1024)
        return lambda qx, qy, qz, gm: acc_chunked(qx, qy, qz, gm, soft,
                                                  chunk=chunk)
    if method == "proxy":
        from murb_tpu.ops.proxy import acc_proxy

        m = kw.pop("m", 12)
        # fused=False pins the jnp anterpolation stages (differentiable);
        # the fused Pallas stages have no VJP.
        return lambda qx, qy, qz, gm: acc_proxy(qx, qy, qz, gm, soft,
                                                m=m, fused=False)
    raise ValueError(
        f"unknown differentiable method {method!r}: expected naive | "
        f"chunked | proxy (Pallas engines define no VJP)")


@functools.partial(jax.jit,
                   static_argnames=("steps", "method", "remat", "chunk", "m",
                                    "integrator"))
def rollout(state: BodyState, *, steps: int, dt, soft,
            method: str = "chunked", remat: bool = True,
            chunk: int = 1024, m: int = 12,
            integrator: str = "euler") -> BodyState:
    """Integrate ``steps`` iterations; differentiable end to end.

    ``integrator``: euler (reference scheme) | kdk (symplectic 2nd order) |
    yoshida4 (symplectic 4th order -- the right adjoint for long horizons:
    symplectic flows keep the backward pass well-conditioned).
    ``remat=True`` wraps the step in `jax.checkpoint`: the backward pass
    recomputes each step's forces instead of storing O(steps) activations --
    the standard memory/flops trade for long adjoints."""
    acc = _acc_method(method, soft, chunk=chunk, m=m)

    def step(st, _):
        gm = jnp.asarray(G, st.dtype) * st.m
        acc_at = lambda x, y, z: acc(x, y, z, gm)
        if integrator == "euler":
            nxt = euler_update(st, acc_at(st.qx, st.qy, st.qz), dt)
        elif integrator == "kdk":
            nxt = kdk_step(st, acc_at, dt)
        elif integrator == "yoshida4":
            nxt = yoshida4_step(st, acc_at, dt)
        else:
            raise ValueError(f"unknown integrator {integrator!r}")
        return nxt, None

    if remat:
        step = jax.checkpoint(step)
    final, _ = jax.lax.scan(step, state, None, length=steps)
    return final


@functools.partial(
    jax.jit, static_argnames=("steps", "method", "save_every", "chunk", "m"))
def trajectory(state: BodyState, *, steps: int, dt, soft,
               method: str = "chunked", save_every: int = 1,
               chunk: int = 1024, m: int = 12):
    """(final_state, stacked (steps//save_every, npad, 3) positions).

    The stacked positions are scan ys (one device buffer, no per-step D2H --
    the same design as the tracking engines' metric accumulation)."""
    acc = _acc_method(method, soft, chunk=chunk, m=m)
    assert steps % save_every == 0, (steps, save_every)

    def inner(st, _):
        gm = jnp.asarray(G, st.dtype) * st.m
        a = acc(st.qx, st.qy, st.qz, gm)
        return euler_update(st, a, dt), None

    def outer(st, _):
        st, _ = jax.lax.scan(inner, st, None, length=save_every)
        return st, jnp.stack([st.qx, st.qy, st.qz], axis=-1)

    final, qs = jax.lax.scan(outer, state, None, length=steps // save_every)
    return final, qs


def target_loss(state: BodyState, target_positions) -> jax.Array:
    """Mean squared distance of the real (non-ghost) bodies to
    ``target_positions`` (n, 3) -- ghosts are masked out, not just zero-mass,
    so padding never leaks into gradients."""
    q = jnp.stack([state.qx, state.qy, state.qz], axis=-1)
    tgt = jnp.asarray(target_positions, q.dtype)
    npad = state.npad
    mask = (jnp.arange(npad) < state.n).astype(q.dtype)[:, None]
    tgt_pad = jnp.zeros((npad, 3), q.dtype).at[: tgt.shape[0]].set(tgt)
    return jnp.sum(mask * (q - tgt_pad) ** 2) / state.n


def stack_states(states: list[BodyState]) -> BodyState:
    """Stack same-shape BodyStates into one batched pytree for `ensemble`."""
    assert len({(s.n, s.npad) for s in states}) == 1, "shapes must match"
    return jax.tree.map(lambda *a: jnp.stack(a), *states)


def ensemble(fn: Callable, **fn_kwargs) -> Callable:
    """vmap a rollout-like function over a `stack_states` batch: one wide
    dispatch instead of B sequential runs (the TPU-native ensemble story)."""
    return jax.vmap(functools.partial(fn, **fn_kwargs))


def fit_initial_velocities(state0: BodyState, target_positions, *,
                           steps: int, dt, soft, iters: int = 50,
                           lr: float | None = None, method: str = "chunked",
                           verbose: bool = False):
    """Gradient-descend the initial velocities so the final positions hit
    ``target_positions``: the canonical adjoint-method demo (boundary-value
    problem solved through the simulator).  Returns (fitted state, losses).

    The default learning rate is scale-aware: positions ~ 1e12 m and
    steps*dt ~ 1e5..1e6 s give dL/dv ~ q * T / n; lr normalizes by T^2."""
    T = float(steps) * float(dt)
    lr = lr if lr is not None else 0.5 / T ** 2 * state0.n

    def loss_fn(vs):
        st = dataclasses.replace(state0, vx=vs[0], vy=vs[1], vz=vs[2])
        final = rollout(st, steps=steps, dt=dt, soft=soft, method=method)
        return target_loss(final, target_positions)

    vs = jnp.stack([state0.vx, state0.vy, state0.vz])
    vg = jax.jit(jax.value_and_grad(loss_fn))
    loss, g = vg(vs)
    best, best_loss, best_g = vs, float(loss), g
    losses = [best_loss]
    for k in range(iters):
        if verbose:
            print(f"  iter {k:3d}  loss {best_loss:.6e}")
        cand = best - lr * best_g
        loss, g = vg(cand)
        # `<=` rejects NaN too (NaN comparisons are False): a diverged step
        # backtracks instead of poisoning `best`
        if float(loss) <= best_loss:
            best, best_loss, best_g = cand, float(loss), g
        else:
            lr *= 0.5
        losses.append(best_loss)
    fitted = dataclasses.replace(state0, vx=best[0], vy=best[1], vz=best[2])
    return fitted, losses


__all__ = ["rollout", "trajectory", "target_loss", "stack_states",
           "ensemble", "fit_initial_velocities", "Accel"]
