"""Engine base classes: the TPU-native ``SimulationNBodyInterface``.

The reference's abstract engine owns the body state, G, dt, softening and a
FLOPs model, and exposes ``computeOneIteration()`` (ref:
src/common/core/SimulationNBodyInterface.hpp:16-88).  Here an engine is a thin
stateful host-side wrapper around a *pure jitted step function*
``state -> (state, acc)`` with buffer donation, so the body state never leaves
HBM between iterations (the property the reference only achieves in its
``gpu+tile+full`` flagship, ref: SimulationNBodyCUDATileFullDevice.cu:203-236
-- here every engine is fully device-resident by construction).

Two drive modes:
  * ``compute_one_iteration()`` -- one jitted step per call (the CLI frame
    loop, per-iteration timing).
  * ``run(n)``  -- a single ``lax.scan`` over n iterations, one device
    dispatch for the whole simulation (maximum throughput; also how tracking
    engines collect their history as scan ys).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from murb_tpu import G, DEFAULT_DT, DEFAULT_SOFTENING
from murb_tpu.core.integrators import euler_update
from murb_tpu.core.state import BodyState
from murb_tpu.ops.common import Accel, flops_per_iteration


class SimulationEngine:
    """Common interface; concrete engines provide ``_make_step``."""

    tag: str = "base"

    def __init__(
        self,
        bodies: BodyState,
        soft: float = DEFAULT_SOFTENING,
        dt: float = DEFAULT_DT,
        **kwargs,
    ):
        if kwargs:
            # Fail loudly on misspelled engine options rather than silently
            # running with defaults (the reference CLI errors likewise).
            raise TypeError(
                f"unknown engine option(s): {sorted(kwargs)} for "
                f"{type(self).__name__}"
            )
        # Private copy: steps donate their input buffers, and donation must
        # never invalidate a BodyState the caller still holds (differential
        # tests feed the same initial state to two engines).
        self._state = jax.tree.map(lambda a: jnp.array(a, copy=True), bodies)
        self.soft = float(soft)
        self._dt = float(dt)
        self.G = G
        self.flops_per_ite = flops_per_iteration(bodies.n)
        self._last_acc: Accel | None = None
        self._step = None          # jitted step, built lazily (dt is baked in)
        self._run_cache: dict[int, object] = {}
        self._iteration = 0

    # ----------------------------------------------------------- properties
    @property
    def bodies(self) -> BodyState:
        return self._state

    @property
    def dt(self) -> float:
        return self._dt

    def set_dt(self, dt: float) -> None:
        if float(dt) != self._dt:
            self._dt = float(dt)
            self._step = None
            self._run_cache.clear()

    @property
    def allocated_bytes(self) -> int:
        return self._state.allocated_bytes

    @property
    def accelerations(self) -> Accel:
        """Accelerations from the last iteration (test accessor, the analogue
        of ``getAccSoA()``, ref: SimulationNBodyNaive.hpp)."""
        if self._last_acc is None:
            if self._iteration > 0:
                raise RuntimeError(
                    "accelerations are not materialized on the run() fast "
                    "path; call compute_one_iteration() to observe them"
                )
            raise RuntimeError("no iteration computed yet")
        return self._last_acc

    # ------------------------------------------------------------- stepping
    def _make_step(self):
        """Return a jitted ``state -> (state, acc)``.  Subclasses override."""
        raise NotImplementedError

    def compute_one_iteration(self) -> None:
        if self._step is None:
            self._step = self._make_step()
        self._state, self._last_acc = self._step(self._state)
        self._iteration += 1

    def run(self, n_iterations: int) -> None:
        """Advance ``n_iterations`` steps in one device dispatch."""
        for _ in range(n_iterations):
            self.compute_one_iteration()

    def block_until_ready(self) -> None:
        jax.block_until_ready(self._state)

    def assert_finite(self) -> None:
        """Fail-fast NaN/Inf guard -- the analogue of the reference's
        per-frame CUDA_CHECK + cudaDeviceSynchronize abort
        (ref: src/murb/main.cpp:356-368).  Syncs the device; call it from
        the frame loop, not inside jit."""
        bad = [
            k for k in ("qx", "qy", "qz", "vx", "vy", "vz")
            if not bool(jnp.all(jnp.isfinite(getattr(self._state, k))))
        ]
        if bad:
            raise FloatingPointError(
                f"non-finite state after iteration {self._iteration}: "
                f"{', '.join(bad)} (dt too large or softening too small?)"
            )

    # ------------------------------------------------------------- plumbing
    def _gm(self, state: BodyState) -> jax.Array:
        """Precomputed G*m_j, the reference's ``devGM`` trick
        (ref: SimulationNBodyCUDATileFullDevice.cu:41-45)."""
        return jnp.asarray(self.G, state.dtype) * state.m


class EulerAccelEngine(SimulationEngine):
    """An engine defined by an acceleration kernel + explicit Euler update.

    Covers the whole CPU/GPU non-leapfrog family of the reference: the only
    difference between its 10 engines is how the O(N^2) sweep is computed.
    """

    def _acc_fn(self, qx, qy, qz, gm) -> Accel:
        raise NotImplementedError

    def _make_step(self):
        dt = self._dt

        def step(state: BodyState):
            acc = self._acc_fn(state.qx, state.qy, state.qz, self._gm(state))
            return euler_update(state, acc, dt), acc

        return jax.jit(step, donate_argnums=0)

    def _make_loop_run(self):
        """One compiled program for ANY iteration count: a fori_loop with a
        runtime bound (lowered to while_loop), state device-resident
        throughout -- the whole simulation is a single device dispatch."""
        dt = self._dt

        def step1(_, state):
            acc = self._acc_fn(state.qx, state.qy, state.qz, self._gm(state))
            return euler_update(state, acc, dt)

        @partial(jax.jit, donate_argnums=0)
        def run(state, n):
            return jax.lax.fori_loop(0, n, step1, state)

        return run

    def run(self, n_iterations: int) -> None:
        if n_iterations <= 0:
            return
        fn = self._run_cache.get("loop")
        if fn is None:
            fn = self._run_cache["loop"] = self._make_loop_run()
        self._state = fn(self._state, n_iterations)
        self._last_acc = None  # not materialized on the loop fast path
        self._iteration += n_iterations
