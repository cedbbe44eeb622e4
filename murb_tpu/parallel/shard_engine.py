"""Distributed engines: shard_map over a 1-D device mesh.

TPU-native rebuild of the reference's MPI engine
(ref: src/murb/implem/SimulationNBodyMultiNode.cpp) and heterogeneous split
(ref: src/murb/implem/SimulationNBodyHetero.cu).  Three modes:

  * ``allgather`` -- fidelity-first analogue of the MPI engine: each shard
    owns a block of bodies; per step it ``all_gather``s the global
    (positions, G*m) -- the analogue of the 4x MPI_Allgatherv of state
    (ref: SimulationNBodyMultiNode.cpp:94-117) -- computes its own i-rows
    against the replicated j-state, and integrates *only its own slice*
    (owner-computes).  The reference's second round of 3x MPI_Allgatherv of
    accelerations (ref: .cpp:120-148) and its redundant full-state
    integration on every rank (ref: .cpp:236-241) disappear entirely.

  * ``ring`` -- scalable mode: memory stays O(N/devices) per chip.  The j-block
    (positions + G*m of one shard) rotates around the mesh with
    ``lax.ppermute`` while each shard streams it through the rectangular tile
    kernel -- the ring-attention analogue of the tile sweep (SURVEY.md
    section 5b).

  * ``proxy`` -- the production multi-chip path: each shard anterpolates its
    bodies to the global Chebyshev proxy grid locally (P2M), the m^3
    coefficient tensor is ``psum``-merged (~16 KB at m=16 -- the ONLY
    O(m^3) communication per step, vs O(N) for allgather/ring), the tiny
    node sweep runs redundantly per shard, and L2P stays local.  Heavy
    bodies are gathered as a D*k list and corrected exactly with a psum of
    their forces.  Communication per step is independent of N.

  * ``fmm`` -- the wide-box production multi-chip path: same skeleton as
    ``proxy`` but the far field is the L-level Chebyshev hierarchy
    (ops/fmm.py).  Each shard runs P2M of ITS bodies into the finest-level
    cell grid locally, ONE ``psum`` merges the (C^3, m^3) expansion tensor
    (~256 KB at m=10, L=2 -- still independent of N), the tiny M2M/M2L/L2L
    sweeps run redundantly per shard, and L2P stays local.  This fills the
    parallelism x algorithm cell the reference's any-scheme MPI engine
    covers by brute force (ref: SimulationNBodyMultiNode.cpp:94-148):
    boxes too wide for a single global expansion now scale over the mesh
    with N-independent communication instead of falling back to the
    O(N)-comm ring.  ``shard+proxy`` auto-promotes to this mode when the
    box demands it (mirroring the single-chip ProxyEngine's auto policy).

  * ``adaptive`` -- the clustered-wide-box multi-chip path: the
    occupied-cell sparse hierarchy (ops/sparse_fmm.py) over
    Morton-contiguous shards with sub-O(N) communication -- one psum of
    the finest sparse multipoles for the far field, one surface-scaled
    all_gather halo pool for the exact P2P near field, psum'd exact rows
    for stray targets (parallel/shard_adaptive.py has the full design
    note).  Fills the cell the exact ring covers with O(N) comm: 10M+
    two-cluster boxes that need both multi-chip memory AND the adaptive
    solver.

  * ``uneven`` -- capability parity with the hetero engine's fraction knob
    (env MURB_HETERO_GPU_FRACTION, ref: SimulationNBodyHetero.cu:16-18,
    222-227): shard 0 computes a tunable fraction of the i-rows, the rest
    share the remainder; state is replicated and partial accelerations are
    ``psum``-merged.  On a homogeneous TPU mesh equal fractions are optimal;
    the knob is preserved for API parity with heterogeneous deployments.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from murb_tpu import G
from murb_tpu.core.integrators import euler_update
from murb_tpu.core.state import BodyState
from murb_tpu.models.base import SimulationEngine
from murb_tpu.ops.common import Accel
from murb_tpu.ops.naive import acc_rect
from murb_tpu.parallel.mesh import (
    SHARD_AXIS,
    make_mesh,
    replicate_state,
    shard_state,
)

# check_vma=False: the local step bodies invoke Pallas kernels, whose
# out_shape carries no varying-manual-axes annotation; jax 0.9's vma
# validation rejects that combination on TPU.  The specs below fully
# determine the sharding, so the check adds nothing here.
_shard_map = partial(jax.shard_map, check_vma=False)


def _default_kernel() -> str:
    """Pallas hybrid on TPU, jnp broadcast elsewhere (CPU test meshes)."""
    return "hybrid" if jax.default_backend() == "tpu" else "jnp"


def _rect_kernel(name: str, block_i: int, block_j: int):
    if name == "jnp":
        return acc_rect
    if name == "tile":
        from murb_tpu.ops.tile_pallas import acc_tile_rect

        return partial(acc_tile_rect, block_i=block_i, block_j=block_j)
    if name == "hybrid":
        from murb_tpu.ops.hybrid import acc_hybrid_rect

        # passes=2: the accuracy default (single-pass bf16 misses the
        # chaotic-central-body tolerance, same as the single-chip engines)
        return partial(acc_hybrid_rect, block_i=block_i, block_j=block_j,
                       passes=2)
    if name == "mxu":
        from murb_tpu.ops.mxu import acc_mxu_rect

        return partial(acc_mxu_rect, block_i=block_i, block_j=block_j)
    raise ValueError(f"unknown rect kernel {name!r}")


class ShardedEngine(SimulationEngine):
    """Data-parallel engine over a 1-D mesh (modes: allgather / ring / uneven)."""

    tag = "shard"

    def __init__(self, bodies: BodyState, soft=None, dt=None, *,
                 mode: str = "ring", shards: int = 0,
                 gpu_fraction: float | None = None, min_n: int | None = None,
                 kernel: str = "auto", block_i: int = 0, block_j: int = 0,
                 ring_impl: str = "auto", m: int = 0, levels: int = 0,
                 m2l_dots: str = "fp32", validate: bool = True,
                 adapt_every: int = 0, **kw):
        import os

        kwargs = {}
        if soft is not None:
            kwargs["soft"] = soft
        if dt is not None:
            kwargs["dt"] = dt
        # Env-knob parity with the hetero engine (re-read per construction,
        # ref: SimulationNBodyHetero.cu:16-26, 217-227): the weighted-split
        # fraction and the small-N fallback threshold.
        if gpu_fraction is None and os.environ.get("MURB_HETERO_GPU_FRACTION"):
            gpu_fraction = float(os.environ["MURB_HETERO_GPU_FRACTION"])
        if gpu_fraction is not None and not 0.0 < gpu_fraction <= 1.0:
            # A fraction outside (0, 1] would leave i-rows owned by no shard
            # (silently zero acceleration) -- reject it loudly (the
            # reference's hetero engine only meaningfully accepts [0, 1]).
            raise ValueError(
                f"gpu_fraction must be in (0, 1], got {gpu_fraction}"
            )
        if min_n is None:
            min_n = int(os.environ.get("MURB_HETERO_MIN_N", "0") or 0)
        if min_n and bodies.n < min_n:
            # Degrade to a single shard, mirroring the hetero engine's
            # pure-CPU fallback for small N (ref: .cu:229-257).
            shards = 1

        self.m2l_dots = m2l_dots
        self.validated_err: float | None = None
        self.validated_half: float | None = None
        self.adaptive_plan = None
        self._inv_perm = None
        if mode in ("proxy", "fmm"):
            # Pick the solver geometry from the initial box, same policy
            # ladder as the single-chip ProxyEngine: a single global
            # expansion while the box admits m <= 24; the L-level
            # hierarchy (shard+fmm) for wider boxes -- scale-free, so
            # there is no exact-kernel fallback for big boxes anymore.
            from murb_tpu import DEFAULT_SOFTENING
            from murb_tpu.ops.proxy import half_extent, required_order

            half = half_extent(bodies.unpadded())
            soft_val = kwargs.get("soft", DEFAULT_SOFTENING)
            if mode == "proxy":
                # margin=0: the 1.5x box factor already pads for growth
                # (same measured-calibration rationale as
                # ProxyEngine._configure)
                m_auto = required_order(half * 1.5, soft_val, 1e-4,
                                        margin=0)
                m_auto = (m_auto + 3) // 4 * 4
                if m_auto > 24:
                    mode = "fmm"
                else:
                    self.proxy_m = m if m else m_auto
                    self.proxy_heavy_k = 1
            if mode == "fmm":
                from murb_tpu.ops.fmm import (
                    best_depth,
                    fmm_order,
                    required_levels,
                )

                if m and levels:
                    self.fmm_m, self.fmm_levels = int(m), int(levels)
                else:
                    # Same policy rung as the single-chip CLI ladder
                    # (cli.py kernel='fmm' -> 'adaptive'): when the
                    # box/softening ratio puts the dense hierarchy's
                    # required order past 16, no dense config meets tol
                    # -- promote to the occupied-cell adaptive mode.
                    lv_req = required_levels(half, soft_val)
                    if fmm_order(half, soft_val, lv_req, 1e-4) > 16:
                        mode = "adaptive"
                    else:
                        self.fmm_m, self.fmm_levels = best_depth(
                            bodies.npad, half, soft_val
                        )
                if mode == "fmm":
                    self.proxy_heavy_k = 1
            if mode != "adaptive" and validate and not m:
                # Measured-order selection (ops/validate), same contract
                # as the single-chip ProxyEngine: the static pick's error
                # prefactor is distribution-dependent, so measure the
                # solver single-device against an exact strided sample
                # before compiling it into the sharded step, escalating
                # (and switching proxy -> fmm) as needed.
                from murb_tpu.ops.validate import validate_config

                gmv = jnp.asarray(G, bodies.qx.dtype) * bodies.m

                def _make_acc(mm, lv, cc):
                    def acc(qx, qy, qz, g):
                        if lv:
                            from murb_tpu.ops.fmm import acc_fmm

                            return acc_fmm(qx, qy, qz, g, soft_val, m=mm,
                                           levels=lv,
                                           m2l_dots=self.m2l_dots)
                        from murb_tpu.ops.proxy import acc_proxy

                        return acc_proxy(qx, qy, qz, g, soft_val, m=mm,
                                         cells=cc)

                    return acc

                init_m = self.fmm_m if mode == "fmm" else self.proxy_m
                init_lv = self.fmm_levels if mode == "fmm" else 0
                mv, lvv, _, err = validate_config(
                    bodies.qx, bodies.qy, bodies.qz, gmv, soft_val, 1e-4,
                    init_m, init_lv, 1, half, _make_acc)
                self.validated_err = err
                from murb_tpu.ops.validate import certified_half
                self.validated_half = certified_half(
                    int(mv), int(lvv), float(half), err, soft_val, 1e-4)
                if lvv:
                    mode = "fmm"
                    self.fmm_m, self.fmm_levels = int(mv), int(lvv)
                else:
                    self.proxy_m = int(mv)

        self.mesh = make_mesh(shards)
        self.n_shards = self.mesh.devices.size
        self.mode = mode
        self.adapt_every = int(adapt_every)
        self._auto = not (m or levels)   # fixed configs are never churned
        self.gpu_fraction = gpu_fraction
        self.kernel_name = _default_kernel() if kernel == "auto" else kernel
        self.block_i = block_i
        self.block_j = block_j
        if ring_impl == "auto":
            # The fused RDMA ring is the TPU path; elsewhere it would run
            # through the (slow, testing-only) TPU interpreter.
            ring_impl = ("pipelined" if jax.default_backend() == "tpu"
                         else "ppermute")
        if ring_impl not in ("pipelined", "ppermute"):
            raise ValueError(f"unknown ring_impl {ring_impl!r}")
        self.ring_impl = ring_impl

        # Every shard must hold a lane-aligned block: pad to 256 * shards.
        bodies = bodies.repad(256 * self.n_shards)

        if mode == "adaptive":
            # Plan the Morton-sharded adaptive solve from the initial
            # distribution (capacities + residence ranges), validate the
            # order with the same measured ladder as the single-chip
            # adaptive path (cli.py), and permute the body arrays into
            # Morton residence order.  ``bodies`` (the property) undoes
            # the permutation at observation points so per-body identity
            # is preserved for history/CSV/checkpoints.
            import dataclasses

            import numpy as np

            from murb_tpu import DEFAULT_SOFTENING
            from murb_tpu.ops.sparse_fmm import (
                acc_adaptive,
                adaptive_order,
                best_adaptive_plan,
            )
            from murb_tpu.parallel.shard_adaptive import plan_shard_adaptive

            soft_val = kwargs.get("soft", DEFAULT_SOFTENING)
            u = bodies.unpadded()
            act = np.asarray(u["m"]) > 0
            qh = np.stack([u["qx"], u["qy"], u["qz"]], 1).astype(np.float32)
            m_pick = int(m) if m else adaptive_order(1e-4)
            Ld_pick, L_pick = (2, int(levels)) if levels else (0, 0)
            rank_pick = -1
            if validate and not m:
                from murb_tpu.ops.sparse_fmm import default_m2l_rank
                from murb_tpu.ops.validate import measured_force_error

                plan1, _ = best_adaptive_plan(qh[act], bodies.npad, m_pick)
                gmv = jnp.asarray(G, bodies.qx.dtype) * bodies.m
                tried_rank0 = False
                while True:
                    merr = measured_force_error(
                        bodies.qx, bodies.qy, bodies.qz, gmv, soft_val,
                        lambda a, b, c, g: acc_adaptive(
                            a, b, c, g, soft_val, plan1))
                    if merr <= 1e-4:
                        break
                    # drop M2L compression before escalating m (its
                    # truncation is per-m constant; engines ladder rule)
                    eff = plan1.m2l_rank
                    if eff < 0:
                        eff = default_m2l_rank(plan1.m)
                    if eff > 0 and not tried_rank0:
                        tried_rank0 = True
                        plan1 = plan1._replace(m2l_rank=0)
                        continue
                    if plan1.m + 2 > 12:
                        break
                    plan1 = plan1._replace(m=plan1.m + 2)
                self.validated_err = float(merr)
                m_pick = plan1.m
                Ld_pick, L_pick = plan1.dense_levels, plan1.levels
                rank_pick = plan1.m2l_rank
            self.adaptive_plan, perm = plan_shard_adaptive(
                qh, bodies.npad, self.n_shards, m_pick, Ld_pick, L_pick,
                active=act, m2l_rank=kw.pop("m2l_rank", rank_pick))
            bodies = dataclasses.replace(
                bodies, **{k: getattr(bodies, k)[np.asarray(perm)]
                           for k in ("m", "r", "qx", "qy", "qz",
                                     "vx", "vy", "vz")})
            inv = np.empty_like(perm)
            inv[perm] = np.arange(len(perm))
            self._inv_perm = inv
            self.proxy_heavy_k = 1

        super().__init__(bodies, **kwargs, **kw)
        self.tag = f"shard+{mode}"

        if mode == "uneven":
            self._state = replicate_state(self._state, self.mesh)
        else:
            self._state = shard_state(self._state, self.mesh)

    @property
    def bodies(self) -> BodyState:
        """Observation view.  shard+adaptive permutes body order at build
        (Morton residence); undo it here so history/CSV/checkpoints keep
        per-body identity.  Observation-only (never the hot path)."""
        state = self._state
        if self._inv_perm is not None:
            import dataclasses

            inv = jnp.asarray(self._inv_perm)
            state = dataclasses.replace(
                state, **{k: getattr(state, k)[inv]
                          for k in ("m", "r", "qx", "qy", "qz",
                                    "vx", "vy", "vz")})
        return state

    def proxy_health(self) -> dict | None:
        """Validity check for the far-field modes (same contract as
        ProxyEngine.proxy_health, incl. the measured certification when
        the ctor validated the pick); None for the exact modes.  The CLI
        surfaces a not-ok post-run (build_engine's duck-typed hook)."""
        if self.mode == "adaptive":
            from murb_tpu.parallel.shard_adaptive import (
                health_check,
                make_health_fn,
            )

            fn = self._run_cache.get("health")
            if fn is None:
                counts = make_health_fn(self.adaptive_plan,
                                        axis_name=SHARD_AXIS)
                fn = jax.jit(_shard_map(
                    counts, mesh=self.mesh,
                    in_specs=P(SHARD_AXIS), out_specs=P()))
                self._run_cache["health"] = fn
            out = health_check(self.adaptive_plan, fn(self._state))
            if self.validated_err is not None:
                out["validated_err"] = self.validated_err
            return out
        if self.mode not in ("proxy", "fmm"):
            return None
        from murb_tpu.ops.fmm import fmm_order
        from murb_tpu.ops.proxy import half_extent, required_order

        half = half_extent(self._state.unpadded())
        if self.mode == "fmm":
            m, levels = self.fmm_m, self.fmm_levels
            needed = fmm_order(half, self.soft, levels)
        else:
            m, levels = self.proxy_m, 0
            needed = required_order(half, self.soft)
        if self.validated_half is not None:
            ok = half <= self.validated_half
        else:
            ok = needed <= m
        return {
            "using_proxy": True,
            "m": m,
            "cells": 1,
            "levels": levels,
            "required_m_now": needed,
            "ok": ok,
        }

    # ------------------------------------------------------- mid-run re-plan
    def maybe_adapt(self) -> bool:
        """Mid-run re-plan for the far-field modes (the sharded
        counterpart of ProxyEngine.maybe_adapt; the mode docstring's
        stated contract, parallel/shard_adaptive.py:18-19): when
        proxy_health reports not-ok -- the system drifted out of the
        frozen box, overflowed a planned capacity, or outgrew the
        compiled order -- rebuild the plan from the CURRENT gathered
        state and recompile the step.  Only *invalid* configs are
        rebuilt (no compile churn); explicit (m, levels) configs are
        never churned.  Syncs the device; call between frames, never
        inside jit.  Returns True if the engine was reconfigured.

        The reference's own mid-run-adaptivity precedent is the hetero
        engine's per-iteration env re-read
        (ref: SimulationNBodyHetero.cu:217-227)."""
        if not self._auto:
            return False
        health = self.proxy_health()
        if health is None or health.get("ok", True):
            return False
        if self.mode == "adaptive":
            self._replan_adaptive()
            return True
        if self.mode in ("proxy", "fmm"):
            return self._reconfigure_far()
        return False

    def _replan_adaptive(self) -> None:
        """Re-run plan_shard_adaptive at the CURRENT distribution: new
        frozen box + residence ranges + capacities, bodies re-permuted
        into the new Morton residence, step/loop caches dropped.  The
        order m is kept: adaptive accuracy is scale-free (the |o| >= 2
        separation ratio does not depend on the box), so growth is a
        pure CAPACITY event; (Ld, L) re-pick for the new occupancy."""
        import dataclasses

        import numpy as np

        from murb_tpu.parallel.shard_adaptive import plan_shard_adaptive

        state = self.bodies                  # identity-order view
        keys = ("m", "r", "qx", "qy", "qz", "vx", "vy", "vz")
        host = {k: np.asarray(getattr(state, k)) for k in keys}
        act = host["m"] > 0
        qh = np.stack([host["qx"], host["qy"], host["qz"]],
                      1).astype(np.float32)
        base = self.adaptive_plan.base
        self.adaptive_plan, perm = plan_shard_adaptive(
            qh, state.npad, self.n_shards, base.m, active=act,
            m2l_rank=base.m2l_rank)
        new = dataclasses.replace(
            state, **{k: jnp.asarray(v[perm]) for k, v in host.items()})
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        self._inv_perm = inv
        self._state = shard_state(new, self.mesh)
        self._step = None
        self._run_cache.clear()

    def _reconfigure_far(self) -> bool:
        """Re-derive the proxy/fmm pick at the grown box (the ctor's
        static rungs; the measured certification applied to the OLD box,
        so it is cleared).  Promotion chain proxy -> fmm -> adaptive
        mirrors the build-time policy ladder."""
        from murb_tpu import DEFAULT_SOFTENING  # noqa: F401  (parity)
        from murb_tpu.ops.fmm import best_depth, fmm_order, required_levels
        from murb_tpu.ops.proxy import half_extent, required_order

        old = (self.mode, getattr(self, "proxy_m", None),
               getattr(self, "fmm_m", None),
               getattr(self, "fmm_levels", None))
        half = half_extent(self._state.unpadded())
        mode = self.mode
        if mode == "proxy":
            m_auto = required_order(half * 1.5, self.soft, 1e-4, margin=0)
            m_auto = (m_auto + 3) // 4 * 4
            if m_auto > 24:
                mode = "fmm"
            else:
                self.proxy_m = m_auto
        if mode == "fmm":
            lv_req = required_levels(half, self.soft)
            if fmm_order(half, self.soft, lv_req, 1e-4) > 16:
                return self._promote_to_adaptive()
            self.fmm_m, self.fmm_levels = best_depth(
                self._state.npad, half, self.soft)
        if (mode, getattr(self, "proxy_m", None),
                getattr(self, "fmm_m", None),
                getattr(self, "fmm_levels", None)) == old:
            return False
        self.mode = mode
        self.validated_err = None
        self.validated_half = None
        self._step = None
        self._run_cache.clear()
        return True

    def _promote_to_adaptive(self) -> bool:
        """proxy/fmm -> adaptive mid-run: the box outgrew every dense
        config (same rung as the ctor's promotion), so build the sharded
        adaptive plan from the current state and switch the step."""
        from murb_tpu.ops.sparse_fmm import SparsePlan, adaptive_order
        from murb_tpu.parallel.shard_adaptive import ShardAdaptivePlan

        self.mode = "adaptive"
        self.proxy_heavy_k = 1
        self.validated_err = None
        self.validated_half = None
        # seed a placeholder so _replan_adaptive can read base.m/rank
        self.adaptive_plan = ShardAdaptivePlan(
            base=SparsePlan(m=adaptive_order(1e-4), dense_levels=2,
                            levels=3, cell_caps=(1,), p2p_pmax=1),
            c=(0.0, 0.0, 0.0), h=1.0, bounds=(0,), local_cap=1,
            export_cap=256, stray_cap=64, concat_pmax=32)
        self._replan_adaptive()
        return True

    def compute_one_iteration(self) -> None:
        if (self.adapt_every and self._iteration
                and self._iteration % self.adapt_every == 0):
            self.maybe_adapt()
        super().compute_one_iteration()

    # ------------------------------------------------------------ step build
    def _local_step_fn(self):
        if self.mode == "allgather":
            return self._allgather_local_step()
        if self.mode == "ring":
            if self.ring_impl == "pipelined":
                return self._ring_pipelined_local_step()
            return self._ring_local_step()
        if self.mode == "uneven":
            return self._uneven_local_step()
        if self.mode == "proxy":
            return self._far_local_step(self._proxy_far_solver())
        if self.mode == "fmm":
            return self._far_local_step(self._fmm_far_solver())
        if self.mode == "adaptive":
            from murb_tpu.parallel.shard_adaptive import make_local_step

            return make_local_step(
                self.adaptive_plan, self.soft, self._dt,
                axis_name=SHARD_AXIS, heavy_k=self.proxy_heavy_k,
                m2l_dots=self.m2l_dots)
        raise ValueError(f"unknown shard mode {self.mode!r}")

    def _make_step(self):
        local = self._local_step_fn()

        spec = P() if self.mode == "uneven" else P(SHARD_AXIS)
        fn = _shard_map(
            local, mesh=self.mesh,
            in_specs=spec, out_specs=(spec, spec),
        )
        return jax.jit(fn, donate_argnums=0)

    def _local_rect(self):
        kern = _rect_kernel(self.kernel_name, self.block_i, self.block_j)
        soft = self.soft
        return lambda qi3, qj3, gmj: kern(*qi3, *qj3, gmj, soft)

    # --------------------------------------------------------- mode: gather
    def _allgather_local_step(self):
        rect = self._local_rect()
        dt = self._dt

        def step(state: BodyState):
            gm_l = jnp.asarray(G, state.dtype) * state.m
            gather = lambda a: jax.lax.all_gather(a, SHARD_AXIS, tiled=True)
            qj = (gather(state.qx), gather(state.qy), gather(state.qz))
            gmj = gather(gm_l)
            acc = rect((state.qx, state.qy, state.qz), qj, gmj)
            return euler_update(state, acc, dt), acc

        return step

    # ----------------------------------------------------------- mode: ring
    def _ring_local_step(self):
        rect = self._local_rect()
        dt = self._dt
        d = self.n_shards
        perm = [(k, (k + 1) % d) for k in range(d)]

        def step(state: BodyState):
            gm_l = jnp.asarray(G, state.dtype) * state.m
            qi = (state.qx, state.qy, state.qz)
            zeros = jnp.zeros_like(state.qx)

            def body(_, carry):
                jx, jy, jz, jgm, ax, ay, az = carry
                a = rect(qi, (jx, jy, jz), jgm)
                rot = lambda x: jax.lax.ppermute(x, SHARD_AXIS, perm)
                return (rot(jx), rot(jy), rot(jz), rot(jgm),
                        ax + a.ax, ay + a.ay, az + a.az)

            init = (state.qx, state.qy, state.qz, gm_l, zeros, zeros, zeros)
            *_, ax, ay, az = jax.lax.fori_loop(0, d, body, init)
            acc = Accel(ax, ay, az)
            return euler_update(state, acc, dt), acc

        return step

    def _ring_pipelined_local_step(self):
        """Fused RDMA ring (ops/ring_pallas.py): one Pallas call per step,
        j-block transfer overlapping the tile sweep.  Off-TPU it runs in
        Pallas TPU interpret mode (simulated DMAs/semaphores) -- correct but
        slow, for tests only."""
        from murb_tpu.ops.ring_pallas import acc_ring_pipelined

        dt = self._dt
        soft = self.soft
        d = self.n_shards
        bi, bj = self.block_i, self.block_j
        if jax.default_backend() == "tpu":
            interp = False
        else:
            import os

            from jax.experimental.pallas import tpu as pltpu

            # MURB_RING_DETECT_RACES=1 turns on the interpreter's DMA/
            # semaphore race detector (slower; used by the multichip dryrun
            # so the driver artifact validates the overlap protocol).
            interp = pltpu.InterpretParams(
                detect_races=bool(os.environ.get("MURB_RING_DETECT_RACES"))
            )

        def step(state: BodyState):
            gm_l = jnp.asarray(G, state.dtype) * state.m
            acc = acc_ring_pipelined(
                state.qx, state.qy, state.qz, gm_l, soft,
                axis_name=SHARD_AXIS, n_devices=d,
                block_i=bi, block_j=bj, interpret=interp,
            )
            return euler_update(state, acc, dt), acc

        return step

    # ----------------------------------------------------- modes: proxy/fmm
    def _proxy_far_solver(self):
        """Far field via ONE global Chebyshev expansion: local P2M, psum of
        the m^3 coefficients, redundant tiny node sweep, local L2P."""
        from murb_tpu.ops.proxy import bases, l2p, m2l, p2m

        m = self.proxy_m
        soft = self.soft

        def solve(qx, qy, qz, gm_eff, c, h, dtype):
            n_local = qx.shape[0]
            fused = jax.default_backend() == "tpu" and n_local % 256 == 0
            if fused:
                from murb_tpu.ops.common import pick_block
                from murb_tpu.ops.proxy_pallas import l2p_fused, p2m_fused

                block = pick_block(n_local, 2048)
                w_local = p2m_fused(qx, qy, qz, gm_eff, c, h, m=m,
                                    block=block)
            else:
                sx, syz = bases(qx, qy, qz, c, h, m)
                w_local = p2m(sx, syz, gm_eff, m)
            w = jax.lax.psum(w_local, SHARD_AXIS)

            f = m2l(c, h, w, soft, m, dtype)      # redundant tiny sweep
            if fused:
                return l2p_fused(qx, qy, qz, c, h, f.ax, f.ay, f.az,
                                 m=m, block=block)
            return l2p(sx, syz, f, m)             # local rows only

        return solve

    def _fmm_far_solver(self):
        """Far field via the L-level hierarchy: local P2M into the finest
        cell grid, ONE psum of the (C^3, m^3) expansion tensor (the only
        collective -- N-independent), redundant M2M/M2L/L2L per shard
        (tiny: the node grids are KBs), local L2P."""
        from murb_tpu.ops.fmm import fmm_field_grid, l2p_grid, p2m_grid
        from murb_tpu.ops.fmm_pallas import fmm_fused_block

        m = self.fmm_m
        levels = self.fmm_levels
        C = 2 ** levels
        soft = self.soft
        m2l_dots = self.m2l_dots

        def solve(qx, qy, qz, gm_eff, c, h, dtype):
            n_local = qx.shape[0]
            block = fmm_fused_block(n_local, m, C)
            if block:
                from murb_tpu.ops.fmm_pallas import (
                    l2p_grid_fused,
                    p2m_grid_fused,
                )

                w_local = p2m_grid_fused(qx, qy, qz, gm_eff, c, h,
                                         m=m, C=C, block=block)
            else:
                w_local = p2m_grid(qx, qy, qz, gm_eff, c, h, m=m, C=C)
            w = jax.lax.psum(w_local, SHARD_AXIS)

            fields = fmm_field_grid(w, h, soft, m=m, levels=levels,
                                    fused=True, m2l_dots=m2l_dots)
            if block:
                out = l2p_grid_fused(qx, qy, qz, c, h, fields, m=m, C=C,
                                     block=block)
            else:
                out = l2p_grid(qx, qy, qz, c, h, fields, m=m, C=C)
            return jnp.stack(out, axis=1)

        return solve

    def _far_local_step(self, far_solver):
        """Shared skeleton of the N-independent-communication modes
        (proxy / fmm): global bounding box (pmin/pmax), globally consistent
        heavy split, the mode's far-field solve, then exact heavy-body
        corrections (heavy sources via the gathered D*k list; heavy targets
        via a psum of local partial rows)."""
        from murb_tpu.ops.proxy import (
            DEFAULT_HEAVY_FACTOR,
            heavy_source_acc,
            heavy_split,
        )

        dt = self._dt
        soft = self.soft
        k = self.proxy_heavy_k
        heavy_factor = DEFAULT_HEAVY_FACTOR

        def step(state: BodyState):
            dtype = state.dtype
            gm_l = jnp.asarray(G, dtype) * state.m
            gm_pos = gm_l > 0
            qx, qy, qz = state.qx, state.qy, state.qz

            # global bounding box (pmin/pmax over the mesh)
            big = jnp.asarray(3.4e38, dtype)
            lo_l = jnp.stack(
                [jnp.min(jnp.where(gm_pos, q, big)) for q in (qx, qy, qz)]
            )
            hi_l = jnp.stack(
                [jnp.max(jnp.where(gm_pos, q, -big)) for q in (qx, qy, qz)]
            )
            lo = jax.lax.pmin(lo_l, SHARD_AXIS)
            hi = jax.lax.pmax(hi_l, SHARD_AXIS)
            c = 0.5 * (lo + hi)
            h = jnp.maximum(0.5 * (hi - lo), jnp.asarray(1.0, dtype))  # (3,)

            # global mean mass -> consistent heavy threshold on all shards
            s_gm = jax.lax.psum(jnp.sum(gm_l), SHARD_AXIS)
            s_cnt = jax.lax.psum(jnp.sum(gm_pos.astype(dtype)), SHARD_AXIS)
            mean_gm = s_gm / jnp.maximum(s_cnt, 1.0)

            # local heavy candidates, gathered into a global D*k list
            hq_l, hgm_l, is_heavy_l, top_idx_l, gm_eff = heavy_split(
                qx, qy, qz, gm_l, k, heavy_factor, mean_gm
            )
            gather = lambda a: jax.lax.all_gather(a, SHARD_AXIS, tiled=True)
            hq_g = (gather(hq_l[0]), gather(hq_l[1]), gather(hq_l[2]))
            hgm_g = gather(hgm_l)

            acc = far_solver(qx, qy, qz, gm_eff, c, h, dtype)
            acc = acc + heavy_source_acc(qx, qy, qz, hq_g, hgm_g, soft)

            # exact forces on the global heavy list: psum of local partials
            ht_part = acc_rect(hq_g[0], hq_g[1], hq_g[2], qx, qy, qz,
                               gm_l, soft)
            ht = jax.lax.psum(
                jnp.stack([ht_part.ax, ht_part.ay, ht_part.az], 1),
                SHARD_AXIS,
            )  # (D*k, 3)
            me = jax.lax.axis_index(SHARD_AXIS)
            start = (me * k).astype(jnp.int32)
            mine = jax.lax.dynamic_slice(ht, (start, jnp.int32(0)), (k, 3))
            acc = acc.at[top_idx_l].set(
                jnp.where(is_heavy_l[:, None], mine, acc[top_idx_l])
            )

            accel = Accel(acc[:, 0], acc[:, 1], acc[:, 2])
            return euler_update(state, accel, dt), accel

        return step

    # --------------------------------------------------------- mode: uneven
    def _uneven_local_step(self):
        """Capability parity with the hetero fraction knob, NOT a scaling
        mode: every shard computes ``cmax`` rows (the largest share, lane-
        padded) against the replicated state and masks unowned rows before
        the psum, so a 0.9 fraction makes every shard do ~90% of the full
        sweep.  Use allgather/ring/proxy for actual multi-chip scaling."""
        rect = self._local_rect()
        dt = self._dt
        d = self.n_shards
        npad = self._state.npad

        # Row ownership fractions: shard 0 gets ``gpu_fraction`` (default
        # 0.60 like MURB_HETERO_GPU_FRACTION), the rest share the remainder.
        f = 1.0 if d == 1 else (
            0.60 if self.gpu_fraction is None else float(self.gpu_fraction)
        )
        counts = [int(round(f * npad))] if d > 1 else [npad]
        if d > 1:
            rest = npad - counts[0]
            for k in range(d - 1):
                counts.append(rest // (d - 1) + (1 if k < rest % (d - 1) else 0))
        starts = [sum(counts[:k]) for k in range(d)]
        # All shards compute the same (max) row-count shape; unowned rows are
        # masked.  Pad to a lane multiple for the rect kernels.
        cmax = min(npad, ((max(counts) + 255) // 256) * 256)
        starts_arr = jnp.asarray(starts, jnp.int32)
        counts_arr = jnp.asarray(counts, jnp.int32)

        def step(state: BodyState):
            gm = jnp.asarray(G, state.dtype) * state.m
            me = jax.lax.axis_index(SHARD_AXIS)
            start = starts_arr[me]
            count = counts_arr[me]
            sstart = jnp.minimum(start, npad - cmax)

            sl = lambda a: jax.lax.dynamic_slice(a, (sstart,), (cmax,))
            qi = (sl(state.qx), sl(state.qy), sl(state.qz))
            a = rect(qi, (state.qx, state.qy, state.qz), gm)

            ridx = sstart + jnp.arange(cmax, dtype=jnp.int32)
            mask = ((ridx >= start) & (ridx < start + count)).astype(state.dtype)
            upd = lambda p: jax.lax.dynamic_update_slice(
                jnp.zeros(npad, state.dtype), p * mask, (sstart,)
            )
            acc = Accel(
                jax.lax.psum(upd(a.ax), SHARD_AXIS),
                jax.lax.psum(upd(a.ay), SHARD_AXIS),
                jax.lax.psum(upd(a.az), SHARD_AXIS),
            )
            return euler_update(state, acc, dt), acc

        return step

    # ------------------------------------------------------------- run fast
    def run(self, n_iterations: int) -> None:
        if n_iterations <= 0:
            return
        if self.adapt_every:
            # segment the loop so re-plan checkpoints land every
            # adapt_every iterations (the ProxyEngine.run pattern)
            done = 0
            while done < n_iterations:
                until = self.adapt_every - self._iteration % self.adapt_every
                k = min(until, n_iterations - done)
                self._run_segment(k)
                done += k
                if done < n_iterations:
                    self.maybe_adapt()
            return
        self._run_segment(n_iterations)

    def _run_segment(self, n_iterations: int) -> None:
        fn = self._run_cache.get("loop")
        if fn is None:
            # Unjitted shard_map'd step for the loop body; one compiled
            # program serves any iteration count (runtime fori bound).
            local = self._local_step_fn()
            spec = P() if self.mode == "uneven" else P(SHARD_AXIS)
            inner_step = _shard_map(
                local, mesh=self.mesh, in_specs=spec, out_specs=(spec, spec)
            )

            @partial(jax.jit, donate_argnums=0)
            def run_loop(state, n):
                def body(_, s):
                    s2, _acc = inner_step(s)
                    return s2

                return jax.lax.fori_loop(0, n, body, state)

            fn = self._run_cache["loop"] = run_loop
        self._state = fn(self._state, n_iterations)
        self._last_acc = None
        self._iteration += n_iterations
