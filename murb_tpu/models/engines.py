"""Concrete engines: the TPU-native ``--im`` registry entries.

Mapping from the reference registry (ref: src/murb/main.cpp:205-270):

  cpu+naive           -> NaiveEngine      (jnp broadcast oracle)
  cpu+nop             -> NopEngine        (harness-overhead baseline)
  cpu+optim/simd/omp  -> ChunkedEngine    (one jitted XLA path: the VPU *is*
                                           the SIMD unit, XLA the OpenMP)
  gpu+tile[+full...]  -> PallasTileEngine (murb_tpu.ops.tile_pallas)
  gpu+tile+full200k   -> MXUEngine        (murb_tpu.ops.mxu)
  gpu+tracking        -> TrackingEngine
  gpu+leapfrog        -> LeapfrogEngine
  mpi / hetero        -> murb_tpu.parallel engines
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from murb_tpu.core.history import SimulationHistory
from murb_tpu.core.integrators import (
    LeapfrogAux,
    euler_update,
    kdk_step,
    leapfrog_first,
    leapfrog_last,
    leapfrog_middle,
    yoshida4_step,
)
from murb_tpu.core import metrics as metrics_mod
from murb_tpu.models.base import EulerAccelEngine, SimulationEngine
from murb_tpu.ops.common import Accel
from murb_tpu.ops.naive import acc_chunked, acc_naive


def _resolve_metric_dtype(metric_dtype):
    """Default metric dtype: f64 whenever the platform provides it (x64
    enabled -- real on CPU, emulated on XLA:TPU), else fp32.  The reference
    computes its metrics in double (ref: main.cpp:247-248); at merger-scale
    units (masses ~1e26 kg) the energy/|L| totals exceed fp32's range
    entirely, so fp32 metrics are a fallback, not the default."""
    if metric_dtype is not None:
        return metric_dtype
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _default_exact_acc(qx, qy, qz, gm, soft):
    """Best exact all-pairs kernel for the backend: the hybrid Pallas
    kernel on the TPU (passes=2, fp32-class ~3e-5 force error, ~5x the
    chunked XLA sweep at N~80k), the chunked sweep elsewhere.  The default
    force path of the integrator/tracking engines when no acc_fn is
    wired (e.g. exact tracked runs on boxes too wide for the proxy)."""
    if jax.default_backend() == "tpu":
        from murb_tpu.ops.hybrid import acc_hybrid

        return acc_hybrid(qx, qy, qz, gm, soft, passes=2)
    return acc_chunked(qx, qy, qz, gm, soft)


def _check_m2l_dots(tier: str) -> str:
    """Validate an FMM level-sweep matmul tier (see ops/fmm.fmm_field_grid)."""
    if tier not in ("fp32", "mixed", "bf16x3"):
        raise ValueError(f"unknown m2l_dots tier: {tier!r}")
    return tier


def _fused_force_phi(qx, qy, qz, gm, soft, fused_proxy_m, fused_fmm,
                     m2l_dots, fused_adaptive=None):
    """(Accel, phi) in ONE far-field pass -- the shared fused
    force+potential dispatch of the tracking engines (single-level proxy,
    L-level hierarchy, or the adaptive sparse hierarchy; see
    ops/proxy.force_and_potential_proxy, ops/fmm.force_and_potential_fmm
    and ops/sparse_fmm.force_and_potential_adaptive)."""
    if fused_adaptive is not None:
        from murb_tpu.ops.sparse_fmm import force_and_potential_adaptive

        return force_and_potential_adaptive(qx, qy, qz, gm, soft,
                                            fused_adaptive,
                                            m2l_dots=m2l_dots)
    if fused_fmm:
        from murb_tpu.ops.fmm import force_and_potential_fmm

        return force_and_potential_fmm(
            qx, qy, qz, gm, soft, m=fused_fmm[0], levels=fused_fmm[1],
            m2l_dots=m2l_dots,
        )
    from murb_tpu.ops.proxy import force_and_potential_proxy

    return force_and_potential_proxy(qx, qy, qz, gm, soft, m=fused_proxy_m)


def _phi_metrics(state, phi, soft, out_dtype, scales=None):
    """(energy, |L|, density center) with the potential already in hand --
    what the fused force+potential pass buys: no second O(N*m^3) sweep.
    ``scales``: dimensionless-reduction unit scales (metrics.MetricScales);
    the engine multiplies them back in host float64."""
    scales = scales or metrics_mod.UNIT_SCALES
    return (
        metrics_mod.energy_from_phi(state, phi, soft, out_dtype,
                                    scales=scales),
        metrics_mod.angular_momentum(state, out_dtype, scales=scales),
        metrics_mod.density_center(state, out_dtype, scales=scales),
    )


def _fused_proxy_health(state, soft, fused_proxy_m, fused_fmm,
                        validated_half=None,
                        fused_adaptive=None) -> dict | None:
    """Validity check for a tracking engine's fused far-field path (same
    contract as ProxyEngine.proxy_health); None when using neither.

    ``validated_half``: when the order came from measured validation
    (ops/validate via the CLI), the config is certified for boxes up to
    this half-extent (certified_half: the rho^-m law with the measured
    prefactor) instead of the static bound, which a descended order
    deliberately sits below."""
    if fused_adaptive is not None:
        import numpy as np

        from murb_tpu.ops.p2p import estimate_brick_pairs
        from murb_tpu.ops.sparse_fmm import level_stats, p2p_capacity_needed

        u = state.unpadded()
        sel = u["m"] > 0
        q = np.stack([u["qx"][sel], u["qy"][sel], u["qz"][sel]],
                     1).astype(np.float32)
        plan = fused_adaptive
        stats = level_stats(q, plan.dense_levels, plan.levels)
        cells_ok = all(nc <= cap for nc, cap in zip(stats, plan.cell_caps))
        npairs = estimate_brick_pairs(q, state.npad, plan.levels)
        pairs_ok = p2p_capacity_needed(npairs, state.npad,
                                       plan) <= plan.p2p_pmax
        return {
            "using_proxy": True,
            "m": plan.m,
            "cells": 1,
            "levels": plan.levels,
            "near": "adaptive",
            "required_m_now": plan.m,
            "n_cells_now": tuple(stats),
            "cell_caps": plan.cell_caps,
            "p2p_pairs_now": npairs,
            "p2p_pmax": plan.p2p_pmax,
            "ok": cells_ok and pairs_ok,
        }
    if not (fused_proxy_m or fused_fmm):
        return None
    from murb_tpu.ops.proxy import half_extent, required_order

    half = half_extent(state.unpadded())
    if fused_fmm:
        from murb_tpu.ops.fmm import fmm_order

        m, levels = fused_fmm
        needed = fmm_order(half, soft, levels)
    else:
        m, levels = fused_proxy_m, 0
        needed = required_order(half, soft)
    if validated_half is not None:
        ok = half <= validated_half
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


class NopEngine(SimulationEngine):
    """Empty engine -- measures harness overhead
    (ref: src/murb/implem/SimulationNBodyNop.cpp:34-36)."""

    tag = "nop"

    def _make_step(self):
        zeros = jnp.zeros_like(self._state.qx)
        acc = Accel(zeros, zeros, zeros)
        return lambda state: (state, acc)

    def run(self, n_iterations: int) -> None:
        self._iteration += n_iterations


class NaiveEngine(EulerAccelEngine):
    """Full-broadcast oracle (ref: SimulationNBodyNaive.cpp:34-53).  The
    correctness reference for every differential test."""

    tag = "xla+naive"

    def _acc_fn(self, qx, qy, qz, gm):
        return acc_naive(qx, qy, qz, gm, self.soft)


class ChunkedEngine(EulerAccelEngine):
    """i-chunked XLA sweep; subsumes the reference's cpu+optim / cpu+simd /
    cpu+omp family (SIMD + threads are XLA's job on TPU, SURVEY.md section 7)."""

    tag = "xla+chunked"

    def __init__(self, bodies, soft=None, dt=None, *, chunk: int = 1024, **kw):
        kwargs = {}
        if soft is not None:
            kwargs["soft"] = soft
        if dt is not None:
            kwargs["dt"] = dt
        super().__init__(bodies, **kwargs, **kw)
        self.chunk = min(chunk, bodies.npad)

    def _acc_fn(self, qx, qy, qz, gm):
        return acc_chunked(qx, qy, qz, gm, self.soft, chunk=self.chunk)


class PallasTileEngine(EulerAccelEngine):
    """Pallas VMEM tile kernel engine -- the analogue of gpu+tile /
    gpu+tile+full (state is always device-resident here, so the "+full"
    distinction of the reference collapses).

    Block geometry: explicit ``block_i``/``block_j`` win; otherwise a
    persisted autotune result for this (kernel, npad, backend) is used when
    one exists, and ``autotune=True`` (or MURB_AUTOTUNE=1) runs the
    first-use sweep (utils/autotune.py) -- the measured replacement for the
    reference's hand-derived thread-count dispatch
    (ref: SimulationNBodyCUDATile.cu:40-52)."""

    tag = "tpu+tile"

    def __init__(self, bodies, soft=None, dt=None, *, block_i: int = 0,
                 block_j: int = 0, autotune: bool | None = None, **kw):
        kwargs = {}
        if soft is not None:
            kwargs["soft"] = soft
        if dt is not None:
            kwargs["dt"] = dt
        super().__init__(bodies, **kwargs, **kw)
        self.block_i = block_i
        self.block_j = block_j
        if not (block_i or block_j):
            self._resolve_blocks(autotune)

    @property
    def _tune_tag(self) -> str:
        return self.tag

    def _resolve_blocks(self, autotune: bool | None) -> None:
        from murb_tpu.utils import autotune as at

        if autotune is None:
            autotune = at.enabled()
        tuned = at.lookup(self._tune_tag, self._state.npad)
        if tuned is None and autotune:
            tuned = self._run_autotune()
        if tuned:
            self.block_i = int(tuned.get("block_i", 0))
            self.block_j = int(tuned.get("block_j", 0))

    def _run_autotune(self) -> dict:
        from murb_tpu.utils import autotune as at

        dt = self._dt

        def make_run(params):
            bi, bj = params["block_i"], params["block_j"]

            def step1(_, st):
                acc = self._acc_blocks(st.qx, st.qy, st.qz, self._gm(st),
                                        bi, bj)
                return euler_update(st, acc, dt)

            @partial(jax.jit, donate_argnums=0)
            def run(st, n):
                return jax.lax.fori_loop(0, n, step1, st)

            return run

        state0 = jax.tree.map(lambda a: jnp.array(a, copy=True), self._state)
        return at.tune(self._tune_tag, self._state.npad, make_run, state0)

    def _acc_blocks(self, qx, qy, qz, gm, bi, bj):
        from murb_tpu.ops.tile_pallas import acc_tile

        return acc_tile(qx, qy, qz, gm, self.soft, block_i=bi, block_j=bj)

    def _acc_fn(self, qx, qy, qz, gm):
        return self._acc_blocks(qx, qy, qz, gm, self.block_i, self.block_j)


class HybridEngine(PallasTileEngine):
    """VPU+MXU hybrid kernel engine -- the single-chip flagship, replacing
    the reference's gpu+tile+full / gpu+tile+full200k CUDA kernels.
    ``passes=2`` selects the high-accuracy two-pass bf16 reduction;
    ``passes=3`` the extended tier (exact-fp32 MXU operands + Kahan blocks,
    the `double`-instantiation analogue).  fp64 state defaults to 3."""

    tag = "tpu+hybrid"

    def __init__(self, bodies, soft=None, dt=None, *,
                 passes: int | None = None, **kw):
        # Wide blocks want divisor-rich padding; ghosts are inert.
        if bodies.npad >= 8192:
            bodies = bodies.repad(2048)
        if passes is None:
            passes = 3 if jnp.dtype(bodies.qx.dtype) == jnp.float64 else 2
        self.passes = passes  # _resolve_blocks may time the kernel
        super().__init__(bodies, soft, dt, **kw)

    @property
    def _tune_tag(self) -> str:
        return f"{self.tag}/p{self.passes}"  # 1- and 2-pass tune separately

    def _acc_blocks(self, qx, qy, qz, gm, bi, bj):
        from murb_tpu.ops.hybrid import acc_hybrid

        return acc_hybrid(qx, qy, qz, gm, self.soft,
                          block_i=bi, block_j=bj, passes=self.passes)


class MXUEngine(PallasTileEngine):
    """MXU (systolic-array) all-pairs engine -- the large-N flagship, the
    analogue of gpu+tile+full200k."""

    tag = "tpu+mxu"

    def __init__(self, bodies, soft=None, dt=None, *, precision: str = "high",
                 **kw):
        self.precision = precision  # _resolve_blocks may time the kernel
        super().__init__(bodies, soft, dt, **kw)

    def _acc_blocks(self, qx, qy, qz, gm, bi, bj):
        from murb_tpu.ops.mxu import acc_mxu

        return acc_mxu(qx, qy, qz, gm, self.soft,
                       block_i=bi, block_j=bj, precision=self.precision)


class ProxyEngine(EulerAccelEngine):
    """Chebyshev-proxy fast solver family (see ops/proxy.py, ops/fmm.py).

    Auto policy from the initial bounding box and force tolerance:
      * single global expansion (O(N*m^3)) while the box admits m <= 20;
      * the L-level hierarchy (true bbFMM, ops/fmm.py) for larger
        box-to-softening ratios -- scale-free, so there is no exact-kernel
        fallback for big boxes anymore;
      * the exact hybrid kernel only when N is so small that the node work
        would dominate (cost model below) -- check ``engine.using_proxy``.
    ``cells=2`` keeps the legacy octant mode; ``levels=L`` forces the
    hierarchy explicitly.
    """

    tag = "tpu+proxy"

    def __init__(self, bodies, soft=None, dt=None, *, m: int = 0,
                 cells: int = 0, levels: int = 0, tol: float = 1e-4,
                 max_m: int = 32, heavy_k: int = 1, box_margin: float = 1.5,
                 adapt_every: int = 0, cost_slack: float = 30.0,
                 m2l_dots: str = "fp32", block: int = 0, m2l_tile: int = 0,
                 autotune: bool | None = None, validate: bool = True,
                 near: str = "auto", **kw):
        kwargs = {}
        if soft is not None:
            kwargs["soft"] = soft
        if dt is not None:
            kwargs["dt"] = dt
        # wide blocks for the exact-kernel fallback path
        if bodies.npad >= 8192:
            bodies = bodies.repad(2048)
        SimulationEngine.__init__(self, bodies, **kwargs, **kw)
        self.tol = tol
        self.max_m = max_m
        self.box_margin = box_margin
        self.heavy_k = heavy_k
        self.adapt_every = int(adapt_every)
        self.cost_slack = cost_slack
        self.m2l_dots = _check_m2l_dots(m2l_dots)
        self.block = int(block)
        self.m2l_tile = int(m2l_tile)
        self.validate = bool(validate)
        self.validated_err: float | None = None
        self.validated_half: float | None = None
        if near not in ("auto", "interp", "adaptive"):
            raise ValueError(f"unknown near mode: {near!r} "
                             "(auto | interp | adaptive)")
        self.near = near
        self.near_mode = "interp"   # resolved: "interp" | "adaptive"
        self._plan = None           # SparsePlan when near_mode=="adaptive"
        self._auto = m == 0 and levels == 0
        if self._auto:
            self._configure()
        else:
            if m and levels == 0 and cells == 0:
                cells = 1
            self.m = int(m)
            self.levels = int(levels)
            self.cells = int(cells or 1)
            self.using_proxy = self.m <= max_m
            if near == "adaptive":
                self._configure_adaptive(force=True)
        if not (block or m2l_tile):
            self._resolve_fast_blocks(autotune)

    def _configure(self) -> None:
        """Derive (m, levels/cells, using_proxy) from the CURRENT box --
        the auto policy, shared by construction and mid-run adaptation."""
        from murb_tpu.ops.proxy import half_extent, required_order

        round4 = lambda x: (x + 3) // 4 * 4
        half = half_extent(self._state.unpadded())
        # Prefer a single global expansion (box-growth margin applied);
        # larger boxes go to the multi-level hierarchy, whose finest
        # cells restore a ~ 1 at any scale.  margin=0: the box_margin
        # factor already pads for growth, and the +2 default on top of it
        # was measured pure waste -- at the N=200k galaxy the double
        # margin picks m=20 while m=16 (this policy) and even m=14 sit at
        # the fp32 error floor of 1.7e-5 (scripts/order_error_probe.py);
        # round4 keeps the pick lane-aligned (m=16 = 4096 nodes is also
        # the fastest measured block geometry).
        m1 = round4(required_order(half * self.box_margin, self.soft,
                                   self.tol, margin=0))
        self.near_mode, self._plan = "interp", None
        if m1 <= 20:
            m, levels, cells = m1, 0, 1
        else:
            m, levels = self._best_depth(half)
            cells = 1
        self.m = int(m)
        self.levels = int(levels)
        self.cells = int(cells)
        self._apply_cost_model()
        if self.near == "adaptive" or (self.near == "auto"
                                       and not self.using_proxy):
            # the interp policy rejected every dense config (clustered
            # box: finest-cell requirement explodes the grid) -- try the
            # adaptive sparse hierarchy before the exact fallback
            self._configure_adaptive(force=self.near == "adaptive")
        if self.using_proxy and self.validate:
            if self.near_mode == "adaptive":
                self._validate_adaptive()
            else:
                self._validate_order(half)

    def _active_q(self):
        """(n_active, 3) float32 massive-body positions (host) -- the
        input of the adaptive planner / health replica."""
        import numpy as np

        u = self._state.unpadded()
        sel = u["m"] > 0
        return np.stack([u["qx"][sel], u["qy"][sel], u["qz"][sel]],
                        1).astype(np.float32)

    def _configure_adaptive(self, force: bool = False) -> None:
        """Plan the adaptive sparse hierarchy (ops/sparse_fmm) for the
        current distribution; adopt it when its measured-rate cost model
        beats the exact kernel (or unconditionally when forced by
        ``near='adaptive'``).  At small N the exact kernel at the VPU
        ceiling wins and this honestly declines (measured: the 82k
        merger runs 24 ms exact vs 116 ms adaptive; N=1M clustered flips
        it, 4.75 s exact vs 2.24 s)."""
        from murb_tpu.ops.sparse_fmm import (
            adaptive_order,
            best_adaptive_plan,
            exact_cost_ms,
        )

        q = self._active_q()
        explicit = not self._auto
        m0 = self.m if (explicit and self.m) else adaptive_order(self.tol)
        if explicit and self.levels:
            from murb_tpu.ops.sparse_fmm import plan_adaptive

            Ld = min(3, self.levels - 1)
            plan = plan_adaptive(q, self._state.npad, m0, Ld, self.levels)
            est_ms = 0.0
        else:
            plan, est_ms = best_adaptive_plan(q, self._state.npad, m0)
        if not force and est_ms >= min(1.0, self.cost_slack / 30.0) \
                * exact_cost_ms(self._state.npad):
            return  # exact fallback stays the honest pick
        self._plan = plan
        self.near_mode = "adaptive"
        self.m, self.levels, self.cells = plan.m, plan.levels, 1
        self.using_proxy = True

    def _plan_at(self, m: int, rank: int | None = None):
        """The current plan re-ordered (geometry/capacities are
        m-independent, so validation rungs reuse them); ``rank``
        optionally overrides the M2L compression rank."""
        plan = self._plan._replace(m=int(m))
        if rank is not None:
            plan = plan._replace(m2l_rank=rank)
        return plan

    def _validate_adaptive(self) -> None:
        """Measured-order selection for the adaptive solver: the far
        shell's convergence is scale-free (|o| >= 2 separation), so the
        ladder moves m only -- depth is the cost model's job.  Escalate
        by 2 until the measured error meets tol (cap 12), then descend
        off a passing first trial (floor 4)."""
        from murb_tpu.ops.sparse_fmm import acc_adaptive
        from murb_tpu.ops.validate import measured_force_error

        st = self._state
        gm = self._gm(st)

        def err_at(m, rank=None, dots=None):
            plan = self._plan_at(m, rank)
            tier = dots or self.m2l_dots

            def acc(qx, qy, qz, g):
                return acc_adaptive(qx, qy, qz, g, self.soft, plan,
                                    heavy_k=self.heavy_k,
                                    m2l_dots=tier)

            return measured_force_error(st.qx, st.qy, st.qz, gm,
                                        self.soft, acc)

        m = self.m
        err = err_at(m)
        if err <= self.tol:
            while m - 2 >= 4:
                derr = err_at(m - 2)
                if derr > self.tol:
                    break
                m, err = m - 2, derr
        else:
            # M2L compression truncation does NOT shrink with m (the
            # shared-basis rank is per-m): when the first rung misses
            # tol with compression active, drop compression BEFORE
            # escalating m -- otherwise the ladder burns rungs on an
            # error floor m cannot fix (measured round 4: rank-128 at
            # m=12 floored at 1.9e-4).
            from murb_tpu.ops.sparse_fmm import default_m2l_rank

            eff = self._plan.m2l_rank
            if eff < 0:
                eff = default_m2l_rank(m)
            if eff > 0:
                err0 = err_at(m, rank=0)
                if err0 < err:
                    self._plan = self._plan._replace(m2l_rank=0)
                    err = err0
            # Same discipline for the dot tiers: bf16x3's |o|=2-shell
            # rounding floor (~3e-4 class) does not shrink with m either
            # -- on a first-rung miss, step the tier toward fp32
            # (bf16x3 -> mixed -> fp32) before burning escalation rungs.
            _stronger = {"bf16x3": "mixed", "mixed": "fp32"}
            while err > self.tol and self.m2l_dots in _stronger:
                tier = _stronger[self.m2l_dots]
                errt = err_at(m, dots=tier)
                if errt >= err:
                    break
                print(f"adaptive validation: m2l_dots={self.m2l_dots} "
                      f"floors at {err:.1e} > tol; dropping to {tier} "
                      f"({errt:.1e})")
                self.m2l_dots, err = tier, errt
            while err > self.tol and m + 2 <= 12:
                m += 2
                err = err_at(m)
            if err > self.tol:
                print(f"WARNING: adaptive-solver validation missed "
                      f"tol={self.tol:.1e} at m={m} "
                      f"(measured err {err:.1e}); keeping m={m}")
        self.m = int(m)
        self._plan = self._plan_at(m)
        self.validated_err = err
        # scale-free accuracy: box growth never invalidates the order;
        # proxy_health watches the CAPACITIES instead
        self.validated_half = None

    def _apply_cost_model(self) -> None:
        # Cost model: the proxy must not be drastically costlier than
        # the exact sweep (at small N the node work dominates).  Rough
        # op counts; the generous slack keeps the reference's small
        # differential cases (N=2048 galaxy, ~17x) on the proxy path
        # while rejecting pathological ones (small-N multi-cell modes).
        self.using_proxy = self.m <= self.max_m
        if self.using_proxy:
            n = self._state.npad
            if self.levels:
                cgrid = 8 ** self.levels
                est = 8 * n * self.m**3 + 686 * cgrid * self.m**6
            else:
                p_tot = self.cells**3 * self.m**3
                est = self.cells**3 * 8 * n * self.m**3 + 14 * p_tot**2
            est_direct = 14 * n * n
            if est > self.cost_slack * est_direct:
                self.using_proxy = False

    def _validate_order(self, half: float) -> None:
        """Measured-order selection (ops/validate): the static pick is a
        calibrated GUESS -- its error prefactor is distribution-dependent
        (concentrated two-cluster boxes measure 30x over the uncalibrated
        bound, scripts/order_calib_probe3.py) -- so measure the configured
        solver against an exact strided sample and escalate until the tol
        contract is met.  On the happy path this is one dispatch of the
        same executable the run needs anyway; only distributions that
        genuinely need a higher order pay for extra trials."""
        from murb_tpu.ops.validate import validate_config

        st = self._state
        gm = self._gm(st)

        def make_acc(m, levels, cells):
            def acc(qx, qy, qz, g):
                if levels:
                    from murb_tpu.ops.fmm import acc_fmm

                    return acc_fmm(qx, qy, qz, g, self.soft, m=m,
                                   levels=levels, heavy_k=self.heavy_k,
                                   m2l_dots=self.m2l_dots)
                from murb_tpu.ops.proxy import acc_proxy

                return acc_proxy(qx, qy, qz, g, self.soft, m=m,
                                 heavy_k=self.heavy_k, cells=cells)

            return acc

        m, levels, cells, err = validate_config(
            st.qx, st.qy, st.qz, gm, self.soft, self.tol,
            self.m, self.levels, self.cells, half, make_acc)
        # Lossy M2L dot tiers floor independently of order (the dense
        # bf16x3 tier measures ~3e-4-class on the |o|=2 shell): when the
        # ladder lands above tol on a hierarchy config under a lossy
        # tier, re-run it one tier stronger (bf16x3 -> mixed -> fp32)
        # instead of shipping the miss -- the adaptive ladder's
        # tier-drop discipline on the dense path.
        _stronger = {"bf16x3": "mixed", "mixed": "fp32"}
        while (err > self.tol and levels
               and self.m2l_dots in _stronger):
            old = self.m2l_dots
            self.m2l_dots = _stronger[old]
            m2, l2, c2, err2 = validate_config(
                st.qx, st.qy, st.qz, gm, self.soft, self.tol,
                self.m, self.levels, self.cells, half, make_acc)
            if err2 < err:
                print(f"hierarchy validation: m2l_dots={old} floors at "
                      f"{err:.1e} > tol; dropping to {self.m2l_dots} "
                      f"({err2:.1e})")
                m, levels, cells, err = m2, l2, c2, err2
            else:
                self.m2l_dots = old
                break
        self.validated_err = err
        from murb_tpu.ops.validate import certified_half
        self.validated_half = certified_half(m, levels, float(half), err,
                                             self.soft, self.tol)
        if (m, levels, cells) != (self.m, self.levels, self.cells):
            self.m, self.levels, self.cells = int(m), int(levels), int(cells)
            self._apply_cost_model()

    def _best_depth(self, half: float) -> tuple[int, int]:
        """(m, levels) from the shared depth-cost policy (ops/fmm.best_depth:
        depth-for-order trade calibrated against on-chip measurements)."""
        from murb_tpu.ops.fmm import best_depth

        return best_depth(self._state.npad, half, self.soft, self.tol)

    @property
    def _fast_tune_tag(self) -> str:
        """Per-geometry tune key: the stage shapes depend on (m, levels),
        not just npad."""
        return f"{self.tag}/m{self.m}L{self.levels}c{self.cells}"

    def _resolve_fast_blocks(self, autotune: bool | None) -> None:
        """Measured stage geometry for the fast solver (round-2 VERDICT
        item 8): the anterpolation block and (hierarchy only) the fused-M2L
        row tile, swept with the same steady-state discipline as the exact
        kernels' block autotuner and persisted per (tag, m, levels, npad,
        backend).  Off-path configs (exact fallback, adaptive mode,
        non-TPU) skip -- the adaptive solver has no dense fused stages."""
        from murb_tpu.utils import autotune as at

        if not self.using_proxy or self.near_mode == "adaptive":
            return
        if autotune is None:
            autotune = at.enabled()
        tuned = at.lookup(self._fast_tune_tag, self._state.npad)
        if tuned is None and autotune:
            import jax as _jax

            if _jax.default_backend() != "tpu":
                return  # the fused stages only exist on the TPU backend
            tuned = self._run_fast_autotune()
        if tuned:
            self.block = int(tuned.get("block", 0))
            self.m2l_tile = int(tuned.get("m2l_tile", 0))

    def _fast_candidates(self) -> list[dict]:
        npad = self._state.npad
        if self.levels:
            blocks = [b for b in (256, 512, 1024) if npad % b == 0]
            return [{"block": b, "m2l_tile": t}
                    for b in (blocks or [0]) for t in (128, 256)]
        blocks = [b for b in (1024, 2048, 4096) if npad % b == 0]
        return [{"block": b} for b in (blocks or [0])]

    def _run_fast_autotune(self) -> dict:
        from murb_tpu.utils import autotune as at

        dt = self._dt

        def make_run(params):
            blk = params.get("block", 0)
            tile = params.get("m2l_tile", 0)

            def step1(_, st):
                acc = self._acc_solver(st.qx, st.qy, st.qz, self._gm(st),
                                       blk, tile)
                return euler_update(st, acc, dt)

            @partial(jax.jit, donate_argnums=0)
            def run(st, n):
                return jax.lax.fori_loop(0, n, step1, st)

            return run

        state0 = jax.tree.map(lambda a: jnp.array(a, copy=True), self._state)
        return at.tune(self._fast_tune_tag, self._state.npad, make_run,
                       state0)

    def maybe_adapt(self) -> bool:
        """Mid-run order adaptation: when the system expanded past the
        compiled order's validity (proxy_health not ok), re-derive the mode
        from the current box and rebuild the jitted step.  Returns True if
        the engine was reconfigured.  Only grows/changes on *invalid*
        configs -- a valid one is never churned (no compile oscillation).
        Syncs the device; call between frames, not inside jit."""
        if not self._auto or self.proxy_health()["ok"]:
            return False
        old = (self.m, self.levels, self.cells, self.using_proxy,
               self.near_mode, self._plan)
        self._configure()
        if (self.m, self.levels, self.cells, self.using_proxy,
                self.near_mode, self._plan) == old:
            return False
        # stage geometry is per-(m, levels); re-lookup (never sweep mid-run)
        self.block = self.m2l_tile = 0
        self._resolve_fast_blocks(autotune=False)
        self._step = None
        self._run_cache.clear()
        return True

    def compute_one_iteration(self) -> None:
        if (self.adapt_every and self._iteration
                and self._iteration % self.adapt_every == 0):
            self.maybe_adapt()
        super().compute_one_iteration()

    def run(self, n_iterations: int) -> None:
        if not self.adapt_every:
            return super().run(n_iterations)
        # segment the loop so adaptation checkpoints land every adapt_every
        done = 0
        while done < n_iterations:
            until_check = self.adapt_every - self._iteration % self.adapt_every
            k = min(until_check, n_iterations - done)
            super().run(k)
            done += k
            if done < n_iterations:
                self.maybe_adapt()

    def _acc_solver(self, qx, qy, qz, gm, block: int, m2l_tile: int):
        if not self.using_proxy:
            # exact-kernel fallback (state already repadded for wide blocks)
            from murb_tpu.ops.hybrid import acc_hybrid

            return acc_hybrid(qx, qy, qz, gm, self.soft, passes=2)
        if self.near_mode == "adaptive":
            from murb_tpu.ops.sparse_fmm import acc_adaptive

            return acc_adaptive(qx, qy, qz, gm, self.soft, self._plan,
                                heavy_k=self.heavy_k,
                                m2l_dots=self.m2l_dots)
        if self.levels:
            from murb_tpu.ops.fmm import acc_fmm

            return acc_fmm(qx, qy, qz, gm, self.soft, m=self.m,
                           levels=self.levels, heavy_k=self.heavy_k,
                           m2l_dots=self.m2l_dots, block=block,
                           m2l_tile=m2l_tile)
        from murb_tpu.ops.proxy import acc_proxy

        return acc_proxy(qx, qy, qz, gm, self.soft, m=self.m,
                         heavy_k=self.heavy_k, cells=self.cells,
                         block=block)

    def _acc_fn(self, qx, qy, qz, gm):
        return self._acc_solver(qx, qy, qz, gm, self.block, self.m2l_tile)

    def proxy_health(self) -> dict:
        """Is the design order still adequate for the CURRENT box?  The
        order is compiled in; if the system expanded past the design margin
        this reports the order it would need now (syncs the device).

        Adaptive mode: accuracy is scale-free, so health is CAPACITY --
        the evolving distribution must still fit the compiled occupied-
        cell and P2P-pair capacities (host replica of the device
        structures)."""
        from murb_tpu.ops.fmm import fmm_order
        from murb_tpu.ops.proxy import half_extent, required_order

        if self.near_mode == "adaptive":
            from murb_tpu.ops.p2p import estimate_brick_pairs
            from murb_tpu.ops.sparse_fmm import (
                level_stats,
                p2p_capacity_needed,
            )

            plan = self._plan
            q = self._active_q()
            stats = level_stats(q, plan.dense_levels, plan.levels)
            cells_ok = all(nc <= cap for nc, cap
                           in zip(stats, plan.cell_caps))
            npairs = estimate_brick_pairs(q, self._state.npad,
                                          plan.levels)
            pairs_ok = p2p_capacity_needed(npairs, self._state.npad,
                                           plan) <= plan.p2p_pmax
            return {
                "using_proxy": True,
                "m": self.m,
                "cells": 1,
                "levels": plan.levels,
                "near": "adaptive",
                "required_m_now": self.m,   # scale-free
                "n_cells_now": tuple(stats),
                "cell_caps": plan.cell_caps,
                "p2p_pairs_now": npairs,
                "p2p_pmax": plan.p2p_pmax,
                "ok": cells_ok and pairs_ok,
            }

        half = half_extent(self._state.unpadded())
        if self.levels:
            needed = fmm_order(half, self.soft, self.levels)
        else:
            needed = required_order(half / self.cells, self.soft)
        if self.validated_half is not None:
            # Measured contract (ops/validate.certified_half): the config
            # was measured against an exact sample and is certified for
            # boxes up to where the rho^-m law with the MEASURED prefactor
            # hits tol -- the static bound no longer applies (descent
            # deliberately sits below it).  Past that, maybe_adapt
            # re-measures at the grown box.
            ok = half <= self.validated_half
        else:
            ok = needed <= self.m
        return {
            "using_proxy": self.using_proxy,
            "m": self.m,
            "cells": self.cells,
            "levels": self.levels,
            "required_m_now": needed,
            "ok": (not self.using_proxy) or ok,
        }



class KDKEngine(SimulationEngine):
    """Textbook kick-drift-kick symplectic integrator over any kernel."""

    tag = "tpu+kdk"
    _integrator = staticmethod(kdk_step)

    def __init__(self, bodies, acc_fn=None, **kw):
        super().__init__(bodies, **kw)
        self._acc = acc_fn  # (qx, qy, qz, gm, soft) -> Accel

    def _acc_fn(self, qx, qy, qz, gm):
        fn = self._acc or _default_exact_acc
        return fn(qx, qy, qz, gm, self.soft)

    def _make_step(self):
        dt = self._dt
        integ = type(self)._integrator

        def step(state):
            gm = self._gm(state)
            acc_at = lambda x, y, z: self._acc_fn(x, y, z, gm)
            return integ(state, acc_at, dt), None

        return jax.jit(step, donate_argnums=0)

    def run(self, n_iterations: int) -> None:
        if n_iterations <= 0:
            return
        fn = self._run_cache.get("loop")
        if fn is None:
            dt = self._dt
            integ = type(self)._integrator

            def body(_, state):
                gm = self._gm(state)
                acc_at = lambda x, y, z: self._acc_fn(x, y, z, gm)
                return integ(state, acc_at, dt)

            @partial(jax.jit, donate_argnums=0)
            def run_loop(state, n):
                return jax.lax.fori_loop(0, n, body, state)

            fn = self._run_cache["loop"] = run_loop
        self._state = fn(self._state, n_iterations)
        self._iteration += n_iterations


class Yoshida4Engine(KDKEngine):
    """4th-order symplectic integrator (Yoshida triple-jump): three force
    evaluations per step for an O(dt^4) energy error -- the high-accuracy
    rung above the leapfrog family (`core/integrators.yoshida4_step`)."""

    tag = "tpu+yoshida4"
    _integrator = staticmethod(yoshida4_step)


class LeapfrogEngine(SimulationEngine):
    """Phase-split leapfrog: one force evaluation per iteration, dispatching
    first/middle/last by the host-side iteration counter exactly like the
    reference dispatch (ref: src/common/core/CUDABodies.cu:327-351) -- zero
    traced control flow.  Requires the total iteration count up front
    (ref ctor: SimulationNBodyCUDALeapfrog.hpp:27-30; the reference CLI passes
    its arguments in the wrong order -- fixed here, see SURVEY.md 2.10.1).
    """

    tag = "tpu+leapfrog"

    def __init__(self, bodies, soft=None, dt=None, *, num_iterations: int,
                 acc_fn=None, **kw):
        kwargs = {}
        if soft is not None:
            kwargs["soft"] = soft
        if dt is not None:
            kwargs["dt"] = dt
        # Divisor-rich padding for the fast-solver block geometry (see
        # TrackingEngine.__init__; the leapfrog phases run the same fused
        # proxy/fmm kernels via fused_proxy_m / acc_fn).
        if bodies.npad >= 8192:
            bodies = bodies.repad(2048)
        super().__init__(bodies, **kwargs, **kw)
        self.num_iterations = int(num_iterations)
        self._acc = acc_fn
        self._aux = LeapfrogAux.zeros_like(bodies)
        self._phase_steps = None

    def _acc_fn(self, qx, qy, qz, gm):
        fn = self._acc or _default_exact_acc
        return fn(qx, qy, qz, gm, self.soft)

    def _build_phase_steps(self):
        dt = self._dt

        @partial(jax.jit, donate_argnums=(0, 1))
        def first(state, aux):
            acc = self._acc_fn(state.qx, state.qy, state.qz, self._gm(state))
            new_state, new_aux = leapfrog_first(state, aux, acc, dt)
            return new_state, new_aux, acc

        @partial(jax.jit, donate_argnums=(0, 1))
        def middle(state, aux):
            acc = self._acc_fn(aux.nqx, aux.nqy, aux.nqz, self._gm(state))
            new_state, new_aux = leapfrog_middle(state, aux, acc, dt)
            return new_state, new_aux, acc

        @partial(jax.jit, donate_argnums=(0, 1))
        def last(state, aux):
            acc = self._acc_fn(aux.nqx, aux.nqy, aux.nqz, self._gm(state))
            new_state, new_aux = leapfrog_last(state, aux)
            return new_state, new_aux, acc

        return first, middle, last

    def compute_one_iteration(self):
        if self._phase_steps is None:
            self._phase_steps = self._build_phase_steps()
        first, middle, last = self._phase_steps
        if self._iteration == 0:
            fn = first
        elif self._iteration < self.num_iterations - 1:
            fn = middle
        else:
            fn = last
        self._state, self._aux, self._last_acc = fn(self._state, self._aux)
        self._iteration += 1

    def run(self, n_iterations: int) -> None:
        """Fast path: the first/last phases run stepwise, the middle phases
        collapse into one jitted fori_loop (one device dispatch, mirroring
        the phase dispatch at ref: CUDABodies.cu:327-351)."""
        end = self._iteration + n_iterations
        if self._iteration == 0 and end > self._iteration:
            self.compute_one_iteration()  # first phase
        n_mid = min(end, self.num_iterations - 1) - self._iteration
        if n_mid > 0:
            fn = self._run_cache.get("midloop")
            if fn is None:
                dt = self._dt

                def body(_, carry):
                    state, aux = carry
                    acc = self._acc_fn(aux.nqx, aux.nqy, aux.nqz,
                                       self._gm(state))
                    return leapfrog_middle(state, aux, acc, dt)

                @partial(jax.jit, donate_argnums=(0, 1))
                def run_mid(state, aux, n):
                    return jax.lax.fori_loop(0, n, body, (state, aux))

                fn = self._run_cache["midloop"] = run_mid
            self._state, self._aux = fn(self._state, self._aux, n_mid)
            self._last_acc = None
            self._iteration += n_mid
        while self._iteration < end:
            self.compute_one_iteration()  # last phase(s)


class LeapfrogTrackingEngine(LeapfrogEngine):
    """Phase-split leapfrog WITH fused conserved-quantity tracking -- the
    capability the reference ships disabled (its leapfrog engine carries
    metrics kernels that are commented out, ref:
    SimulationNBodyCUDALeapfrog.cu:140-143).

    Metrics are evaluated at the *visible* state each phase produces, which
    for middle phases is the synchronized (x_n, v_n) pair -- the physically
    meaningful point for energy/|L| (half-step velocities would mix time
    levels).  Under ``run()`` the middle phases collapse into one fori_loop
    writing metrics into a capacity-sized device buffer, same structure as
    TrackingEngine._tracked_run_loop.

    ``fused_proxy_m`` / ``fused_fmm`` fuse the potential into the force
    sweep (ONE far-field pass per iteration, mirroring TrackingEngine).
    The fusion is exact for every phase: the force positions equal the new
    visible state's positions by construction (first: x_0; middle/last:
    the x_n buffer becomes the visible q), so phi evaluated where the
    force is evaluated IS phi at the metrics state.
    """

    tag = "tpu+leapfrog+tracking"

    def __init__(self, bodies, soft=None, dt=None, *, num_iterations: int,
                 history: SimulationHistory | None = None, acc_fn=None,
                 metric_dtype=None, metrics_method: str = "exact",
                 metrics_proxy_m: int = 16, fused_proxy_m: int = 0,
                 fused_fmm: tuple = (), fused_adaptive=None,
                 m2l_dots: str = "fp32",
                 validated_half: float | None = None, **kw):
        super().__init__(bodies, soft, dt, num_iterations=num_iterations,
                         acc_fn=acc_fn, **kw)
        self.history = history or SimulationHistory(num_iterations)
        if self.history.num_iterations < num_iterations:
            self.history.set_num_iterations(num_iterations)
        self._metric_dtype = _resolve_metric_dtype(metric_dtype)
        self._metrics_method = metrics_method
        self._metrics_proxy_m = metrics_proxy_m
        if sum(map(bool, (fused_proxy_m, fused_fmm,
                          fused_adaptive is not None))) > 1:
            raise ValueError("fused_proxy_m / fused_fmm / fused_adaptive "
                             "are exclusive")
        self._fused_proxy_m = fused_proxy_m
        self._fused_fmm = tuple(fused_fmm)  # (m, levels) or ()
        self._fused_adaptive = fused_adaptive  # SparsePlan or None
        self._m2l_dots = _check_m2l_dots(m2l_dots)
        self._validated_half = validated_half
        self._mscales = metrics_mod.metric_scales(self._state)

    def _metrics(self, state):
        return metrics_mod.all_metrics(
            state, self.soft, out_dtype=self._metric_dtype,
            method=self._metrics_method, proxy_m=self._metrics_proxy_m,
            scales=self._mscales,
        )

    def _phase_force_mets(self, px, py, pz, gm, finish):
        """Shared phase body: force (and fused phi) at positions p, then
        ``finish(acc) -> (new_state, new_aux)``, then metrics at the new
        visible state (whose positions are p -- see class docstring)."""
        if (self._fused_proxy_m or self._fused_fmm
                or self._fused_adaptive is not None):
            acc, phi = _fused_force_phi(
                px, py, pz, gm, self.soft,
                self._fused_proxy_m, self._fused_fmm, self._m2l_dots,
                self._fused_adaptive,
            )
            ns, na = finish(acc)
            return ns, na, acc, _phi_metrics(ns, phi, self.soft,
                                             self._metric_dtype,
                                             self._mscales)
        acc = self._acc_fn(px, py, pz, gm)
        ns, na = finish(acc)
        return ns, na, acc, self._metrics(ns)

    def proxy_health(self) -> dict | None:
        """Validity check for the fused far-field path (same contract as
        ProxyEngine.proxy_health); None when using neither."""
        return _fused_proxy_health(self._state, self.soft,
                                   self._fused_proxy_m, self._fused_fmm,
                                   self._validated_half,
                                   self._fused_adaptive)

    def _build_phase_steps(self):
        dt = self._dt

        @partial(jax.jit, donate_argnums=(0, 1))
        def first(state, aux):
            return self._phase_force_mets(
                state.qx, state.qy, state.qz, self._gm(state),
                lambda acc: leapfrog_first(state, aux, acc, dt),
            )

        @partial(jax.jit, donate_argnums=(0, 1))
        def middle(state, aux):
            return self._phase_force_mets(
                aux.nqx, aux.nqy, aux.nqz, self._gm(state),
                lambda acc: leapfrog_middle(state, aux, acc, dt),
            )

        @partial(jax.jit, donate_argnums=(0, 1))
        def last(state, aux):
            return self._phase_force_mets(
                aux.nqx, aux.nqy, aux.nqz, self._gm(state),
                lambda acc: leapfrog_last(state, aux),
            )

        return first, middle, last

    def _record(self, i, mets):
        if i >= self.history.num_iterations:
            return
        e, l, dc = mets
        self.history.set_energy_at(
            i, float(e) * self._mscales.energy_scale)
        self.history.set_ang_momentum_at(
            i, float(l) * self._mscales.ang_momentum_scale)
        self.history.set_density_center_at(i, jax.device_get(dc))

    def compute_one_iteration(self):
        if self._phase_steps is None:
            self._phase_steps = self._build_phase_steps()
        first, middle, last = self._phase_steps
        if self._iteration == 0:
            fn = first
        elif self._iteration < self.num_iterations - 1:
            fn = middle
        else:
            fn = last
        self._state, self._aux, self._last_acc, mets = fn(
            self._state, self._aux
        )
        self._record(self._iteration, mets)
        self._iteration += 1

    def run(self, n_iterations: int) -> None:
        end = self._iteration + n_iterations
        if self._iteration == 0 and end > self._iteration:
            self.compute_one_iteration()  # first phase (records row 0)
        n_mid = min(end, self.num_iterations - 1) - self._iteration
        if n_mid > 0:
            fn = self._run_cache.get("midloop")
            if fn is None:
                dt = self._dt
                cap = max(int(self.history.num_iterations), 1)
                mets_shape = jax.eval_shape(self._metrics, self._state)

                def body(k, carry):
                    state, aux, bufs = carry
                    state, aux, _acc, mets = self._phase_force_mets(
                        aux.nqx, aux.nqy, aux.nqz, self._gm(state),
                        lambda acc: leapfrog_middle(state, aux, acc, dt),
                    )
                    k_safe = jnp.minimum(k, cap - 1)
                    valid = k < cap

                    def write(b, v):
                        v = jnp.where(valid, v.astype(b.dtype), b[k_safe])
                        return jax.lax.dynamic_update_index_in_dim(
                            b, v, k_safe, 0
                        )

                    return state, aux, jax.tree.map(write, bufs, mets)

                @partial(jax.jit, donate_argnums=(0, 1))
                def run_mid(state, aux, n):
                    bufs0 = jax.tree.map(
                        lambda s: jnp.zeros((cap,) + s.shape, s.dtype),
                        mets_shape,
                    )
                    return jax.lax.fori_loop(0, n, body, (state, aux, bufs0))

                fn = self._run_cache["midloop"] = run_mid
            self._state, self._aux, (es, ls, dcs) = fn(
                self._state, self._aux, n_mid
            )
            es, ls, dcs = jax.device_get((es, ls, dcs))
            i0 = self._iteration
            for k in range(min(n_mid, len(es))):
                self._record(i0 + k, (es[k], ls[k], dcs[k]))
            self._last_acc = None
            self._iteration += n_mid
        while self._iteration < end:
            self.compute_one_iteration()  # last phase(s)


class TrackingEngine(EulerAccelEngine):
    """Euler engine that records (energy, |L|, density center) every iteration
    (ref: SimulationNBodyCUDAPropertyTracking.cu:121-133).  Metrics are fused
    into the jitted step; under ``run()`` they accumulate on device as scan ys
    and transfer once (the reference does a D2H copy per iteration)."""

    tag = "tpu+tracking"

    def __init__(self, bodies, soft=None, dt=None, *, num_iterations: int,
                 history: SimulationHistory | None = None, acc_fn=None,
                 metric_dtype=None, metrics_method: str = "exact",
                 metrics_proxy_m: int = 16, fused_proxy_m: int = 0,
                 fused_fmm: tuple = (), fused_adaptive=None,
                 m2l_dots: str = "fp32",
                 validated_half: float | None = None,
                 fused_exact: bool | None = None, **kw):
        kwargs = {}
        if soft is not None:
            kwargs["soft"] = soft
        if dt is not None:
            kwargs["dt"] = dt
        # Divisor-rich padding, same rule as ProxyEngine: the fused
        # anterpolation block is capped by the largest block dividing npad,
        # and the default lane padding can be divisor-poor (N=200k pads to
        # 200192 = 256*782 -> block 512 instead of 4096, measured 0.79 ->
        # 1.20 ms/step: the whole round-2 "41% tracked overhead" was this).
        if bodies.npad >= 8192:
            bodies = bodies.repad(2048)
        super().__init__(bodies, **kwargs, **kw)
        self.history = history or SimulationHistory(num_iterations)
        if self.history.num_iterations < num_iterations:
            self.history.set_num_iterations(num_iterations)
        self._acc = acc_fn
        self._metric_dtype = _resolve_metric_dtype(metric_dtype)
        self._metrics_method = metrics_method
        self._metrics_proxy_m = metrics_proxy_m
        self._fused_proxy_m = fused_proxy_m
        if sum(map(bool, (fused_proxy_m, fused_fmm,
                          fused_adaptive is not None))) > 1:
            raise ValueError("fused_proxy_m / fused_fmm / fused_adaptive "
                             "are exclusive")
        self._fused_fmm = tuple(fused_fmm)  # (m, levels) or ()
        self._fused_adaptive = fused_adaptive  # SparsePlan or None
        self._m2l_dots = _check_m2l_dots(m2l_dots)
        self._validated_half = validated_half
        self._fused_exact = fused_exact
        self._mscales = metrics_mod.metric_scales(self._state)
        self._tracked_step = None

    def _use_fused_exact(self) -> bool:
        """Whether the exact tracked step should run the fused
        force+potential hybrid kernel (ops/hybrid.acc_phi_rows_hybrid:
        ONE all-pairs sweep for both fields) instead of a force kernel
        plus a separate potential sweep.  Auto = on the TPU backend,
        when no fast far-field is configured, metrics are exact, and no
        custom acc_fn is wired.  ``fused_exact`` forces it either way
        (tests run it in interpret mode)."""
        if (self._acc is not None or self._metrics_method != "exact"
                or self._fused_proxy_m or self._fused_fmm
                or self._fused_adaptive is not None):
            return False
        if self._fused_exact is not None:
            return self._fused_exact
        return jax.default_backend() == "tpu"

    def _acc_fn(self, qx, qy, qz, gm):
        fn = self._acc or _default_exact_acc
        return fn(qx, qy, qz, gm, self.soft)

    def _metrics(self, state):
        return metrics_mod.all_metrics(
            state, self.soft, out_dtype=self._metric_dtype,
            method=self._metrics_method, proxy_m=self._metrics_proxy_m,
            scales=self._mscales,
        )

    def _step_with_metrics(self, state):
        """(new_state, acc, metrics): metrics are evaluated at the
        PRE-update state, matching the reference's iteration structure
        (acceleration -> metrics -> update, ref:
        SimulationNBodyCUDAPropertyTracking.cu:121-133)."""
        dt = self._dt
        if (self._fused_proxy_m or self._fused_fmm
                or self._fused_adaptive is not None):
            acc, phi = _fused_force_phi(
                state.qx, state.qy, state.qz, self._gm(state), self.soft,
                self._fused_proxy_m, self._fused_fmm, self._m2l_dots,
                self._fused_adaptive,
            )
            mets = _phi_metrics(state, phi, self.soft, self._metric_dtype,
                                self._mscales)
        elif self._use_fused_exact():
            # exact tracked step, one sweep: force + potential share the
            # distance chain (ops/hybrid.acc_phi_rows_hybrid) instead of
            # a force kernel plus a separate O(N^2) potential sweep
            from murb_tpu.ops.hybrid import acc_phi_rows_hybrid

            gm = self._gm(state)
            acc, phir = acc_phi_rows_hybrid(
                state.qx, state.qy, state.qz, gm, gm[None, :], self.soft)
            mets = _phi_metrics(state, phir[0], self.soft,
                                self._metric_dtype, self._mscales)
        else:
            acc = self._acc_fn(state.qx, state.qy, state.qz, self._gm(state))
            mets = self._metrics(state)
        return euler_update(state, acc, dt), acc, mets

    def _make_tracked_step(self):
        @partial(jax.jit, donate_argnums=0)
        def step(state):
            return self._step_with_metrics(state)

        return step

    def proxy_health(self) -> dict | None:
        """Validity check for the fused proxy/fmm path (same contract as
        ProxyEngine.proxy_health); None when using neither."""
        return _fused_proxy_health(self._state, self.soft,
                                   self._fused_proxy_m, self._fused_fmm,
                                   self._validated_half,
                                   self._fused_adaptive)

    def compute_one_iteration(self):
        if self._tracked_step is None:
            self._tracked_step = self._make_tracked_step()
        self._state, self._last_acc, (e, l, dc) = self._tracked_step(self._state)
        i = self._iteration
        if i < self.history.num_iterations:
            self.history.set_energy_at(
                i, float(e) * self._mscales.energy_scale)
            self.history.set_ang_momentum_at(
                i, float(l) * self._mscales.ang_momentum_scale)
            self.history.set_density_center_at(i, jax.device_get(dc))
        self._iteration += 1

    def _tracked_run_loop(self):
        """One compiled program for ANY per-call iteration count: a
        runtime-bound fori_loop writing per-iteration metrics into a
        capacity-sized device buffer (capacity = the history length fixed at
        construction).  A scan with a static length would recompile per
        distinct count -- pathological for a frame loop whose --ite-chunk
        leaves varying remainders."""
        fn = self._run_cache.get("tracked_loop")
        if fn is None:
            cap = max(int(self.history.num_iterations), 1)
            mets_shape = jax.eval_shape(self._step_with_metrics,
                                        self._state)[2]

            def body(k, carry):
                state, bufs = carry
                new_state, _acc, mets = self._step_with_metrics(state)
                k_safe = jnp.minimum(k, cap - 1)
                valid = k < cap  # past-capacity iterations leave bufs alone

                def write(b, v):
                    v = jnp.where(valid, v.astype(b.dtype), b[k_safe])
                    return jax.lax.dynamic_update_index_in_dim(b, v, k_safe, 0)

                return new_state, jax.tree.map(write, bufs, mets)

            @partial(jax.jit, donate_argnums=0)
            def run_loop(state, n):
                bufs0 = jax.tree.map(
                    lambda s: jnp.zeros((cap,) + s.shape, s.dtype), mets_shape
                )
                return jax.lax.fori_loop(0, n, body, (state, bufs0))

            fn = self._run_cache["tracked_loop"] = run_loop
        return fn

    def run(self, n_iterations: int) -> None:
        if n_iterations <= 0:
            return
        self._state, (es, ls, dcs) = self._tracked_run_loop()(
            self._state, n_iterations
        )
        es, ls, dcs = jax.device_get((es, ls, dcs))
        i0 = self._iteration
        hi = self.history.num_iterations
        for k in range(min(n_iterations, len(es))):
            if i0 + k < hi:
                self.history.set_energy_at(
                    i0 + k, float(es[k]) * self._mscales.energy_scale)
                self.history.set_ang_momentum_at(
                    i0 + k, float(ls[k]) * self._mscales.ang_momentum_scale)
                self.history.set_density_center_at(i0 + k, dcs[k])
        self._last_acc = None  # not materialized on the loop fast path
        self._iteration += n_iterations


class MultiGalaxyTrackingEngine(TrackingEngine):
    """Tracking engine with per-galaxy conserved-quantity series.

    The reference aggregates per-galaxy histories by element-wise sum into a
    global series (``MultiGalaxySimulationHistory::updateGlobalProperties``,
    ref: SimulationHistory.cpp:153-184) but never computes per-galaxy metrics
    on device; here each galaxy's (energy, |L|, density center) is a masked
    metric fused into the same jitted step.

    ``masks``: list of (npad,) 0/1 arrays, one per galaxy.
    """

    tag = "tpu+tracking+multi"

    def __init__(self, bodies, soft=None, dt=None, *, num_iterations: int,
                 masks, **kw):
        from murb_tpu.core.history import MultiGalaxySimulationHistory

        if kw.get("fused_adaptive") is not None:
            raise ValueError(
                "per-galaxy fused metrics support the single-level proxy "
                "(fused_proxy_m), the L-level hierarchy (fused_fmm: masked "
                "weight channels through P2M/M2M/M2L/L2L, "
                "ops/fmm.force_and_potential_fmm_pergal) and the exact "
                "kernel; the ADAPTIVE solver stays rejected -- its "
                "occupied-cell slot tables and P2P brick packs would need "
                "a per-galaxy channel through every windowed/sparse stage "
                "and the Pallas near kernel for a workload (1M+ clustered "
                "multi-galaxy tracking) that metrics_method='proxy' "
                "already serves with fast masked metrics"
            )
        history = MultiGalaxySimulationHistory(
            num_iterations, num_galaxies=len(masks)
        )
        super().__init__(bodies, soft, dt, num_iterations=num_iterations,
                         history=history, **kw)
        import jax.numpy as jnp

        npad = self._state.npad
        masks = [jnp.asarray(m) for m in masks]
        for m in masks:
            assert m.shape[0] <= npad, (m.shape, npad)
        # the ctor may have repadded the state (divisor-rich blocks); the
        # ghost rows are zero-mass, so extending each mask with zeros is exact
        self.masks = [jnp.pad(m, (0, npad - m.shape[0])) for m in masks]

    def _metrics(self, state):
        if self._metrics_method == "exact" and len(self.masks) <= 8:
            return self._metrics_exact_fused(state)
        per_gal = [
            metrics_mod.all_metrics(state, self.soft,
                                    out_dtype=self._metric_dtype, mask=m,
                                    method=self._metrics_method,
                                    proxy_m=self._metrics_proxy_m,
                                    scales=self._mscales)
            for m in self.masks
        ]
        es = jnp.stack([g[0] for g in per_gal])
        ls = jnp.stack([g[1] for g in per_gal])
        dcs = jnp.stack([g[2] for g in per_gal])
        return es, ls, dcs

    def _metrics_exact_fused(self, state):
        """Every per-galaxy potential from ONE O(N^2) sweep: the masked
        G*m rows ride the hybrid kernel's free (8 -> 128-padded) MXU
        dimension (ops/hybrid.phi_rows), replacing one full masked sweep
        PER galaxy; KE / |L| / density centers are O(N) masked
        reductions.  Falls back to the per-galaxy loop above for > 8
        galaxies or proxy-method metrics."""
        from murb_tpu.ops.hybrid import phi_rows

        gm = self._gm(state)
        rows = jnp.stack([gm * m.astype(gm.dtype) for m in self.masks])
        phi = phi_rows(state.qx, state.qy, state.qz, rows, self.soft)
        return self._metrics_from_phi_rows(state, phi)

    def _metrics_from_phi_rows(self, state, phi):
        """Per-galaxy (energy, |L|, density center) stacks from per-galaxy
        potential rows ``phi`` (G, n) already in hand (from phi_rows, the
        fused exact kernel, or the per-galaxy proxy pass); KE / |L| /
        density centers are O(N) masked reductions."""
        import dataclasses

        out_dtype, sc = self._metric_dtype, self._mscales
        es, ls, dcs = [], [], []
        for g, mask in enumerate(self.masks):
            mstate = dataclasses.replace(
                state, m=state.m * mask.astype(state.dtype))
            es.append(metrics_mod.energy_from_phi(
                mstate, phi[g], self.soft, out_dtype, scales=sc))
            ls.append(metrics_mod.angular_momentum(mstate, out_dtype,
                                                   scales=sc))
            dcs.append(metrics_mod.density_center(mstate, out_dtype,
                                                  scales=sc))
        return jnp.stack(es), jnp.stack(ls), jnp.stack(dcs)

    def _step_with_metrics(self, state):
        """Fused multi-galaxy step: force AND every per-galaxy potential
        from ONE far-field pass (the per-galaxy proxy when fused_proxy_m
        is configured, the fused exact sweep otherwise on TPU), instead
        of a force pass plus a separate potential sweep per step --
        measured 17.4 vs 33.5 untracked FPS on the 82k merger before
        this (round-3 VERDICT item 5)."""
        dt = self._dt
        gm = self._gm(state)
        if self._fused_proxy_m:
            from murb_tpu.ops.proxy import force_and_potential_proxy_pergal

            masks_f = jnp.stack([mk.astype(state.qx.dtype)
                                 for mk in self.masks])
            acc, phi_gal = force_and_potential_proxy_pergal(
                state.qx, state.qy, state.qz, gm, masks_f, self.soft,
                m=self._fused_proxy_m)
            mets = self._metrics_from_phi_rows(state, phi_gal)
        elif self._fused_fmm:
            from murb_tpu.ops.fmm import force_and_potential_fmm_pergal

            masks_f = jnp.stack([mk.astype(state.qx.dtype)
                                 for mk in self.masks])
            acc, phi_gal = force_and_potential_fmm_pergal(
                state.qx, state.qy, state.qz, gm, masks_f, self.soft,
                m=self._fused_fmm[0], levels=self._fused_fmm[1],
                m2l_dots=self._m2l_dots)
            mets = self._metrics_from_phi_rows(state, phi_gal)
        elif self._use_fused_exact() and len(self.masks) <= 8:
            from murb_tpu.ops.hybrid import acc_phi_rows_hybrid

            rows = jnp.stack([gm * mk.astype(gm.dtype)
                              for mk in self.masks])
            acc, phi_gal = acc_phi_rows_hybrid(
                state.qx, state.qy, state.qz, gm, rows, self.soft)
            mets = self._metrics_from_phi_rows(state, phi_gal)
        else:
            return super()._step_with_metrics(state)
        return euler_update(state, acc, dt), acc, mets

    def _record(self, i, es, ls, dcs):
        if i >= self.history.num_iterations:
            return
        for g, gal in enumerate(self.history.galaxies):
            gal.set_energy_at(
                i, float(es[g]) * self._mscales.energy_scale)
            gal.set_ang_momentum_at(
                i, float(ls[g]) * self._mscales.ang_momentum_scale)
            gal.set_density_center_at(i, jax.device_get(dcs[g]))

    def compute_one_iteration(self):
        if self._tracked_step is None:
            self._tracked_step = self._make_tracked_step()
        self._state, self._last_acc, (es, ls, dcs) = self._tracked_step(
            self._state
        )
        self._record(self._iteration, es, ls, dcs)
        self._iteration += 1

    def run(self, n_iterations: int) -> None:
        if n_iterations <= 0:
            return
        self._state, (es, ls, dcs) = self._tracked_run_loop()(
            self._state, n_iterations
        )
        es, ls, dcs = jax.device_get((es, ls, dcs))
        for k in range(min(n_iterations, len(es))):
            self._record(self._iteration + k, es[k], ls[k], dcs[k])
        self._last_acc = None
        self._iteration += n_iterations

    def finalize_history(self):
        """Fold per-galaxy series into the global series (element-wise sum)."""
        self.history.update_global_properties()
        return self.history
