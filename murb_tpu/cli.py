"""CLI driver: the TPU-native ``murb`` binary (ref: src/murb/main.cpp:309-407).

Preserves the reference's observable behavior: configuration banner, verbose
per-iteration status line (FPS, cumulative GFlop/s, physic time), and the
final "Entire simulation took ..." summary, with the reference's FLOPs model
(20*N^2/iteration) and GFlop/s convention (1024^3 divisor).

Usage:  python -m murb_tpu -n 30000 -i 100 --im tpu+mxu --nv --gf -v
"""
from __future__ import annotations

import sys

import jax
import numpy as np

from murb_tpu import create_engine, available_implementations
from murb_tpu.core.init import make_bodies
from murb_tpu.models import resolve_tag
from murb_tpu.utils.args import MurbConfig, parse_args
from murb_tpu.utils.perf import Perf
from murb_tpu.utils.strdate import str_date
from murb_tpu.visu import create_visu

_DTYPES = {"fp32": "float32", "fp64": "float64", "bf16": "bfloat16"}


def enable_compile_cache() -> None:
    """Persistent XLA compile cache: first compile of a kernel is ~10-40s on
    TPU; caching makes every later CLI/bench invocation start hot."""
    import os

    cache_dir = os.environ.get("MURB_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/murb_tpu_xla"))
    if cache_dir and cache_dir != "0":
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception:
            pass


def build_engine(cfg: MurbConfig):
    """-> (engine, start_iteration).  ``start_iteration`` is nonzero when
    resuming from a checkpoint, so a later --save-state carries cumulative
    progress instead of restarting the counter."""
    import jax.numpy as jnp

    from murb_tpu.models import validate_tag

    canonical = validate_tag(cfg.impl_tag)  # fail fast, before device work
    if cfg.precision == "fp64":
        jax.config.update("jax_enable_x64", True)
    # Tracking metrics need no dtype escalation: the dimensionless-reduction
    # scales (core/metrics.MetricScales) keep fp32 range-safe at any state
    # magnitude, and forcing x64 here would put the O(N^2) exact metrics
    # sweep on TPU's ~10x emulated-f64 path (and stop load_state resumes
    # from downcasting f64 checkpoints to the --precision dtype).  f64
    # metrics remain available via --precision fp64 / metric_dtype.
    dtype = jnp.dtype(_DTYPES[cfg.precision])
    start_iteration = 0
    if cfg.load_state:
        from murb_tpu.core.checkpoint import load_state

        bodies, meta = load_state(cfg.load_state)
        start_iteration = int(meta.get("iteration", 0))
        # The checkpoint's physics constants win unless the user explicitly
        # re-specified them: a run saved with non-default --dt/--soft must
        # not silently continue with different physics.
        if not cfg.dt_explicit and "dt" in meta:
            cfg.dt = float(meta["dt"])
        if not cfg.soft_explicit and "soft" in meta:
            cfg.softening = float(meta["soft"])
        print(f"Resumed state from {cfg.load_state} "
              f"(iteration {start_iteration}, n={bodies.n}, "
              f"dt={cfg.dt:g}, soft={cfg.softening:g})")
    else:
        bodies = make_bodies(
            cfg.n_bodies, cfg.scheme, cfg.seed,
            dtype=dtype, scheme_file=cfg.scheme_file,
        )
    extra = {}
    if canonical == "tpu+tracking+multi":
        from murb_tpu.core.init import milkyway_andromeda_masks

        extra["masks"] = milkyway_andromeda_masks(bodies.npad, bodies.n)
    kernel = cfg.kernel
    proxy_m = 0
    fmm_levels = 0
    if kernel == "proxy":
        # The proxy order must cover the box; unlike --im tpu+proxy (which
        # checks and picks a mode itself) the wrapper engines take a raw
        # kernel, so validate here.
        from murb_tpu.ops.proxy import half_extent, required_order

        half = half_extent(bodies.unpadded())
        # margin=0 on top of the 1.5x growth factor: measured-calibration
        # rationale in ProxyEngine._configure
        proxy_m = (required_order(half * 1.5, cfg.softening, cfg.tol,
                                  margin=0) + 3) // 4 * 4
        if proxy_m > 32:
            print(f"NOTE: box too large for the single-level proxy "
                  f"(needs m={proxy_m} > 32); using the multi-level fmm "
                  f"kernel.")
            kernel = "fmm"
            proxy_m = 0
    if kernel == "fmm":
        from murb_tpu.ops.fmm import fmm_order, required_levels
        from murb_tpu.ops.proxy import half_extent

        half = half_extent(bodies.unpadded())
        fmm_levels = required_levels(half, cfg.softening)
        proxy_m = fmm_order(half, cfg.softening, fmm_levels, cfg.tol)
        if proxy_m > 16:
            # the dense hierarchy cannot meet tol on this box (clustered
            # / soft far below the feasible finest cells) -- the
            # occupied-cell adaptive hierarchy is scale-free
            print(f"NOTE: box/softening ratio too large for the dense "
                  f"hierarchy (needs m={proxy_m}); using the adaptive "
                  f"sparse kernel (exact P2P near field).")
            kernel = "adaptive"
            proxy_m = 0
    adaptive_plan = None
    if kernel == "adaptive":
        import numpy as _np

        import jax.numpy as _jnp

        from murb_tpu import G as _G
        from murb_tpu.ops.sparse_fmm import (
            acc_adaptive,
            adaptive_order,
            best_adaptive_plan,
        )
        from murb_tpu.ops.validate import measured_force_error

        u = bodies.unpadded()
        sel = u["m"] > 0
        qh = _np.stack([u["qx"][sel], u["qy"][sel], u["qz"][sel]],
                       1).astype(_np.float32)
        adaptive_plan, _est = best_adaptive_plan(
            qh, bodies.npad, adaptive_order(cfg.tol))
        gmv = _jnp.asarray(_G, bodies.qx.dtype) * bodies.m
        from murb_tpu.ops.sparse_fmm import default_m2l_rank

        merr = None
        tried_rank0 = False
        while True:
            merr = measured_force_error(
                bodies.qx, bodies.qy, bodies.qz, gmv, cfg.softening,
                lambda a, b, c, g: acc_adaptive(a, b, c, g, cfg.softening,
                                                adaptive_plan))
            if merr <= cfg.tol:
                break
            # M2L compression truncation does not shrink with m: drop
            # it before burning escalation rungs (engines ladder rule)
            eff = adaptive_plan.m2l_rank
            if eff < 0:
                eff = default_m2l_rank(adaptive_plan.m)
            if eff > 0 and not tried_rank0:
                tried_rank0 = True
                adaptive_plan = adaptive_plan._replace(m2l_rank=0)
                continue
            if adaptive_plan.m + 2 > 12:
                break
            adaptive_plan = adaptive_plan._replace(m=adaptive_plan.m + 2)
        if merr > cfg.tol:
            print(f"WARNING: adaptive kernel validation missed "
                  f"tol={cfg.tol:.1e} (measured {merr:.1e} at "
                  f"m={adaptive_plan.m}); keeping it.")
        proxy_m, fmm_levels = adaptive_plan.m, adaptive_plan.levels
        cert_half = None
    if kernel in ("proxy", "fmm"):
        # Measured-order selection (ops/validate): the static pick is a
        # calibrated guess whose prefactor is distribution-dependent;
        # measure it against an exact strided sample and escalate until
        # the --tol contract holds (same loop as ProxyEngine).
        import jax.numpy as _jnp

        from murb_tpu import G as _G
        from murb_tpu.ops.validate import validate_config

        def _make_acc(m, levels, cells):
            def acc(qx, qy, qz, g):
                if levels:
                    from murb_tpu.ops.fmm import acc_fmm

                    return acc_fmm(qx, qy, qz, g, cfg.softening, m=m,
                                   levels=levels, m2l_dots=cfg.m2l_dots)
                from murb_tpu.ops.proxy import acc_proxy

                return acc_proxy(qx, qy, qz, g, cfg.softening, m=m,
                                 cells=cells)

            return acc

        from murb_tpu.ops.validate import certified_half

        gmv = _jnp.asarray(_G, bodies.qx.dtype) * bodies.m
        proxy_m, fmm_levels, _, _err = validate_config(
            bodies.qx, bodies.qy, bodies.qz, gmv, cfg.softening, cfg.tol,
            proxy_m, fmm_levels, 1, half, _make_acc)
        kernel = "fmm" if fmm_levels else "proxy"
        # measured-contract health basis: the box growth this validated
        # config is certified for (rho^-m law, measured prefactor)
        cert_half = certified_half(proxy_m, fmm_levels, float(half), _err,
                                   cfg.softening, cfg.tol)
    _fusible = ("tpu+tracking", "tpu+leapfrog+tracking")
    if canonical in _fusible and kernel == "proxy":
        extra["fused_proxy_m"] = proxy_m  # fused force+potential proxy step
        extra["validated_half"] = cert_half
    elif canonical in _fusible and kernel == "fmm":
        extra["fused_fmm"] = (proxy_m, fmm_levels)  # fused hierarchy step
        extra["validated_half"] = cert_half
    elif canonical in _fusible and kernel == "adaptive":
        extra["fused_adaptive"] = adaptive_plan  # fused sparse+P2P step
    elif canonical in ("tpu+tracking", "tpu+tracking+multi", "tpu+leapfrog",
                       "tpu+leapfrog+tracking", "tpu+kdk"):
        from murb_tpu.ops import make_acc_fn

        extra["acc_fn"] = make_acc_fn(
            kernel, block_i=cfg.block_i, block_j=cfg.block_j,
            chunk=cfg.chunk, m=proxy_m or 16, levels=fmm_levels or 2,
            plan=adaptive_plan,
        )
    # Default-on mid-run adaptation for the frame loop: a long expanding
    # system rebuilds its proxy/fmm order every 64 iterations instead of
    # silently degrading until the post-run warning.  Off under --scan
    # (the whole run is one device dispatch; the warning covers it), and
    # an explicit --adapt-every (including 0) always wins.  Valid configs
    # are never churned (ProxyEngine.maybe_adapt rebuilds only on
    # *invalid* health), so the no-recompile property is preserved.
    adapt_every = cfg.adapt_every
    if adapt_every is None:
        adapt_every = 0 if cfg.scan else 64
    engine = create_engine(
        cfg.impl_tag, bodies,
        soft=cfg.softening, dt=cfg.dt,
        num_iterations=cfg.n_iterations,
        chunk=cfg.chunk, block_i=cfg.block_i, block_j=cfg.block_j,
        shards=cfg.shards, gpu_fraction=cfg.gpu_fraction,
        adapt_every=adapt_every,
        m2l_dots=cfg.m2l_dots, tol=cfg.tol, near=cfg.near,
        autotune=True if cfg.autotune else None,
        **extra,
    )
    return engine, start_iteration


def print_banner(cfg: MurbConfig, engine) -> None:
    # ref: main.cpp:323-334
    mbytes = engine.allocated_bytes / 1024.0 / 1024.0
    print("n-body simulation configuration:")
    print("--------------------------------")
    print(f"  -> bodies scheme     (-s    ): {cfg.scheme}")
    print(f"  -> implementation    (--im  ): {cfg.impl_tag} "
          f"[{resolve_tag(cfg.impl_tag)}]")
    print(f"  -> nb. of bodies     (-n    ): {engine.bodies.n}")
    print(f"  -> nb. of iterations (-i    ): {cfg.n_iterations}")
    print(f"  -> verbose mode      (-v    ): "
          f"{'enable' if cfg.verbose else 'disable'}")
    print(f"  -> precision                 : {cfg.precision}")
    print(f"  -> mem. allocated            : {mbytes:g} MB")
    print(f"  -> devices                   : "
          f"{[str(d) for d in jax.devices()]}")
    print(f"  -> time step         (--dt  ): {cfg.dt:g} sec")
    print(f"  -> softening factor  (--soft): {cfg.softening:g}")
    # measured-order selection outcome (ops/validate): surface the pick
    # and its measured error so a run's accuracy config is auditable from
    # the log alone
    err = getattr(engine, "validated_err", None)
    if err is not None:
        lv = getattr(engine, "levels", getattr(engine, "fmm_levels", 0))
        m = getattr(engine, "m", getattr(engine, "fmm_m",
                                         getattr(engine, "proxy_m", 0)))
        if getattr(engine, "near_mode", "interp") == "adaptive":
            mode = f"adaptive m={m} L={lv} (sparse + exact near field)"
        else:
            mode = f"fmm m={m} L={lv}" if lv else f"proxy m={m}"
        print(f"  -> validated order           : {mode} "
              f"(measured err {err:.1e} vs tol {cfg.tol:g})")


def main(argv=None) -> int:
    import os

    cfg = parse_args(argv)
    if os.environ.get("MURB_FORCE_CPU"):
        # The TPU plugin force-selects itself regardless of JAX_PLATFORMS;
        # multi-process smoke runs (scripts/run_multihost.sh) need the CPU
        # backend forced in-process before first backend use.
        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()

    from murb_tpu.parallel.mesh import maybe_init_distributed

    if maybe_init_distributed():
        print(f"distributed runtime up: process "
              f"{jax.process_index()}/{jax.process_count()}")

    if cfg.list_impls:
        for tag, aliases in sorted(available_implementations().items()):
            alias_str = f"  (aliases: {', '.join(aliases)})" if aliases else ""
            print(f"  {tag}{alias_str}")
        return 0

    try:
        engine, start_iteration = build_engine(cfg)
    except (ValueError, FileNotFoundError) as e:
        # ref: main.cpp:265-268 -- clean exit on unknown implementation
        print(e)
        return 1
    print_banner(cfg, engine)
    visu = create_visu(cfg)

    print("Simulation started...")

    perf_ite, perf_total = Perf(), Perf()
    physic_time = 0.0
    n_done = 0
    n_run = 0

    profile_ctx = None
    if cfg.profile:
        jax.profiler.start_trace(cfg.profile)
        profile_ctx = cfg.profile

    traj = None
    if cfg.dump_traj:
        from murb_tpu.io import TrajectoryWriter

        traj = TrajectoryWriter(cfg.dump_traj, engine.bodies.n)

    def record(i_ite: int, force: bool = False) -> None:
        if traj is None:
            return
        if force or i_ite % max(cfg.dump_every, 1) == 0:
            # pull ONLY the positions: unpadded() transfers all 8 state
            # arrays, ~2.7x the bytes, and relay transfers dominate the
            # demo's frame time
            b = engine.bodies
            import numpy as _np

            n = b.n
            traj.append(i_ite, _np.asarray(b.qx)[:n], _np.asarray(b.qy)[:n],
                        _np.asarray(b.qz)[:n])

    ckpt_writer = None
    if cfg.save_every > 0:
        if not cfg.save_state:
            print("--save-every requires --save-state", file=sys.stderr)
            return 1
        from murb_tpu.core.checkpoint import AsyncCheckpointWriter

        ckpt_writer = AsyncCheckpointWriter(cfg.save_state)

    def checkpoint(i_ite: int) -> None:
        """Async periodic checkpoint at --save-every boundaries (atomic,
        write-behind; the frame loop never blocks on disk)."""
        if (ckpt_writer is not None and i_ite > 0
                and i_ite % cfg.save_every == 0):
            ckpt_writer.save(engine.bodies,
                             iteration=start_iteration + i_ite,
                             dt=engine.dt, soft=engine.soft)

    record(0, force=True)  # frame 0 = the initial conditions

    if cfg.scan and cfg.n_iterations > 0:
        # One device dispatch for the whole run (no per-iteration timing).
        # Warm up with a single iteration so the timed section excludes the
        # XLA compile (the compiled program is length-agnostic).  With a
        # single requested iteration there is nothing to warm with, so that
        # iteration itself is timed (including its compile).
        warm = 1 if cfg.n_iterations > 1 else 0
        if warm:
            engine.run(warm)
            engine.block_until_ready()
        timed = cfg.n_iterations - warm
        perf_total.start()
        if traj is None and ckpt_writer is not None:
            # segment the single-dispatch run on checkpoint boundaries
            current = warm
            for target in range(cfg.save_every, cfg.n_iterations + 1,
                                cfg.save_every):
                if target > current:
                    engine.run(target - current)
                    current = target
                checkpoint(target)
            if current < cfg.n_iterations:
                engine.run(cfg.n_iterations - current)
        elif traj is None:
            engine.run(timed)
        else:
            # advance in segments that land exactly on the record points
            every = max(cfg.dump_every, 1)
            current = warm
            for target in range(every, cfg.n_iterations + 1, every):
                if target > current:
                    engine.run(target - current)
                    current = target
                record(target, force=True)
                checkpoint(target)
            if current < cfg.n_iterations:
                engine.run(cfg.n_iterations - current)
        engine.block_until_ready()
        perf_total.stop()
        n_done = timed          # the timed iterations (for FPS)
        n_run = cfg.n_iterations  # all iterations actually advanced
        physic_time = cfg.n_iterations * engine.dt
        if cfg.check_finite:
            engine.assert_finite()
    elif cfg.scan:
        pass  # -i 0: nothing to run
    else:
        chunk = max(cfg.ite_chunk, 1)
        i_ite = 0
        while i_ite < cfg.n_iterations:
            if visu.window_should_close():
                break
            visu.dt = engine.dt
            visu.refresh_display(engine.bodies, time_s=physic_time)

            # Viewer key events -- the interface the reference declares but
            # never polls (ref: src/common/ogl/SpheresVisu.hpp:4-15): space
            # pauses the loop, PgUp/PgDn double/halve dt.
            if visu.pressed_space_bar():
                import time as _time

                visu.paused = True
                visu.refresh_display(engine.bodies, time_s=physic_time)
                while not (visu.pressed_space_bar()
                           or visu.window_should_close()):
                    _time.sleep(0.05)
                visu.paused = False
                visu.refresh_display(engine.bodies, time_s=physic_time)
            if visu.pressed_page_up():
                engine.set_dt(engine.dt * 2.0)
            if visu.pressed_page_down():
                engine.set_dt(engine.dt / 2.0)

            k = min(chunk, cfg.n_iterations - i_ite)
            if traj is not None:
                # land exactly on the next record point so --ite-chunk never
                # skips a --dump-every frame
                every = max(cfg.dump_every, 1)
                to_next = every - (i_ite % every)
                k = min(k, to_next)
            perf_ite.start()
            if k == 1:
                engine.compute_one_iteration()
            else:
                engine.run(k)
            engine.block_until_ready()   # analogue of cudaDeviceSynchronize
            perf_ite.stop()
            perf_total += perf_ite

            i_ite += k
            physic_time += engine.dt * k
            n_done = n_run = i_ite
            record(i_ite)
            checkpoint(i_ite)
            if cfg.check_finite:
                engine.assert_finite()

            if cfg.verbose:
                gflops = ""
                if cfg.show_gflops:
                    gflops = (f", {perf_total.get_gflops(engine.flops_per_ite * i_ite):6.1f}"
                              " Gflop/s")
                print(
                    f"Iteration n°{i_ite:4d} "
                    f"({perf_total.get_fps(i_ite):6.1f} FPS{gflops}), "
                    f"physic time: {str_date(physic_time)}",
                    end="\r",
                    flush=(i_ite % 5 == 0),
                )
        if cfg.verbose:
            print()

    if profile_ctx:
        jax.profiler.stop_trace()
        print(f"Profiler trace written to {profile_ctx}")

    if traj is not None:
        dropped = traj.close()
        msg = f" ({dropped} frames dropped)" if dropped else ""
        print(f"Trajectory written to {cfg.dump_traj}{msg}")

    print("Simulation ended.")
    print()
    gflops = ""
    if cfg.show_gflops:
        gflops = f", {perf_total.get_gflops(engine.flops_per_ite * n_done):6.1f} Gflop/s"
    print(
        f"Entire simulation took {perf_total.get_elapsed_time():g} ms "
        f"({perf_total.get_fps(n_done):g} FPS{gflops})"
    )

    if hasattr(engine, "proxy_health"):
        health = engine.proxy_health()
        if health is not None and not health["ok"]:
            if health.get("near") == "adaptive":
                print(
                    f"WARNING: the distribution outgrew the adaptive "
                    f"solver's compiled capacities (occupied cells "
                    f"{health['n_cells_now']} vs caps "
                    f"{health['cell_caps']}; p2p pairs "
                    f"{health['p2p_pairs_now']} vs cap "
                    f"{health['p2p_pmax']}); some near pairs were dropped "
                    f"in late iterations -- rerun with --adapt-every to "
                    f"re-plan mid-run, or --im tpu+hybrid for exact forces."
                )
            else:
                print(
                    f"WARNING: system expanded beyond the proxy design "
                    f"margin (order m={health['m']}, now requires "
                    f"m={health['required_m_now']}); forces in late "
                    f"iterations are less accurate -- rerun with --im "
                    f"tpu+hybrid for exact forces, or resume from a "
                    f"checkpoint with a fresh engine."
                )

    if cfg.csv and hasattr(engine, "history"):
        if hasattr(engine, "finalize_history"):
            engine.finalize_history()
        engine.history.save_metrics_to_csv(cfg.csv)
        print(f"Metrics written to {cfg.csv}")

    if cfg.save_state:
        from murb_tpu.core.checkpoint import save_state

        if ckpt_writer is not None:
            ckpt_writer.flush()  # never race the final synchronous write
        save_state(cfg.save_state, engine.bodies,
                   iteration=start_iteration + n_run,
                   dt=engine.dt, soft=engine.soft)
        extra = ""
        if ckpt_writer is not None:
            extra = (f" ({ckpt_writer.written} periodic"
                     + (f", {ckpt_writer.skipped} skipped while busy"
                        if ckpt_writer.skipped else "") + ")")
        print(f"State checkpoint written to {cfg.save_state}{extra}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
