"""End-to-end adaptive-solver timings on the clustered distributions.

Measures full engine steps (chained device dispatch via Engine.run, per
CLAUDE.md timing rules) on the two boxes the dense hierarchy cannot
solve, with whatever near-field sweep plan_adaptive picks for the
backend (the block-sparse Pallas P2P kernel on TPU, the jnp gather
sweep elsewhere).  Reference points measured with the jnp sweep
(round 3): 82k merger forced-adaptive 216 ms/step, N=1M two-cluster
3.64 s/step (vs 4.75 s exact).

    python scripts/adaptive_probe.py [--small]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from murb_tpu.cli import enable_compile_cache  # noqa: E402

enable_compile_cache()

import bench  # noqa: E402  (repo-root bench helpers: _bodies/measure)


def probe(label, n, scheme, soft, dt, steps, warmup, **kw) -> None:
    t0 = time.time()
    fps, eng = bench.measure("tpu+proxy", steps, n=n, scheme=scheme,
                             warmup=warmup, soft=soft, dt=dt,
                             ret_engine=True, **kw)
    plan = getattr(eng, "_plan", None)
    impl = plan.p2p_impl if plan is not None else "-"
    print(f"{label}: {1e3 / fps:8.1f} ms/step  ({fps:.3f} FPS)  "
          f"near={eng.near_mode} p2p_impl={impl} m={eng.m} "
          f"L={eng.levels} err={eng.validated_err}  "
          f"[total {time.time() - t0:.0f}s]", flush=True)


def main() -> None:
    small = "--small" in sys.argv
    # mw+andromeda merger (81,920 bodies): exact kernel wins here at the
    # VPU ceiling; force adaptive to measure the sweep itself
    probe("merger 82k forced-adaptive", 81_920, "two_galaxies",
          2.0e8, 3600.0, steps=30, warmup=5, near="adaptive")
    if small:
        return
    # 1M two-cluster: the adaptive solver's domain (auto picks it)
    probe("two-cluster 1M auto", 1_048_576, "two_clusters",
          0.02, 1e-6, steps=4, warmup=1)


if __name__ == "__main__":
    main()
