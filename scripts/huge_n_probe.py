"""Single-chip huge-N ladder: validated tpu+proxy throughput at 20M-100M.

Reproduces the documented 100M-bodies-on-one-v5e measurement (README /
ROADMAP; bench.py carries the 20M/50M rungs -- 100M lives here because its
host-side IC generation dominates wall time).  Each rung reports the
measured-validated solver config and error alongside FPS.

    python scripts/huge_n_probe.py [max_millions]   # default 100
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from murb_tpu.cli import enable_compile_cache  # noqa: E402

enable_compile_cache()

from murb_tpu.core.init import SCHEMES  # noqa: E402
from murb_tpu.models import create_engine  # noqa: E402

MAX_M = int(sys.argv[1]) if len(sys.argv) > 1 else 100
RUNGS = [(20, 10), (50, 6), (100, 5)]


def main() -> None:
    for nm, steps in RUNGS:
        if nm > MAX_M:
            break
        n = nm * 1_000_000
        t0 = time.time()
        eng = create_engine("tpu+proxy", SCHEMES["galaxy"](n, 123),
                            soft=2.0e8, dt=3600.0)
        print(f"N={nm}M  init {time.time() - t0:.0f}s  "
              f"m={eng.m} L={eng.levels} validated_err={eng.validated_err:.2e}",
              flush=True)
        eng.run(2)
        eng.block_until_ready()
        t0 = time.time()
        eng.run(steps)
        eng.block_until_ready()
        fps = steps / (time.time() - t0)
        print(f"        {fps:6.2f} FPS   ({1e3 / fps:8.1f} ms/step, "
              f"{20.0 * n * n * fps / 1024**3:.3g} ref-GFlop/s)", flush=True)
        del eng  # free HBM before the next rung


if __name__ == "__main__":
    main()
