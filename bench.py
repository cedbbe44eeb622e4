"""Headline benchmark: flagship hybrid kernel at N=200k on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference's RTX-4090 `gpu+tile+full` at N=200k -- 40.1 FPS,
~29,880 "GFlop/s" in the reference's own convention (20*N^2 flops per step,
1024^3 divisor; Report.pdf Table 5, BASELINE.md).  vs_baseline > 1 means the
single TPU chip beats the 4090 on the reference's headline row.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

N = 200_000
STEPS = 10
BASELINE_REF_GFLOPS = 29_880.0  # RTX-4090 gpu+tile+full @ N=200k


def main() -> None:
    from murb_tpu.cli import enable_compile_cache

    enable_compile_cache()

    import jax
    import numpy as np

    from murb_tpu.core.init import init_galaxy
    from murb_tpu.models import create_engine

    bodies = init_galaxy(N, 123)
    engine = create_engine("tpu+hybrid", bodies, soft=2.0e8, dt=3600.0)

    # Warmup with the same scan length so only ONE program is compiled
    # (and lands in the persistent cache for future invocations).
    engine.run(STEPS)
    engine.block_until_ready()

    t0 = time.time()
    engine.run(STEPS)
    engine.block_until_ready()
    elapsed = time.time() - t0

    fps = STEPS / elapsed
    ref_gflops = 20.0 * N * N * fps / 1024**3
    d = engine.bodies.unpadded()
    assert np.all(np.isfinite(d["qx"])), "non-finite positions after bench"

    print(json.dumps({
        "metric": "ref_gflops_n200k_allpairs",
        "value": round(ref_gflops, 1),
        "unit": "GFlop/s (20*N^2/step, 1024^3 divisor, ref convention)",
        "vs_baseline": round(ref_gflops / BASELINE_REF_GFLOPS, 3),
        "fps": round(fps, 2),
        "n_bodies": N,
        "steps": STEPS,
        "device": str(jax.devices()[0]),
        "engine": "tpu+hybrid (VPU distances + bf16x2 MXU reduction, Euler)",
    }))


if __name__ == "__main__":
    main()
