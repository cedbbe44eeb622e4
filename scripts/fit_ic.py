"""Adjoint-method demo: fit initial velocities through the simulator.

Generates a random cloud, perturbs its velocities to produce a *realizable*
target final configuration, then gradient-descends the original velocities
through the differentiable rollout (murb_tpu.diff) until the final positions
hit the target -- a boundary-value problem solved with d(loss)/d(IC) from
one backward pass per iteration.  Works on CPU or the TPU.

    python scripts/fit_ic.py [N] [steps] [iters] [method]

method: chunked (exact adjoint, default) | proxy (fast-solver adjoint).
"""
from __future__ import annotations

import dataclasses
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from murb_tpu.cli import enable_compile_cache  # noqa: E402

enable_compile_cache()

from murb_tpu.core.init import init_random  # noqa: E402
from murb_tpu.diff import fit_initial_velocities, rollout  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 40
METHOD = sys.argv[4] if len(sys.argv) > 4 else "chunked"
DT, SOFT = 3600.0, 2.0e8


def main() -> None:
    s0 = init_random(N, 7)
    s_tgt = dataclasses.replace(s0, vx=s0.vx * 1.3, vy=s0.vy * 0.7)
    tgt = rollout(s_tgt, steps=STEPS, dt=DT, soft=SOFT, method=METHOD)
    target = np.stack([np.asarray(tgt.qx), np.asarray(tgt.qy),
                       np.asarray(tgt.qz)], 1)[:N]

    print(f"fitting v0 of {N} bodies over {STEPS} steps ({METHOD} adjoint)")
    fitted, losses = fit_initial_velocities(
        s0, target, steps=STEPS, dt=DT, soft=SOFT, iters=ITERS,
        method=METHOD, verbose=True)
    final = rollout(fitted, steps=STEPS, dt=DT, soft=SOFT, method=METHOD)
    q = np.stack([np.asarray(final.qx), np.asarray(final.qy),
                  np.asarray(final.qz)], 1)[:N]
    rms = float(np.sqrt(np.mean((q - target) ** 2)))
    print(f"loss {losses[0]:.3e} -> {losses[-1]:.3e} "
          f"({losses[0] / max(losses[-1], 1e-300):.0f}x); final rms "
          f"miss {rms:.3e} m")


if __name__ == "__main__":
    main()
