"""Steady-state kernel microbenchmark on the real TPU.

Times a scanned full step (acc kernel + Euler update) to exclude host
dispatch latency.  Usage:
    python scripts/kernel_bench.py [N] [iters]
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from murb_tpu import G
from murb_tpu.cli import enable_compile_cache
from murb_tpu.core.init import init_galaxy
from murb_tpu.core.integrators import euler_update

enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
DT = 3600.0
SOFT = 2.0e8


def time_step(name, acc_fn):
    state = init_galaxy(N, 123)

    def step(s, _):
        acc = acc_fn(s.qx, s.qy, s.qz, jnp.asarray(G, s.dtype) * s.m)
        return euler_update(s, acc, DT), None

    @jax.jit
    def run(s):
        final, _ = jax.lax.scan(step, s, length=ITERS)
        return final

    t0 = time.time()
    out = jax.block_until_ready(run(state))
    compile_s = time.time() - t0
    t0 = time.time()
    out = jax.block_until_ready(run(out))
    per_step = (time.time() - t0) / ITERS
    fps = 1.0 / per_step
    gflops = 20.0 * N * N * fps / 1024**3
    print(f"{name:34s} {per_step*1e3:9.2f} ms/step {fps:8.2f} FPS "
          f"{gflops:9.1f} ref-GFlop/s   (compile {compile_s:.1f}s)")
    return per_step


if __name__ == "__main__":
    from murb_tpu.ops.naive import acc_chunked
    from murb_tpu.ops.tile_pallas import acc_tile
    from murb_tpu.ops.mxu import acc_mxu

    npad = init_galaxy(N, 123).npad
    print(f"N={N} npad={npad} iters={ITERS}")

    cases = []
    if N <= 65536:
        cases.append(("xla chunked 1024",
                      lambda *a: acc_chunked(*a, SOFT, chunk=1024)))
    for bi, bj in [(256, 2048), (512, 1024), (512, 2048), (1024, 1024),
                   (256, 4096), (128, 8192)]:
        if npad % bi == 0 and npad % bj == 0:
            cases.append((f"tile bi={bi} bj={bj}",
                          partial(lambda bi, bj, *a: acc_tile(
                              *a, SOFT, block_i=bi, block_j=bj), bi, bj)))
    for bi, bj in [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
                   (2048, 512), (512, 2048)]:
        if npad % bi == 0 and npad % bj == 0:
            for prec in ("high", "default"):
                cases.append((f"mxu bi={bi} bj={bj} {prec}",
                              partial(lambda bi, bj, p, *a: acc_mxu(
                                  *a, SOFT, block_i=bi, block_j=bj,
                                  precision=p), bi, bj, prec)))

    for name, fn in cases:
        try:
            time_step(name, fn)
        except Exception as e:
            print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:120]}")
