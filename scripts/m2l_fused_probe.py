"""Fused vs jnp M2L level sweep on the real TPU, plus end-to-end acc_fmm.

Usage: python scripts/m2l_fused_probe.py [N] [m] [levels]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from murb_tpu import G
from murb_tpu.cli import enable_compile_cache
from murb_tpu.core.init import SCHEMES
from murb_tpu.ops import fmm
from murb_tpu.ops.fmm_pallas import m2l_fused_tile, m2l_level_fused
from murb_tpu.ops.proxy import bounding_box

enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 10
LEVELS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
SOFT = 2.0e8
C = 2 ** LEVELS

s = SCHEMES["random"](N, 1)
gm = jnp.asarray(G, s.qx.dtype) * s.m
c, h = jax.device_get(bounding_box(s.qx, s.qy, s.qz, gm > 0))
c, h = jnp.asarray(c), jnp.asarray(h)
w = jax.block_until_ready(fmm.p2m_grid(s.qx, s.qy, s.qz, gm, c, h, m=M, C=C))
hl = h / C


def timeit(name, fn, *args, iters=10):
    jfn = jax.jit(fn)
    out = jax.block_until_ready(jfn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    print(f"{name:32s} {(time.time() - t0) / iters * 1000:8.2f} ms")
    return out

ref = timeit("m2l_level jnp", lambda: fmm.m2l_level(w, hl, SOFT, m=M, C=C))
tile = m2l_fused_tile(M, C, 3)
print(f"eligible tile: {tile}")
if tile:
    got = timeit("m2l_level_fused",
                 lambda: m2l_level_fused(w, hl, SOFT, m=M, C=C, tile=tile))
    for a, b in zip(got, ref):
        scale = float(jnp.max(jnp.abs(b)))
        print("  max rel err:",
              f"{float(jnp.max(jnp.abs(a - b))) / scale:.2e}")

timeit("acc_fmm end-to-end",
       lambda: fmm.acc_fmm(s.qx, s.qy, s.qz, gm, SOFT, m=M, levels=LEVELS),
       iters=5)
