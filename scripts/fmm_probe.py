"""Stage-by-stage timing of the FMM pipeline on the real TPU.

Axon relay timing discipline (CLAUDE.md): chain each iteration's input on
the previous output inside one jitted fori_loop, pull one value to host at
the end, divide by the loop count.
"""
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from murb_tpu import G
from murb_tpu.cli import enable_compile_cache
from murb_tpu.core.init import SCHEMES
from murb_tpu.ops import fmm

enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 12
LEVELS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
SOFT = 2.0e8
C = 2 ** LEVELS

s = SCHEMES["random"](N, 1)
gm = jnp.asarray(G, s.qx.dtype) * s.m
qx, qy, qz = s.qx, s.qy, s.qz
from murb_tpu.ops.proxy import bounding_box

c, h = bounding_box(qx, qy, qz, gm > 0)
c, h = jax.device_get((c, h))
c, h = jnp.asarray(c), jnp.asarray(h)


def timeit(name, fn, *args, iters=10):
    """fn must return something array-like; chains a tiny perturbation."""
    jfn = jax.jit(fn)
    out = jax.block_until_ready(jfn(*args))  # compile
    t0 = time.time()
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:28s} {dt:8.2f} ms")
    return out


w = timeit("p2m_grid (segment_sum)",
           lambda: fmm.p2m_grid(qx, qy, qz, gm, c, h, m=M, C=C))

fields = timeit("fmm_field_grid (M2M+M2L)",
                lambda: fmm.fmm_field_grid(w, h, SOFT, m=M, levels=LEVELS))

timeit("m2l_level finest only",
       lambda: fmm.m2l_level(w, h / C, SOFT, m=M, C=C))

timeit("l2p_grid (gather)",
       lambda: fmm.l2p_grid(qx, qy, qz, c, h, fields[:3], m=M, C=C))

timeit("acc_fmm (full)",
       lambda: fmm.acc_fmm(qx, qy, qz, gm, SOFT, m=M, levels=LEVELS),
       iters=5)
