"""Measure m2l_level time/accuracy vs dot precision on the real TPU.

The M2L matmuls run at Precision.HIGHEST (6-pass fp32 emulation).  XLA:TPU
also offers HIGH (bf16_3x).  This probe times the level sweep at each
precision and reports the field-level relative error vs HIGHEST.
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
from murb_tpu.ops.proxy import bounding_box

enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 10
LEVELS = 2
SOFT = 2.0e8
C = 2 ** LEVELS

s = SCHEMES["random"](N, 1)
gm = jnp.asarray(G, s.qx.dtype) * s.m
c, h = jax.device_get(bounding_box(s.qx, s.qy, s.qz, gm > 0))
c, h = jnp.asarray(c), jnp.asarray(h)
w = jax.block_until_ready(fmm.p2m_grid(s.qx, s.qy, s.qz, gm, c, h, m=M, C=C))

results = {}
for prec in ("HIGHEST", "HIGH", "DEFAULT"):
    fmm._PRECISION = getattr(jax.lax.Precision, prec)
    fn = jax.jit(lambda w: fmm.m2l_level(w, h / C, SOFT, m=M, C=C))
    try:
        out = jax.block_until_ready(fn(w))
    except Exception as e:  # noqa: BLE001 -- probe records backend refusals
        print(f"{prec:8s} unsupported: {type(e).__name__}")
        continue
    t0 = time.time()
    for _ in range(10):
        out = fn(w)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 10 * 1000
    results[prec] = (dt, jax.device_get(jnp.stack(out)))
    base = results["HIGHEST"][1]
    cur = results[prec][1]
    scale = np.abs(base).max()
    err = np.abs(cur - base).max() / scale
    print(f"{prec:8s} {dt:8.2f} ms   max rel err vs HIGHEST: {err:.2e}")
