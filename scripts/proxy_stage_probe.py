"""Stage timing of the single-cell proxy (the galaxy headline) on the TPU.

Usage: python scripts/proxy_stage_probe.py [N] [m]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from murb_tpu import G
from murb_tpu.cli import enable_compile_cache
from murb_tpu.core.init import SCHEMES
from murb_tpu.ops import proxy
from murb_tpu.ops.proxy_pallas import fused_block, l2p_fused, p2m_fused

enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 16
SOFT = 2.0e8

s = SCHEMES["galaxy"](N, 123)
gm = jnp.asarray(G, s.qx.dtype) * s.m
c, h = jax.device_get(proxy.bounding_box(s.qx, s.qy, s.qz, gm > 0))
c, h = jnp.asarray(c), jnp.asarray(h)
block = fused_block(s.qx.shape[0])
print(f"N={N} m={M} block={block}")


def timeit(name, fn, *args, iters=20):
    jfn = jax.jit(fn)
    out = jax.block_until_ready(jfn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.time() - t0) / iters * 1000:8.3f} ms")
    return out


w = timeit("p2m_fused", lambda: p2m_fused(s.qx, s.qy, s.qz, gm, c, h,
                                          m=M, block=block))
px, py, pz = proxy.proxy_nodes(c, h, M, s.qx.dtype)
f = timeit("node_sweep", lambda: proxy.node_sweep(px, py, pz, w, SOFT))
timeit("l2p_fused", lambda: l2p_fused(s.qx, s.qy, s.qz, c, h,
                                      f.ax, f.ay, f.az, m=M, block=block))
timeit("heavy_source_acc",
       lambda: proxy.heavy_source_acc(
           s.qx, s.qy, s.qz,
           (s.qx[:1], s.qy[:1], s.qz[:1]), gm[:1], SOFT))
timeit("acc_proxy (full)",
       lambda: proxy.acc_proxy(s.qx, s.qy, s.qz, gm, SOFT, m=M), iters=20)
