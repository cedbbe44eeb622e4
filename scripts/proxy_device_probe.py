"""True on-device stage times + accuracy for the single-cell proxy (the
galaxy headline) across Chebyshev orders.

Chained fori_loop timing (see fmm_device_probe.py for the rationale: the
axon relay adds ~1.5-2 ms per dispatch, so naive per-call timings swamp
sub-ms stages).

Usage: python scripts/proxy_device_probe.py [N] [iters] [m ...]
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
from murb_tpu.ops import proxy
from murb_tpu.ops.naive import acc_rect
from murb_tpu.ops.proxy_pallas import fused_block, l2p_fused, p2m_fused

enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
MS = [int(a) for a in sys.argv[3:]] or [12, 16, 20]
SOFT = 2.0e8
SAMPLE = 2048

s = SCHEMES["galaxy"](N, 123)
gm = jnp.asarray(G, s.qx.dtype) * s.m
qx, qy, qz = s.qx, s.qy, s.qz
c, h = jax.device_get(proxy.bounding_box(qx, qy, qz, gm > 0))
c, h = jnp.asarray(c), jnp.asarray(h)
block = fused_block(qx.shape[0])
print(f"N={N} block={block} box_ratio="
      f"{float(jnp.max(h)) / SOFT:.2f}", flush=True)

r = acc_rect(qx[:SAMPLE], qy[:SAMPLE], qz[:SAMPLE], qx, qy, qz, gm, SOFT)
ref = np.stack([np.asarray(r.ax), np.asarray(r.ay), np.asarray(r.az)], 1)
rn = np.linalg.norm(ref, axis=1)
floor = np.maximum(rn, rn.max() * 1e-6)


from murb_tpu.utils.probe import chain_time


def chain(name, body):
    chain_time("  " + name, body, ITERS)


eps = jnp.float32(1e-30)
for m in MS:
    from murb_tpu.ops.proxy import required_order

    print(f"m={m} (required for tol=1e-4: "
          f"{required_order(float(jnp.max(h)), SOFT)})", flush=True)
    w0 = jax.block_until_ready(
        p2m_fused(qx, qy, qz, gm, c, h, m=m, block=block))
    px, py, pz = proxy.proxy_nodes(c, h, m, qx.dtype)
    f0 = jax.block_until_ready(proxy.node_sweep(px, py, pz, w0, SOFT))

    chain("p2m_fused", lambda z: jnp.sum(p2m_fused(
        qx + z * eps, qy, qz, gm, c, h, m=m, block=block)))
    chain("node_sweep", lambda z: jnp.sum(proxy.node_sweep(
        px + z * eps, py, pz, w0, SOFT).ax))
    chain("l2p_fused", lambda z: jnp.sum(l2p_fused(
        qx + z * eps, qy, qz, c, h, f0.ax, f0.ay, f0.az,
        m=m, block=block)[0]))
    chain("acc_proxy full", lambda z: jnp.sum(proxy.acc_proxy(
        qx + z * eps, qy, qz, gm, SOFT, m=m).ax))

    a = jax.block_until_ready(proxy.acc_proxy(qx, qy, qz, gm, SOFT, m=m))
    approx = np.stack([np.asarray(a.ax[:SAMPLE]), np.asarray(a.ay[:SAMPLE]),
                       np.asarray(a.az[:SAMPLE])], 1)
    rel = np.linalg.norm(approx - ref, axis=1) / floor
    sel = np.asarray(s.m[:SAMPLE]) > 0
    rel = rel[sel]
    print(f"  force err max {rel.max():.2e} p99 "
          f"{np.percentile(rel, 99):.2e}", flush=True)
