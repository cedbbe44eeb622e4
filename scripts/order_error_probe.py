"""Measured force error vs Chebyshev order, for calibrating the order
policy against reality instead of the theoretical bound.

required_order's bound is known-conservative: the measured error sits
~1.5 orders below it (ops/fmm.fmm_order docstring, tests/test_fmm.py).
This probe quantifies that gap as a CURVE: for each (scheme, solver)
pair it sweeps m and reports max / p99 relative force error on a
4096-row sample vs an exact rectangular sweep, plus the chained step
time.  The output feeds the measured-calibration decision for
required_order/fmm_order (docs/DESIGN.md).

Usage: python scripts/order_error_probe.py [N]
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from murb_tpu import G
from murb_tpu.cli import enable_compile_cache
from murb_tpu.core.init import SCHEMES
from murb_tpu.ops import fmm
from murb_tpu.ops.naive import acc_rect
from murb_tpu.ops.proxy import acc_proxy, bounding_box, required_order
from murb_tpu.utils.probe import chain_time

enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_704
SOFT = 2.0e8
SAMPLE = 4096
ITERS = 30
eps = jnp.float32(1e-30)


def ref_forces(s, gm):
    parts = []
    for k in range(0, SAMPLE, 512):
        r = acc_rect(s.qx[k:k + 512], s.qy[k:k + 512], s.qz[k:k + 512],
                     s.qx, s.qy, s.qz, gm, SOFT)
        parts.append(np.stack([np.asarray(r.ax), np.asarray(r.ay),
                               np.asarray(r.az)]))
    rx, ry, rz = np.concatenate(parts, axis=1)
    rn = np.sqrt(rx ** 2 + ry ** 2 + rz ** 2)
    return (rx, ry, rz), np.maximum(rn, rn.max() * 1e-6)


def report(tag, s, gm, ref, floor, a, dt):
    rx, ry, rz = ref
    err = np.sqrt((np.asarray(a.ax[:SAMPLE]) - rx) ** 2
                  + (np.asarray(a.ay[:SAMPLE]) - ry) ** 2
                  + (np.asarray(a.az[:SAMPLE]) - rz) ** 2) / floor
    sel = np.asarray(s.m[:SAMPLE]) > 0
    e = err[sel]
    print(f"{tag:34s} {dt:8.3f} ms  max={e.max():.2e} "
          f"p99={np.percentile(e, 99):.2e}", flush=True)


for key, solver in (("random", "fmm"), ("galaxy", "proxy")):
    s = SCHEMES[key](N, 1)
    gm = jnp.asarray(G, s.qx.dtype) * s.m
    ref, floor = ref_forces(s, gm)
    c, h = jax.device_get(bounding_box(s.qx, s.qy, s.qz, gm > 0))
    half = float(np.max(h))
    print(f"--- scheme={key} solver={solver} half={half:.3e} "
          f"soft={SOFT:.1e} half/soft={half / SOFT:.1f}")

    if solver == "fmm":
        bound = fmm.fmm_order(half, SOFT, 2)
        print(f"    fmm_order bound (L=2, tol=1e-4): m={bound}")
        for m in (6, 7, 8, 9, 10):
            fn = lambda q: fmm.acc_fmm(q, s.qy, s.qz, gm, SOFT,
                                       m=m, levels=2)
            a = jax.block_until_ready(fn(s.qx))
            dt = chain_time("", lambda z: fn(s.qx + z * eps).ax[0],
                            ITERS, quiet=True)
            report(f"fmm m={m} L=2", s, gm, ref, floor, a, dt)
    else:
        bound = required_order(half, SOFT, 1e-4)
        print(f"    required_order bound (tol=1e-4): m={bound}")
        for m in (10, 12, 14, 16):
            fn = lambda q: acc_proxy(q, s.qy, s.qz, gm, SOFT, m=m)
            a = jax.block_until_ready(fn(s.qx))
            dt = chain_time("", lambda z: fn(s.qx + z * eps).ax[0],
                            ITERS, quiet=True)
            report(f"proxy m={m}", s, gm, ref, floor, a, dt)
