"""Robustness check for the measured fmm_order calibration.

order_error_probe.py measured the error-vs-m curve on the uniform random
box (prefactor C ~ 0.1 vs the bound's C = 1).  Before calibrating the
policy on that, this probe checks the two distribution axes that could
break it:

  * concentration: the two-galaxy merger ICs (two dense clusters in a
    wide box -- the production wide-box workload), where same-cell
    interpolation sees clustered mass;
  * N: the random box at N=8192 (does the prefactor drift with count?).

Usage: python scripts/order_calib_probe2.py
"""
import os
import subprocess
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from murb_tpu import G
from murb_tpu.cli import enable_compile_cache
from murb_tpu.core.init import SCHEMES, init_milkyway_andromeda
from murb_tpu.ops import fmm
from murb_tpu.ops.naive import acc_rect
from murb_tpu.ops.proxy import bounding_box
from murb_tpu.utils.probe import chain_time

enable_compile_cache()

SOFT = 2.0e8
SAMPLE = 4096
eps = jnp.float32(1e-30)


def ref_forces(qx, qy, qz, gm):
    parts = []
    for k in range(0, SAMPLE, 512):
        r = acc_rect(qx[k:k + 512], qy[k:k + 512], qz[k:k + 512],
                     qx, qy, qz, gm, SOFT)
        parts.append(np.stack([np.asarray(r.ax), np.asarray(r.ay),
                               np.asarray(r.az)]))
    rx, ry, rz = np.concatenate(parts, axis=1)
    rn = np.sqrt(rx ** 2 + ry ** 2 + rz ** 2)
    return (rx, ry, rz), np.maximum(rn, rn.max() * 1e-6)


def sweep(tag, qx, qy, qz, gm, mvals, levels):
    ref, floor = ref_forces(qx, qy, qz, gm)
    for m in mvals:
        fn = lambda q: fmm.acc_fmm(q, qy, qz, gm, SOFT, m=m,
                                   levels=levels)
        a = jax.block_until_ready(fn(qx))
        dt = chain_time("", lambda z: fn(qx + z * eps).ax[0], 20,
                        quiet=True)
        err = np.sqrt((np.asarray(a.ax[:SAMPLE]) - ref[0]) ** 2
                      + (np.asarray(a.ay[:SAMPLE]) - ref[1]) ** 2
                      + (np.asarray(a.az[:SAMPLE]) - ref[2]) ** 2) / floor
        sel = np.asarray(gm[:SAMPLE]) > 0
        e = err[sel]
        print(f"{tag} m={m:2d} L={levels}  {dt:8.3f} ms  "
              f"max={e.max():.2e} p99={np.percentile(e, 99):.2e}",
              flush=True)


# --- two-galaxy merger ICs (wide box, concentrated clusters) ----------
tab = "/tmp/murb_bench_mw_andromeda.tab"
if not os.path.exists(tab):
    subprocess.run([sys.executable, "scripts/make_two_galaxy_tab.py", tab],
                   check=True, capture_output=True)
s = init_milkyway_andromeda(tab)
gm = jnp.asarray(G, s.qx.dtype) * s.m
c, h = jax.device_get(bounding_box(s.qx, s.qy, s.qz, gm > 0))
half = float(np.max(h))
lv = fmm.required_levels(half, SOFT)
print(f"two-galaxy: n={s.qx.shape[0]} half={half:.3e} "
      f"half/soft={half / SOFT:.1f} required_levels={lv} "
      f"bound m={fmm.fmm_order(half, SOFT, lv)}")
sweep("twogal", s.qx, s.qy, s.qz, gm, (6, 7, 8, 9, 10, 12), lv)

# --- random at small N ------------------------------------------------
s = SCHEMES["random"](8192, 7)
gm = jnp.asarray(G, s.qx.dtype) * s.m
c, h = jax.device_get(bounding_box(s.qx, s.qy, s.qz, gm > 0))
half = float(np.max(h))
print(f"random n=8192 half={half:.3e} half/soft={half / SOFT:.1f} "
      f"bound m={fmm.fmm_order(half, SOFT, 2)}")
sweep("rand8k", s.qx, s.qy, s.qz, gm, (7, 8, 10), 2)
