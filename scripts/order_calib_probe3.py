"""Concentrated-distribution check for the fmm_order calibration.

The two-galaxy tab at a softening scaled to its own units (half/soft
matched to the random-box probe at 3.3, so the Chebyshev analyticity
ratio -- and hence the order bound -- is identical): two dense clusters
in a wide box, the adversarial case for same-cell interpolation.

Usage: python scripts/order_calib_probe3.py
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
from murb_tpu.core.init import init_milkyway_andromeda
from murb_tpu.ops import fmm
from murb_tpu.ops.naive import acc_rect
from murb_tpu.ops.proxy import bounding_box
from murb_tpu.utils.probe import chain_time

enable_compile_cache()

SAMPLE = 4096
eps = jnp.float32(1e-30)

tab = "/tmp/murb_bench_mw_andromeda.tab"
if not os.path.exists(tab):
    subprocess.run([sys.executable, "scripts/make_two_galaxy_tab.py", tab],
                   check=True, capture_output=True)
s = init_milkyway_andromeda(tab)
gm = jnp.asarray(G, s.qx.dtype) * s.m
c, h = jax.device_get(bounding_box(s.qx, s.qy, s.qz, gm > 0))
half = float(np.max(h))
soft = half / 3.325                  # match the random-box probe's ratio
lv = fmm.required_levels(half, soft)
print(f"two-galaxy: n={s.qx.shape[0]} half={half:.3e} soft={soft:.3e} "
      f"half/soft={half / soft:.2f} required_levels={lv} "
      f"bound m={fmm.fmm_order(half, soft, lv)}")

parts = []
for k in range(0, SAMPLE, 512):
    r = acc_rect(s.qx[k:k + 512], s.qy[k:k + 512], s.qz[k:k + 512],
                 s.qx, s.qy, s.qz, gm, soft)
    parts.append(np.stack([np.asarray(r.ax), np.asarray(r.ay),
                           np.asarray(r.az)]))
rx, ry, rz = np.concatenate(parts, axis=1)
rn = np.sqrt(rx ** 2 + ry ** 2 + rz ** 2)
floor = np.maximum(rn, rn.max() * 1e-6)

for m in (6, 7, 8, 9, 10):
    fn = lambda q: fmm.acc_fmm(q, s.qy, s.qz, gm, soft, m=m, levels=lv)
    a = jax.block_until_ready(fn(s.qx))
    dt = chain_time("", lambda z: fn(s.qx + z * eps).ax[0], 20,
                    quiet=True)
    err = np.sqrt((np.asarray(a.ax[:SAMPLE]) - rx) ** 2
                  + (np.asarray(a.ay[:SAMPLE]) - ry) ** 2
                  + (np.asarray(a.az[:SAMPLE]) - rz) ** 2) / floor
    sel = np.asarray(gm[:SAMPLE]) > 0
    e = err[sel]
    print(f"twogal m={m:2d} L={lv}  {dt:8.3f} ms  "
          f"max={e.max():.2e} p99={np.percentile(e, 99):.2e}", flush=True)
