"""acc_fmm speed + measured force error per m2l_dots tier, on the real TPU.

Usage: python scripts/m2l_tier_probe.py [N] [m] [levels]

For each tier (fp32 / mixed / bf16x3) prints the step time and the max /
p99 relative force error on a sampled row block vs an exact rectangular
sweep -- the measurement behind the mixed-tier default decision
(docs/DESIGN.md section 5).
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
from murb_tpu.ops.naive import acc_rect

enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 10
LEVELS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
SOFT = 2.0e8
SAMPLE = 4096

s = SCHEMES["random"](N, 1)
gm = jnp.asarray(G, s.qx.dtype) * s.m

parts = []
for k in range(0, SAMPLE, 512):
    r = acc_rect(s.qx[k:k + 512], s.qy[k:k + 512], s.qz[k:k + 512],
                 s.qx, s.qy, s.qz, gm, SOFT)
    parts.append(np.stack([np.asarray(r.ax), np.asarray(r.ay),
                           np.asarray(r.az)]))
refx, refy, refz = np.concatenate(parts, axis=1)
ref = type("R", (), {"ax": refx, "ay": refy, "az": refz})
rn = np.sqrt(refx ** 2 + refy ** 2 + refz ** 2)
floor = np.maximum(rn, rn.max() * 1e-6)

from murb_tpu.utils.probe import chain_time

ITERS = 20
for dots in ("fp32", "mixed", "bf16x3"):
    fn = lambda q: fmm.acc_fmm(q, s.qy, s.qz, gm, SOFT, m=M,
                               levels=LEVELS, m2l_dots=dots)
    a = jax.block_until_ready(fn(s.qx))
    dt = chain_time(dots, lambda z: fn(s.qx + z * jnp.float32(1e-30)).ax[0],
                    ITERS, quiet=True)
    err = np.sqrt(
        (np.asarray(a.ax[:SAMPLE]) - np.asarray(ref.ax)) ** 2
        + (np.asarray(a.ay[:SAMPLE]) - np.asarray(ref.ay)) ** 2
        + (np.asarray(a.az[:SAMPLE]) - np.asarray(ref.az)) ** 2) / floor
    sel = np.asarray(s.m[:SAMPLE]) > 0
    err = err[sel]
    print(f"{dots:8s} {dt:8.2f} ms   force err max {err.max():.2e} "
          f"p99 {np.percentile(err, 99):.2e}")
