"""Full-chain acc_fmm differentials at the ENGINE's padded N.

Per-stage chained probes are unreliable here (CLAUDE.md "Timing ground
rules": sub-ms stages carry a ~0.9 ms floor and stage numbers don't sum
to the full step).  This probe instead times the COMPLETE acc_fmm chain
under one-knob variations, so every number is a real step time and the
differences attribute cost to the varied stage:

  * m2l_dots fp32 vs bf16x3  -> the 6-pass vs 3-pass matmul delta; the
    fp32 M2L matmul share is ~2x that delta.
  * m in {10, 8}             -> m3p 1024 vs 512: M2L matmul ~4x smaller,
    anterpolation ~2x smaller.
  * levels 2 vs 3            -> depth trade at matched accuracy orders.

Usage: python scripts/fmm_fullchain_probe.py [N] [iters]
N defaults to 200704 (= 2048*98, the divisor-rich engine padding, so the
fused anterpolation engages exactly as in production).
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from murb_tpu import G
from murb_tpu.cli import enable_compile_cache
from murb_tpu.core.init import SCHEMES
from murb_tpu.ops import fmm
from murb_tpu.utils.probe import chain_time

enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_704
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 40
SOFT = 2.0e8

s = SCHEMES["random"](N, 1)
gm = jnp.asarray(G, s.qx.dtype) * s.m
eps = jnp.float32(1e-30)

print(f"N={N} (fused block engaged: {N % 256 == 0})")


def run(name, **kw):
    fn = lambda z: fmm.acc_fmm(s.qx + z * eps, s.qy, s.qz, gm, SOFT,
                               **kw).ax[0]
    chain_time(name, fn, ITERS)


run("acc_fmm m=10 L=2 fp32 (default)", m=10, levels=2)
run("acc_fmm m=10 L=2 bf16x3", m=10, levels=2, m2l_dots="bf16x3")
run("acc_fmm m=8  L=2 fp32", m=8, levels=2)
run("acc_fmm m=8  L=2 bf16x3", m=8, levels=2, m2l_dots="bf16x3")
run("acc_fmm m=6  L=3 fp32", m=6, levels=3)
run("acc_fmm m=12 L=2 fp32", m=12, levels=2)
