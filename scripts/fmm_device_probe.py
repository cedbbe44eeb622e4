"""True on-device stage times for the fused FMM pipeline.

Per-dispatch relay latency (~1.5-2 ms through axon) swamps single-call
timings, so each stage runs inside ONE jitted fori_loop whose carry chains
the stage output back into its input (a real data dependency -- fake ones
get hoisted).  Reported time = total / iters.

Usage: python scripts/fmm_device_probe.py [N] [m] [levels] [iters]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from murb_tpu import G
from murb_tpu.cli import enable_compile_cache
from murb_tpu.core.init import SCHEMES
from murb_tpu.ops import fmm
from murb_tpu.ops.proxy import bounding_box

enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 10
LEVELS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 30
SOFT = 2.0e8
C = 2 ** LEVELS

s = SCHEMES["random"](N, 1)
gm = jnp.asarray(G, s.qx.dtype) * s.m
qx, qy, qz = s.qx, s.qy, s.qz
c, h = jax.device_get(bounding_box(qx, qy, qz, gm > 0))
c, h = jnp.asarray(c), jnp.asarray(h)

from murb_tpu.ops.fmm_pallas import (fmm_fused_block, l2p_grid_fused,
                                     m2l_fused_tile, m2l_level_fused,
                                     p2m_grid_fused)

block = fmm_fused_block(N, M, C)
tile = m2l_fused_tile(M, C, 3)
print(f"N={N} m={M} L={LEVELS} C={C} block={block} tile={tile}")

w0 = jax.block_until_ready(
    p2m_grid_fused(qx, qy, qz, gm, c, h, m=M, C=C, block=block)
    if block else fmm.p2m_grid(qx, qy, qz, gm, c, h, m=M, C=C))


from murb_tpu.utils.probe import chain_time as _chain_time


def chain_time(name, body):
    """body(carry_scalar) -> new_scalar; carry forces serialization."""
    _chain_time(name, body, ITERS)


eps = jnp.float32(1e-30)

if block:
    chain_time("p2m_grid_fused", lambda z: p2m_grid_fused(
        qx + z * eps, qy, qz, gm, c, h, m=M, C=C, block=block)[0, 0])
chain_time("p2m_grid (jnp)", lambda z: fmm.p2m_grid(
    qx + z * eps, qy, qz, gm, c, h, m=M, C=C)[0, 0])

hl = h / C
if tile:
    chain_time("m2l_level_fused finest", lambda z: m2l_level_fused(
        w0 + z * eps, hl, SOFT, m=M, C=C, tile=tile)[0][0, 0])
    chain_time("m2l_level_fused finest bf16x3", lambda z: m2l_level_fused(
        w0 + z * eps, hl, SOFT, m=M, C=C, tile=tile,
        exact_dots=False)[0][0, 0])
    chain_time("m2l finest near-subset", lambda z: m2l_level_fused(
        w0 + z * eps, hl, SOFT, m=M, C=C, tile=tile,
        subset="near")[0][0, 0])

chain_time("fmm_field_grid full (fused)", lambda z: fmm.fmm_field_grid(
    w0 + z * eps, h, SOFT, m=M, levels=LEVELS, fused=True)[0][0, 0])

if LEVELS > 1:
    chain_time("m2m one level", lambda z: fmm.m2m(
        w0 + z * eps, m=M, C=C)[0, 0])
    f_half = jnp.zeros(((C // 2) ** 3, M ** 3), jnp.float32)
    chain_time("l2l one level", lambda z: fmm.l2l(
        f_half + z * eps, m=M, C=C // 2)[0, 0])

fields = tuple(jnp.zeros((C ** 3, M ** 3), jnp.float32) for _ in range(3))
if block:
    chain_time("l2p_grid_fused", lambda z: l2p_grid_fused(
        qx + z * eps, qy, qz, c, h, fields, m=M, C=C, block=block)[0][0])

chain_time("bounding_box", lambda z: bounding_box(
    qx + z * eps, qy, qz, gm > 0)[0][0])

from murb_tpu.ops.naive import acc_rect
from murb_tpu.ops.proxy import heavy_source_acc

chain_time("heavy_source_acc (k=1)", lambda z: heavy_source_acc(
    qx + z * eps, qy, qz, (qx[:1], qy[:1], qz[:1]), gm[:1], SOFT)[0, 0])
chain_time("heavy_target rect (1 x N)", lambda z: acc_rect(
    qx[:1] + z * eps, qy[:1], qz[:1], qx, qy, qz, gm, SOFT).ax[0])

chain_time("acc_fmm full", lambda z: fmm.acc_fmm(
    qx + z * eps, qy, qz, gm, SOFT, m=M, levels=LEVELS).ax[0])
