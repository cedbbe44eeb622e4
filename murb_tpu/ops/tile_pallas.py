"""Blockwise all-pairs Pallas kernel: the TPU analogue of the CUDA tile family.

The reference's flagship CUDA kernel stages TILE-sized j-blocks through shared
memory while each thread keeps EPT i-bodies in registers
(ref: src/murb/implem/SimulationNBodyCUDATileFullDevice.cu:53-153).  The TPU
translation: a 2-D Pallas grid over (i-blocks, j-blocks); j-blocks stream
HBM -> VMEM via the automatic block pipeline; the (BI, 1) acceleration
accumulator lives in the revisited output block in VMEM and is carried across
the j (reduction) grid dimension -- the FlashAttention-style blockwise
structure (SURVEY.md section 5, long-context analogue).

All arithmetic is VPU elementwise work on (BI, BJ) broadcasts:

    d2  = |r_j - r_i|^2 + eps^2          (fma chain)
    w   = G*m_j * rsqrt(d2)^3
    a_i += sum_j w * (r_j - r_i)

Zero-mass ghosts contribute exactly 0 through gm == 0, and the j == i
self-term is killed by the softening (same invariants as the reference tile
kernels, ref: SimulationNBodyCUDATile.cu:138-143).

The kernel is *rectangular*: the i-set (rows whose accelerations we own) and
the j-set (sources) may differ -- this is what the distributed engines stream
through (`murb_tpu.parallel`).  The square all-pairs case passes the same
arrays for both sides.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from murb_tpu.ops.common import Accel, BlockSpec, f32_inputs, pick_block


def _tile_kernel(qxi, qyi, qzi, qxj, qyj, qzj, gmj, ax, ay, az, *, soft2):
    # Pallas kernels compute in fp32: the TPU has no f64 vector unit and no
    # bf16 rsqrt (backend abort) -- bf16/f64 state is up/down-cast here and
    # the caller casts outputs back.  Exact f64 users belong on the jnp
    # oracle/chunked paths (CPU).
    j = pl.program_id(1)
    f32 = lambda r: r[...].astype(jnp.float32)

    dx = f32(qxj) - f32(qxi)          # (1, BJ) - (BI, 1) -> (BI, BJ)
    dy = f32(qyj) - f32(qyi)
    dz = f32(qzj) - f32(qzi)

    d2 = dx * dx + dy * dy + dz * dz + soft2
    inv = jax.lax.rsqrt(d2)
    w = f32(gmj) * (inv * inv * inv)  # (1, BJ) * (BI, BJ)

    pax = jnp.sum(w * dx, axis=1, keepdims=True)   # (BI, 1)
    pay = jnp.sum(w * dy, axis=1, keepdims=True)
    paz = jnp.sum(w * dz, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _init():
        ax[...] = pax
        ay[...] = pay
        az[...] = paz

    @pl.when(j > 0)
    def _acc():
        ax[...] += pax
        ay[...] += pay
        az[...] += paz


@functools.partial(
    jax.jit, static_argnames=("soft", "block_i", "block_j", "interpret")
)
def acc_tile_rect(qxi, qyi, qzi, qxj, qyj, qzj, gmj, soft, *,
                  block_i: int = 0, block_j: int = 0,
                  interpret: bool | None = None) -> Accel:
    """Accelerations of the i-set due to the j-set (rectangular sweep)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from murb_tpu.ops.common import notify_fp32_compute

    notify_fp32_compute("tpu+tile", qxi.dtype)
    dtype_in = qxi.dtype
    qxi, qyi, qzi, qxj, qyj, qzj, gmj = f32_inputs(
        qxi, qyi, qzi, qxj, qyj, qzj, gmj)
    ni = qxi.shape[0]
    nj = qxj.shape[0]
    bi = block_i or pick_block(ni, 256)
    bj = block_j or pick_block(nj, 2048)
    assert ni % bi == 0 and nj % bj == 0, (ni, nj, bi, bj)
    dtype = dtype_in
    soft2 = float(soft) ** 2

    col = lambda a: a.reshape(-1, 1)
    row = lambda a: a.reshape(1, -1)

    ispec = BlockSpec((bi, 1), lambda i, j: (i, 0))
    jspec = BlockSpec((1, bj), lambda i, j: (0, j))
    ospec = BlockSpec((bi, 1), lambda i, j: (i, 0))

    grid = (ni // bi, nj // bj)
    out_shape = [jax.ShapeDtypeStruct((ni, 1), jnp.float32)] * 3

    kernel = functools.partial(_tile_kernel, soft2=soft2)
    ax, ay, az = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ispec, ispec, ispec, jspec, jspec, jspec, jspec],
        out_specs=[ospec, ospec, ospec],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * ni * nj,
            bytes_accessed=int((3 * ni + 4 * nj * (ni // bi) + 3 * ni) * 4),
            transcendentals=ni * nj,
        ),
        interpret=interpret,
    )(col(qxi), col(qyi), col(qzi), row(qxj), row(qyj), row(qzj), row(gmj))

    return Accel(ax.reshape(ni).astype(dtype), ay.reshape(ni).astype(dtype),
                 az.reshape(ni).astype(dtype))


def acc_tile(qx, qy, qz, gm, soft, *, block_i: int = 0, block_j: int = 0,
             interpret: bool | None = None) -> Accel:
    """Square all-pairs case (the single-chip engines)."""
    return acc_tile_rect(qx, qy, qz, qx, qy, qz, gm, soft,
                         block_i=block_i, block_j=block_j, interpret=interpret)
