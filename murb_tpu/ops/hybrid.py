"""Hybrid VPU+MXU all-pairs kernel -- the single-chip flagship.

Division of labor per (j, i) block, chosen from measured v5e costs
(scripts/hybrid_probe.py):

  VPU:  dx,dy,dz = r_j - r_i ; d2 = |d|^2 + eps^2 ; w = rsqrt(d2)^3
        (~10 fp32 VPU slots/pair + ~4 for the hardware rsqrt -- measured
        at the VPU's throughput ceiling)
  MXU:  P = A_p @ W  with A_p rows [Gm*qx_j, Gm*qy_j, Gm*qz_j, Gm_j]
        (G*m folded into A_p so the VPU never multiplies by mass -- the
        reference's devGM trick taken one step further,
        ref: SimulationNBodyCUDATileFullDevice.cu:41-45).  A_p is ALWAYS
        Dekker-split into bf16 hi+lo row blocks (16 rows total): an M=8
        matmul already pads to the MXU's 128 result rows, so widening M to
        16 is free -- ~16-bit mantissa on every A_p element for one extra
        (8, BI) VPU add.  (Measured: the un-split bf16 A_p -- not W --
        dominated the 2-pass error, ~3e-3 max vs the ~3e-5 this split
        restores.)
  VPU epilogue (O(N)): a_i = P[0:3, i] - q_i * P[3, i]

Why not the norm-expansion matmul for d2 (ops/mxu.py)?  A K=8 or M=8 matmul
pads to 128 on the systolic array, so an fp32-accurate (HIGHEST) S matmul
costs ~6x the whole VPU distance chain.  Computing d2 directly on the VPU is
both faster and exactly accurate (no cancellation).

``passes`` controls W precision on the MXU:
  1 (default) -- W rounded to bf16; ~0.4% error per weight, which averages
      out over the j sum to ~1e-4..4e-3 relative force error concentrated in
      cancellation-dominated components; passes the reference's 1e-3/1e-1
      trajectory tolerances (tests/test_engines_differential.py).
  2 -- Dekker-style split W = W_hi + W_lo (two bf16 matmuls): ~16-bit
      mantissa on every weight; with the always-on A_p split this lands at
      ~3e-5 max relative force error (measured vs the exact oracle at
      N=2048, both schemes) -- genuinely fp32-class; ~20% slower.

Replaces the reference's CUDA flagship kernels (gpu+tile+full / ...200k,
ref: SimulationNBodyCUDATileFullDevice.cu:53-153) as the production path.
Rectangular (i-set x j-set) for the distributed engines.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from murb_tpu.ops.common import Accel, pick_block


def _hybrid_kernel(qxj, qyj, qzj, qxi, qyi, qzi, ap, axo, ayo, azo, acc,
                   *, soft2, passes):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    # ---- VPU: softened inverse-cube weights, W[j, i]
    # Compute in fp32 regardless of state dtype: the TPU has no f64 vector
    # unit and no bf16 rsqrt (backend abort); the Dekker split below needs
    # fp32 headroom anyway.  The caller casts outputs back.
    f32 = lambda r: r[...].astype(jnp.float32)
    dx = f32(qxj) - f32(qxi)            # (BJ,1) - (1,BI) -> (BJ,BI)
    dy = f32(qyj) - f32(qyi)
    dz = f32(qzj) - f32(qzi)
    d2 = (dx * dx + soft2) + dy * dy + dz * dz
    inv = jax.lax.rsqrt(d2)
    w32 = inv * inv * inv

    # A_p arrives fp32 and is Dekker-split HERE, inside the kernel: an
    # XLA-level split gets folded away by the algebraic simplifier's
    # upcast-of-downcast elision (measured: lo rows silently zeroed, error
    # back at ~4e-3 -- the same hazard CLAUDE.md documents for bf16x3
    # dots in interpret mode).  Mosaic never folds in-kernel splits.
    ap32 = ap[...].astype(jnp.float32)
    ap_hi = ap32.astype(jnp.bfloat16)
    ap_lo = (ap32 - ap_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    ap16 = jnp.concatenate([ap_hi, ap_lo], axis=0)        # (16, BJ)

    def dot_p(w):
        # hi rows 0:8, Dekker lo rows 8:16; M=16 costs the same as M=8 on
        # the 128-row systolic array, so the hi+lo fold is one (8, BI)
        # VPU add per pass.
        p16 = jax.lax.dot_general(
            ap16, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return p16[0:8, :] + p16[8:16, :]

    # ---- MXU: P[(gm qx, gm qy, gm qz, gm), i] = sum_j A_p[:, j] * W[j, i]
    w_hi = w32.astype(jnp.bfloat16)
    p = dot_p(w_hi)
    if passes == 2:
        w_lo = (w32 - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        p += dot_p(w_lo)

    @pl.when(j == 0)
    def _init():
        acc[...] = p

    @pl.when(j > 0)
    def _accumulate():
        acc[...] += p

    # ---- epilogue after the full j sweep: a_i = P[0:3] - q_i * P[3]
    @pl.when(j == nj - 1)
    def _epilogue():
        sw = acc[3:4, :]
        axo[...] = acc[0:1, :] - qxi[...].astype(jnp.float32) * sw
        ayo[...] = acc[1:2, :] - qyi[...].astype(jnp.float32) * sw
        azo[...] = acc[2:3, :] - qzi[...].astype(jnp.float32) * sw


@functools.partial(
    jax.jit,
    static_argnames=("soft", "block_i", "block_j", "passes", "interpret"),
)
def acc_hybrid_rect(qxi, qyi, qzi, qxj, qyj, qzj, gmj, soft, *,
                    block_i: int = 0, block_j: int = 0, passes: int = 1,
                    interpret: bool | None = None) -> Accel:
    """Accelerations of the i-set due to the j-set via the hybrid kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from murb_tpu.ops.common import notify_fp32_compute

    notify_fp32_compute("tpu+hybrid", qxi.dtype)
    ni = qxi.shape[0]
    nj = qxj.shape[0]
    # Measured optimum at large N: wide i-lanes, 1k j-rows per block.
    bi = block_i or pick_block(ni, 2048)
    bj = block_j or pick_block(nj, 1024)
    assert ni % bi == 0 and nj % bj == 0, (ni, nj, bi, bj)
    dtype = qxi.dtype
    soft2 = float(soft) ** 2

    zeros = jnp.zeros_like(gmj)
    a_p = jnp.stack([gmj * qxj, gmj * qyj, gmj * qzj, gmj,
                     zeros, zeros, zeros, zeros]).astype(jnp.float32)

    jspec = pl.BlockSpec((bj, 1), lambda i, j: (j, 0))
    ispec = pl.BlockSpec((1, bi), lambda i, j: (0, i))
    aspec = pl.BlockSpec((8, bj), lambda i, j: (0, j))
    ospec = pl.BlockSpec((1, bi), lambda i, j: (0, i))

    col = lambda a: a.reshape(-1, 1)
    row = lambda a: a.reshape(1, -1)

    ax, ay, az = pl.pallas_call(
        functools.partial(_hybrid_kernel, soft2=soft2, passes=passes),
        grid=(ni // bi, nj // bj),
        in_specs=[jspec, jspec, jspec, ispec, ispec, ispec, aspec],
        out_specs=[ospec, ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((1, ni), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((8, bi), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * ni * nj,
            bytes_accessed=int((12 * nj * (ni // bi) + 9 * ni) * 4),
            transcendentals=ni * nj,
        ),
        interpret=interpret,
    )(col(qxj), col(qyj), col(qzj), row(qxi), row(qyi), row(qzi), a_p)

    return Accel(
        ax.reshape(ni).astype(dtype),
        ay.reshape(ni).astype(dtype),
        az.reshape(ni).astype(dtype),
    )


def acc_hybrid(qx, qy, qz, gm, soft, *, block_i: int = 0, block_j: int = 0,
               passes: int = 1, interpret: bool | None = None) -> Accel:
    """Square all-pairs case (the single-chip flagship engine)."""
    return acc_hybrid_rect(qx, qy, qz, qx, qy, qz, gm, soft,
                           block_i=block_i, block_j=block_j, passes=passes,
                           interpret=interpret)
