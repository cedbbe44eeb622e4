"""MXU all-pairs kernel: squared distances and force reduction as matmuls.

The direct tile kernel (``tile_pallas.py``) is VPU-bound at ~16 vector ops per
interaction.  This kernel restructures the O(N^2) sweep so the systolic array
does the heavy lifting -- the same shape as a FlashAttention block:

  1. ``S = A^T B``  (MXU):  with K = 8 packed rows, S[j, i] directly equals
       |r_j - r_i|^2 + eps^2  via the norm expansion
       |r_j|^2 - 2 r_j . r_i + (|r_i|^2 + eps^2)
     A rows: [qx_j, qy_j, qz_j, |q_j|^2, 1, 0, 0, 0]
     B rows: [-2qx_i, -2qy_i, -2qz_i, 1, |q_i|^2 + eps^2, 0, 0, 0]
  2. ``W = gm_j * rsqrt(S)^3``  (VPU, ~4 ops/pair -- the "softmax" analogue)
  3. ``P = A W``  (MXU, K = BJ):  P[0:3] = sum_j w q_j,  P[4] = sum_j w
  4. epilogue (VPU, O(N)):  a_i = P[0:3, i] - q_i * P[4, i]

Coordinates are centered (Gm-weighted mean subtracted) before the norm
expansion so fp32/bf16x3 cancellation stays far below the softening floor;
forces are translation-invariant so the result is unchanged.

Accuracy knobs: ``precision`` for the big P matmul -- "highest" (bf16x6),
"high" (bf16x3, default: ~fp32 for this dynamic range), "default" (one bf16
pass, fastest, ~0.4% force error -- the bf16 speed tier).

Replaces the reference's N=200k-tuned 1-body-per-thread CUDA variant
(ref: src/murb/implem/SimulationNBodyCUDATileFullDevice200k.cu:102-175) as the
large-N flagship.  Rectangular (i-set x j-set) for the distributed engines.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from murb_tpu.ops.common import Accel, BlockSpec, f32_inputs, pick_block

# Mosaic's dot lowering accepts only DEFAULT and HIGHEST
# (jax/_src/pallas/mosaic/lowering.py _dot_general_lowering_rule); "high"
# therefore maps to HIGHEST inside kernels.
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGHEST,
    "highest": jax.lax.Precision.HIGHEST,
}


def _mxu_kernel(a_ref, b_ref, gmj_ref, qxi_ref, qyi_ref, qzi_ref,
                ax, ay, az, acc, *, precision, s_precision):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    # ---- 1. squared distances on the MXU: S[j, i] = d2 + eps^2
    s = jax.lax.dot_general(
        a_ref[...], b_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=s_precision,
    )  # (BJ, BI)

    # ---- 2. interaction weights on the VPU
    inv = jax.lax.rsqrt(s)
    w = gmj_ref[...] * (inv * inv * inv)   # (BJ, 1) * (BJ, BI)

    # ---- 3. weighted reduction over j on the MXU: P = A @ W, K = BJ
    p = jax.lax.dot_general(
        a_ref[...], w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (8, BI):  rows 0..2 = sum w*q_j, row 4 = sum w

    @pl.when(j == 0)
    def _init():
        acc[...] = p

    @pl.when(j > 0)
    def _accumulate():
        acc[...] += p

    # ---- 4. epilogue once the j sweep is complete
    @pl.when(j == nj - 1)
    def _epilogue():
        sw = acc[4:5, :]                       # (1, BI)  sum_j w
        ax[...] = acc[0:1, :] - qxi_ref[...] * sw
        ay[...] = acc[1:2, :] - qyi_ref[...] * sw
        az[...] = acc[2:3, :] - qzi_ref[...] * sw


@functools.partial(
    jax.jit,
    static_argnames=("soft", "block_i", "block_j", "precision", "s_precision",
                     "interpret", "center"),
)
def acc_mxu_rect(qxi, qyi, qzi, qxj, qyj, qzj, gmj, soft, *,
                 block_i: int = 0, block_j: int = 0,
                 precision: str = "high", s_precision: str = "highest",
                 interpret: bool | None = None, center: bool = True,
                 center_point=None) -> Accel:
    """Accelerations of the i-set due to the j-set, MXU-offloaded.

    ``center_point`` (cx, cy, cz) overrides the locally-computed centering
    translation -- distributed engines pass a globally psum'd center so all
    shards agree.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from murb_tpu.ops.common import notify_fp32_compute

    notify_fp32_compute("tpu+mxu", qxi.dtype)
    ni = qxi.shape[0]
    nj = qxj.shape[0]
    bi = block_i or pick_block(ni, 512)
    bj = block_j or pick_block(nj, 512)
    assert ni % bi == 0 and nj % bj == 0, (ni, nj, bi, bj)
    dtype = qxi.dtype
    soft2 = jnp.asarray(float(soft) ** 2, dtype)

    # O(N) preprocessing: center, norms, packed operands.
    if center_point is not None:
        cx, cy, cz = center_point
        cqxj, cqyj, cqzj = qxj - cx, qyj - cy, qzj - cz
        cqxi, cqyi, cqzi = qxi - cx, qyi - cy, qzi - cz
    elif center:
        cqxj, cqyj, cqzj, (cx, cy, cz) = _centered_with_point(qxj, qyj, qzj, gmj)
        cqxi, cqyi, cqzi = qxi - cx, qyi - cy, qzi - cz
    else:
        cqxj, cqyj, cqzj = qxj, qyj, qzj
        cqxi, cqyi, cqzi = qxi, qyi, qzi

    nqj = cqxj * cqxj + cqyj * cqyj + cqzj * cqzj
    nqi = cqxi * cqxi + cqyi * cqyi + cqzi * cqzi
    ones_j = jnp.ones_like(nqj)
    zeros_j = jnp.zeros_like(nqj)
    ones_i = jnp.ones_like(nqi)
    zeros_i = jnp.zeros_like(nqi)
    a_mat = jnp.stack([cqxj, cqyj, cqzj, nqj, ones_j,
                       zeros_j, zeros_j, zeros_j])                  # (8, nj)
    m2 = jnp.asarray(-2.0, dtype)
    b_mat = jnp.stack([m2 * cqxi, m2 * cqyi, m2 * cqzi, ones_i, nqi + soft2,
                       zeros_i, zeros_i, zeros_i])                  # (8, ni)

    aspec = BlockSpec((8, bj), lambda i, j: (0, j))
    bspec = BlockSpec((8, bi), lambda i, j: (0, i))
    gspec = BlockSpec((bj, 1), lambda i, j: (j, 0))
    qspec = BlockSpec((1, bi), lambda i, j: (0, i))
    ospec = BlockSpec((1, bi), lambda i, j: (0, i))

    grid = (ni // bi, nj // bj)
    out_shape = [jax.ShapeDtypeStruct((1, ni), jnp.float32)] * 3

    kernel = functools.partial(
        _mxu_kernel,
        precision=_PRECISIONS[precision],
        s_precision=_PRECISIONS[s_precision],
    )
    row = lambda a: a.reshape(1, -1)
    ax, ay, az = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[aspec, bspec, gspec, qspec, qspec, qspec],
        out_specs=[ospec, ospec, ospec],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((8, bi), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * ni * nj,
            bytes_accessed=int((11 * nj * (ni // bi) + 8 * ni) * 4),
            transcendentals=ni * nj,
        ),
        interpret=interpret,
    )(*f32_inputs(a_mat, b_mat, gmj.reshape(-1, 1),
                  row(cqxi), row(cqyi), row(cqzi)))

    return Accel(
        ax.reshape(ni).astype(dtype),
        ay.reshape(ni).astype(dtype),
        az.reshape(ni).astype(dtype),
    )


def _centered_with_point(qx, qy, qz, gm):
    w = gm / jnp.maximum(jnp.sum(gm), jnp.asarray(1.0, gm.dtype))
    cx = jnp.sum(w * qx)
    cy = jnp.sum(w * qy)
    cz = jnp.sum(w * qz)
    return qx - cx, qy - cy, qz - cz, (cx, cy, cz)


def acc_mxu(qx, qy, qz, gm, soft, *, block_i: int = 0, block_j: int = 0,
            precision: str = "high", s_precision: str = "highest",
            interpret: bool | None = None) -> Accel:
    """Square all-pairs case (the single-chip engines)."""
    return acc_mxu_rect(qx, qy, qz, qx, qy, qz, gm, soft,
                        block_i=block_i, block_j=block_j,
                        precision=precision, s_precision=s_precision,
                        interpret=interpret)
