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
  3 -- extended-precision tier: BOTH operands split into 3 bf16 terms
      (8-bit mantissas x3 = 24 bits, i.e. the fp32 operands enter the MXU
      EXACTLY -- each bf16xbf16 partial product is exact in the fp32
      accumulator), plus Kahan-compensated accumulation of the per-block
      partial sums across the j sweep.  The only remaining error is fp32
      rounding inside each dot's K-long sum and the fp32 epilogue; the
      analogue of the reference's `double` engine instantiations
      (ref: SimulationNBodyNaive.cpp double instantiation) at TPU speed.

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

from murb_tpu.ops.common import Accel, BlockSpec, f32_inputs, pick_block


from murb_tpu.ops.common import bsplit as _bsplit  # in-kernel Dekker split


def _hybrid_kernel(qxj, qyj, qzj, qxi, qyi, qzi, ap, axo, ayo, azo, acc,
                   comp=None, *, soft2, passes):
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
    # 2 terms (16-bit mantissa) for passes<=2; 3 terms (exact fp32) for the
    # extended tier.  M=16/24 costs the same as M=8 on the 128-row systolic
    # array, so extra terms cost only one (8, BI) VPU add each per pass.
    nterms = 3 if passes >= 3 else 2
    ap32 = ap[...].astype(jnp.float32)
    apb = jnp.concatenate(_bsplit(ap32, nterms), axis=0)  # (8*nterms, BJ)

    def dot_p(w):
        pb = jax.lax.dot_general(
            apb, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        out = pb[0:8, :]
        for k in range(1, nterms):
            out = out + pb[8 * k:8 * (k + 1), :]
        return out

    # ---- MXU: P[(gm qx, gm qy, gm qz, gm), i] = sum_j A_p[:, j] * W[j, i]
    if passes == 1:
        w_parts = [w32.astype(jnp.bfloat16)]
    else:
        w_parts = _bsplit(w32, passes)
    p = dot_p(w_parts[0])
    for wp in w_parts[1:]:
        p += dot_p(wp)

    @pl.when(j == 0)
    def _init():
        acc[...] = p
        if passes >= 3:
            comp[...] = jnp.zeros_like(p)

    @pl.when(j > 0)
    def _accumulate():
        if passes >= 3:
            # Kahan: comp carries the low-order bits the fp32 add drops,
            # so the cross-block sum doesn't random-walk at 2^-24 per add.
            y = p - comp[...]
            t = acc[...] + y
            comp[...] = (t - acc[...]) - y
            acc[...] = t
        else:
            acc[...] += p

    # ---- epilogue after the full j sweep: a_i = P[0:3] - q_i * P[3]
    @pl.when(j == nj - 1)
    def _epilogue():
        s = acc[...] - comp[...] if passes >= 3 else acc[...]
        sw = s[3:4, :]
        axo[...] = s[0:1, :] - qxi[...].astype(jnp.float32) * sw
        ayo[...] = s[1:2, :] - qyi[...].astype(jnp.float32) * sw
        azo[...] = s[2:3, :] - qzi[...].astype(jnp.float32) * sw


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
    assert passes in (1, 2, 3), passes
    from murb_tpu.ops.common import notify_fp32_compute

    notify_fp32_compute(
        f"tpu+hybrid/p{passes}", qxi.dtype,
        detail=("fp64 state runs the extended tier (exact-fp32 MXU "
                "operands + Kahan blocks, ~1e-6 relative force error)"
                if passes >= 3 else None))
    ni = qxi.shape[0]
    nj = qxj.shape[0]
    # Measured optimum at large N: wide i-lanes, 1k j-rows per block.
    bi = block_i or pick_block(ni, 2048)
    bj = block_j or pick_block(nj, 1024)
    assert ni % bi == 0 and nj % bj == 0, (ni, nj, bi, bj)
    dtype = qxi.dtype
    soft2 = float(soft) ** 2

    zeros = jnp.zeros_like(gmj)
    # A_p products form BEFORE the downcast: with f64 state they round once.
    a_p = jnp.stack([gmj * qxj, gmj * qyj, gmj * qzj, gmj,
                     zeros, zeros, zeros, zeros]).astype(jnp.float32)
    from murb_tpu.ops.common import f32_inputs

    qxj, qyj, qzj, qxi, qyi, qzi = f32_inputs(qxj, qyj, qzj, qxi, qyi, qzi)

    jspec = BlockSpec((bj, 1), lambda i, j: (j, 0))
    ispec = BlockSpec((1, bi), lambda i, j: (0, i))
    aspec = BlockSpec((8, bj), lambda i, j: (0, j))
    ospec = BlockSpec((1, bi), lambda i, j: (0, i))

    col = lambda a: a.reshape(-1, 1)
    row = lambda a: a.reshape(1, -1)

    ax, ay, az = pl.pallas_call(
        functools.partial(_hybrid_kernel, soft2=soft2, passes=passes),
        grid=(ni // bi, nj // bj),
        in_specs=[jspec, jspec, jspec, ispec, ispec, ispec, aspec],
        out_specs=[ospec, ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((1, ni), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((8, bi), jnp.float32)] * (
            2 if passes >= 3 else 1),
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


# ------------------------------------------------- multi-row potential sweep
def _phi_kernel(qxj, qyj, qzj, qxi, qyi, qzi, gmr, phio, acc, *,
                soft2, passes):
    """phi_r[i] = sum_j gmr[r, j] * rsqrt(d_ij^2 + eps^2) for up to 8
    source-weight rows r in ONE O(N^2) sweep: the weight rows ride the
    same (8 -> 128-padded) MXU dimension the force kernel uses, so extra
    rows are free.  The multi-galaxy tracking engine packs one masked
    G*m row per galaxy and gets every per-galaxy potential from a single
    pass (previously one full masked sweep PER galaxy)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    f32 = lambda r: r[...].astype(jnp.float32)
    dx = f32(qxj) - f32(qxi)            # (BJ,1) - (1,BI) -> (BJ,BI)
    dy = f32(qyj) - f32(qyi)
    dz = f32(qzj) - f32(qzi)
    d2 = (dx * dx + soft2) + dy * dy + dz * dz
    inv = jax.lax.rsqrt(d2)             # the weight matrix itself

    a32 = gmr[...].astype(jnp.float32)
    ab = jnp.concatenate(_bsplit(a32, 2), axis=0)         # (16, BJ)

    def dot_p(w):
        pb = jax.lax.dot_general(
            ab, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return pb[0:8, :] + pb[8:16, :]

    if passes == 1:
        w_parts = [inv.astype(jnp.bfloat16)]
    else:
        w_parts = _bsplit(inv, passes)
    p = dot_p(w_parts[0])
    for wp in w_parts[1:]:
        p += dot_p(wp)

    @pl.when(j == 0)
    def _init():
        acc[...] = p

    @pl.when(j > 0)
    def _accumulate():
        acc[...] += p

    @pl.when(j == nj - 1)
    def _done():
        phio[...] = acc[...]


@functools.partial(
    jax.jit,
    static_argnames=("soft", "block_i", "block_j", "passes", "interpret"),
)
def phi_rows_rect(qxi, qyi, qzi, qxj, qyj, qzj, gm_rows, soft, *,
                  block_i: int = 0, block_j: int = 0, passes: int = 2,
                  interpret: bool | None = None) -> jax.Array:
    """(R, ni) potentials of the i-set under R masked source-weight rows
    ``gm_rows`` (R <= 8, nj); rows must already include G.  passes=2 gives
    the fp32-class bf16-split reduction (same tiering as the force kernel).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert passes in (1, 2), passes
    r = gm_rows.shape[0]
    assert r <= 8, r
    notify_dtype = qxi.dtype
    from murb_tpu.ops.common import notify_fp32_compute

    notify_fp32_compute(f"phi_rows/p{passes}", notify_dtype)
    ni = qxi.shape[0]
    nj = qxj.shape[0]
    bi = block_i or pick_block(ni, 2048)
    bj = block_j or pick_block(nj, 1024)
    assert ni % bi == 0 and nj % bj == 0, (ni, nj, bi, bj)
    soft2 = float(soft) ** 2

    gmr = jnp.zeros((8, nj), jnp.float32).at[:r].set(
        gm_rows.astype(jnp.float32))
    qxj, qyj, qzj, qxi, qyi, qzi = f32_inputs(qxj, qyj, qzj, qxi, qyi, qzi)

    jspec = BlockSpec((bj, 1), lambda i, j: (j, 0))
    ispec = BlockSpec((1, bi), lambda i, j: (0, i))
    aspec = BlockSpec((8, bj), lambda i, j: (0, j))
    ospec = BlockSpec((8, bi), lambda i, j: (0, i))

    col = lambda a: a.reshape(-1, 1)
    row = lambda a: a.reshape(1, -1)

    phi = pl.pallas_call(
        functools.partial(_phi_kernel, soft2=soft2, passes=passes),
        grid=(ni // bi, nj // bj),
        in_specs=[jspec, jspec, jspec, ispec, ispec, ispec, aspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((8, ni), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, bi), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * ni * nj,
            bytes_accessed=int((12 * nj * (ni // bi) + 9 * ni) * 4),
            transcendentals=ni * nj,
        ),
        interpret=interpret,
    )(col(qxj), col(qyj), col(qzj), row(qxi), row(qyi), row(qzi), gmr)

    return phi[:r]


def phi_rows(qx, qy, qz, gm_rows, soft, *, passes: int = 2,
             interpret: bool | None = None) -> jax.Array:
    """Square all-pairs multi-row potential sweep."""
    return phi_rows_rect(qx, qy, qz, qx, qy, qz, gm_rows, soft,
                         passes=passes, interpret=interpret)


# ------------------------------------- fused force + multi-row potential
def _hybrid_phi_kernel(qxj, qyj, qzj, qxi, qyi, qzi, ap, gmr,
                       axo, ayo, azo, phio, acc, accp, *, soft2, passes):
    """The force kernel and the multi-row potential kernel FUSED: one
    distance chain + rsqrt per pair feeds both the inv^3 force dot and
    the inv potential dot.  The per-pair increment over force-only is
    the inv split (~2 VPU slots) plus MXU dots that overlap the VPU
    chain -- measured far cheaper than a second full sweep (the
    tracked-multi merger previously paid force + phi_rows back to back).
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    f32 = lambda r: r[...].astype(jnp.float32)
    dx = f32(qxj) - f32(qxi)            # (BJ,1) - (1,BI) -> (BJ,BI)
    dy = f32(qyj) - f32(qyi)
    dz = f32(qzj) - f32(qzi)
    d2 = (dx * dx + soft2) + dy * dy + dz * dz
    inv = jax.lax.rsqrt(d2)
    w32 = inv * inv * inv

    apb = jnp.concatenate(_bsplit(ap[...].astype(jnp.float32), 2), axis=0)
    gb = jnp.concatenate(_bsplit(gmr[...].astype(jnp.float32), 2), axis=0)

    def dot_p(a16, w):
        pb = jax.lax.dot_general(
            a16, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return pb[0:8, :] + pb[8:16, :]

    if passes == 1:
        w_parts = [w32.astype(jnp.bfloat16)]
        i_parts = [inv.astype(jnp.bfloat16)]
    else:
        w_parts = _bsplit(w32, passes)
        i_parts = _bsplit(inv, passes)
    p = dot_p(apb, w_parts[0])
    pp = dot_p(gb, i_parts[0])
    for wp, ip in zip(w_parts[1:], i_parts[1:]):
        p += dot_p(apb, wp)
        pp += dot_p(gb, ip)

    @pl.when(j == 0)
    def _init():
        acc[...] = p
        accp[...] = pp

    @pl.when(j > 0)
    def _accumulate():
        acc[...] += p
        accp[...] += pp

    @pl.when(j == nj - 1)
    def _epilogue():
        s = acc[...]
        sw = s[3:4, :]
        axo[...] = s[0:1, :] - qxi[...].astype(jnp.float32) * sw
        ayo[...] = s[1:2, :] - qyi[...].astype(jnp.float32) * sw
        azo[...] = s[2:3, :] - qzi[...].astype(jnp.float32) * sw
        phio[...] = accp[...]


@functools.partial(
    jax.jit,
    static_argnames=("soft", "block_i", "block_j", "passes", "interpret"),
)
def acc_phi_rows_hybrid(qx, qy, qz, gm, gm_rows, soft, *,
                        block_i: int = 0, block_j: int = 0,
                        passes: int = 2,
                        interpret: bool | None = None):
    """(Accel, phi (R, n)): forces from the full ``gm`` AND up to 8
    masked-row potentials in ONE all-pairs sweep.

    The multi-galaxy tracking engine packs one masked G*m row per galaxy
    (plus the total row when it needs the global potential) and gets
    every per-galaxy potential for the cost of the force sweep plus a
    second MXU dot -- previously it ran the force kernel AND a separate
    phi_rows sweep per step (measured 17.4 vs 33.5 FPS untracked on the
    82k merger).  The potential includes the j == i self term, exactly
    like the reference's tile sweep (callers compensate with Gm_i/eps,
    ref: SimulationNBodyCUDAPropertyTracking.cu:296-302)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert passes in (1, 2), passes
    r = gm_rows.shape[0]
    assert r <= 8, r
    from murb_tpu.ops.common import notify_fp32_compute

    notify_fp32_compute(f"tpu+hybrid+phi/p{passes}", qx.dtype)
    n = qx.shape[0]
    bi = block_i or pick_block(n, 2048)
    bj = block_j or pick_block(n, 1024)
    assert n % bi == 0 and n % bj == 0, (n, bi, bj)
    dtype = qx.dtype
    soft2 = float(soft) ** 2

    zeros = jnp.zeros_like(gm)
    a_p = jnp.stack([gm * qx, gm * qy, gm * qz, gm,
                     zeros, zeros, zeros, zeros]).astype(jnp.float32)
    gmr = jnp.zeros((8, n), jnp.float32).at[:r].set(
        gm_rows.astype(jnp.float32))
    qxj, qyj, qzj, qxi, qyi, qzi = f32_inputs(qx, qy, qz, qx, qy, qz)

    jspec = BlockSpec((bj, 1), lambda i, j: (j, 0))
    ispec = BlockSpec((1, bi), lambda i, j: (0, i))
    aspec = BlockSpec((8, bj), lambda i, j: (0, j))
    ospec = BlockSpec((1, bi), lambda i, j: (0, i))
    pspec = BlockSpec((8, bi), lambda i, j: (0, i))

    col = lambda a: a.reshape(-1, 1)
    row = lambda a: a.reshape(1, -1)

    ax, ay, az, phi = pl.pallas_call(
        functools.partial(_hybrid_phi_kernel, soft2=soft2, passes=passes),
        grid=(n // bi, n // bj),
        in_specs=[jspec, jspec, jspec, ispec, ispec, ispec, aspec, aspec],
        out_specs=[ospec, ospec, ospec, pspec],
        out_shape=[jax.ShapeDtypeStruct((1, n), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((8, n), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((8, bi), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * n * n,
            bytes_accessed=int((16 * n * (n // bi) + 16 * n) * 4),
            transcendentals=n * n,
        ),
        interpret=interpret,
    )(col(qxj), col(qyj), col(qzj), row(qxi), row(qyi), row(qzi), a_p, gmr)

    return (
        Accel(ax.reshape(n).astype(dtype), ay.reshape(n).astype(dtype),
              az.reshape(n).astype(dtype)),
        phi[:r].astype(dtype),
    )
