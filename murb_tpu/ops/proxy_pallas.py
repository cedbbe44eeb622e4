"""Pallas-fused anterpolation stages for the Chebyshev proxy solver.

The XLA formulation of P2M / L2P materializes the combined basis
``syz (N, m^2)`` in HBM and reads it in every contraction -- ~600 MB of
traffic per step at N=200k, m=16, which dominates the proxy step.  These
kernels rebuild the per-dimension bases in VMEM from the raw coordinates
(Chebyshev three-term recurrence: pure fma work) and contract them against
the tiny node-side tensors on the spot, so the only HBM traffic is the
coordinates in and the result out.

Layouts (all lane-friendly, bodies on lanes):
  S_x/S_y/S_z : (m, B)        basis rows per dimension
  syz         : (m^2, B)      built row-block by row-block
  P2M         : W (m, m^2) accumulated in VMEM scratch across the grid
  L2P         : b = F^T (3m, m^2) @ syz -> (3m, B); a_c = sum_u Sx[u]*b_c[u]

Used automatically by ops/proxy.py on TPU for the single-cell path; the XLA
formulation remains the reference implementation and CPU path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from murb_tpu.ops.common import BlockSpec


def fused_block(n: int, m: int = 16) -> int | None:
    """Block size for the fused kernels, or None when they don't apply
    (non-TPU backend or lane-misaligned body count).  The single source of
    the eligibility rule used by every call site.

    The block target is VMEM-capped by the in-kernel syz (m^2, B) build
    (f32 + bf16 hi/lo splits ~ 8 bytes/entry, ~8 MiB budget): m <= 16
    runs B=4096 (measured 5% faster than 2048 at N=200k via fewer grid
    steps), m <= 22 runs 2048, larger orders halve again."""
    if jax.default_backend() != "tpu" or n % 256 != 0:
        return None
    from murb_tpu.ops.common import pick_block

    target = 4096
    while m * m * target * 8 > 8 * 2 ** 20 and target > 256:
        target //= 2
    return pick_block(n, target)


def _tj_nodes(m: int) -> np.ndarray:
    """T_j(t_k) for j=1..m-1 at the first-kind nodes t_k, shape (m, m-1)."""
    j = np.arange(1, m)
    theta = np.pi * (np.arange(m) + 0.5) / m
    return np.cos(np.outer(theta, j))  # (m, m-1)


def _bsplit(x):
    """bf16 hi/lo split: x == hi + lo to ~16 mantissa bits (shared N-term
    implementation: ops/common.bsplit)."""
    from murb_tpu.ops.common import bsplit

    return bsplit(x, 2)


def dot3(a, b, *, tr_b: bool):
    """bf16x3 contraction (a dim 1 with b dim 1 or 0): hi*hi + hi*lo +
    lo*hi, 3 full-rate MXU passes.  Mosaic lacks Precision.HIGH, so this
    hand-rolls the bf16_3x scheme the jnp anterpolation path already uses
    (~2^-21 relative per product, below the interpolation error)."""
    ah, al = _bsplit(a)
    bh, bl = _bsplit(b)
    d = lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (1 if tr_b else 0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _basis_rows(t_row, nodes_ref, m: int):
    """S (m, B) from t (1, B) via the Chebyshev recurrence + one tiny matmul."""
    t = jnp.clip(t_row, -1.0, 1.0)
    rows = [t]
    if m > 2:
        rows.append(2.0 * t * t - 1.0)
        for _ in range(3, m):
            rows.append(2.0 * t * rows[-1] - rows[-2])
    tj = jnp.concatenate(rows[: m - 1], axis=0)          # (m-1, B)
    s = jax.lax.dot_general(
        nodes_ref[...], tj, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (m, B)
    return (1.0 / m) + (2.0 / m) * s


def _syz_rows(sy, sz, m: int):
    """syz (m^2, B): row (v*m + w) = sy[v] * sz[w], built m rows at a time."""
    blocks = [sy[v:v + 1, :] * sz for v in range(m)]     # each (m, B)
    return jnp.concatenate(blocks, axis=0)               # (m^2, B)


def _scaled_coords(qx, qy, qz, box_ref):
    """(1,B) normalized coordinates from the dynamic box (1,8) input."""
    cx, cy, cz = box_ref[0, 0], box_ref[0, 1], box_ref[0, 2]
    hx, hy, hz = box_ref[0, 3], box_ref[0, 4], box_ref[0, 5]
    f32 = lambda r: r[...].astype(jnp.float32)
    return ((f32(qx) - cx) / hx, (f32(qy) - cy) / hy, (f32(qz) - cz) / hz)


# ------------------------------------------------------------------- P2M
def _p2m_kernel(qx, qy, qz, gm, box, nodes, w_out, w_acc, *, m):
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    tx, ty, tz = _scaled_coords(qx, qy, qz, box)
    sx = _basis_rows(tx, nodes, m)
    sy = _basis_rows(ty, nodes, m)
    sz = _basis_rows(tz, nodes, m)
    syz = _syz_rows(sy, sz, m)                           # (m^2, B)
    gsx = sx * gm[...].astype(jnp.float32)               # (m, B) * (1, B)
    part = dot3(gsx, syz, tr_b=True)                     # (m, m^2)

    @pl.when(i == 0)
    def _():
        w_acc[...] = part

    @pl.when(i > 0)
    def _():
        w_acc[...] += part

    @pl.when(i == ni - 1)
    def _():
        w_out[...] = w_acc[...]


@functools.partial(jax.jit, static_argnames=("m", "block", "interpret"))
def p2m_fused(qx, qy, qz, gm_eff, c, h, *, m: int, block: int = 2048,
              interpret: bool = False):
    """W (m^3,) = P2M with in-kernel basis construction (TPU only)."""
    from murb_tpu.ops.common import f32_inputs

    qx, qy, qz, gm_eff = f32_inputs(qx, qy, qz, gm_eff)  # no f64 VMEM refs
    n = qx.shape[0]
    assert n % block == 0, (n, block)
    box = jnp.concatenate([c, h, jnp.zeros(2, c.dtype)]).reshape(1, 8)
    box = box.astype(jnp.float32)
    nodes = jnp.asarray(_tj_nodes(m), jnp.float32)

    row = lambda a: a.reshape(1, n)
    bspec = BlockSpec((1, block), lambda i: (0, i))
    full = BlockSpec((1, 8), lambda i: (0, 0))
    nspec = BlockSpec((m, m - 1), lambda i: (0, 0))

    w = pl.pallas_call(
        functools.partial(_p2m_kernel, m=m),
        grid=(n // block,),
        in_specs=[bspec, bspec, bspec, bspec, full, nspec],
        out_specs=BlockSpec((m, m * m), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, m * m), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, m * m), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(row(qx), row(qy), row(qz), row(gm_eff), box, nodes)
    return w.reshape(m * m * m)


# ------------------------------------------------------------------- L2P
def _l2p_kernel(qx, qy, qz, box, nodes, fmat, *outs, m):
    """Interpolate len(outs) stacked node fields back to the bodies."""
    tx, ty, tz = _scaled_coords(qx, qy, qz, box)
    sx = _basis_rows(tx, nodes, m)
    sy = _basis_rows(ty, nodes, m)
    sz = _basis_rows(tz, nodes, m)
    syz = _syz_rows(sy, sz, m)                           # (m^2, B)
    # (len(outs)*m, B): field f occupies rows [f*m, (f+1)*m)
    b = dot3(fmat[...], syz, tr_b=False)
    for f, out in enumerate(outs):
        out[...] = jnp.sum(sx * b[f * m:(f + 1) * m, :], axis=0,
                           keepdims=True)


@functools.partial(jax.jit, static_argnames=("m", "block", "interpret"))
def l2p_fused_multi(qx, qy, qz, c, h, fields, *, m: int, block: int = 2048,
                    interpret: bool = False):
    """Interpolate an arbitrary tuple of (m^3,) node fields -> tuple of (n,)."""
    from murb_tpu.ops.common import f32_inputs

    dtype_in = qx.dtype
    qx, qy, qz = f32_inputs(qx, qy, qz)  # no f64 VMEM refs
    n = qx.shape[0]
    assert n % block == 0, (n, block)
    k = len(fields)
    box = jnp.concatenate([c, h, jnp.zeros(2, c.dtype)]).reshape(1, 8)
    box = box.astype(jnp.float32)
    nodes = jnp.asarray(_tj_nodes(m), jnp.float32)
    fmat = jnp.concatenate(
        [f.reshape(m, m * m) for f in fields]
    ).astype(jnp.float32)  # (k*m, m^2)

    row = lambda a: a.reshape(1, n)
    bspec = BlockSpec((1, block), lambda i: (0, i))
    full = BlockSpec((1, 8), lambda i: (0, 0))
    nspec = BlockSpec((m, m - 1), lambda i: (0, 0))
    fspec = BlockSpec((k * m, m * m), lambda i: (0, 0))
    ospec = BlockSpec((1, block), lambda i: (0, i))

    outs = pl.pallas_call(
        functools.partial(_l2p_kernel, m=m),
        grid=(n // block,),
        in_specs=[bspec, bspec, bspec, full, nspec, fspec],
        out_specs=[ospec] * k,
        out_shape=[jax.ShapeDtypeStruct((1, n), jnp.float32)] * k,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(row(qx), row(qy), row(qz), box, nodes, fmat)
    # preserve the caller's state dtype (XLA-path parity)
    return tuple(o.reshape(n).astype(dtype_in) for o in outs)


def l2p_fused(qx, qy, qz, c, h, f_ax, f_ay, f_az, *, m: int,
              block: int = 2048, interpret: bool = False):
    """a (n, 3) = L2P with in-kernel basis construction."""
    ax, ay, az = l2p_fused_multi(qx, qy, qz, c, h, (f_ax, f_ay, f_az),
                                 m=m, block=block, interpret=interpret)
    return jnp.stack([ax, ay, az], axis=1)
