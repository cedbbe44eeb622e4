"""Pallas-fused anterpolation for the multi-level hierarchy (ops/fmm.py).

The jnp P2M materializes a per-body (B, m^3) outer-product chunk in HBM and
scatter-adds it (segment_sum); the jnp L2P gathers each body's (m^3,) cell
field from HBM.  Both are bandwidth-bound (~11-14 ms at N=200k, m=10).

These kernels exploit the factorization of the one-hot cell assignment:
with the *extended basis*  E_d = onehot(cell_d) (x) S_d  of per-dimension
width C*m, the multi-cell P2M/L2P are exactly the single-cell contractions
of ops/proxy_pallas.py at width C*m:

    W_ext (Cm, (Cm)^2) = sum_j gm_j * Ex_j (x) Ey_j (x) Ez_j
    a_j               = <Ex_j (x) Ey_j (x) Ez_j , F_ext>

built entirely in VMEM (bases from the Chebyshev recurrence, one-hot masks
from the cell index), with ONE streaming pass over the bodies and matmul
contractions on the MXU.  The extended layout (cx*m+u, ...) is a cheap
transpose away from the (C^3, m^3) grid layout the M2L stages use.

The dense width means ~(Cm)^3 MXU flops per body instead of m^3 -- at
C=4, m=10 that is ~25 GFLOP at N=200k, well under a millisecond of MXU
time, traded for removing gigabytes of HBM traffic.  For C > 4 the VMEM
footprint of Eyz ((Cm)^2 x B) grows past the budget; callers fall back to
the jnp path (eligibility via ``fmm_fused_block``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from murb_tpu.ops.proxy_pallas import _basis_rows, _tj_nodes


def fmm_fused_block(n: int, m: int, C: int) -> int | None:
    """Block size for the fused grid kernels, or None when they don't apply
    (non-TPU, lane-misaligned n, or a VMEM-busting extended width)."""
    if jax.default_backend() != "tpu" or n % 256 != 0:
        return None
    cm = C * m
    if cm > 48:  # Eyz footprint: (cm^2, B) fp32
        return None
    from murb_tpu.ops.common import pick_block

    return pick_block(n, 512 if cm > 32 else 1024)


def _cell_rows(q_row, lo, cs, C: int):
    """(cell index (1, B) float, in-cell coordinate t (1, B))."""
    u = (q_row - lo) / cs
    cx = jnp.clip(jnp.floor(u), 0.0, C - 1.0)
    return cx, 2.0 * (u - cx) - 1.0


def _ext_rows(q_row, lo, cs, nodes_ref, m: int, C: int):
    """Extended basis E (C*m, B): rows [c*m, (c+1)*m) = S * [cell == c]."""
    cx, t = _cell_rows(q_row, lo, cs, C)
    s = _basis_rows(t, nodes_ref, m)                      # (m, B)
    blocks = [s * (cx == float(c)).astype(jnp.float32) for c in range(C)]
    return jnp.concatenate(blocks, axis=0)                # (C*m, B)


def _eyz_rows(ey, ez, cm: int):
    """Eyz ((C*m)^2, B): row (v*cm + w) = ey[v] * ez[w]."""
    blocks = [ey[v:v + 1, :] * ez for v in range(cm)]     # each (cm, B)
    return jnp.concatenate(blocks, axis=0)                # (cm^2, B)


def _grid_box(c, h, C: int):
    """(1, 8) kernel operand: [lo(3), cellsize(3), 0, 0] in fp32."""
    lo = c - h
    cs = 2.0 * h / C
    return jnp.concatenate(
        [lo, cs, jnp.zeros(2, c.dtype)]
    ).reshape(1, 8).astype(jnp.float32)


def _ext_coords(qx, qy, qz, box_ref, nodes_ref, m: int, C: int):
    f32 = lambda r: r[...].astype(jnp.float32)
    lo = (box_ref[0, 0], box_ref[0, 1], box_ref[0, 2])
    cs = (box_ref[0, 3], box_ref[0, 4], box_ref[0, 5])
    ex = _ext_rows(f32(qx), lo[0], cs[0], nodes_ref, m, C)
    ey = _ext_rows(f32(qy), lo[1], cs[1], nodes_ref, m, C)
    ez = _ext_rows(f32(qz), lo[2], cs[2], nodes_ref, m, C)
    return ex, ey, ez


def _to_grid_layout(w_ext, m: int, C: int):
    """(Cm, (Cm)^2) extended layout -> (C^3, m^3) grid layout."""
    g = w_ext.reshape(C, m, C, m, C, m)
    return jnp.transpose(g, (0, 2, 4, 1, 3, 5)).reshape(C ** 3, m ** 3)


def _from_grid_layout(f_grid, m: int, C: int):
    """(C^3, m^3) grid layout -> (Cm, (Cm)^2) extended layout."""
    g = f_grid.reshape(C, C, C, m, m, m)
    cm = C * m
    return jnp.transpose(g, (0, 3, 1, 4, 2, 5)).reshape(cm, cm * cm)


# ------------------------------------------------------------------- P2M
def _p2m_grid_kernel(qx, qy, qz, gm, box, nodes, w_out, w_acc, *, m, C):
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    cm = C * m
    ex, ey, ez = _ext_coords(qx, qy, qz, box, nodes, m, C)
    eyz = _eyz_rows(ey, ez, cm)                           # (cm^2, B)
    gex = ex * gm[...].astype(jnp.float32)                # (cm, B)
    part = jax.lax.dot_general(
        gex, eyz, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (cm, cm^2)

    @pl.when(i == 0)
    def _():
        w_acc[...] = part

    @pl.when(i > 0)
    def _():
        w_acc[...] += part

    @pl.when(i == ni - 1)
    def _():
        w_out[...] = w_acc[...]


@functools.partial(jax.jit, static_argnames=("m", "C", "block", "interpret"))
def p2m_grid_fused(qx, qy, qz, gm_eff, c, h, *, m: int, C: int,
                   block: int = 512, interpret: bool = False):
    """W (C^3, m^3): fused multi-cell anterpolation (TPU only)."""
    n = qx.shape[0]
    assert n % block == 0, (n, block)
    cm = C * m
    box = _grid_box(c, h, C)
    nodes = jnp.asarray(_tj_nodes(m), jnp.float32)

    row = lambda a: a.reshape(1, n)
    bspec = pl.BlockSpec((1, block), lambda i: (0, i))
    full = pl.BlockSpec((1, 8), lambda i: (0, 0))
    nspec = pl.BlockSpec((m, m - 1), lambda i: (0, 0))

    w_ext = pl.pallas_call(
        functools.partial(_p2m_grid_kernel, m=m, C=C),
        grid=(n // block,),
        in_specs=[bspec, bspec, bspec, bspec, full, nspec],
        out_specs=pl.BlockSpec((cm, cm * cm), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((cm, cm * cm), jnp.float32),
        scratch_shapes=[pltpu.VMEM((cm, cm * cm), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(row(qx), row(qy), row(qz), row(gm_eff), box, nodes)
    return _to_grid_layout(w_ext, m, C)


# ------------------------------------------------------------------- L2P
def _l2p_grid_kernel(qx, qy, qz, box, nodes, fmat, *outs, m, C):
    cm = C * m
    ex, ey, ez = _ext_coords(qx, qy, qz, box, nodes, m, C)
    eyz = _eyz_rows(ey, ez, cm)                           # (cm^2, B)
    b = jax.lax.dot_general(
        fmat[...], eyz, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (len(outs)*cm, B)
    for f, out in enumerate(outs):
        out[...] = jnp.sum(ex * b[f * cm:(f + 1) * cm, :], axis=0,
                           keepdims=True)


@functools.partial(jax.jit, static_argnames=("m", "C", "block", "interpret"))
def l2p_grid_fused(qx, qy, qz, c, h, fields, *, m: int, C: int,
                   block: int = 512, interpret: bool = False):
    """Interpolate (C^3, m^3) node fields back to the bodies -> tuple (n,)."""
    n = qx.shape[0]
    assert n % block == 0, (n, block)
    cm = C * m
    k = len(fields)
    box = _grid_box(c, h, C)
    nodes = jnp.asarray(_tj_nodes(m), jnp.float32)
    fmat = jnp.concatenate(
        [_from_grid_layout(f.astype(jnp.float32), m, C) for f in fields]
    )  # (k*cm, cm^2)

    row = lambda a: a.reshape(1, n)
    bspec = pl.BlockSpec((1, block), lambda i: (0, i))
    full = pl.BlockSpec((1, 8), lambda i: (0, 0))
    nspec = pl.BlockSpec((m, m - 1), lambda i: (0, 0))
    fspec = pl.BlockSpec((k * cm, cm * cm), lambda i: (0, 0))
    ospec = pl.BlockSpec((1, block), lambda i: (0, i))

    outs = pl.pallas_call(
        functools.partial(_l2p_grid_kernel, m=m, C=C),
        grid=(n // block,),
        in_specs=[bspec, bspec, bspec, full, nspec, fspec],
        out_specs=[ospec] * k,
        out_shape=[jax.ShapeDtypeStruct((1, n), jnp.float32)] * k,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(row(qx), row(qy), row(qz), box, nodes, fmat)
    return tuple(o.reshape(n).astype(qx.dtype) for o in outs)
