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

from murb_tpu.ops.common import BlockSpec

from murb_tpu.ops.proxy import _cheb_nodes
from murb_tpu.ops.proxy_pallas import _basis_rows, _bsplit, _tj_nodes, dot3


def fmm_fused_block(n: int, m: int, C: int, nf: int = 3) -> int | None:
    """Block size for the fused grid kernels, or None when they don't apply
    (non-TPU, lane-misaligned n, or a VMEM-busting extended width).

    ``nf`` is the L2P field count: its resident field matrix is
    (nf*cm, cm^2), so the 4-field force+potential variant needs a tighter
    width cap than the 3-field force-only one (P2M has nf=1 and is never
    the binding stage)."""
    if jax.default_backend() != "tpu" or n % 256 != 0:
        return None
    cm = C * m
    if cm > (40 if nf > 3 else 48):  # Eyz (cm^2, B) + fmat (nf*cm, cm^2)
        return None
    from murb_tpu.ops.common import pick_block

    return pick_block(n, 512 if cm > 32 else 1024)


# ------------------------------------------------------------- fused M2L
def m2l_fused_tile(m: int, C: int, nf: int) -> int | None:
    """Row-tile size for the fused M2L kernel, or None when the resident
    VMEM estimate (output accumulators + double-buffered operands + the
    in-flight T tiles and their build temporaries) busts the budget.
    Cells beyond 256 rows are grid-tiled (cblk), so eligibility depends on
    (m, nf) far more than on C."""
    if jax.default_backend() != "tpu":
        return None
    m3 = m ** 3
    cblk = min(C ** 3, 256)
    for tile in (256, 128):
        m3p = -(-m3 // tile) * tile
        est = (4 * nf * cblk * m3p          # resident output accumulators
               + 8 * cblk * (m3p + tile)    # 2-buffered bf16 wp/wn hi+lo
               + 8 * nf * tile * m3p        # row- and col-stacked T splits
               + 20 * tile * m3p)           # f32 build temporaries
        # 14 MiB: the build-temporary term is conservative -- the
        # (m=10, nf=3, tile=256) config it excluded at the old 12 MiB
        # budget compiles and runs ~4% faster than tile=128 (measured);
        # tile=512 genuinely busts (Mosaic compile failure)
        if est <= 14 * 2 ** 20:
            return tile
    return None


def _m2l_kernel(*refs, tile: int, nf: int, with_phi: bool,
                exact_dots: bool):
    """One (cell tile c, offset k, row-tile u) step: build the T tile in
    VMEM, apply it to both shift directions, accumulate into the resident
    node fields.

    T_d[u, v] = D_d * (D.D + eps^2)^-3/2 with D = 2 h_l o + p_v - p_u; the
    mirror identity T_d(-o) = -T_d(o)^T (phi: +T^T) turns the -o side into
    the transposed matmul of the same tile (ref convention as the jnp
    m2l_level, ops/fmm.py)."""
    nw = 2 if exact_dots else 4  # fp32 (wp, wn) or bf16 (wp, wn) hi/lo
    off_ref, pvc_ref, pxr_ref, pyr_ref, pzr_ref = refs[nw:nw + 5]
    outs = refs[nw + 5:]
    k = pl.program_id(1)
    u = pl.program_id(2)
    off = off_ref[0]                                      # (1, 8)

    # D components for this row tile: (tile, m3p) rank-2 broadcasts
    dx = off[0, 0] + pvc_ref[0:1, :] - pxr_ref[...]
    dy = off[0, 1] + pvc_ref[1:2, :] - pyr_ref[...]
    dz = off[0, 2] + pvc_ref[2:3, :] - pzr_ref[...]
    inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + off[0, 3])
    inv3 = inv * inv * inv

    @pl.when(jnp.logical_and(k == 0, u == 0))
    def _():
        for o in outs:
            o[...] = jnp.zeros_like(o[...])

    # Dot policy (the level sweep accumulates contributions of oscillating
    # sign across offsets and source cells, so split error is
    # cancellation-amplified in the final force -- measured ~6e-4 max
    # relative force error at m=10 with bf16x3 here vs ~1e-5 with fp32):
    #   exact_dots: fp32 operands, HIGHEST (6-pass) -- the default;
    #   else:       bf16 hi/lo splits, 3 full-rate passes (--fast-m2l).
    dot1 = lambda a, b, tr, prec=None: jax.lax.dot_general(
        a, b, (((1,), (1 if tr else 0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dot3 = lambda ah, al, bh, bl, tr: (
        dot1(ah, bh, tr) + dot1(ah, bl, tr) + dot1(al, bh, tr))

    splits, exacts = [], []
    for i in range(nf):
        phi = with_phi and i == nf - 1
        t = inv if phi else (dx, dy, dz)[i] * inv3
        (exacts if exact_dots else splits).append(
            (t,) if exact_dots else _bsplit(t))
    # Stack the per-field T tiles so each shift direction is ONE wide
    # matmul per pass instead of nf narrow ones (grid-step count times
    # dot-invocation overhead is a first-order cost at c3 = 64 rows):
    # +o contracts over v -> row-stack; -o contracts over u -> column-stack.
    if exact_dots:
        wp = refs[0][0]                                   # (c3, m3p) f32
        wn = refs[1][0]                                   # (c3, tile) f32
        t_r = jnp.concatenate([e[0] for e in exacts], axis=0)
        t_c = jnp.concatenate([e[0] for e in exacts], axis=1)
        hi = jax.lax.Precision.HIGHEST
        pp = dot1(wp, t_r, True, hi)                      # (c3, nf*tile)
        pn = dot1(wn, t_c, False, hi)                     # (c3, nf*m3p)
    else:
        wph, wpl = refs[0][0], refs[1][0]                 # (c3, m3p) bf16
        wnh, wnl = refs[2][0], refs[3][0]                 # (c3, tile) bf16
        th_r = jnp.concatenate([s[0] for s in splits], axis=0)
        tl_r = jnp.concatenate([s[1] for s in splits], axis=0)
        th_c = jnp.concatenate([s[0] for s in splits], axis=1)
        tl_c = jnp.concatenate([s[1] for s in splits], axis=1)
        pp = dot3(wph, wpl, th_r, tl_r, True)             # (c3, nf*tile)
        pn = dot3(wnh, wnl, th_c, tl_c, False)            # (c3, nf*m3p)
    m3p = pn.shape[1] // nf
    for i in range(nf):
        phi = with_phi and i == nf - 1
        sign = 1.0 if phi else -1.0
        # +o: f[c, u_tile] += sum_v wp[c, v] T[u, v]
        outs[i][:, pl.ds(u * tile, tile)] += pp[:, i * tile:(i + 1) * tile]
        # -o: f[c, :] -+= sum_u wn[c, u] T[u, v]
        outs[i][...] += sign * pn[:, i * m3p:(i + 1) * m3p]


@functools.partial(
    jax.jit,
    static_argnames=("m", "C", "subset", "with_phi", "tile", "interpret",
                     "exact_dots"),
)
def m2l_level_fused(w, hl, soft, *, m: int, C: int, subset: str = "expand",
                    with_phi: bool = False, tile: int = 256,
                    interpret: bool = False, exact_dots: bool = True):
    """Node force fields (fx, fy, fz[, phi]), each (C^3, m^3) -- the fused
    counterpart of ops/fmm.m2l_level.

    The jnp sweep materializes three (m^3, m^3) transfer matrices per offset
    in HBM (~24 MB/offset round-tripped at m=10); here each T row tile lives
    only in VMEM between its build and its two matmuls, and the node fields
    stay VMEM-resident across the whole (cell tile, offset, tile) grid.
    Measured probe: the level sweep is build-bound, not matmul-bound, so
    removing the HBM round-trip is the win.  ``exact_dots=False`` trades
    the fp32 matmuls for bf16x3 splits (~1 ms at m=10, C=4) at the cost of
    cancellation-amplified force error (measured ~6e-4 max vs ~1e-5)."""
    from murb_tpu.ops.fmm import m2l_gather

    f32 = jnp.float32
    m3 = m ** 3
    c3 = C ** 3
    nf = 4 if with_phi else 3
    m3p = -(-m3 // tile) * tile
    nu = m3p // tile

    cblk = min(c3, 256)
    nc = c3 // cblk

    wp, wn, offsets, _ = m2l_gather(w.astype(f32), m=m, C=C, subset=subset)
    K = wp.shape[0]
    pad = ((0, 0), (0, 0), (0, m3p - m3))
    wp = jnp.pad(wp, pad)
    wn = jnp.pad(wn, pad)

    if exact_dots:
        w_ops = (wp, wn)
        w_specs = [
            BlockSpec((1, cblk, m3p), lambda c, k, u: (k, c, 0)),
            BlockSpec((1, cblk, tile), lambda c, k, u: (k, c, u)),
        ]
    else:
        wp_hi, wp_lo = _bsplit(wp)
        wn_hi, wn_lo = _bsplit(wn)
        w_ops = (wp_hi, wp_lo, wn_hi, wn_lo)
        w_specs = [
            BlockSpec((1, cblk, m3p), lambda c, k, u: (k, c, 0)),
            BlockSpec((1, cblk, m3p), lambda c, k, u: (k, c, 0)),
            BlockSpec((1, cblk, tile), lambda c, k, u: (k, c, u)),
            BlockSpec((1, cblk, tile), lambda c, k, u: (k, c, u)),
        ]

    # flat per-node coordinate vectors, padded with a finite sentinel: the
    # pad slots of wp/wn are zero, the sentinel only keeps r2 finite
    t = jnp.asarray(_cheb_nodes(m), f32)
    m2 = m * m
    pxv = hl[0].astype(f32) * jnp.repeat(t, m2)
    pyv = hl[1].astype(f32) * jnp.tile(jnp.repeat(t, m), m)
    pzv = hl[2].astype(f32) * jnp.tile(t, m2)
    sent = jnp.full((m3p - m3,), 1e18, f32)
    pxv, pyv, pzv = (jnp.concatenate([v, sent]) for v in (pxv, pyv, pzv))
    pvc = jnp.stack([pxv, pyv, pzv])                      # (3, m3p)

    off_params = jnp.zeros((K, 8), f32)
    off_params = off_params.at[:, :3].set(
        2.0 * hl.astype(f32)[None, :] * jnp.asarray(offsets, f32))
    off_params = off_params.at[:, 3].set(jnp.asarray(soft, f32) ** 2)
    off_params = off_params.reshape(K, 1, 8)

    # grid order (cell tile, offset, row tile): the cell tile is OUTERMOST
    # so the output accumulators stay VMEM-resident across the whole inner
    # (K, nu) sweep and write back only nc times; the T tiles are rebuilt
    # per cell tile (nc <= 2 for every eligible config).
    col = lambda v: v.reshape(m3p, 1)
    fields = pl.pallas_call(
        functools.partial(_m2l_kernel, tile=tile, nf=nf, with_phi=with_phi,
                          exact_dots=exact_dots),
        grid=(nc, K, nu),
        in_specs=w_specs + [
            BlockSpec((1, 1, 8), lambda c, k, u: (k, 0, 0)),   # offset row
            BlockSpec((3, m3p), lambda c, k, u: (0, 0)),       # col coords
            BlockSpec((tile, 1), lambda c, k, u: (u, 0)),      # row coords
            BlockSpec((tile, 1), lambda c, k, u: (u, 0)),
            BlockSpec((tile, 1), lambda c, k, u: (u, 0)),
        ],
        out_specs=[BlockSpec((cblk, m3p), lambda c, k, u: (c, 0))] * nf,
        out_shape=[jax.ShapeDtypeStruct((c3, m3p), f32)] * nf,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*w_ops, off_params, pvc, col(pxv), col(pyv), col(pzv))
    return tuple(f[:, :m3].astype(w.dtype) for f in fields)


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
    part = dot3(gex, eyz, tr_b=True)                      # (cm, cm^2)

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
    from murb_tpu.ops.common import f32_inputs

    qx, qy, qz, gm_eff = f32_inputs(qx, qy, qz, gm_eff)  # no f64 VMEM refs
    n = qx.shape[0]
    assert n % block == 0, (n, block)
    cm = C * m
    box = _grid_box(c, h, C)
    nodes = jnp.asarray(_tj_nodes(m), jnp.float32)

    row = lambda a: a.reshape(1, n)
    bspec = BlockSpec((1, block), lambda i: (0, i))
    full = BlockSpec((1, 8), lambda i: (0, 0))
    nspec = BlockSpec((m, m - 1), lambda i: (0, 0))

    w_ext = pl.pallas_call(
        functools.partial(_p2m_grid_kernel, m=m, C=C),
        grid=(n // block,),
        in_specs=[bspec, bspec, bspec, bspec, full, nspec],
        out_specs=BlockSpec((cm, cm * cm), lambda i: (0, 0)),
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
    b = dot3(fmat[...], eyz, tr_b=False)                  # (len(outs)*cm, B)
    for f, out in enumerate(outs):
        out[...] = jnp.sum(ex * b[f * cm:(f + 1) * cm, :], axis=0,
                           keepdims=True)


@functools.partial(jax.jit, static_argnames=("m", "C", "block", "interpret"))
def l2p_grid_fused(qx, qy, qz, c, h, fields, *, m: int, C: int,
                   block: int = 512, interpret: bool = False):
    """Interpolate (C^3, m^3) node fields back to the bodies -> tuple (n,)."""
    from murb_tpu.ops.common import f32_inputs

    dtype_in = qx.dtype
    qx, qy, qz = f32_inputs(qx, qy, qz)  # no f64 VMEM refs
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
    bspec = BlockSpec((1, block), lambda i: (0, i))
    full = BlockSpec((1, 8), lambda i: (0, 0))
    nspec = BlockSpec((m, m - 1), lambda i: (0, 0))
    fspec = BlockSpec((k * cm, cm * cm), lambda i: (0, 0))
    ospec = BlockSpec((1, block), lambda i: (0, i))

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
    return tuple(o.reshape(n).astype(dtype_in) for o in outs)
