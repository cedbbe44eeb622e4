"""Pallas windowed anterpolation for the SPARSE hierarchy (ops/sparse_fmm).

The jnp windowed P2M/L2P (sparse_fmm.p2m_window / l2p_window) already
replace XLA:TPU's serialized scatter-adds and slow row gathers with
(B, B) one-hot matmuls against dynamic-slice windows -- but they pay the
one-hot contraction at fp32 HIGHEST (6 MXU passes) and round-trip every
(B, m^3) window through HBM twice per lax.scan step.  These kernels are
the round-5 sorted-segment form (round-4 verdict item 1):

  grid      one step per chunk of B Morton-sorted bodies.  The window
            property (sorted order => a chunk touches < B CONSECUTIVE
            slot ranks, sparse_fmm.p2m_window docstring) makes each
            chunk's slot window a contiguous (B, m^3) slab at the
            prefetched start slot s0 -- a hardware DMA, not a gather.
  one-hot   M (B, B) with M[r, j] = [slot_j - s0 == r], built in VMEM
            from one iota compare.  0/1 entries are EXACT in bf16, so
            the contraction runs as TWO full-rate DEFAULT passes against
            the in-kernel Dekker split of the data operand (hi + lo,
            each bf16-exact; products exact, fp32 accumulate) -- the
            ~2^-21-relative bf16x3 class of the shipped anterpolation
            kernels (ops/proxy_pallas.dot3) at 2/6 the MXU passes, and
            per CLAUDE.md the split MUST live inside the kernel (an XLA
            split gets folded by upcast-of-downcast elision on-chip).
  P2M       W_win (B, m^3) = M @ outer^T; consecutive chunks can share
            ONE slot row (the cell straddling the chunk boundary), so a
            (1, m^3) VMEM carry re-injects the previous chunk's partial
            before the window DMAs out; later windows overwrite earlier
            zero padding in sequential grid order.  Unwritten tail rows
            (> the last occupied slot) are masked to zero by the caller.
  L2P       the transpose: window DMA in, G^T (m^3, B) = F_win^T M via
            the dim0-contraction, then the VPU sublane reduction
            sum(outer^T * G^T) -- the dense l2p_grid_fused pattern.

Same contract as the jnp forms: dump rows (slot clamped to ``cap``:
inactive bodies, capacity overflow) fall outside [0, B) and vanish from
M's columns; dump-window L2P rows read the caller's zero padding.

Ref anchor: the tile-streaming discipline of
ref: src/murb/implem/SimulationNBodyCUDATileFullDevice.cu:53-153 applied
to the sparse stages.
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's jaxpr lowering recurses deeply on these kernel bodies (the
# sliced-window accumulate pattern) and trips CPython's default 1000
# recursion limit at compile time; the depth is bounded by the KERNEL
# BODY (B/8-class), not by n or the grid, so a fixed raise is safe.
sys.setrecursionlimit(max(sys.getrecursionlimit(), 20_000))

from murb_tpu.ops.common import BlockSpec
from murb_tpu.ops.proxy_pallas import _basis_rows, _bsplit, _tj_nodes


def window_block(n: int, chunk: int) -> int | None:
    """Kernel block size, or None when the kernels don't apply (non-TPU
    backend or a lane-misaligned body count)."""
    if jax.default_backend() != "tpu" or n % 256 != 0:
        return None
    from murb_tpu.ops.common import pick_block

    return pick_block(n, min(chunk, n))


def _dot_onehot(data, onehot, *, dims, data_first: bool):
    """One-hot contraction in TWO exact DEFAULT-precision passes:
    onehot entries are 0/1 (bf16-exact) and the data operand is
    Dekker-split in-kernel, so each single-pass bf16 MXU product is
    exact and the fp32 sum of the two passes reproduces the bf16x3
    scheme minus its structurally-zero lo-of-onehot terms (2/6 the MXU
    passes of the jnp forms' fp32 HIGHEST dots).  ``data_first`` places
    the split operand on the lhs/rhs; ``dims`` are the dot_general
    contraction dims for that placement."""
    dh, dl = _bsplit(data)
    if data_first:
        d = lambda x: jax.lax.dot_general(
            x, onehot, dims, preferred_element_type=jnp.float32)
    else:
        d = lambda x: jax.lax.dot_general(
            onehot, x, dims, preferred_element_type=jnp.float32)
    return d(dh) + d(dl)


def _win_basis(qx, qy, qz, box_ref, nodes_ref, m: int, C: int):
    """Per-body Chebyshev bases (m, B) x3 at the FINEST level: cell from
    floor((q - lo)/cs), t = in-cell coordinate (the _window_basis
    algebra of sparse_fmm, in VMEM)."""
    f32 = lambda r: r[...].astype(jnp.float32)

    def one(q_row, lo, cs):
        u = (q_row - lo) / cs
        cx = jnp.clip(jnp.floor(u), 0.0, C - 1.0)
        return _basis_rows(2.0 * (u - cx) - 1.0, nodes_ref, m)

    return (one(f32(qx), box_ref[0, 0], box_ref[0, 3]),
            one(f32(qy), box_ref[0, 1], box_ref[0, 4]),
            one(f32(qz), box_ref[0, 2], box_ref[0, 5]))


def _lane_pad(m3: int) -> int:
    """HBM window DMAs need the minor dim 128-aligned (Mosaic tiling);
    the node axis pads m^3 -> ceil/128 lanes (216 -> 256 at m = 6) and
    the padded rows/columns are structurally zero everywhere."""
    return -(-m3 // 128) * 128


def _outer_rows(sx, syz, m: int, m3p: int):
    """outer^T (m3p, B): row (u*m^2 + p) = sx[u] * syz[p], zero-padded
    to the lane-aligned node count."""
    rows = [sx[u:u + 1, :] * syz for u in range(m)]
    m3 = m ** 3
    if m3p > m3:
        rows.append(jnp.zeros((m3p - m3, sx.shape[1]), jnp.float32))
    return jnp.concatenate(rows, 0)


def _syz(sy, sz, m: int):
    return jnp.concatenate([sy[v:v + 1, :] * sz for v in range(m)], 0)


def _onehot(sl_ref, a0, B: int, B8: int):
    """M (B8, B): M[r, j] = [slot_j - a0 == r] (f32 0/1), r over the
    8-row-ALIGNED window [a0, a0 + B8).  Mosaic iota is integer-only;
    the f32 slot row (exact to 2^24) casts down exactly."""
    d = (sl_ref[...].astype(jnp.float32)
         - a0.astype(jnp.float32)).astype(jnp.int32)       # (1, B)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B8, 1), 0)
    return (rows == d).astype(jnp.float32)


# ------------------------------------------------------------------- P2M
def _p2m_win_kernel(s0s, lasts, qx, qy, qz, gm, sl, box, nodes,
                    out_hbm, wbuf, carry, sem, *, m: int, C: int, B: int):
    # window DMAs into a (rows, lanes) HBM ref need a PROVABLY 8-aligned
    # row offset: a0 = (s0 // 8) * 8, computed in-kernel so Mosaic can
    # prove divisibility.  The window grows to B8 = B + 8 rows and the
    # chunk-boundary carry becomes the aligned 8-row block containing
    # the previous chunk's last real row.
    B8 = B + 8
    i = pl.program_id(0)
    s0 = s0s[i]
    a0 = (s0 // 8) * 8
    sx, sy, sz = _win_basis(qx, qy, qz, box, nodes, m, C)
    gsx = sx * gm[...].astype(jnp.float32)
    outer = _outer_rows(gsx, _syz(sy, sz, m), m,
                        _lane_pad(m ** 3))                 # (m3p, B)
    M = _onehot(sl, a0, B, B8)
    # W (B8, m3p) = M @ outer^T: contract the body dim of both
    wbuf[...] = _dot_onehot(outer, M, dims=(((1,), (1,)), ((), ())),
                            data_first=False)

    last_p = lasts[jnp.maximum(i - 1, 0)]

    @pl.when(jnp.logical_and(i > 0, (last_p // 8) * 8 == a0))
    def _():
        wbuf[0:8, :] += carry[...]

    dla = ((lasts[i] - a0) // 8) * 8

    @pl.when(lasts[i] >= a0)
    def _():
        carry[...] = wbuf[pl.ds(dla, 8), :]

    # ALL-DUMP chunks (ghost tail / capacity overflow: lasts == -1) skip
    # the write: their aligned window [align8(cap), ...) would dip up to
    # 7 rows BELOW the dump row and zero-clobber the last real slots,
    # and the only row they contribute to is the dump row no consumer
    # reads.
    @pl.when(lasts[i] >= 0)
    def _():
        cp = pltpu.make_async_copy(wbuf, out_hbm.at[pl.ds(a0, B8), :],
                                   sem)
        cp.start()
        cp.wait()


@functools.partial(jax.jit,
                   static_argnames=("cap", "m", "C", "B", "interpret"))
def p2m_window_pallas(xs, ys, zs, gs, c, h, slots, *, cap: int, m: int,
                      C: int, B: int, interpret: bool = False):
    """(cap + 1, m^3) slot expansions from Morton-sorted bodies (the
    sparse_fmm.p2m_window contract; see module docstring)."""
    from murb_tpu.ops.common import f32_inputs

    xs, ys, zs, gs = f32_inputs(xs, ys, zs, gs)
    n = xs.shape[0]
    assert n % B == 0, (n, B)
    nb = n // B
    m3 = m ** 3
    m3p = _lane_pad(m3)
    capw = cap + B + 16                  # aligned windows: a0 + B + 8 max

    sl2 = slots.reshape(nb, B)
    s0s = jnp.minimum(sl2[:, 0], cap).astype(jnp.int32)
    lasts = jnp.max(jnp.where(sl2 < cap, sl2, -1), axis=1) \
        .astype(jnp.int32)

    lo = c - h
    cs = 2.0 * h / C
    box = jnp.concatenate(
        [lo, cs, jnp.zeros(2, lo.dtype)]).reshape(1, 8).astype(jnp.float32)
    nodes = jnp.asarray(_tj_nodes(m), jnp.float32)

    row = lambda a: a.reshape(1, n)
    bspec = BlockSpec((1, B), lambda i, *_: (0, i))
    full = BlockSpec((1, 8), lambda i, *_: (0, 0))
    nspec = BlockSpec((m, m - 1), lambda i, *_: (0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[bspec, bspec, bspec, bspec, bspec, full, nspec],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((B + 8, m3p), jnp.float32),
            pltpu.VMEM((8, m3p), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    w_raw = pl.pallas_call(
        functools.partial(_p2m_win_kernel, m=m, C=C, B=B),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((capw, m3p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(s0s, lasts, row(xs), row(ys), row(zs), row(gs),
      row(slots.astype(jnp.float32)), box, nodes)
    # rows past the last occupied slot were never DMA'd (uninitialized)
    last_glob = jnp.max(lasts)
    keep = jnp.arange(cap + 1, dtype=jnp.int32)[:, None] <= last_glob
    return jnp.where(keep, w_raw[:cap + 1, :m3], 0.0)


# ------------------------------------------------------------------- L2P
def _l2p_win_kernel(s0s, qx, qy, qz, sl, box, nodes, *rest,
                    m: int, C: int, B: int, nf: int):
    f_hbm = rest[:nf]
    outs = rest[nf:2 * nf]
    fwins = rest[2 * nf:3 * nf]
    sems = rest[3 * nf:]
    B8 = B + 8
    i = pl.program_id(0)
    s0 = s0s[i]
    a0 = (s0 // 8) * 8                   # provably aligned DMA offset
    cps = [pltpu.make_async_copy(f_hbm[k].at[pl.ds(a0, B8), :], fwins[k],
                                 sems[k]) for k in range(nf)]
    for cp in cps:
        cp.start()
    sx, sy, sz = _win_basis(qx, qy, qz, box, nodes, m, C)
    outer = _outer_rows(sx, _syz(sy, sz, m), m,
                        _lane_pad(m ** 3))                 # (m3p, B)
    M = _onehot(sl, a0, B, B8)
    for k, cp in enumerate(cps):
        cp.wait()
        # G^T (m3p, B) = F_win^T @ M: contract the window-row dim of both
        gt = _dot_onehot(fwins[k][...], M,
                         dims=(((0,), (0,)), ((), ())), data_first=True)
        outs[k][...] = jnp.sum(outer * gt, axis=0, keepdims=True)


@functools.partial(jax.jit,
                   static_argnames=("cap", "m", "C", "B", "interpret"))
def l2p_window_pallas(xs, ys, zs, c, h, slots, fields, *, cap: int,
                      m: int, C: int, B: int, interpret: bool = False):
    """Per-body values of ``fields`` ((cap + 1, m^3) each, zero dump
    row) -- the sparse_fmm.l2p_window contract (see module docstring)."""
    from murb_tpu.ops.common import f32_inputs

    dtype_in = xs.dtype
    xs, ys, zs = f32_inputs(xs, ys, zs)
    n = xs.shape[0]
    assert n % B == 0, (n, B)
    nb = n // B
    m3 = m ** 3
    m3p = _lane_pad(m3)
    nf = len(fields)

    zrows = jnp.zeros((B + 16, m3p), jnp.float32)
    fpad = tuple(jnp.concatenate(
        [jnp.pad(f.astype(jnp.float32), ((0, 0), (0, m3p - m3))), zrows],
        0) for f in fields)
    sl2 = slots.reshape(nb, B)
    s0s = jnp.minimum(sl2[:, 0], cap).astype(jnp.int32)

    lo = c - h
    cs = 2.0 * h / C
    box = jnp.concatenate(
        [lo, cs, jnp.zeros(2, lo.dtype)]).reshape(1, 8).astype(jnp.float32)
    nodes = jnp.asarray(_tj_nodes(m), jnp.float32)

    row = lambda a: a.reshape(1, n)
    bspec = BlockSpec((1, B), lambda i, *_: (0, i))
    full = BlockSpec((1, 8), lambda i, *_: (0, 0))
    nspec = BlockSpec((m, m - 1), lambda i, *_: (0, 0))
    ospec = BlockSpec((1, B), lambda i, *_: (0, i))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[bspec, bspec, bspec, bspec, full, nspec]
        + [pl.BlockSpec(memory_space=pl.ANY)] * nf,
        out_specs=[ospec] * nf,
        scratch_shapes=[pltpu.VMEM((B + 8, m3p), jnp.float32)] * nf
        + [pltpu.SemaphoreType.DMA] * nf,
    )
    outs = pl.pallas_call(
        functools.partial(_l2p_win_kernel, m=m, C=C, B=B, nf=nf),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, n), jnp.float32)] * nf,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(s0s, row(xs), row(ys), row(zs), row(slots.astype(jnp.float32)),
      box, nodes, *fpad)
    return tuple(o.reshape(n).astype(dtype_in) for o in outs)
