"""Adaptive (occupied-cell) deep hierarchy: sparse FMM levels + P2P.

The dense hierarchy (ops/fmm.py) stores every cell of a uniform grid, so
its depth is capped at L ~ 4 by the 8^L M2L cost -- and clustered
distributions (the two-galaxy merger: power-law cores in a ~500 kpc box
with 0.2 kpc softening) need cells far smaller than that before the
near-field work collapses.  This module extends the hierarchy below the
dense levels with COMPACTED levels that store only occupied cells:

  sort       ONE Morton argsort of the bodies per solve, shared by every
             stage: the occupied-cell lists fall out of first-occurrence
             flags (O(n), no second sort), anterpolation runs on
             contiguous slot windows, and the P2P stage cuts its bricks
             on the same order.  Cell ids are Morton codes throughout
             (parent = >>3, octant = &7).
  occupancy  each sparse level l keeps a sorted, statically-capped list
             of occupied cell ids.  Every capacity is sized on the host
             from the ctor-time distribution (plan_adaptive) and
             health-checked as it evolves -- the same static-capacity
             contract as the P2P pair list.
  upward     windowed P2M into finest-level slots (one-hot matmuls into
             dynamic-slice windows -- see p2m_window); sparse M2M (8 per-octant
             (m^3, m^3) matmuls -- Kronecker-factored transfer matrices
             precomputed on host, applied octant-grouped so the TPU sees
             pure matmuls, never (n, m, m, m) relayouts); the coarsest
             sparse level scatters into the dense grid at L_dense.
  M2L        per sparse level, an offset scan over compacted rows with
             offsets in the parity-masked far list (the same
             expand(near(l-1)) \\ near(l) telescoping as the dense
             sweeps, ops/fmm._SUBSETS): per offset, gather each
             occupied target's occupied source (one vectorized slot
             table per level), one (cap, m^3) @ (m^3, m^3) matmul per
             field, ALIGNED accumulate.  All transfer matrices of a
             level are built in one vectorized pass.  (A true pair-list
             form touches fewer rows but measured 10-40x slower on
             XLA:TPU -- per-chunk gather/scatter/build overheads
             dominate its arithmetic at every chunk size tried.)
  downward   dense field at L_dense (ops/fmm.fmm_field_grid with
             finest_subset="far") -> gathered into sparse child slots ->
             sparse L2L (transposed octant matmuls) + per-level M2L ->
             sparse L2P at the finest level.
  near       the finest level's 27-neighborhood is exact: ops/p2p.py.

Accuracy is scale-free (|o| >= 2 separation ratio, independent of the
softening), so depth follows occupancy and the engines' measured-order
validation (ops/validate) supplies the tolerance contract.

No reference counterpart: the reference's tree code is an empty TODO
(ref: performance_report.txt:58) and its merger workload runs O(N^2)
(ref: src/murb/implem/SimulationNBodyCUDATileFullDevice.cu).
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from murb_tpu.ops.common import Accel
from murb_tpu.ops.fmm import (
    _basis_np,
    _cheb_nodes,
    _offsets_paired,
    _SUBSETS,
    fmm_field_grid,
)
from murb_tpu.ops.p2p import (
    DEFAULT_CHUNK as P2P_CHUNK,
    DEFAULT_K,
    estimate_brick_pairs,
    morton_key,
    size_pmax,
)
from murb_tpu.ops.proxy import _basis

_PRECISION = jax.lax.Precision.HIGHEST


class SparsePlan(NamedTuple):
    """Static geometry of an adaptive solve (hashable: jit static arg).

    ``cell_caps``: one occupied-cell capacity per sparse level
    (dense_levels+1 .. levels).  All capacities come from the host-side
    ``plan_adaptive`` estimate of the ctor-time distribution, with
    margins; proxy_health re-estimates as the system evolves."""

    m: int
    dense_levels: int
    levels: int
    cell_caps: tuple
    p2p_pmax: int
    p2p_chunk: int = P2P_CHUNK
    #: near-field sweep implementation: "pallas" (the block-sparse DMA
    #: kernel, TPU; p2p_pmax is then the RUN-padded capacity) or "jnp"
    #: (the gather-based sweep, any backend; chunk-padded capacity)
    p2p_impl: str = "jnp"
    #: M2L shared-basis compression rank (m2l_sparse_level): -1 = the
    #: m-dependent default (default_m2l_rank -- survives _plan_at's
    #: validation-ladder m swaps), 0 = off, >0 = explicit
    m2l_rank: int = -1


# ------------------------------------------------------------ id helpers
#
# Sparse-level cell ids are MORTON codes (Z-order), not row-major packs:
#   parent(code) = code >> 3      octant(code) = code & 7
#   (the bit convention of ops/p2p.morton_key: x<<2 | y<<1 | z per bit,
#   so code & 7 == (cx&1)*4 + (cy&1)*2 + (cz&1) -- the _octant_transfer
#   index)
# and -- the load-bearing property -- sorting bodies by finest-level
# Morton code makes their occupied-list SLOTS non-decreasing, which is
# what lets the anterpolation run on contiguous slot windows (the
# windowed one-hot matmuls below) AND gives the P2P stage tight brick
# bboxes from the SAME sort.  Only the dense-grid handoff (ops/fmm
# stores (C^3, m^3) row-major) converts coords.
def _pack(cx, cy, cz, C: int):
    """Row-major cell id -- the DENSE grid convention (ops/fmm)."""
    return (cx * C + cy) * C + cz


def _munpack(code, C: int):
    """(cx, cy, cz) from a Morton code on a C^3 grid."""
    bits = max(int(C - 1).bit_length(), 1)
    cx = jnp.zeros_like(code)
    cy = jnp.zeros_like(code)
    cz = jnp.zeros_like(code)
    for b in range(bits):
        cx = cx | (((code >> (3 * b + 2)) & 1) << b)
        cy = cy | (((code >> (3 * b + 1)) & 1) << b)
        cz = cz | (((code >> (3 * b)) & 1) << b)
    return cx, cy, cz


#: sentinel cell id for inactive rows / padding slots: sorts last, never
#: matches a real id (real ids < C^3 <= 2^30).
_BIG = np.int32(np.iinfo(np.int32).max)


@functools.lru_cache(maxsize=None)
def _octant_transfer(m: int) -> np.ndarray:
    """T (8, m^3, m^3): the Kronecker-factored M2M matrix per octant
    s = (sx, sy, sz): T[s][pq, uvw] = M[sx][u, e] M[sy][v, f] M[sz][w, g]
    flattened so that  W_parent(flat efg) += W_child(flat uvw) @ T[s].
    L2L is the transpose.  Host-precomputed; 8 * m^6 floats."""
    t = _cheb_nodes(m)
    Ms = []
    for s in (0, 1):
        tp = (2 * s - 1) * 0.5 + 0.5 * t
        Ms.append(_basis_np(tp, m))                       # (node v, basis e)
    out = np.zeros((8, m ** 3, m ** 3), np.float32)
    for sx in (0, 1):
        for sy in (0, 1):
            for sz in (0, 1):
                k = np.kron(np.kron(Ms[sx], Ms[sy]), Ms[sz])  # (uvw, efg)
                out[(sx * 2 + sy) * 2 + sz] = k.astype(np.float32)
    return out


def _far_offsets() -> tuple[np.ndarray, np.ndarray]:
    """((NO, 3) int32 offsets, (NO, 3) int8 parity codes) -- BOTH signs of
    the parity-masked far list (2 <= |o|_inf <= 3; |o_d| = 3 carries the
    target-parity rule of the expand telescoping, ops/fmm._parity_mask).
    parity code per dim: 0 = any, 1 = target coord must be even (o_d=+3),
    2 = odd (o_d=-3)."""
    canon, neg = _offsets_paired(*_SUBSETS["far"])
    offs = np.concatenate([canon, -canon[neg > 0]]).astype(np.int32)
    par = np.zeros_like(offs, np.int8)
    par[offs == 3] = 1
    par[offs == -3] = 2
    return offs, par


# -------------------------------------------------------- occupied cells
def _occupied_and_slots(key_s, cap: int):
    """From SORTED ids (_BIG padding last): ``(cells (cap,), slots (n,))``.

    ``cells`` = sorted unique ids (pad = _BIG), ``slots`` = each row's
    rank in that list, with _BIG rows and capacity overflow on the dump
    slot ``cap``.  O(n) flag + cumsum -- no second sort, no searchsorted:
    the ids arrive sorted, so first-occurrence flags enumerate the
    occupied list and their running count IS the slot."""
    n = key_s.shape[0]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    first = first & (key_s != _BIG)
    slot = jnp.cumsum(first.astype(jnp.int32)) - 1
    slot = jnp.where((key_s == _BIG) | (slot >= cap), cap, slot)
    (idx,) = jnp.nonzero(first, size=cap, fill_value=n - 1)
    count = jnp.sum(first.astype(jnp.int32))
    cells = jnp.where(jnp.arange(cap) < count, key_s[idx], _BIG)
    return cells, slot.astype(jnp.int32)


def _slot_table(cells, C: int):
    """(C^3 + 1,) dense code->slot table: -1 = unoccupied.  Index C^3 is
    a clamp target for sentinel queries and is never written (pad rows
    scatter out of bounds and drop)."""
    cap = cells.shape[0]
    real = cells != _BIG
    return jnp.full((C ** 3 + 1,), -1, jnp.int32).at[
        jnp.where(real, cells, jnp.int32(C ** 3 + 1))].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")


def _slot(cells, cids, C: int | None = None):
    """Slot of each cid in the sorted occupied list; misses (including
    _BIG sentinels and capacity overflow) land on the dump slot
    len(cells).  With the level size ``C`` given (and small enough), a
    dense scattered table + one gather replaces the binary search --
    searchsorted's 15 rounds of scalar gathers were measured 12.7x
    slower at M2L scale (see _TABLE_MAX)."""
    cap = cells.shape[0]
    if C is not None and C ** 3 <= _TABLE_MAX:
        t = _slot_table(cells, C)
        sp = t[jnp.clip(cids, 0, C ** 3)]
        return jnp.where(sp < 0, cap, sp).astype(jnp.int32)
    pos = jnp.searchsorted(cells, cids)
    pos = jnp.clip(pos, 0, cap - 1)
    return jnp.where(cells[pos] == cids, pos, cap).astype(jnp.int32)


# ---------------------------------------------------------- anterpolation
def _body_cells(qx, qy, qz, c, h, C: int):
    from murb_tpu.ops.p2p import _cell_ixyz

    cx, cy, cz = _cell_ixyz(qx, qy, qz, c, h, C)
    return cx, cy, cz


#: windowed-anterpolation chunk: MACs scale as n * B * m^3, so small B is
#: cheap arithmetic; per-scan-step overheads push back up.  512 measured
#: best at 1M (256/512/1024 probed).
WINDOW_CHUNK = 512


def _window_basis(bx, by, bz, lo, cs, m: int, C: int):
    from murb_tpu.ops.fmm import _cell_coords

    _, tx = _cell_coords(bx, lo[0], cs[0], C)
    _, ty = _cell_coords(by, lo[1], cs[1], C)
    _, tz = _cell_coords(bz, lo[2], cs[2], C)
    return _basis(tx, m), _basis(ty, m), _basis(tz, m)


def _window_pallas_block(n: int, m: int, nf: int,
                         chunk: int = WINDOW_CHUNK) -> int | None:
    """Block size for the Pallas windowed-anterpolation kernels
    (ops/anterp_pallas), or None to keep the jnp scan: non-TPU backend,
    lane-misaligned n, an env override (MURB_ANTERP_PALLAS=0/1), or a
    VMEM-busting (nf + 2) * (B, m^3) working set (m >= ~10; adaptive
    orders are <= 8)."""
    import os

    env = os.environ.get("MURB_ANTERP_PALLAS", "")
    if env == "0":
        return None
    from murb_tpu.ops.anterp_pallas import window_block

    B = window_block(n, chunk)
    if B is None:
        return None
    if (nf + 2) * B * m ** 3 * 4 + 8 * B * B > 12 << 20 and env != "1":
        return None
    return B


def p2m_window(xs, ys, zs, gs, c, h, slots, cap, *, m: int, C: int,
               chunk: int = WINDOW_CHUNK):
    """P2M on MORTON-SORTED bodies: (cap + 1, m^3) slot expansions.

    On the TPU backend this dispatches to the Pallas sorted-segment
    kernel (ops/anterp_pallas.p2m_window_pallas: window DMAs + 2-pass
    exact one-hot dots, round-5); the jnp scan below is the fallback
    and the differential reference.

    Sorted order gives the window property: every occupied cell between
    a chunk's first and last cid has at least one body INSIDE the chunk,
    so a chunk of B consecutive bodies touches < B consecutive slot
    ranks.  The per-chunk segment-sum is then a (B, B) one-hot matmul
    (MXU, exact: one-hot entries are 0/1) accumulated into a contiguous
    slot window by a dynamic-slice read-modify-write -- replacing the
    scatter-adds XLA:TPU serializes (measured ~0.38 us/body for the
    segment_sum form; this form is matmul + streaming window I/O).
    Dump rows (inactive bodies, capacity overflow) either fall outside
    the window (dropped) or land on accumulator row ``cap`` -- the dump
    row, which no consumer reads."""
    from murb_tpu.ops.common import pick_block

    n = xs.shape[0]
    Bp = _window_pallas_block(n, m, 1, chunk)
    if Bp is not None:
        from murb_tpu.ops.anterp_pallas import p2m_window_pallas

        return p2m_window_pallas(xs, ys, zs, gs, c, h, slots, cap=cap,
                                 m=m, C=C, B=Bp)
    B = pick_block(n, min(chunk, n))
    nb = n // B
    lo = c - h
    cs = 2.0 * h / C
    m3 = m ** 3
    dtype = xs.dtype
    col = jnp.arange(B, dtype=jnp.int32)[None, :]
    resh = lambda a: a.reshape(nb, B)

    def step(acc, args):
        bx, by, bz, bg, sl = args
        sx, sy, sz = _window_basis(bx, by, bz, lo, cs, m, C)
        svw = jnp.einsum("bv,bw->bvw", sy, sz).reshape(B, m * m)
        outer = jnp.einsum("bu,bp->bup", bg[:, None] * sx,
                           svw).reshape(B, m3)
        s0 = sl[0]
        onehot = (sl[:, None] - s0 == col).astype(dtype)
        part = jax.lax.dot_general(
            onehot, outer, (((0,), (0,)), ((), ())),
            precision=_PRECISION, preferred_element_type=dtype)
        z0 = jnp.zeros((), s0.dtype)  # typed 0: int literals trace i64 under x64
        win = jax.lax.dynamic_slice(acc, (s0, z0), (B, m3))
        return jax.lax.dynamic_update_slice(acc, win + part, (s0, z0)), None

    acc0 = jnp.zeros((cap + 1 + B, m3), dtype)
    acc, _ = jax.lax.scan(
        step, acc0, (resh(xs), resh(ys), resh(zs), resh(gs), resh(slots)))
    return acc[:cap + 1]


def l2p_window(xs, ys, zs, c, h, slots, fields, *, m: int, C: int,
               chunk: int = WINDOW_CHUNK):
    """L2P on MORTON-SORTED bodies: per-body values from slot fields.

    The p2m_window structure transposed: the per-body field row is a
    (B, B) one-hot matmul against a contiguous dynamic-slice window of
    the field table -- replacing the (216,)-wide row gathers XLA:TPU
    runs at ~150 GB/s with streaming window reads.  Dump bodies read
    zeros (outside-window one-hot rows are all-zero; in-window ones hit
    the zero dump row).

    On the TPU backend this dispatches to the Pallas sorted-segment
    kernel (ops/anterp_pallas.l2p_window_pallas; see p2m_window)."""
    from murb_tpu.ops.common import pick_block

    n = xs.shape[0]
    Bp = _window_pallas_block(n, m, len(fields), chunk)
    if Bp is not None:
        from murb_tpu.ops.anterp_pallas import l2p_window_pallas

        cap = fields[0].shape[0] - 1
        return l2p_window_pallas(xs, ys, zs, c, h, slots, tuple(fields),
                                 cap=cap, m=m, C=C, B=Bp)
    B = pick_block(n, min(chunk, n))
    nb = n // B
    lo = c - h
    cs = 2.0 * h / C
    m3 = m ** 3
    dtype = xs.dtype
    col = jnp.arange(B, dtype=jnp.int32)[None, :]
    resh = lambda a: a.reshape(nb, B)
    zpad = jnp.zeros((B, m3), dtype)
    fpad = tuple(jnp.concatenate([f, zpad], 0) for f in fields)

    def step(_, args):
        bx, by, bz, sl = args
        sx, sy, sz = _window_basis(bx, by, bz, lo, cs, m, C)
        s0 = sl[0]
        onehot = (sl[:, None] - s0 == col).astype(dtype)
        z0 = jnp.zeros((), s0.dtype)
        outs = []
        for f in fpad:
            win = jax.lax.dynamic_slice(f, (s0, z0), (B, m3))
            fg = jax.lax.dot(onehot, win, precision=_PRECISION,
                             preferred_element_type=dtype)
            fg = fg.reshape(B, m, m * m)
            t1 = jnp.einsum("bu,bup->bp", sx, fg,
                            precision=_PRECISION).reshape(B, m, m)
            t2 = jnp.einsum("bv,bvw->bw", sy, t1, precision=_PRECISION)
            outs.append(jnp.sum(sz * t2, axis=1))
        return None, tuple(outs)

    _, outs = jax.lax.scan(
        step, None, (resh(xs), resh(ys), resh(zs), resh(slots)))
    return tuple(o.reshape(n) for o in outs)


# ------------------------------------------------------------- M2M / L2L
def _octant_apply(x, oct_idx, m: int, transpose: bool):
    """Per-row octant transform: out[i] = x[i] @ T[oct[i]] (or @ T^T),
    computed as 8 masked matmuls so the MXU sees (N, m^3) @ (m^3, m^3)."""
    T = jnp.asarray(_octant_transfer(m), x.dtype)
    out = jnp.zeros_like(x)
    for s in range(8):
        xs = jnp.where((oct_idx == s)[:, None], x, 0.0)
        Ts = T[s].T if transpose else T[s]
        out = out + jax.lax.dot(xs, Ts, precision=_PRECISION)
    return out


def m2m_sparse(w_child, child_cells, parent_cells, *, m: int, C_child: int):
    """Child slot expansions -> parent slot expansions (segment-summed;
    dump rows excluded by construction: a _BIG child id maps to the
    parent dump slot)."""
    oct_idx = child_cells & 7
    pid = jnp.where(child_cells == _BIG, _BIG, child_cells >> 3)
    up = _octant_apply(w_child[:-1], oct_idx, m, transpose=False)
    cap_p = parent_cells.shape[0]
    return jax.ops.segment_sum(up, _slot(parent_cells, pid, C_child // 2),
                               num_segments=cap_p + 1)


def l2l_sparse(f_parent, parent_cells, child_cells, *, m: int,
               C_child: int):
    """Parent slot fields -> child slot fields (the M2M transpose); the
    dump row stays zero."""
    oct_idx = child_cells & 7
    pid = jnp.where(child_cells == _BIG, _BIG, child_cells >> 3)
    fp = f_parent[_slot(parent_cells, pid, C_child // 2)]  # (cap_child, m^3)
    down = _octant_apply(fp, oct_idx, m, transpose=True)
    pad = jnp.zeros((1, down.shape[1]), down.dtype)
    return jnp.concatenate([down, pad], 0)


def l2l_from_dense(f_dense, child_cells, *, m: int, C_child: int):
    """Dense-grid parent fields (C_parent^3, m^3) -> sparse child slots.
    The dense grid is row-major, so the Morton parent code converts."""
    oct_idx = child_cells & 7
    px, py, pz = _munpack(child_cells >> 3, C_child // 2)
    pid = _pack(px, py, pz, C_child // 2)
    pid = jnp.clip(pid, 0, f_dense.shape[0] - 1)
    fp = jnp.where((child_cells == _BIG)[:, None], 0.0, f_dense[pid])
    down = _octant_apply(fp, oct_idx, m, transpose=True)
    pad = jnp.zeros((1, down.shape[1]), down.dtype)
    return jnp.concatenate([down, pad], 0)


def densify(w_sparse, cells, C: int):
    """Sparse slot expansions (Morton-coded) -> dense row-major
    (C^3, m^3) grid (scatter by id)."""
    cx, cy, cz = _munpack(jnp.minimum(cells, C ** 3 - 1), C)
    cid = jnp.clip(_pack(cx, cy, cz, C), 0, C ** 3 - 1)
    w = jnp.where((cells == _BIG)[:, None], 0.0, w_sparse[:-1])
    return jnp.zeros((C ** 3, w.shape[1]), w.dtype).at[cid].add(w)


# ---------------------------------------------------------------- M2L
def _parity_codes(offs: np.ndarray) -> np.ndarray:
    """Per-dim parity code of the expand-telescoping rule: 0 = any,
    1 = target coord even (o_d = +3), 2 = odd (o_d = -3)."""
    par = np.zeros_like(offs, np.int8)
    par[offs == 3] = 1
    par[offs == -3] = 2
    return par


def _canon_far() -> np.ndarray:
    """(K, 3) canonical far offsets -- one per {+o, -o} pair (every far
    canonical has a valid mirror: min_inf = 2 excludes o = 0)."""
    canon, neg = _offsets_paired(*_SUBSETS["far"])
    assert (neg > 0).all()
    return canon.astype(np.int32)


#: dense code->slot lookup gate: levels with C^3 entries under this use a
#: scattered (C^3 + 1,) table + ONE gather for all offsets.  The previous
#: searchsorted build was the hidden cost of the whole sparse M2L sweep --
#: 15 binary-search rounds x NO*cap scalar gathers measured 378 ms per
#: sign table at cap=22k on-chip vs 30 ms for the dense table (the sweep
#: itself is ~50 ms).  64 MB of i32 at the gate; deeper levels fall back.
_TABLE_MAX = 1 << 24


def _neighbor_slots(cells, C: int, offs: np.ndarray, par: np.ndarray):
    """((NO, cap) source slots, (NO, cap) found mask): for every listed
    offset, each occupied target's occupied source (if any), with the
    parity masks of the expand telescoping applied.  One vectorized
    build per level -- per-offset lookups inside the sweep scan were
    measured 40x slower than this (XLA per-step gather overheads)."""
    cap = cells.shape[0]
    cx, cy, cz = _munpack(jnp.minimum(cells, C ** 3 - 1), C)
    co = jnp.stack([cx, cy, cz], 1)                        # (cap, 3)
    real = cells != _BIG

    offs_j = jnp.asarray(offs)                             # (NO, 3)
    par_j = jnp.asarray(par)                               # (NO, 3)
    nco = co[None, :, :] + offs_j[:, None, :]              # (NO, cap, 3)
    ok = jnp.all((nco >= 0) & (nco < C), -1) & real[None, :]
    parity = co[None, :, :] % 2
    pok = jnp.where(par_j[:, None, :] == 0, True,
                    jnp.where(par_j[:, None, :] == 1, parity == 0,
                              parity == 1))
    ok = ok & jnp.all(pok, -1)
    ncc = jnp.clip(nco, 0, C - 1)
    sid = morton_key(ncc[..., 0], ncc[..., 1], ncc[..., 2], C)
    if C ** 3 <= _TABLE_MAX:
        spos = _slot_table(cells, C)[jnp.where(ok, sid, 0)]  # (NO, cap)
        spos = jnp.where(spos < 0, cap, spos).astype(jnp.int32)
    else:
        spos = _slot(cells, jnp.where(ok, sid, _BIG))      # (NO, cap)
    return spos, ok & (spos < cap)


@functools.lru_cache(maxsize=None)
def _m2l_basis(m: int, rank: int) -> np.ndarray:
    """(m^3, rank) orthonormal shared basis of the far transfer family:
    top eigenvectors of the Gram sum_k (T_k^T T_k + T_k T_k^T) over all
    canonical far offsets, all four component kernels (force x/y/z +
    potential), and a soft/hl grid {0, 0.3, 1} -- hl scales out of the
    operators entirely, soft/hl does not, and the per-level ratio is a
    traced value, so one basis must span the whole family.  Including
    T T^T closes the family under transpose (the mirror identity
    T_d(-o) = -T_d(o)^T), so ONE basis serves both sides of
    T ~ Q (Q^T T Q) Q^T.  Measured spectra (normalized singular values
    of the family Gram): the 1e-5 crossing sits at rank 280 (m=8), 513
    (m=10), 810 (m=12) -- roughly m^3/2, NOT a fixed lane count; and
    measured force error tracks ~2x the sv at the truncation rank
    (m=12 rank 128: sv ~1e-4, measured force err 1.9e-4 on the 1M
    two-cluster).  _M2L_RANKS rounds the crossings up to full 128-lane
    multiples; even those accumulate to ~1e-4-class force error at
    flagship scale, which is why compression is an explicit tier, not
    the default (default_m2l_rank docstring has the measured ladder).

    This is the bbFMM SVD-compression recipe (Fong & Darve 2009)
    adapted to a shared two-sided basis: per offset the (cap, m^3) @
    (m^3, m^3) sweep matmuls become (cap, r) @ (r, r) with the
    m^3-space projection hoisted out of the offset scan."""
    m3 = m ** 3
    t = _cheb_nodes(m).astype(np.float32)
    pxv = np.repeat(t, m * m)
    pyv = np.tile(np.repeat(t, m), m)
    pzv = np.tile(t, m * m)
    dP = np.stack([pv[None, :] - pv[:, None] for pv in (pxv, pyv, pzv)])
    canon = _canon_far().astype(np.float32)                # (NO, 3)
    gram = np.zeros((m3, m3), np.float64)
    # chunk offsets: a full (NO, 4, m3, m3) stack is ~2.6 GB at m=8
    step = max(1, (1 << 27) // (4 * m3 * m3))
    for soh in (0.0, 0.3, 1.0):
        for k0 in range(0, len(canon), step):
            o = canon[k0:k0 + step]                        # (ko, 3)
            D = 2.0 * o[:, :, None, None] + dP[None]       # (ko, 3, m3, m3)
            inv = 1.0 / np.sqrt((D * D).sum(1) + soh * soh)
            Ts = np.concatenate([D * (inv ** 3)[:, None],
                                 inv[:, None]], 1)         # (ko, 4, m3, m3)
            A = Ts.reshape(-1, m3)
            gram += (A.T @ A).astype(np.float64)
            B = Ts.swapaxes(2, 3).reshape(-1, m3)
            gram += (B.T @ B).astype(np.float64)
    _, vec = np.linalg.eigh(gram)
    return np.ascontiguousarray(vec[:, ::-1][:, :rank])


#: recommended EXPLICIT compression ranks: the measured 1e-5
#: singular-value crossings of the far-transfer family (see _m2l_basis),
#: rounded up to 128-lane multiples.  Orders below m=8 have no room to
#: compress (m^3 <= 216 vs the ~m^3/2 crossing).  Per-level engagement
#: is gated by _resolve_rank at cap >= 2*rank: the per-offset projection
#: costs (m^6 r + m^3 r^2) MACs against a per-row saving of
#: 2 cap (m^6 - r^2), which breaks even almost exactly at cap = 2 rank.
_M2L_RANKS = {8: 384, 10: 640, 12: 896}


def default_m2l_rank(m: int) -> int:
    """DEFAULT: compression OFF for every order.  Measured round 4: the
    per-offset truncation residuals accumulate coherently across the
    offset scan and the engaged levels -- m=8 rank 384 (past the
    spectrum cliff at ~281) measures 6.9e-6 force error on a 30k
    two-cluster, 1.7e-5 at 131k, and 2.4e-4 ON CHIP at the 1M
    two-cluster, against the uncompressed path's 1.7e-6 -- for only a
    1.29x full-step win (989 -> 766 ms).  At flagship scale the 1e-4
    validation ladder would drop it anyway (the rank-0 fallback), so a
    nonzero default buys nothing but an extra validation compile.
    Explicit m2l_rank > 0 (_M2L_RANKS has the sane values) remains a
    supported ~1e-4-class speed tier, same contract as
    m2l_dots='bf16x3' (~3e-4, also non-default); the measured-error
    ladder guards whichever tier is picked."""
    return 0


def _resolve_rank(plan: "SparsePlan", cap: int) -> int:
    """Effective compression rank for one level: plan.m2l_rank with -1
    meaning the m-dependent default (kept auto through _plan_at's
    validation-ladder m swaps), switched off below the cap crossover."""
    rank = plan.m2l_rank
    if rank < 0:
        rank = default_m2l_rank(plan.m)
    return rank if cap >= 2 * rank else 0


#: gathered-operand byte budget per fused-M2L scan step: sets how many
#: canonical offsets NC batch into one multi-dim-contraction matmul
#: (K_eff = NC * 2m^3).  Small caps take ALL offsets in one step (the
#: per-step scan overhead WAS the measured ~10 ms/level floor of the
#: coarse sparse levels); the finest 1M-class level lands at NC ~ 3-4.
_M2L_STEP_BYTES = 128 << 20


def _m2l_nc(cap: int, m3: int, n_canon: int) -> int:
    per_offset = max(cap * 2 * m3 * 4, 1)
    return max(1, min(n_canon, _M2L_STEP_BYTES // per_offset))


#: cap threshold for the fused multi-offset M2L form -- DEFAULT 0 (the
#: per-offset scan everywhere): the fused batched contraction measured
#: SLOWER at every granularity on the chip (1M two-cluster m=6 L=7
#: far-only / FULL: all-fused 352/610 ms, fused-coarse-only(<=4096)
#: 249/565, all-scan 216/555).  The hypothesized ~10 ms/level per-step
#: scan floor on the coarse levels does not exist -- XLA pipelines the
#: 158-step scan fine, and the (NC, cap, 2m^3) gathered operand's
#: relayout + double transfer build cost more than they save (same
#: verdict class as the r4 shared-basis M2L compression).  The fused
#: form stays as an opt-in probe tier: MURB_M2L_FUSED=1 (always fused)
#: / 0 (always scan) / this threshold otherwise.
_M2L_FUSED_CAP = 0


def _m2l_use_fused(cap: int) -> bool:
    import os

    env = os.environ.get("MURB_M2L_FUSED", "")
    if env in ("0", "1"):
        return env == "1"
    return cap <= _M2L_FUSED_CAP


def m2l_sparse_level(w, cells, hl, soft, *, m: int, C: int,
                     with_phi: bool, m2l_dots: str = "fp32",
                     rank: int = 0):
    """Far sweep at one sparse level: canonical-offset accumulation of
    compacted rows, both signs per offset riding the mirror identity
    T_d(-o) = -T_d(o)^T (T_phi(-o) = +T_phi(o)^T) so one transfer
    build serves both.

    Two schedulings, dispatched by cap (_m2l_use_fused):

      * scan (big levels): one canonical offset per lax.scan step, the
        (nf, m^3, m^3) transfer matrices built IN-SCAN (a precomputed
        (NO, nf, m^3, m^3) tensor is ~1 GB at m = 8 -- its HBM
        round-trip dominated small-cap levels), one (cap, m^3) @
        (m^3, m^3) matmul per field per sign, ALIGNED accumulate.
      * fused (small levels, round 5): NC offsets batch per step and
        contract JOINTLY -- signs ride the contraction (K) dimension
        ((cap, 2 m^3) gathered sources), fields ride the output (N)
        dimension ((2 m^3, nf m^3) columns), and one dot_general with
        contracting dims {offset, 2 m^3} accumulates offsets INSIDE
        the matmul (K_eff = NC * 2 m^3).  Kills the ~10 ms/level
        per-step floor the coarse levels paid under the scan.

    Same MACs, same masks, same mirror algebra either way -- only the
    scheduling differs; the differential suite pins the numerics.

    ``m2l_dots``: "fp32" = HIGHEST (6-pass) matmuls; "bf16x3" = HIGH
    (XLA's 3-pass bf16 split, ~2x the matmul rate, ~3e-5-class dot
    error everywhere -- cancellation-amplified on the |o|_inf = 2
    shell); "mixed" (round 5) = HIGHEST on the critical |o|_inf = 2
    shell only and HIGH on the well-separated |o|_inf >= 3 shells,
    where the transfer entries vary smoothly and the bf16x3 product
    error stays at its ~2^-21 class.  The engines' measured-error
    validation guards whichever tier is picked.

    ``rank`` > 0 compresses onto the shared operator basis (explicit
    opt-in tier, _m2l_sparse_level_rank).

    Returns nf fields of shape (cap, m^3)."""
    rank = rank if 0 < rank < m ** 3 else 0
    if rank:
        return _m2l_sparse_level_rank(w, cells, hl, soft, m=m, C=C,
                                      with_phi=with_phi,
                                      m2l_dots=m2l_dots, rank=rank)
    if _m2l_use_fused(cells.shape[0]):
        return _m2l_sparse_level_fused(w, cells, hl, soft, m=m, C=C,
                                       with_phi=with_phi,
                                       m2l_dots=m2l_dots)
    if m2l_dots == "mixed":
        canon = _canon_far()
        shell = np.max(np.abs(canon), axis=1)
        crit = _m2l_sparse_level_scan(
            w, cells, hl, soft, m=m, C=C, with_phi=with_phi,
            m2l_dots="fp32", canon=canon[shell <= 2])
        far = _m2l_sparse_level_scan(
            w, cells, hl, soft, m=m, C=C, with_phi=with_phi,
            m2l_dots="bf16x3", canon=canon[shell >= 3])
        return tuple(a + b for a, b in zip(crit, far))
    return _m2l_sparse_level_scan(w, cells, hl, soft, m=m, C=C,
                                  with_phi=with_phi, m2l_dots=m2l_dots)


def _m2l_scan_chunk() -> int:
    """Offsets per scan step of the per-offset M2L sweep.  CH > 1 keeps
    the gather/dot forms of each offset IDENTICAL to the CH = 1 scan but
    accumulates CH offsets locally before touching the (cap, m^3) scan
    carries -- dividing the carry read-modify-write traffic (~38 MB per
    offset per field at the 1M finest level) by CH.  Distinct from the
    rejected fused multi-offset form (_m2l_sparse_level_fused), which
    ALSO reshaped the gathers into a (NC, cap, 2m^3) batched contraction
    and lost to its relayouts.  Addition order within a chunk changes by
    fp32-rounding only (differential-tested)."""
    import os

    try:
        return max(1, int(os.environ.get("MURB_M2L_SCAN_CHUNK", "1")))
    except ValueError:
        return 1


def _m2l_sparse_level_scan(w, cells, hl, soft, *, m: int, C: int,
                           with_phi: bool, m2l_dots: str = "fp32",
                           canon: np.ndarray | None = None):
    """Per-offset scan scheduling (see m2l_sparse_level); ``canon``
    restricts the sweep to an offset subset (the mixed-tier shells)."""
    dtype = w.dtype
    cap = cells.shape[0]
    m3 = m ** 3
    m2 = m * m
    nf = 4 if with_phi else 3
    if canon is None:
        canon = _canon_far()
    prec = (jax.lax.Precision.HIGH if m2l_dots == "bf16x3"
            else _PRECISION)

    NO = len(canon)
    CH = min(_m2l_scan_chunk(), NO)
    nsteps = -(-NO // CH)
    pad = nsteps * CH - NO
    if pad:
        # pad offsets replicate row 0; their found masks are zeroed so
        # they contribute exactly zero (same discipline as the fused form)
        canon = np.concatenate([canon, np.tile(canon[:1], (pad, 1))])
    live = np.ones((NO + pad,), bool)
    live[NO:] = False

    spos_p, fnd_p = _neighbor_slots(cells, C, canon, _parity_codes(canon))
    spos_n, fnd_n = _neighbor_slots(cells, C, -canon,
                                    _parity_codes(-canon))
    if pad:
        live_j = jnp.asarray(live)[:, None]
        fnd_p = fnd_p & live_j
        fnd_n = fnd_n & live_j

    t = jnp.asarray(_cheb_nodes(m), dtype)
    pxv = hl[0] * jnp.repeat(t, m2)
    pyv = hl[1] * jnp.tile(jnp.repeat(t, m), m)
    pzv = hl[2] * jnp.tile(t, m2)
    soft2 = jnp.asarray(soft, dtype) ** 2
    o_rows = jnp.asarray(canon, dtype)                     # (NO_p, 3)

    dot = functools.partial(jax.lax.dot_general, precision=prec,
                            preferred_element_type=dtype)
    f0 = tuple(jnp.zeros((cap, m3), dtype) for _ in range(nf))

    def one_offset(slp, fp, sln, fn, o):
        """CH = 1 unit of work: nf (c_p, c_n) contribution pairs."""
        dm = lambda pv, d: 2.0 * hl[d] * o[d] \
            + (pv[None, :] - pv[:, None])                  # (m3, m3)
        Dx, Dy, Dz = dm(pxv, 0), dm(pyv, 1), dm(pzv, 2)
        inv = jax.lax.rsqrt(Dx * Dx + Dy * Dy + Dz * Dz + soft2)
        inv3 = inv * inv * inv
        Ts = [Dx * inv3, Dy * inv3, Dz * inv3]
        if nf == 4:
            Ts.append(inv)
        wp = jnp.where(fp[:, None], w[jnp.minimum(slp, cap)], 0.0)
        wn = jnp.where(fn[:, None], w[jnp.minimum(sln, cap)], 0.0)
        out = []
        for i in range(nf):
            c_p = dot(wp, Ts[i], (((1,), (1,)), ((), ())))  # wp @ T^T
            c_n = dot(wn, Ts[i], (((1,), (0,)), ((), ())))  # wn @ T
            out.append(c_p + (c_n if i == 3 else -c_n))
        return out

    def body(acc, args):
        slp, fp, sln, fn, o = args                   # (CH, cap) / (CH, 3)
        loc = None
        for k in range(CH):
            c_k = one_offset(slp[k], fp[k], sln[k], fn[k], o[k])
            loc = c_k if loc is None else [a + b for a, b in zip(loc, c_k)]
        return tuple(a + b for a, b in zip(acc, loc)), None

    resh = lambda a: a.reshape((nsteps, CH) + a.shape[1:])
    fields, _ = jax.lax.scan(
        body, f0, tuple(map(resh, (spos_p, fnd_p, spos_n, fnd_n, o_rows))))
    return fields


def _m2l_sparse_level_fused(w, cells, hl, soft, *, m: int, C: int,
                            with_phi: bool, m2l_dots: str = "fp32"):
    """Fused multi-offset scheduling (see m2l_sparse_level)."""
    dtype = w.dtype
    cap = cells.shape[0]
    m3 = m ** 3
    m2 = m * m
    nf = 4 if with_phi else 3
    canon = _canon_far()
    prec = (jax.lax.Precision.HIGH if m2l_dots == "bf16x3"
            else _PRECISION)

    NO = len(canon)
    NC = _m2l_nc(cap, m3, NO)
    nsteps = -(-NO // NC)
    # pad the canonical list to a multiple of NC; pad offsets get their
    # found masks zeroed below, so their (arbitrary but finite) transfer
    # matrices contribute exactly zero
    pad = nsteps * NC - NO
    canon_p = np.concatenate([canon, np.tile(canon[:1], (pad, 1))])
    live = np.ones((NO + pad,), bool)
    live[NO:] = False

    spos_p, fnd_p = _neighbor_slots(cells, C, canon_p,
                                    _parity_codes(canon_p))
    spos_n, fnd_n = _neighbor_slots(cells, C, -canon_p,
                                    _parity_codes(-canon_p))
    live_j = jnp.asarray(live)[:, None]
    fnd_p = fnd_p & live_j
    fnd_n = fnd_n & live_j

    t = jnp.asarray(_cheb_nodes(m), dtype)
    pxv = hl[0] * jnp.repeat(t, m2)
    pyv = hl[1] * jnp.tile(jnp.repeat(t, m), m)
    pzv = hl[2] * jnp.tile(t, m2)
    soft2 = jnp.asarray(soft, dtype) ** 2
    o_rows = jnp.asarray(canon_p, dtype)                   # (NO_p, 3)

    resh = lambda a: a.reshape(nsteps, NC, cap)

    def transfers(o, sign):
        """(NC, m^3, m^3) per-field transfer stack at sign * o."""
        dm = lambda pv, d: (2.0 * sign) * hl[d] * o[:, d, None, None] \
            + (pv[None, :] - pv[:, None])[None]            # (NC, m3, m3)
        Dx, Dy, Dz = dm(pxv, 0), dm(pyv, 1), dm(pzv, 2)
        inv = jax.lax.rsqrt(Dx * Dx + Dy * Dy + Dz * Dz + soft2)
        inv3 = inv * inv * inv
        Ts = [Dx * inv3, Dy * inv3, Dz * inv3]
        if nf == 4:
            Ts.append(inv)
        return Ts

    def body(acc, args):
        slp, fp, sln, fn, o = args                         # (NC, cap), (NC, 3)
        Tm = transfers(o, -1.0)                            # at -o
        Tp = transfers(o, +1.0)                            # at +o
        # column block f: [wp|wn] @ vstack(-T_f(-o), -T_f(+o)) equals
        # wp @ T_f^T - wn @ T_f (phi: + both) -- the old per-sign dots
        sg = [-1.0, -1.0, -1.0, 1.0][:nf]
        top = jnp.concatenate([s * T for s, T in zip(sg, Tm)], axis=-1)
        bot = jnp.concatenate([s * T for s, T in zip(sg, Tp)], axis=-1)
        M = jnp.concatenate([top, bot], axis=1)            # (NC, 2m3, nf*m3)
        wp = jnp.where(fp[..., None], w[jnp.minimum(slp, cap)], 0.0)
        wn = jnp.where(fn[..., None], w[jnp.minimum(sln, cap)], 0.0)
        wcat = jnp.concatenate([wp, wn], axis=-1)          # (NC, cap, 2m3)
        out = jax.lax.dot_general(
            wcat, M, (((0, 2), (0, 1)), ((), ())),
            precision=prec, preferred_element_type=dtype)  # (cap, nf*m3)
        return acc + out, None

    acc0 = jnp.zeros((cap, nf * m3), dtype)
    acc, _ = jax.lax.scan(
        body, acc0,
        (resh(spos_p), resh(fnd_p), resh(spos_n), resh(fnd_n),
         o_rows.reshape(nsteps, NC, 3)))
    return tuple(acc[:, i * m3:(i + 1) * m3] for i in range(nf))


def _m2l_sparse_level_rank(w, cells, hl, soft, *, m: int, C: int,
                           with_phi: bool, m2l_dots: str = "fp32",
                           rank: int = 0):
    """Shared-basis COMPRESSED far sweep (explicit opt-in tier only --
    default_m2l_rank is 0, and m2l_sparse_level routes rank == 0 to the
    scan/fused dispatch above): the original canonical-offset scan, one
    offset per step, both signs per step, in r-space.

    ``rank`` compresses the sweep onto the shared operator basis
    (_m2l_basis): gather (cap, r) rows of w @ Q instead of (cap, m^3)
    rows of w, project each in-scan transfer to C = Q^T T Q once per
    offset (shared by the sign pair AND all cap rows), accumulate in
    r-space, back-project @ Q^T once per field after the scan --
    algebra: wp @ T^T ~ ((wp @ Q) @ C^T) @ Q^T and wn @ T ~
    ((wn @ Q) @ C) @ Q^T, so the Q^T factors out of the whole scan.
    Per-offset matmul work drops (m^3/r)^2-fold (16x at m=8, r=128)
    and gather traffic m^3/r-fold.

    Returns nf fields of shape (cap, m^3)."""
    dtype = w.dtype
    cap = cells.shape[0]
    m3 = m ** 3
    m2 = m * m
    nf = 4 if with_phi else 3
    canon = _canon_far()
    prec = (jax.lax.Precision.HIGH if m2l_dots == "bf16x3"
            else _PRECISION)
    rank = rank if 0 < rank < m3 else 0

    spos_p, fnd_p = _neighbor_slots(cells, C, canon, _parity_codes(canon))
    spos_n, fnd_n = _neighbor_slots(cells, C, -canon,
                                    _parity_codes(-canon))

    t = jnp.asarray(_cheb_nodes(m), dtype)
    pxv = hl[0] * jnp.repeat(t, m2)
    pyv = hl[1] * jnp.tile(jnp.repeat(t, m), m)
    pzv = hl[2] * jnp.tile(t, m2)
    soft2 = jnp.asarray(soft, dtype) ** 2
    o_rows = jnp.asarray(canon, dtype)                     # (NO, 3)

    dot = functools.partial(jax.lax.dot_general, precision=prec,
                            preferred_element_type=dtype)
    if rank:
        Qb = jnp.asarray(_m2l_basis(m, rank), dtype)       # (m3, r)
        wg = dot(w, Qb, (((1,), (0,)), ((), ())))          # (cap+1, r)
    else:
        wg = w
    f0 = tuple(jnp.zeros((cap, rank or m3), dtype) for _ in range(nf))

    def body(acc, args):
        slp, fp, sln, fn, o = args
        dm = lambda pv, d: 2.0 * hl[d] * o[d] \
            + (pv[None, :] - pv[:, None])                  # (m3, m3)
        Dx, Dy, Dz = dm(pxv, 0), dm(pyv, 1), dm(pzv, 2)
        inv = jax.lax.rsqrt(Dx * Dx + Dy * Dy + Dz * Dz + soft2)
        inv3 = inv * inv * inv
        Ts = [Dx * inv3, Dy * inv3, Dz * inv3]
        if nf == 4:
            Ts.append(inv)
        if rank:
            # hoisted projection: C = Q^T (T Q), one per field for both
            # signs and every target row of this offset
            Ts = [dot(Qb, dot(T, Qb, (((1,), (0,)), ((), ()))),
                      (((0,), (0,)), ((), ()))) for T in Ts]
        wp = jnp.where(fp[:, None], wg[jnp.minimum(slp, cap)], 0.0)
        wn = jnp.where(fn[:, None], wg[jnp.minimum(sln, cap)], 0.0)
        out = []
        for i, a in enumerate(acc):
            c_p = dot(wp, Ts[i], (((1,), (1,)), ((), ())))  # wp @ T^T
            c_n = dot(wn, Ts[i], (((1,), (0,)), ((), ())))  # wn @ T
            out.append(a + c_p + (c_n if i == 3 else -c_n))
        return tuple(out), None

    fields, _ = jax.lax.scan(
        body, f0, (spos_p, fnd_p, spos_n, fnd_n, o_rows))
    if rank:
        fields = tuple(dot(fi, Qb, (((1,), (1,)), ((), ())))
                       for fi in fields)
    return fields


# ----------------------------------------------------------- full solver
def hierarchy_fields(w_fin, cells_fin, c, h, soft, plan: SparsePlan,
                     with_phi: bool, m2l_dots: str = "fp32"):
    """Finest-level local fields from the finest-level occupied
    multipoles: the distribution-independent middle of the adaptive
    solve (parent occupied chain, M2M upward, dense base, downward
    L2L + M2L).  Split out of adaptive_field so the sharded engine can
    psum ONE finest (cap + 1, m^3) tensor and run this chain
    redundantly per shard (parallel/shard_adaptive.py) -- the same
    skeleton as shard+fmm's redundant tiny sweeps.

    ``w_fin`` = (cap + 1, m^3) finest sparse expansions (dump row
    last), ``cells_fin`` = the (cap,) sorted occupied Morton codes.
    Returns (fields tuple of nf (cap + 1, m^3) tables with a ZERO dump
    row, diag)."""
    m = plan.m
    Ld, L = plan.dense_levels, plan.levels

    # occupied lists finest -> coarsest sparse level (Morton codes: the
    # parent chain is a 3-bit shift, which keeps each level's list
    # sorted)
    cells = {L: cells_fin}
    for l in range(L - 1, Ld, -1):
        ids = jnp.where(cells[l + 1] == _BIG, _BIG, cells[l + 1] >> 3)
        cells[l], _ = _occupied_and_slots(ids, plan.cell_caps[l - Ld - 1])

    diag = {"n_cells": tuple(jnp.sum(cells[l] != _BIG)
                             for l in range(Ld + 1, L + 1))}

    # upward: M2M chain, densify at Ld
    w = {L: w_fin}
    for l in range(L - 1, Ld, -1):
        w[l] = m2m_sparse(w[l + 1], cells[l + 1], cells[l], m=m,
                          C_child=2 ** (l + 1))
    code = cells[Ld + 1]
    up = _octant_apply(w[Ld + 1][:-1], code & 7, m, transpose=False)
    # scatter into the dense (row-major) Ld grid; padding slots carry
    # zero expansions (their segment id is safely remapped to 0)
    is_pad = code == _BIG
    px, py, pz = _munpack(jnp.minimum(code, 8 ** (Ld + 1) - 1) >> 3,
                          2 ** Ld)
    pid = jnp.where(is_pad, 0, _pack(px, py, pz, 2 ** Ld)).astype(jnp.int32)
    up = jnp.where(is_pad[:, None], 0.0, up)
    w_dense = jax.ops.segment_sum(up, pid, num_segments=2 ** (3 * Ld))

    # dense downward pass with the near list deferred below Ld
    f_dense = fmm_field_grid(w_dense, h, soft, m=m, levels=Ld,
                             with_phi=with_phi, fused=True,
                             m2l_dots=m2l_dots, finest_subset="far")
    f_dense = jnp.stack(f_dense, 0)                        # (nf, C_d^3, m3)

    # sparse downward chain
    nf = 4 if with_phi else 3
    f = None
    for l in range(Ld + 1, L + 1):
        C = 2 ** l
        hl = h / C
        cap = plan.cell_caps[l - Ld - 1]
        if f is None:
            f = tuple(l2l_from_dense(f_dense[i], cells[l], m=m, C_child=C)
                      for i in range(nf))
        else:
            f = tuple(l2l_sparse(fi, cells[l - 1], cells[l], m=m,
                                 C_child=C)
                      for fi in f)
        contrib = m2l_sparse_level(w[l], cells[l], hl, soft, m=m, C=C,
                                   with_phi=with_phi, m2l_dots=m2l_dots,
                                   rank=_resolve_rank(plan, cap))
        # combine: L2L gave (cap + 1, m3), M2L gave (cap, m3); keep the
        # ZERO dump row (the next L2L / the final L2P read it for
        # missing slots)
        zero = jnp.zeros((1, m ** 3), f[0].dtype)
        f = tuple(
            jnp.concatenate([fi[:cap] + ci, zero], 0)
            for fi, ci in zip(f, contrib)
        )
    return f, diag


def adaptive_field(xs, ys, zs, gs, key_s, c, h, soft, plan: SparsePlan,
                   with_phi: bool, m2l_dots: str = "fp32"):
    """Far fields of every body via dense levels 2..Ld + sparse levels
    Ld+1..L (finest near-27 excluded for the P2P stage).

    Inputs are MORTON-SORTED (``key_s`` = sorted finest-level codes,
    _BIG for inactive rows -- the one shared sort of solve_adaptive);
    outputs are per-body values in the SAME sorted order.  Returns
    (per-body field tuple, diagnostics dict of traced counts)."""
    m = plan.m
    Cfin = 2 ** plan.levels
    cap = plan.cell_caps[-1]
    cells_fin, slots = _occupied_and_slots(key_s, cap)
    w_fin = p2m_window(xs, ys, zs, gs, c, h, slots, cap, m=m, C=Cfin)
    f, diag = hierarchy_fields(w_fin, cells_fin, c, h, soft, plan,
                               with_phi, m2l_dots)
    vals = l2p_window(xs, ys, zs, c, h, slots, f, m=m, C=Cfin)
    return vals, diag


def solve_adaptive(qx, qy, qz, gm, soft, plan: SparsePlan, *, heavy_k: int,
                   heavy_factor: float, with_phi: bool,
                   m2l_dots: str = "fp32"):
    """(acc (n, 3), phi | None): the adaptive counterpart of
    ops/fmm._fmm_solve -- isotropic box, heavy split, sparse hierarchy
    far field, exact P2P near field, exact heavy corrections."""
    from murb_tpu.ops.naive import acc_rect
    from murb_tpu.ops.proxy import (
        bounding_box,
        heavy_source_acc,
        heavy_split,
    )

    dtype = qx.dtype
    n = qx.shape[0]
    gm_pos = gm > 0
    c, h = bounding_box(qx, qy, qz, gm_pos)
    h = jnp.full_like(h, jnp.max(h))      # isotropic: see ops/fmm p2p note

    k = max(min(heavy_k, n), 1)
    mean_gm = jnp.sum(gm) / jnp.maximum(jnp.sum(gm_pos.astype(dtype)), 1.0)
    hq, heavy_gm, is_heavy, top_idx, gm_eff = heavy_split(
        qx, qy, qz, gm, k, heavy_factor, mean_gm
    )

    # ---- ONE Morton sort shared by every sparse stage: anterpolation
    # slot windows, the occupied-list chain, AND the P2P brick cut all
    # ride the same body order; one unsort at the end.
    Cfin = 2 ** plan.levels
    cx, cy, cz = _body_cells(qx, qy, qz, c, h, Cfin)
    active = gm_eff > 0
    key = jnp.where(active, morton_key(cx, cy, cz, Cfin), _BIG)
    perm = jnp.argsort(key)
    key_s = key[perm]
    xs, ys, zs, gs = (v[perm] for v in (qx, qy, qz, gm_eff))

    vals, _diag = adaptive_field(xs, ys, zs, gs, key_s, c, h, soft, plan,
                                 with_phi, m2l_dots)

    from murb_tpu.ops.p2p import _SENTINEL_SHIFT

    sent = jnp.asarray(2 * Cfin + _SENTINEL_SHIFT, jnp.int32)
    if plan.p2p_impl == "pallas":
        from murb_tpu.ops.common import f32_inputs
        from murb_tpu.ops.p2p_pallas import p2p_sweep_pallas_sorted

        ci = tuple(
            jnp.where(active, v, sent)[perm].astype(jnp.float32)
            for v in (cx, cy, cz)
        )
        out, _np = p2p_sweep_pallas_sorted(
            *f32_inputs(xs, ys, zs, gs), ci, soft,
            pmax=plan.p2p_pmax, with_phi=with_phi,
        )
        near = tuple(out[:, i].reshape(n).astype(dtype) for i in
                     range(4 if with_phi else 3))
    else:
        from murb_tpu.ops.p2p import p2p_sweep_sorted

        ci = tuple(
            jnp.where(active, v, sent)[perm].astype(dtype)
            for v in (cx, cy, cz)
        )
        parts, _np = p2p_sweep_sorted(
            xs, ys, zs, gs, ci, soft, pmax=plan.p2p_pmax,
            chunk=plan.p2p_chunk, with_phi=with_phi,
        )
        near = tuple(p.reshape(n) for p in parts)

    # far + near in sorted order, then the ONE unsort
    unsort = lambda a: jnp.zeros(n, dtype).at[perm].set(a)
    acc = jnp.stack([unsort(vals[0] + near[0]),
                     unsort(vals[1] + near[1]),
                     unsort(vals[2] + near[2])], 1)
    phi_far = unsort(vals[3] + near[3]) if with_phi else None

    acc = acc + heavy_source_acc(qx, qy, qz, hq, heavy_gm, soft)
    ht = acc_rect(hq[0], hq[1], hq[2], qx, qy, qz, gm, soft)
    ht_acc = jnp.stack([ht.ax, ht.ay, ht.az], 1)
    acc = acc.at[top_idx].set(
        jnp.where(is_heavy[:, None], ht_acc, acc[top_idx])
    )

    phi = None
    if with_phi:
        from murb_tpu.ops.proxy import heavy_source_phi, heavy_target_phi

        phi = phi_far + heavy_source_phi(qx, qy, qz, hq, heavy_gm, soft)
        phi_h = heavy_target_phi(qx, qy, qz, gm, hq, soft)
        phi = phi.at[top_idx].set(jnp.where(is_heavy, phi_h, phi[top_idx]))
    return acc, phi


@functools.partial(
    jax.jit,
    static_argnames=("soft", "plan", "heavy_k", "heavy_factor",
                     "m2l_dots"),
)
def acc_adaptive(qx, qy, qz, gm, soft, plan: SparsePlan, *,
                 heavy_k: int = 1, heavy_factor: float = 64.0,
                 m2l_dots: str = "fp32") -> Accel:
    """All-pairs softened gravity via the adaptive hierarchy (static
    ``plan`` from plan_adaptive)."""
    acc, _ = solve_adaptive(qx, qy, qz, gm, soft, plan, heavy_k=heavy_k,
                            heavy_factor=heavy_factor, with_phi=False,
                            m2l_dots=m2l_dots)
    return Accel(ax=acc[:, 0], ay=acc[:, 1], az=acc[:, 2])


@functools.partial(
    jax.jit,
    static_argnames=("soft", "plan", "heavy_k", "heavy_factor",
                     "m2l_dots"),
)
def force_and_potential_adaptive(qx, qy, qz, gm, soft, plan: SparsePlan, *,
                                 heavy_k: int = 1,
                                 heavy_factor: float = 64.0,
                                 m2l_dots: str = "fp32"):
    """(Accel, phi) in one adaptive pass -- the tracking-engine entry."""
    acc, phi = solve_adaptive(qx, qy, qz, gm, soft, plan, heavy_k=heavy_k,
                              heavy_factor=heavy_factor, with_phi=True,
                              m2l_dots=m2l_dots)
    return Accel(ax=acc[:, 0], ay=acc[:, 1], az=acc[:, 2]), phi


# ---------------------------------------------------------- host planner
def _host_cells(q: np.ndarray, L: int):
    C = 2 ** L
    q = np.asarray(q, np.float32)
    lo, hi = q.min(0), q.max(0)
    ctr = (np.float32(0.5) * (lo + hi)).astype(np.float32)
    hh = np.maximum(np.float32(0.5) * (hi - lo), np.float32(1.0))
    hh = np.full(3, hh.max(), np.float32)
    cs = (np.float32(2.0) * hh / np.float32(C)).astype(np.float32)
    ci = np.clip(np.floor((q - (ctr - hh)) / cs), 0, C - 1).astype(np.int64)
    return ci


def level_stats(q: np.ndarray, dense_levels: int, levels: int):
    """Per-sparse-level occupied-cell counts of the CURRENT distribution
    -- the planning/health replica of the device `_occupied` lists."""
    ci_fin = _host_cells(q, levels)
    out = []
    for l in range(dense_levels + 1, levels + 1):
        ci = ci_fin >> (levels - l)
        C = 2 ** l
        cid = (ci[:, 0] * C + ci[:, 1]) * C + ci[:, 2]
        out.append(int(len(np.unique(cid))))
    return out


def plan_adaptive(q: np.ndarray, npad: int, m: int, dense_levels: int,
                  levels: int, *, cell_margin: float = 1.3,
                  p2p_margin: float = 1.5,
                  p2p_impl: str | None = None,
                  m2l_rank: int = -1) -> SparsePlan:
    """Build a SparsePlan for the current distribution at the given
    geometry (margined static capacities; proxy_health re-checks them
    as the system evolves, maybe_adapt re-plans on overflow).

    ``p2p_impl`` defaults to the backend's best sweep: the Pallas
    block-sparse kernel on TPU (measured 3x the jnp sweep at the 82k
    merger), the jnp sweep elsewhere."""
    if p2p_impl is None:
        p2p_impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    stats = level_stats(q, dense_levels, levels)
    cell_caps = tuple(int(nc * cell_margin) + 9 for nc in stats)
    est = estimate_brick_pairs(q, npad, levels)
    if p2p_impl == "pallas":
        from murb_tpu.ops.p2p_pallas import size_pmax_runs

        pmax = size_pmax_runs(est, npad // DEFAULT_K, margin=p2p_margin)
    else:
        pmax = size_pmax(est, margin=p2p_margin)
    return SparsePlan(m=m, dense_levels=dense_levels, levels=levels,
                      cell_caps=cell_caps, p2p_pmax=pmax,
                      p2p_impl=p2p_impl, m2l_rank=m2l_rank)


def p2p_capacity_needed(n_pairs: int, npad: int, plan: SparsePlan) -> int:
    """The pair capacity the CURRENT distribution needs under the plan's
    sweep implementation (the health-check counterpart of the sizing in
    plan_adaptive, margin 1)."""
    if plan.p2p_impl == "pallas":
        from murb_tpu.ops.p2p_pallas import size_pmax_runs

        return size_pmax_runs(n_pairs, npad // DEFAULT_K, margin=1.0)
    return size_pmax(n_pairs, margin=1.0)


#: measured v5e rates (merger probe, this round): the offset-scan M2L
#: runs at the MXU's fp32-HIGHEST rate on NO * cap rows; the jnp P2P
#: sweep realizes ~1.2e9 pair-slots/ms (mask + gathers on the VPU); the
#: jnp sparse anterpolation (P2M segment_sum + L2P gather) costs
#: ~0.38 us/body at m=6; sorts/uniques/chains add ~0.5 ms per level.
_MAC_PER_MS = 2.2e10
_GATHER_BYTES_PER_MS = 150e9 / 1e3
_P2P_SLOTS_PER_MS = 1.2e9          # jnp sweep (gather-bound)
_P2P_SLOTS_PER_MS_PALLAS = 2.1e9   # block-sparse DMA kernel (measured)
_ANTERP_US_PER_BODY = 0.38
_EXACT_SLOTS_PER_MS = 3.9e9


def _p2p_rate() -> float:
    return (_P2P_SLOTS_PER_MS_PALLAS
            if jax.default_backend() == "tpu" else _P2P_SLOTS_PER_MS)


def _cost_from_stats(stats, n_bricks, npad, m, dense_levels, levels,
                     nf: int = 3, m2l_rank: int = -1) -> float:
    NO = len(_far_offsets()[0])
    rank = default_m2l_rank(m) if m2l_rank < 0 else m2l_rank
    m3 = m ** 3
    m2l = 0.0
    for nc in stats:
        rows = NO * nc
        cap = int(nc * 1.3) + 9              # plan_adaptive's cap sizing
        r = rank if (rank and cap >= 2 * rank) else 0
        if r:
            # r-space sweep + the hoisted per-offset basis projection
            per_field = rows * r * r + NO * (m3 * m3 * r + m3 * r * r)
        else:
            per_field = rows * m3 * m3
        m2l += per_field * nf / _MAC_PER_MS
        m2l += rows * (r or m3) * 4 / _GATHER_BYTES_PER_MS
    m2l += 686 * 8 ** dense_levels * m ** 6 * nf / _MAC_PER_MS  # dense base
    p2p = n_bricks * DEFAULT_K ** 2 * 26 / _p2p_rate()
    anterp = npad * _ANTERP_US_PER_BODY / 1e3
    misc = 0.5 * (levels - dense_levels) + 2.0      # sorts, uniques, chains
    # end-to-end fudge: the full solve measured ~2x the stage sum on the
    # merger (Ld=2/L=5 est 103 ms vs 216 ms measured: M2M/L2L chains,
    # dense base glue, sort/unique overheads).  Keeping the model
    # PESSIMISTIC means the engine policy only leaves the exact kernel
    # when the adaptive win is decisive.
    return 2.0 * (m2l + p2p + anterp + misc)


def plan_cost_ms(q: np.ndarray, npad: int, m: int, dense_levels: int,
                 levels: int, nf: int = 3, m2l_rank: int = -1) -> float:
    """Estimated adaptive step cost in MILLISECONDS on a v5e, from the
    measured stage rates above -- honest enough that the engine policy
    only picks the adaptive solver where it actually beats the exact
    kernel (at N ~ 80k the exact kernel sits at the VPU ceiling and
    wins; clustered boxes at larger N flip it)."""
    return _cost_from_stats(level_stats(q, dense_levels, levels),
                            estimate_brick_pairs(q, npad, levels),
                            npad, m, dense_levels, levels, nf, m2l_rank)


def exact_cost_ms(npad: int) -> float:
    """The exact hybrid kernel's measured cost model (VPU ceiling)."""
    return 14.0 * npad * npad / _EXACT_SLOTS_PER_MS


#: measured error prefactor of the adaptive far shell (uniform box,
#: worst |o|_inf = 2 pairs): err ~ C * rho^-m with rho = 2 + sqrt(5);
#: measured C ~ 0.6-0.75 (m=4: 2.4e-3, m=6: 1.1e-4, m=8: 3e-6).  1.0 is
#: the safe initial pick; the engines validate by measurement anyway.
ADAPTIVE_ERR_PREFACTOR = 1.0


def adaptive_order(tol: float = 1e-4) -> int:
    """Initial Chebyshev order for the adaptive (P2P near field) solver:
    scale-free -- the binding constraint is the |o|_inf >= 2 far shell,
    whose separation ratio rho = 2 + sqrt(5) is independent of both the
    box and the softening.  Rounded up to even (the validation ladder's
    rungs); the engine's measured validation descends/escalates from
    here."""
    rho = 2.0 + math.sqrt(5.0)
    m = math.ceil(math.log(ADAPTIVE_ERR_PREFACTOR / max(tol, 1e-12))
                  / math.log(rho))
    return max(4, m + (m % 2))


def best_adaptive_plan(q: np.ndarray, npad: int, m: int,
                       max_levels: int = 9,
                       m2l_rank: int = -1) -> tuple[SparsePlan, float]:
    """(plan, est_ms): the cheapest (dense_levels, levels) combo for the
    current distribution.  Dense levels stay shallow (the 8^Ld M2L
    term); the finest level trades P2P pairs against sparse M2L rows.

    The expensive host inputs are shared across candidates: per-level
    occupied counts come from ONE finest-grid assignment (cells at level
    l are the L_max cells shifted down), brick-pair estimates from one
    sort per candidate finest level."""
    per_level = level_stats(q, 2, max_levels)      # levels 3..max
    nc_at = {l: per_level[l - 3] for l in range(3, max_levels + 1)}
    bricks_at = {L: estimate_brick_pairs(q, npad, L)
                 for L in range(3, max_levels + 1)}
    best = None
    for Ld in (2, 3):
        for L in range(Ld + 1, max_levels + 1):
            stats = [nc_at[l] for l in range(Ld + 1, L + 1)]
            cost = _cost_from_stats(stats, bricks_at[L], npad, m, Ld, L,
                                    m2l_rank=m2l_rank)
            if best is None or cost < best[0]:
                best = (cost, Ld, L)
    cost, Ld, L = best
    return plan_adaptive(q, npad, m, Ld, L, m2l_rank=m2l_rank), cost
