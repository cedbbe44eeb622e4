"""Adaptive (occupied-cell) deep hierarchy: sparse FMM levels + P2P.

The dense hierarchy (ops/fmm.py) stores every cell of a uniform grid, so
its depth is capped at L ~ 4 by the 8^L M2L cost -- and clustered
distributions (the two-galaxy merger: power-law cores in a ~500 kpc box
with 0.2 kpc softening) need cells far smaller than that before the
near-field work collapses.  This module extends the hierarchy below the
dense levels with COMPACTED levels that store only occupied cells:

  occupancy  each sparse level l keeps a sorted, statically-capped list
             of occupied cell ids (jnp.unique(size=cap)); slots are
             found by searchsorted.  Every capacity is sized on the host
             from the ctor-time distribution (plan_adaptive) and
             health-checked as it evolves -- the same static-capacity
             contract as the P2P pair list.
  upward     sparse P2M into finest-level slots; sparse M2M (8 per-octant
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
    p2p_sweep,
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


# ------------------------------------------------------------ id helpers
def _pack(cx, cy, cz, C: int):
    return (cx * C + cy) * C + cz


def _unpack(cid, C: int):
    return cid // (C * C), (cid // C) % C, cid % C


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
def _occupied(cids, cap: int):
    """Sorted unique cell ids, statically capped (pad slots = _BIG)."""
    return jnp.unique(cids, size=cap, fill_value=_BIG)


def _slot(cells, cids):
    """Slot of each cid in the sorted occupied list; misses (including
    _BIG sentinels and capacity overflow) land on the dump slot
    len(cells)."""
    cap = cells.shape[0]
    pos = jnp.searchsorted(cells, cids)
    pos = jnp.clip(pos, 0, cap - 1)
    return jnp.where(cells[pos] == cids, pos, cap).astype(jnp.int32)


# ---------------------------------------------------------- anterpolation
def _body_cells(qx, qy, qz, c, h, C: int):
    from murb_tpu.ops.p2p import _cell_ixyz

    cx, cy, cz = _cell_ixyz(qx, qy, qz, c, h, C)
    return cx, cy, cz


def p2m_sparse(qx, qy, qz, gm_eff, c, h, cells, *, m: int, C: int,
               chunk: int = 2048):
    """(cap + 1, m^3) per-slot source expansions at the finest sparse
    level (last row = dump: inactive bodies and capacity misses)."""
    from murb_tpu.ops.common import pick_block
    from murb_tpu.ops.fmm import _cell_coords

    n = qx.shape[0]
    cap = cells.shape[0]
    chunk = pick_block(n, min(chunk, n))
    lo = c - h
    cs = 2.0 * h / C
    nb = n // chunk
    resh = lambda a: a.reshape(nb, chunk)

    def one(args):
        bx, by, bz, bg = args
        cx, tx = _cell_coords(bx, lo[0], cs[0], C)
        cy, ty = _cell_coords(by, lo[1], cs[1], C)
        cz, tz = _cell_coords(bz, lo[2], cs[2], C)
        sx = _basis(tx, m)
        sy = _basis(ty, m)
        sz = _basis(tz, m)
        svw = jnp.einsum("bv,bw->bvw", sy, sz).reshape(chunk, m * m)
        outer = jnp.einsum("bu,bp->bup", bg[:, None] * sx,
                           svw).reshape(chunk, m ** 3)
        cid = jnp.where(bg > 0, _pack(cx, cy, cz, C), _BIG)
        return jax.ops.segment_sum(outer, _slot(cells, cid),
                                   num_segments=cap + 1)

    # accumulate in the scan carry: a map + sum would materialize
    # (n/chunk, cap+1, m^3) -- 9.8 GB at N=1M, cap=22k (measured OOM)
    def step(acc, args):
        return acc + one(args), None

    acc0 = jnp.zeros((cap + 1, m ** 3), qx.dtype)
    acc, _ = jax.lax.scan(step, acc0,
                          (resh(qx), resh(qy), resh(qz), resh(gm_eff)))
    return acc


def l2p_sparse(qx, qy, qz, c, h, cells, fields, *, m: int, C: int,
               chunk: int = 2048):
    """Per-body values from finest sparse-level fields (tuple of
    (cap + dump, m^3)); bodies whose cell missed the capacity read the
    dump row (zeros) -- the health check catches that upstream."""
    from murb_tpu.ops.common import pick_block
    from murb_tpu.ops.fmm import _cell_coords

    n = qx.shape[0]
    chunk = pick_block(n, min(chunk, n))
    lo = c - h
    cs = 2.0 * h / C
    nb = n // chunk
    resh = lambda a: a.reshape(nb, chunk)

    def one(args):
        bx, by, bz = args
        cx, tx = _cell_coords(bx, lo[0], cs[0], C)
        cy, ty = _cell_coords(by, lo[1], cs[1], C)
        cz, tz = _cell_coords(bz, lo[2], cs[2], C)
        sx = _basis(tx, m)
        sy = _basis(ty, m)
        sz = _basis(tz, m)
        sl = _slot(cells, _pack(cx, cy, cz, C))
        outs = []
        for f in fields:
            fg = f[sl].reshape(chunk, m, m * m)
            t1 = jnp.einsum("bu,bup->bp", sx, fg,
                            precision=_PRECISION).reshape(chunk, m, m)
            t2 = jnp.einsum("bv,bvw->bw", sy, t1, precision=_PRECISION)
            outs.append(jnp.sum(sz * t2, axis=1))
        return tuple(outs)

    outs = jax.lax.map(one, (resh(qx), resh(qy), resh(qz)))
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
    cx, cy, cz = _unpack(child_cells, C_child)
    oct_idx = ((cx & 1) * 2 + (cy & 1)) * 2 + (cz & 1)
    pid = jnp.where(child_cells == _BIG, _BIG,
                    _pack(cx >> 1, cy >> 1, cz >> 1, C_child // 2))
    up = _octant_apply(w_child[:-1], oct_idx, m, transpose=False)
    cap_p = parent_cells.shape[0]
    return jax.ops.segment_sum(up, _slot(parent_cells, pid),
                               num_segments=cap_p + 1)


def l2l_sparse(f_parent, parent_cells, child_cells, *, m: int,
               C_child: int):
    """Parent slot fields -> child slot fields (the M2M transpose); the
    dump row stays zero."""
    cx, cy, cz = _unpack(child_cells, C_child)
    oct_idx = ((cx & 1) * 2 + (cy & 1)) * 2 + (cz & 1)
    pid = jnp.where(child_cells == _BIG, _BIG,
                    _pack(cx >> 1, cy >> 1, cz >> 1, C_child // 2))
    fp = f_parent[_slot(parent_cells, pid)]       # (cap_child, m^3)
    down = _octant_apply(fp, oct_idx, m, transpose=True)
    pad = jnp.zeros((1, down.shape[1]), down.dtype)
    return jnp.concatenate([down, pad], 0)


def l2l_from_dense(f_dense, child_cells, *, m: int, C_child: int):
    """Dense-grid parent fields (C_parent^3, m^3) -> sparse child slots."""
    cx, cy, cz = _unpack(child_cells, C_child)
    oct_idx = ((cx & 1) * 2 + (cy & 1)) * 2 + (cz & 1)
    pid = _pack(cx >> 1, cy >> 1, cz >> 1, C_child // 2)
    pid = jnp.clip(pid, 0, f_dense.shape[0] - 1)
    fp = jnp.where((child_cells == _BIG)[:, None], 0.0, f_dense[pid])
    down = _octant_apply(fp, oct_idx, m, transpose=True)
    pad = jnp.zeros((1, down.shape[1]), down.dtype)
    return jnp.concatenate([down, pad], 0)


def densify(w_sparse, cells, C: int):
    """Sparse slot expansions -> dense (C^3, m^3) grid (scatter by id)."""
    cid = jnp.clip(cells, 0, C ** 3 - 1)
    w = jnp.where((cells == _BIG)[:, None], 0.0, w_sparse[:-1])
    return jnp.zeros((C ** 3, w.shape[1]), w.dtype).at[cid].add(w)


# ---------------------------------------------------------------- M2L
def _neighbor_slots(cells, C: int):
    """((NO, cap) source slots, (NO, cap) found mask): for every far-list
    offset, each occupied target's occupied source (if any), with the
    parity masks of the expand telescoping applied.  One vectorized
    build per level -- per-offset lookups inside the sweep scan were
    measured 40x slower than this (XLA per-step gather overheads)."""
    cap = cells.shape[0]
    offs, par = _far_offsets()
    cx, cy, cz = _unpack(cells, C)
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
    sid = _pack(nco[..., 0], nco[..., 1], nco[..., 2], C)
    spos = _slot(cells, jnp.where(ok, sid, _BIG))          # (NO, cap)
    return spos, ok & (spos < cap)


def _transfer_tensors(hl, soft, offsets, *, m: int, nf: int, dtype):
    """(NO, nf, m^3, m^3) transfer matrices of a level, built in ONE
    vectorized pass (per-scan-step builds were measured ~100x the rsqrt
    volume in per-step overhead)."""
    m2 = m * m
    t = jnp.asarray(_cheb_nodes(m), dtype)
    pxv = hl[0] * jnp.repeat(t, m2)
    pyv = hl[1] * jnp.tile(jnp.repeat(t, m), m)
    pzv = hl[2] * jnp.tile(t, m2)
    o = jnp.asarray(offsets, dtype)                        # (NO, 3)
    dm = lambda pv, d: (2.0 * hl[d] * o[:, d])[:, None, None] \
        + (pv[None, None, :] - pv[None, :, None])
    Dx, Dy, Dz = dm(pxv, 0), dm(pyv, 1), dm(pzv, 2)        # (NO, m3, m3)
    inv = jax.lax.rsqrt(Dx * Dx + Dy * Dy + Dz * Dz
                        + jnp.asarray(soft, dtype) ** 2)
    inv3 = inv * inv * inv
    Ts = [Dx * inv3, Dy * inv3, Dz * inv3]
    if nf == 4:
        Ts.append(inv)
    return jnp.stack(Ts, 1)                                # (NO, nf, m3, m3)


def m2l_sparse_level(w, cells, hl, soft, *, m: int, C: int,
                     with_phi: bool):
    """Far sweep at one sparse level: an offset scan over compacted rows.

    Per offset: gather each target's source expansion (precomputed slot
    table), one (cap, m^3) @ (m^3, m^3) matmul per field, ALIGNED
    accumulate (no scatter -- row i of the accumulator is slot i).
    Work is NO * cap rows; a true pair-list form would touch only the
    occupied pairs but pays per-chunk gather/scatter/transfer-build
    overheads that measured 10-40x the arithmetic on XLA:TPU (chunked
    variants at 512..8192 all ~245 ms vs ~25 ms for this form at the
    merger's finest level).  Returns nf fields of shape (cap, m^3)."""
    dtype = w.dtype
    cap = cells.shape[0]
    m3 = m ** 3
    nf = 4 if with_phi else 3
    offsets = _far_offsets()[0]

    spos, found = _neighbor_slots(cells, C)
    T = _transfer_tensors(hl, soft, offsets, m=m, nf=nf, dtype=dtype)

    f0 = tuple(jnp.zeros((cap, m3), dtype) for _ in range(nf))

    def body(acc, args):
        sl, fnd, Ti = args                                 # (cap,), (cap,), (nf, m3, m3)
        ws = jnp.where(fnd[:, None], w[jnp.minimum(sl, cap)], 0.0)
        out = []
        for i, a in enumerate(acc):
            contrib = jax.lax.dot_general(
                ws, Ti[i], (((1,), (1,)), ((), ())),
                precision=_PRECISION, preferred_element_type=dtype,
            )                                              # ws @ T^T
            out.append(a + contrib)
        return tuple(out), None

    fields, _ = jax.lax.scan(body, f0, (spos, found, T))
    return fields


# ----------------------------------------------------------- full solver
def adaptive_field(qx, qy, qz, gm_eff, c, h, soft, plan: SparsePlan,
                   with_phi: bool, m2l_dots: str = "fp32"):
    """Far fields of every body via dense levels 2..Ld + sparse levels
    Ld+1..L (finest near-27 excluded for the P2P stage).  Returns
    (per-body field tuple, finest cells, diagnostics dict of traced
    counts)."""
    m = plan.m
    Ld, L = plan.dense_levels, plan.levels
    Cfin = 2 ** L

    cx, cy, cz = _body_cells(qx, qy, qz, c, h, Cfin)
    cid_fin = jnp.where(gm_eff > 0, _pack(cx, cy, cz, Cfin), _BIG)

    # occupied lists, finest -> coarsest sparse level
    cells = {}
    ids = cid_fin
    for l in range(L, Ld, -1):
        cap = plan.cell_caps[l - Ld - 1]
        cells[l] = _occupied(ids, cap)
        if l - 1 > Ld:
            ccx, ccy, ccz = _unpack(cells[l], 2 ** l)
            ids = jnp.where(cells[l] == _BIG, _BIG,
                            _pack(ccx >> 1, ccy >> 1, ccz >> 1,
                                  2 ** (l - 1)))

    diag = {"n_cells": tuple(jnp.sum(cells[l] != _BIG)
                             for l in range(Ld + 1, L + 1))}

    # upward: sparse P2M + M2M chain, densify at Ld
    w = {L: p2m_sparse(qx, qy, qz, gm_eff, c, h, cells[L], m=m, C=Cfin)}
    for l in range(L - 1, Ld, -1):
        w[l] = m2m_sparse(w[l + 1], cells[l + 1], cells[l], m=m,
                          C_child=2 ** (l + 1))
    ccx, ccy, ccz = _unpack(cells[Ld + 1], 2 ** (Ld + 1))
    up = _octant_apply(w[Ld + 1][:-1],
                       ((ccx & 1) * 2 + (ccy & 1)) * 2 + (ccz & 1), m,
                       transpose=False)
    # scatter into the dense Ld grid; padding slots carry zero expansions
    # (their segment id is safely remapped to 0)
    is_pad = cells[Ld + 1] == _BIG
    pid = jnp.where(is_pad, 0, _pack(ccx >> 1, ccy >> 1, ccz >> 1,
                                     2 ** Ld)).astype(jnp.int32)
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
                                   with_phi=with_phi)
        # combine: L2L gave (cap + 1, m3), M2L gave (cap, m3); keep the
        # ZERO dump row (the next L2L / the final L2P read it for
        # missing slots)
        zero = jnp.zeros((1, m ** 3), f[0].dtype)
        f = tuple(
            jnp.concatenate([fi[:cap] + ci, zero], 0)
            for fi, ci in zip(f, contrib)
        )

    vals = l2p_sparse(qx, qy, qz, c, h, cells[L], f, m=m, C=Cfin)
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

    vals, _diag = adaptive_field(qx, qy, qz, gm_eff, c, h, soft, plan,
                                 with_phi, m2l_dots)
    acc = jnp.stack(vals[:3], 1)

    if plan.p2p_impl == "pallas":
        from murb_tpu.ops.p2p_pallas import p2p_sweep_pallas

        acc_near, phi_near, _np = p2p_sweep_pallas(
            qx, qy, qz, gm_eff, c, h, soft, C=2 ** plan.levels,
            pmax=plan.p2p_pmax, with_phi=with_phi,
        )
    else:
        acc_near, phi_near, _np = p2p_sweep(
            qx, qy, qz, gm_eff, c, h, soft, C=2 ** plan.levels,
            pmax=plan.p2p_pmax, chunk=plan.p2p_chunk, with_phi=with_phi,
        )
    acc = acc + acc_near

    acc = acc + heavy_source_acc(qx, qy, qz, hq, heavy_gm, soft)
    ht = acc_rect(hq[0], hq[1], hq[2], qx, qy, qz, gm, soft)
    ht_acc = jnp.stack([ht.ax, ht.ay, ht.az], 1)
    acc = acc.at[top_idx].set(
        jnp.where(is_heavy[:, None], ht_acc, acc[top_idx])
    )

    phi = None
    if with_phi:
        from murb_tpu.ops.proxy import heavy_source_phi, heavy_target_phi

        phi = vals[3] + phi_near
        phi = phi + heavy_source_phi(qx, qy, qz, hq, heavy_gm, soft)
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
                  p2p_impl: str | None = None) -> SparsePlan:
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
                      p2p_impl=p2p_impl)


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
                     nf: int = 3) -> float:
    NO = len(_far_offsets()[0])
    m2l = 0.0
    for nc in stats:
        rows = NO * nc
        m2l += rows * m ** 6 * nf / _MAC_PER_MS
        m2l += rows * m ** 3 * 4 / _GATHER_BYTES_PER_MS
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
                 levels: int, nf: int = 3) -> float:
    """Estimated adaptive step cost in MILLISECONDS on a v5e, from the
    measured stage rates above -- honest enough that the engine policy
    only picks the adaptive solver where it actually beats the exact
    kernel (at N ~ 80k the exact kernel sits at the VPU ceiling and
    wins; clustered boxes at larger N flip it)."""
    return _cost_from_stats(level_stats(q, dense_levels, levels),
                            estimate_brick_pairs(q, npad, levels),
                            npad, m, dense_levels, levels, nf)


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
                       max_levels: int = 9) -> tuple[SparsePlan, float]:
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
            cost = _cost_from_stats(stats, bricks_at[L], npad, m, Ld, L)
            if best is None or cost < best[0]:
                best = (cost, Ld, L)
    cost, Ld, L = best
    return plan_adaptive(q, npad, m, Ld, L), cost
