"""Multi-level Chebyshev hierarchy (true bbFMM): O(N*m^3 + cells*m^6).

The single-level proxy (ops/proxy.py) needs the Chebyshev order m to grow
with the box-to-softening ratio; the octant mode buys one halving.  This
module makes the solver scale-free: an L-level uniform hierarchy of cells
(2^L per dimension at the finest level) where every stage stays dense and
matmul-shaped -- the tree code the reference left as a TODO ("Implementare
barners hut", ref: performance_report.txt:58), built the way the TPU wants:
no pointers, no traversal, just regular grids and batched contractions.

Pipeline per step (all under one jit):

  P2M   bodies -> finest-level cell expansions W_L (C^3, m^3).  A body's
        in-cell Chebyshev coordinate is cell-agnostic
        (t = 2*frac((q - lo)/cellsize) - 1), so the per-body basis outer
        product is dense work and only the cell-id segment-sum is sparse.
  M2M   child -> parent expansions, three per-dimension einsums with the
        scale-invariant (2, m, m) transfer matrices (parent Lagrange basis
        evaluated at child node positions).
  M2L   per level l: the node *force* field of every cell accumulates
        contributions from its offset neighborhood via rolled-grid batched
        matmuls -- for each offset o the transfer matrices T_o (m^3, m^3)
        are identical for every cell pair, so one (C^3, m^3) @ (m^3, m^3)
        matmul per force component handles the whole level.  (Force
        components directly, NOT potential + spectral differentiation: the
        far field dominates the node potential but not the force, so
        differentiating an fp32 potential amplifies roundoff by
        ~m^2 * |phi| / (h_l * |a|) -- measured as a ~1e-3 error floor that
        GROWS with m and depth.  The three force matrices share one rsqrt
        build.)  Level-l pair coverage follows the classic FMM identity
        pairs(l) = expand(near(l-1)) \\ near(l):
          * expand list  = all |o|_inf <= 3, where |o_d| = 3 carries a
            target-parity mask (o_d=+3 pairs have near parents iff the
            target index is even; -3 iff odd),
          * near list    = |o|_inf <= 1, subtracted at every level except
            the finest.
        Because the softened kernel is analytic everywhere (poles at
        imaginary distance eps), the finest level's near list -- *including
        the self cell* -- is handled by the same interpolation: there is no
        P2P stage at all.  Accuracy per level: same-cell pairs at the finest
        level need a = eps/h_L >~ 1; separated pairs (|o| >= 2) converge
        with rho >= 2 + sqrt(5) at ANY level, so coarse levels are never the
        binding constraint.
  L2L   parent -> child field interpolation (transpose of M2M).
  L2P   bodies gather their own cell's field and contract their basis.

Heavy bodies are excluded and corrected exactly, same policy as
ops/proxy.py.  The oracle comparison lives in tests/test_fmm.py.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from murb_tpu.ops.common import Accel, pick_block
from murb_tpu.ops.naive import acc_rect
from murb_tpu.ops.proxy import (
    DEFAULT_HEAVY_FACTOR,
    _basis,
    _cheb_nodes,
    bounding_box,
    heavy_source_acc,
    heavy_split,
    required_order,
)

# fp32 contractions for M2L/L2P: the node potential field mixes terms of
# oscillating sign (Chebyshev weights), so bf16-input passes are reserved
# for the anterpolation stages where the interpolation error dominates.
_PRECISION = jax.lax.Precision.HIGHEST


# --------------------------------------------------------- host operators
def _basis_np(t: np.ndarray, m: int) -> np.ndarray:
    """Lagrange-on-Chebyshev basis S (len(t), m) in float64 (host)."""
    t = np.clip(np.asarray(t, np.float64), -1.0, 1.0)
    theta_nodes = np.pi * (np.arange(m) + 0.5) / m
    j = np.arange(1, m)
    tj_nodes = np.cos(np.outer(j, theta_nodes))           # (m-1, m)
    tj_t = np.cos(np.outer(np.arccos(t), j))              # (T, m-1)
    return 1.0 / m + (2.0 / m) * tj_t @ tj_nodes          # (T, m)


@functools.lru_cache(maxsize=None)
def _m2m_matrix(m: int) -> np.ndarray:
    """M (2, m, m): M[s, v, u] = parent basis S_u at child node v of child
    side s (child cells occupy the parent's [-1,0] / [0,1] halves).  Purely
    geometric, hence identical at every level."""
    t = _cheb_nodes(m)
    out = []
    for s in (0, 1):
        tp = (2 * s - 1) * 0.5 + 0.5 * t                  # child nodes in parent coords
        out.append(_basis_np(tp, m))                      # (m nodes, m basis)
    return np.stack(out).astype(np.float32)               # (2, m, m)


@functools.lru_cache(maxsize=None)
def _offsets_paired(reach: int,
                    min_inf: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Canonical offset list for the shell min_inf <= |o|_inf <= reach, one
    entry per {+o, -o} pair -> (offsets (K, 3), neg_valid (K,)).

    The transfer matrices satisfy T_d(-o) = -T_d(o)^T, so each pair shares
    one build; ``neg_valid`` is 0 for the o = 0 entry (no mirror)."""
    r = np.arange(-reach, reach + 1)
    offs = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    canon, neg = [], []
    for o in offs:
        if np.abs(o).max() < min_inf:
            continue
        first = next((x for x in o if x != 0), 0)
        if first < 0:
            continue  # its mirror is canonical
        canon.append(o)
        neg.append(0.0 if first == 0 else 1.0)
    return (np.asarray(canon, np.int32), np.asarray(neg, np.float32))


# The three offset subsets of a level sweep.  ``expand`` is the full
# expand(near(l-1)) cube; ``near`` (|o|_inf <= 1) is what gets handled one
# level deeper (subtracted at every level but the finest); ``far`` is their
# difference -- expand = near + far pairwise-exactly, which licenses
# running the two shells at different matmul precision (the near terms
# carry the cancellation-critical bulk of the force, the far shell is
# smooth and small).
_SUBSETS = {"expand": (3, 0), "near": (1, 0), "far": (3, 2)}


# ------------------------------------------------------------------- P2M
def _cell_coords(q, lo, cs, C: int):
    """(cell index (int32), in-cell Chebyshev coordinate in [-1, 1])."""
    u = (q - lo) / cs
    cx = jnp.clip(jnp.floor(u), 0.0, C - 1.0)
    t = 2.0 * (u - cx) - 1.0
    return cx.astype(jnp.int32), t


def p2m_grid(qx, qy, qz, gm_eff, c, h, *, m: int, C: int,
             chunk: int = 2048):
    """W (C^3, m^3): per-cell source expansions at the finest level."""
    n = qx.shape[0]
    chunk = pick_block(n, min(chunk, n))
    assert n % chunk == 0, (n, chunk)
    lo = c - h
    cs = 2.0 * h / C

    nb = n // chunk
    resh = lambda a: a.reshape(nb, chunk)

    def one(args):
        bx, by, bz, bg = args
        cx, tx = _cell_coords(bx, lo[0], cs[0], C)
        cy, ty = _cell_coords(by, lo[1], cs[1], C)
        cz, tz = _cell_coords(bz, lo[2], cs[2], C)
        sx = _basis(tx, m)                                # (B, m)
        sy = _basis(ty, m)
        sz = _basis(tz, m)
        svw = jnp.einsum("bv,bw->bvw", sy, sz).reshape(chunk, m * m)
        outer = jnp.einsum(
            "bu,bp->bup", bg[:, None] * sx, svw
        ).reshape(chunk, m ** 3)
        cid = (cx * C + cy) * C + cz
        return jax.ops.segment_sum(outer, cid, num_segments=C ** 3)

    parts = jax.lax.map(one, (resh(qx), resh(qy), resh(qz), resh(gm_eff)))
    return jnp.sum(parts, axis=0)                          # (C^3, m^3)


# ------------------------------------------------------------- M2M / L2L
def m2m(w, *, m: int, C: int):
    """Child expansions (C^3, m^3) -> parent expansions ((C/2)^3, m^3)."""
    M = jnp.asarray(_m2m_matrix(m), w.dtype)              # (2, m, m)
    P = C // 2
    g = w.reshape(C, C, C, m, m, m)
    # x: (P, 2, C, C, m, m, m) -- contract (side s, child node u) -> parent e
    g = g.reshape(P, 2, C, C, m, m, m)
    g = jnp.einsum("xsyzuvw,sue->xyzevw", g, M, precision=_PRECISION)
    g = g.reshape(P, P, 2, C, m, m, m)
    g = jnp.einsum("xytzevw,tvf->xyzefw", g, M, precision=_PRECISION)
    g = g.reshape(P, P, P, 2, m, m, m)
    g = jnp.einsum("xyzrefw,rwg->xyzefg", g, M, precision=_PRECISION)
    return g.reshape(P ** 3, m ** 3)


def l2l(f, *, m: int, C: int):
    """Parent field (C^3, m^3) -> child field ((2C)^3, m^3) (M2M transpose)."""
    M = jnp.asarray(_m2m_matrix(m), f.dtype)              # (2, m, m)
    g = f.reshape(C, C, C, m, m, m)
    g = jnp.einsum("xyzefg,rwg->xyzefrw", g, M, precision=_PRECISION)
    g = jnp.einsum("xyzefrw,tvf->xyzetvrw", g, M, precision=_PRECISION)
    # emit directly in interleaved (x, s, y, t, z, r, u, v, w) order
    g = jnp.einsum("xyzetvrw,sue->xsytzruvw", g, M, precision=_PRECISION)
    return g.reshape((2 * C) ** 3, m ** 3)


# ------------------------------------------------------------------- M2L
def _parity_mask(o, even, C: int):
    """Target-parity validity of offset o (|o_d| = 3 needs near parents:
    +3 iff the target index is even, -3 iff odd)."""
    mk = lambda od: jnp.where(od == 3, even, jnp.where(od == -3, ~even, True))
    return (mk(o[0])[:, None, None]
            & mk(o[1])[None, :, None]
            & mk(o[2])[None, None, :]).reshape(C ** 3, 1)


def m2l_gather(w, *, m: int, C: int, subset: str = "expand"):
    """Stacked shifted (and parity-masked) expansions for every canonical
    offset pair of ``subset`` ("expand" | "near" | "far", see _SUBSETS):
    (wp (K, C^3, m^3), wn (K, C^3, m^3), offsets, neg_valid).

    The dense-form operands of the level sweep, shared by the jnp and the
    Pallas-fused M2L: wp[k] is the +o_k-shifted weight grid, wn[k] the
    -o_k-shifted grid pre-scaled by the mirror validity."""
    dtype = w.dtype
    m3 = m ** 3
    wg = w.reshape(C, C, C, m3)
    wpad = jnp.pad(wg, ((3, 3), (3, 3), (3, 3), (0, 0)))
    idx = jnp.arange(C)
    even = (idx % 2) == 0
    offsets, neg_valid = _offsets_paired(*_SUBSETS[subset])

    def shifted(o):
        ws = jax.lax.dynamic_slice(
            wpad, (3 + o[0], 3 + o[1], 3 + o[2], jnp.int32(0)),
            (C, C, C, m3)
        ).reshape(C ** 3, m3)
        if subset != "near":
            ws = jnp.where(_parity_mask(o, even, C), ws,
                           jnp.asarray(0.0, dtype))
        return ws

    def body(_, op):
        o, nv = op
        return None, (shifted(o), shifted(-o) * nv)

    _, (wp, wn) = jax.lax.scan(
        body, None, (jnp.asarray(offsets), jnp.asarray(neg_valid))
    )
    return wp, wn, offsets, neg_valid


def m2l_level(w, hl, soft, *, m: int, C: int, subset: str = "expand",
              with_phi: bool = False):
    """Node force fields (fx, fy, fz[, phi]), each (C^3, m^3), from the
    level's expansions.

    ``subset`` selects the offset list (_SUBSETS): "near" is the 27-offset
    list (no parity); "expand" the 343-offset expansion list with parity
    masks on |o_d| = 3; "far" their difference.  Out-of-grid offsets read
    zero-padded weights, so small grids truncate for free.  ``with_phi``
    adds the node potential as a fourth field (shares the same rsqrt
    build; used by tracking).
    """
    dtype = w.dtype
    m3 = m ** 3
    m2 = m * m
    t = jnp.asarray(_cheb_nodes(m), dtype)                # (m,)
    soft2 = jnp.asarray(soft, dtype) ** 2
    wg = w.reshape(C, C, C, m3)
    wpad = jnp.pad(wg, ((3, 3), (3, 3), (3, 3), (0, 0)))
    idx = jnp.arange(C)
    even = (idx % 2) == 0

    offsets, neg_valid = _offsets_paired(*_SUBSETS[subset])
    nf = 4 if with_phi else 3

    # Flat per-node coordinate vectors (m^3,) in x-major order; the
    # displacement matrices are then rank-2 vector broadcasts -- the same
    # (i, j) pattern as the rect kernels, which the VPU runs at full rate.
    # (Building (m^3, m^3) via repeat/tile of (m, m) matrices, or via a 6-D
    # broadcast, lowers to relayout copies: measured 2.3 ms/offset vs
    # ~0.02 ms for the broadcast form.)
    pxv = hl[0] * jnp.repeat(t, m2)
    pyv = hl[1] * jnp.tile(jnp.repeat(t, m), m)
    pzv = hl[2] * jnp.tile(t, m2)

    def shifted(o):
        ws = jax.lax.dynamic_slice(
            wpad, (3 + o[0], 3 + o[1], 3 + o[2], jnp.int32(0)),
            (C, C, C, m3)
        ).reshape(C ** 3, m3)
        if subset != "near":
            ws = jnp.where(_parity_mask(o, even, C), ws,
                           jnp.asarray(0.0, dtype))
        return ws

    def body(acc, op):
        o, nv = op

        # Delta[u, v] = p_v - p_u = 2 hl o + (pv[v] - pv[u]), per dimension
        def dmat(pv, d):
            return 2.0 * hl[d] * o[d].astype(dtype) + (pv[None, :]
                                                       - pv[:, None])

        Dx, Dy, Dz = dmat(pxv, 0), dmat(pyv, 1), dmat(pzv, 2)  # (m^3, m^3)
        inv = jax.lax.rsqrt(Dx * Dx + Dy * Dy + Dz * Dz + soft2)
        inv3 = inv * inv * inv
        Ts = [Dx * inv3, Dy * inv3, Dz * inv3]
        if with_phi:
            Ts.append(inv)

        # +o: f_c += ws(+o) @ T^T.  -o: T(-o) = -T^T (phi: +T^T), so
        # f_c -+= ws(-o) @ T -- same build, opposite matmul side.
        wp = shifted(o)
        wn = shifted(-o) * nv
        dot = lambda a, b, tr: jax.lax.dot_general(
            a, b, (((1,), (1 if tr else 0,)), ((), ())),
            precision=_PRECISION, preferred_element_type=dtype,
        )
        out = []
        for i, T in enumerate(Ts):
            sign = 1.0 if (with_phi and i == 3) else -1.0
            out.append(dot(wp, T, True) + sign * dot(wn, T, False))
        return tuple(a + b for a, b in zip(acc, out)), None

    f0 = tuple(jnp.zeros((C ** 3, m3), dtype) for _ in range(nf))
    fields, _ = jax.lax.scan(
        body, f0, (jnp.asarray(offsets), jnp.asarray(neg_valid))
    )
    return fields


# --------------------------------------------------------- downward pass
def fmm_field_grid(w_finest, h, soft, *, m: int, levels: int,
                   with_phi: bool = False, fused: bool = False,
                   m2l_dots: str = "fp32", m2l_tile: int = 0,
                   finest_subset: str = "expand"):
    """Finest-level node force fields (fx, fy, fz[, phi]) via the full
    hierarchy: coarser expansions by M2M, per-level expand-minus-near M2L,
    fields interpolated down with L2L.  ``fused`` routes eligible level
    sweeps through the Pallas kernel (ops/fmm_pallas.m2l_level_fused).

    ``finest_subset``: the finest level's offset list -- "expand" (the
    default: the near list, self cell included, is handled by the same
    interpolation, which requires eps/h_L >~ 1) or "far" (the finest
    27-neighborhood is excluded for an exact P2P stage, ops/p2p.py --
    accuracy then depends only on the |o| >= 2 separation ratio, never
    on the softening).

    ``m2l_dots`` sets the fused sweeps' matmul tier: "fp32" (6-pass
    emulation everywhere, the default), "bf16x3" (3-pass splits
    everywhere), or "mixed" -- the near shell (|o|_inf <= 1) at fp32 and
    the far shell at bf16x3, splitting the expand list via
    expand = near + far (pairwise exact).  Measured at N=200k random,
    m=10, L=2 (scripts/m2l_tier_probe.py): fp32 14.3 ms / 1.6e-5 max
    force err; mixed 14.5 ms / 2.0e-4; bf16x3 11.7 ms / 2.9e-4.  The far
    shell -- not the cancellation-heavy near one -- dominates the split
    error, so "mixed" buys little; fp32 stays the default and "bf16x3"
    is the tolerance-relaxed fast tier."""
    ws = {levels: w_finest}
    for l in range(levels - 1, 0, -1):
        ws[l] = m2m(ws[l + 1], m=m, C=2 ** (l + 1))

    def fused_sweep(w, hl, C, subset, tile):
        from murb_tpu.ops.fmm_pallas import m2l_level_fused

        if m2l_dots == "mixed" and subset == "expand":
            near = m2l_level_fused(w, hl, soft, m=m, C=C, subset="near",
                                   with_phi=with_phi, tile=tile,
                                   exact_dots=True)
            far = m2l_level_fused(w, hl, soft, m=m, C=C, subset="far",
                                  with_phi=with_phi, tile=tile,
                                  exact_dots=False)
            return tuple(a + b for a, b in zip(near, far))
        return m2l_level_fused(w, hl, soft, m=m, C=C, subset=subset,
                               with_phi=with_phi, tile=tile,
                               exact_dots=m2l_dots != "bf16x3")

    def level_sweep(w, hl, C, subset):
        if fused:
            from murb_tpu.ops.fmm_pallas import m2l_fused_tile

            tile = m2l_fused_tile(m, C, 4 if with_phi else 3)
            if tile and m2l_tile:
                # autotuned override within the eligibility envelope (the
                # VMEM estimate only shrinks with a smaller tile)
                tile = min(tile, m2l_tile)
            if tile:
                return fused_sweep(w, hl, C, subset, tile)
        return m2l_level(w, hl, soft, m=m, C=C, subset=subset,
                         with_phi=with_phi)

    l0 = min(2, levels)  # level 1's expand and near lists coincide (C=2)
    f = None
    for l in range(l0, levels + 1):
        C = 2 ** l
        hl = h / C
        if f is not None:
            f = tuple(l2l(fd, m=m, C=C // 2) for fd in f)
        if l == levels and finest_subset == "far":
            # P2P mode: the finest near list is exact, one "far" sweep
            # replaces the expand-minus-near pair (pairwise identical:
            # far = expand \ near by construction, _SUBSETS)
            contrib = level_sweep(ws[l], hl, C, subset="far")
        else:
            contrib = level_sweep(ws[l], hl, C, subset="expand")
        f = contrib if f is None else tuple(
            a + b for a, b in zip(f, contrib)
        )
        if l < levels:
            near = level_sweep(ws[l], hl, C, subset="near")
            f = tuple(a - b for a, b in zip(f, near))
    return f


# ------------------------------------------------------------------- L2P
def l2p_grid(qx, qy, qz, c, h, fields, *, m: int, C: int,
             chunk: int = 2048):
    """Interpolate per-cell node fields back to the bodies.

    ``fields``: tuple of (C^3, m^3) arrays -> tuple of (n,) body values.
    Each body gathers only its own cell's field (no cross-cell blending:
    cell membership is exact, matching P2M's segment assignment).
    """
    n = qx.shape[0]
    chunk = pick_block(n, min(chunk, n))
    lo = c - h
    cs = 2.0 * h / C
    nb = n // chunk
    resh = lambda a: a.reshape(nb, chunk)
    k = len(fields)

    def one(args):
        bx, by, bz = args
        cx, tx = _cell_coords(bx, lo[0], cs[0], C)
        cy, ty = _cell_coords(by, lo[1], cs[1], C)
        cz, tz = _cell_coords(bz, lo[2], cs[2], C)
        sx = _basis(tx, m)
        sy = _basis(ty, m)
        sz = _basis(tz, m)
        cid = (cx * C + cy) * C + cz
        outs = []
        for f in fields:
            fg = f[cid].reshape(chunk, m, m * m)          # own-cell gather
            t1 = jnp.einsum("bu,bup->bp", sx, fg,
                            precision=_PRECISION).reshape(chunk, m, m)
            t2 = jnp.einsum("bv,bvw->bw", sy, t1, precision=_PRECISION)
            outs.append(jnp.sum(sz * t2, axis=1))
        return tuple(outs)

    outs = jax.lax.map(one, (resh(qx), resh(qy), resh(qz)))
    assert len(outs) == k
    return tuple(o.reshape(n) for o in outs)


# ------------------------------------------------------------- top level
def required_levels(halfwidth: float, soft: float, *, a_target: float = 1.0,
                    max_levels: int = 4) -> int:
    """Hierarchy depth so the finest cells satisfy eps/h_L >= a_target."""
    if halfwidth <= soft * a_target:
        return 1
    return min(int(math.ceil(math.log2(halfwidth * a_target / soft))),
               max_levels)


def best_depth(n: int, halfwidth: float, soft: float,
               tol: float = 1e-4) -> tuple[int, int]:
    """(m, levels) minimizing a measurement-calibrated cost model over
    candidate depths -- the auto policy shared by the single-chip
    ProxyEngine and the distributed shard+fmm mode.

    Depth and order trade off: one level deeper halves the finest cells
    (eps/h doubles, so the required order drops) but 8x the cell count
    multiplies the M2L node work.  Flops alone overstate the win: each
    extra level adds two more level sweeps (each with a ~1 ms fixed cost:
    operand gather, accumulator init/writeback) plus M2M/L2L interpolation
    relayouts -- measured on-chip at the N=200k random box, (m=6, L=3)
    needs 2.7x fewer M2L MACs than (m=10, L=2) yet lands at the same
    14.3 ms step (scripts/m2l_tier_probe.py).  LEVEL_OVERHEAD charges
    those fixed costs in MAC-equivalents: 3.5e10 ~= 1.75 ms at the
    ~2e10-MACs/ms realized M2L rate, covering the extra level's two
    additional sweeps plus its M2M/L2L relayouts, calibrated so the
    measured-equal configs tie and deeper grids win only when the flop
    gap is decisive (genuinely wider boxes, where a shallow grid would
    need m >= 14 and its m^6 blows up).  Any L >= required_levels is
    valid (deeper finest cells only converge faster); the sweep is a
    handful of host-side float ops."""
    LEVEL_OVERHEAD = 3.5e10
    best = None
    lmin = required_levels(halfwidth, soft)
    for levels in range(lmin, max(lmin, 4) + 1):
        m = fmm_order(halfwidth, soft, levels, tol)
        est = (8 * n * m**3 + 686 * 8**levels * m**6
               + LEVEL_OVERHEAD * (levels - lmin))
        if best is None or est < best[0]:
            best = (est, m, levels)
    return best[1], best[2]


#: Measured error prefactor of the hierarchical solver, with 3x safety.
#: required_order's bound assumes err ~ rho^-m (prefactor 1).  Measured
#: on-chip (scripts/order_error_probe.py, order_calib_probe2/3.py), the
#: hierarchy's actual prefactor is ~0.1 at N=200k and ~0.3 worst-case at
#: N=8k, uniform AND concentrated two-cluster wide boxes alike -- the
#: expand/near telescoping evaluates every pair at the finest level where
#: the analyticity ratio is restored, and the 343-offset accumulation
#: averages interpolation error.  0.3 keeps the worst measured case
#: exactly on its bound: at the N=200k random box (half/soft=3.3, L=2)
#: the bound alone demands m=10 (11.4 ms/step) while m=8 (5.5 ms) already
#: sits at the fp32 error floor (2.2e-5 vs m=10's 1.7e-5); at N=8192 the
#: same m=8 measures 8.2e-5 = the calibrated prediction for tol=1e-4.
FMM_ERR_PREFACTOR = 0.3


def fmm_order(halfwidth: float, soft: float, levels: int,
              tol: float = 1e-4) -> int:
    """Chebyshev order for the hierarchical solver: the binding constraint
    is the same-cell interpolation at the finest level (separated pairs at
    any level converge with rho >= 2 + sqrt(5), always faster).

    Calibrated (see FMM_ERR_PREFACTOR): m solves
    FMM_ERR_PREFACTOR * rho^-m <= tol, i.e. the theoretical bound with the
    measured prefactor instead of 1; margin=0 (vs the single-level default
    of 2) because m^6 terms dominate the M2L cost and box growth is caught
    by proxy_health / the adaptive rebuild rather than a permanently
    padded order."""
    return required_order(halfwidth / 2 ** levels, soft,
                          tol / FMM_ERR_PREFACTOR, margin=0)


def _fmm_solve(qx, qy, qz, gm, soft, *, m, levels, heavy_k,
               heavy_factor, m2l_dots, with_phi, block=0, m2l_tile=0,
               near: str = "interp", p2p_pmax: int = 0,
               p2p_chunk: int = 0):
    """Shared hierarchy pass behind acc_fmm / force_and_potential_fmm:
    bounding box, heavy split, anterpolation, level sweeps, and the exact
    heavy-body corrections -> (acc (n, 3), phi (n,) or None).

    ``near="p2p"`` excludes the finest 27-neighborhood from the field
    sweep and evaluates it exactly (ops/p2p.p2p_sweep, capacity
    ``p2p_pmax``) -- accuracy then depends only on cell separation, so
    depth follows occupancy instead of eps/h (clustered merger boxes)."""
    dtype = qx.dtype
    n = qx.shape[0]
    gm_pos = gm > 0
    C = 2 ** levels

    c, h = bounding_box(qx, qy, qz, gm_pos)
    if near == "p2p":
        # Isotropic (cubic) cells: p2p-mode far-field accuracy rests
        # ONLY on the |o| >= 2 separation ratio, and that ratio is
        # per-dimension -- anisotropic cells put an |o|=2 neighbor in a
        # thin dimension INSIDE the Bernstein ellipse of a wide one and
        # the M2L diverges (measured 2e-2 on a two-cluster slab box
        # that converges at 1e-5 with cubic cells).  Interp mode keeps
        # the anisotropic box: its binding constraint is eps/h per
        # dimension, which anisotropy helps.
        h = jnp.full_like(h, jnp.max(h))
    k = max(min(heavy_k, n), 1)
    mean_gm = jnp.sum(gm) / jnp.maximum(jnp.sum(gm_pos.astype(dtype)), 1.0)
    hq, heavy_gm, is_heavy, top_idx, gm_eff = heavy_split(
        qx, qy, qz, gm, k, heavy_factor, mean_gm
    )

    from murb_tpu.ops.fmm_pallas import fmm_fused_block

    # fused extended-basis anterpolation: one streaming pass, bases and
    # one-hot masks rebuilt in VMEM (ops/fmm_pallas.py).  P2M (nf=1)
    # keeps the force-only gate; the with_phi L2P holds a 4/3-wider field
    # matrix resident, so it gets the nf-aware cap and may fall back to
    # jnp independently.
    blk = fmm_fused_block(n, m, C)
    if blk and block:
        blk = pick_block(n, min(block, blk * 4))
    block_l2p = fmm_fused_block(n, m, C, nf=4) if with_phi else blk
    if block_l2p and block:
        block_l2p = pick_block(n, min(block, block_l2p * 4))
    block = blk
    if block or block_l2p:
        from murb_tpu.ops.common import notify_fp32_compute

        notify_fp32_compute("tpu+proxy/fmm (fused anterpolation)", dtype)
    if block:
        from murb_tpu.ops.fmm_pallas import p2m_grid_fused

        w = p2m_grid_fused(qx, qy, qz, gm_eff, c, h, m=m, C=C, block=block)
    else:
        w = p2m_grid(qx, qy, qz, gm_eff, c, h, m=m, C=C)
    fields = fmm_field_grid(w, h, soft, m=m, levels=levels,
                            with_phi=with_phi, fused=True,
                            m2l_dots=m2l_dots, m2l_tile=m2l_tile,
                            finest_subset="far" if near == "p2p"
                            else "expand")
    if block_l2p:
        from murb_tpu.ops.fmm_pallas import l2p_grid_fused

        out = l2p_grid_fused(qx, qy, qz, c, h, fields, m=m, C=C,
                             block=block_l2p)
    else:
        out = l2p_grid(qx, qy, qz, c, h, fields, m=m, C=C)
    acc = jnp.stack(out[:3], axis=1)
    phi_near = None

    if near == "p2p":
        from murb_tpu.ops.p2p import DEFAULT_CHUNK, p2p_sweep

        if p2p_pmax <= 0:
            raise ValueError("near='p2p' requires a sized p2p_pmax "
                             "(ops/p2p.size_pmax from the distribution)")
        acc_near, phi_near, _n_pairs = p2p_sweep(
            qx, qy, qz, gm_eff, c, h, soft, C=C, pmax=p2p_pmax,
            chunk=p2p_chunk or DEFAULT_CHUNK, with_phi=with_phi,
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

        phi = out[3] + heavy_source_phi(qx, qy, qz, hq, heavy_gm, soft)
        if phi_near is not None:
            phi = phi + phi_near
        phi_h = heavy_target_phi(qx, qy, qz, gm, hq, soft)
        phi = phi.at[top_idx].set(jnp.where(is_heavy, phi_h, phi[top_idx]))
    return acc, phi


@functools.partial(
    jax.jit,
    static_argnames=("soft", "m", "levels", "heavy_k", "heavy_factor",
                     "m2l_dots", "block", "m2l_tile", "near", "p2p_pmax",
                     "p2p_chunk"),
)
def acc_fmm(qx, qy, qz, gm, soft, *, m: int = 12, levels: int = 2,
            heavy_k: int = 1, heavy_factor: float = DEFAULT_HEAVY_FACTOR,
            m2l_dots: str = "fp32", block: int = 0,
            m2l_tile: int = 0, near: str = "interp", p2p_pmax: int = 0,
            p2p_chunk: int = 0) -> Accel:
    """All-pairs softened-gravity accelerations via the L-level hierarchy.

    Same outer contract as ops/proxy.acc_proxy: heavy bodies are excluded
    from the far field and corrected exactly (as sources via an N x k sweep,
    as targets via a k x N sweep).  ``m2l_dots`` picks the level sweeps'
    matmul tier (see fmm_field_grid: "fp32" default, "bf16x3" fast tier,
    "mixed" = fp32 near shell + bf16x3 far shell).  ``near="p2p"`` runs
    the adaptive exact near-field (ops/p2p.py, capacity ``p2p_pmax``)."""
    acc, _ = _fmm_solve(qx, qy, qz, gm, soft, m=m, levels=levels,
                        heavy_k=heavy_k, heavy_factor=heavy_factor,
                        m2l_dots=m2l_dots, with_phi=False, block=block,
                        m2l_tile=m2l_tile, near=near, p2p_pmax=p2p_pmax,
                        p2p_chunk=p2p_chunk)
    return Accel(ax=acc[:, 0], ay=acc[:, 1], az=acc[:, 2])


@functools.partial(
    jax.jit,
    static_argnames=("soft", "m", "levels", "heavy_k", "heavy_factor",
                     "m2l_dots", "block", "m2l_tile", "near", "p2p_pmax",
                     "p2p_chunk"),
)
def force_and_potential_fmm(qx, qy, qz, gm, soft, *, m: int = 12,
                            levels: int = 2, heavy_k: int = 1,
                            heavy_factor: float = DEFAULT_HEAVY_FACTOR,
                            m2l_dots: str = "fp32", block: int = 0,
                            m2l_tile: int = 0, near: str = "interp",
                            p2p_pmax: int = 0, p2p_chunk: int = 0):
    """(Accel, phi): forces and potential in ONE hierarchy pass -- the
    multi-level counterpart of ops/proxy.force_and_potential_proxy, for
    tracking engines on boxes too wide for a single expansion.

    phi_i = sum_j Gm_j * rsqrt(|r_ij|^2 + eps^2) including the
    (interpolated) j == i self term, exactly like the single-cell proxy
    and the reference's tile sweep (callers compensate with Gm_i/eps,
    ref: SimulationNBodyCUDAPropertyTracking.cu:296-302).  The potential
    rides the level sweeps as a fourth node field sharing every rsqrt
    build (m2l_level's with_phi), and P2M/bounding box/heavy split are
    shared with the force field."""
    acc, phi = _fmm_solve(qx, qy, qz, gm, soft, m=m, levels=levels,
                          heavy_k=heavy_k, heavy_factor=heavy_factor,
                          m2l_dots=m2l_dots, with_phi=True, block=block,
                          m2l_tile=m2l_tile, near=near, p2p_pmax=p2p_pmax,
                          p2p_chunk=p2p_chunk)
    return Accel(ax=acc[:, 0], ay=acc[:, 1], az=acc[:, 2]), phi


# --------------------------------------------- per-galaxy potential pass
def m2l_phi_multi(wst, hl, soft, *, m: int, C: int,
                  subset: str = "expand"):
    """(G, C^3, m^3) node POTENTIAL fields from G channel expansions in
    ONE offset scan: the (m^3, m^3) rsqrt/transfer build of each offset
    is shared by every channel (it does not depend on the weights), and
    each application is a single (G*C^3, m^3)-row matmul -- the far
    field is linear in the source masses, so per-galaxy potentials are
    extra WEIGHT CHANNELS through the same operators, never extra
    sweeps.  Potential only (T_phi = inv, mirror sign +): the force
    fields come from the ordinary full-weight sweep."""
    dtype = wst.dtype
    ngal = wst.shape[0]
    m3 = m ** 3
    m2 = m * m
    t = jnp.asarray(_cheb_nodes(m), dtype)
    soft2 = jnp.asarray(soft, dtype) ** 2
    wg = wst.reshape(ngal, C, C, C, m3)
    wpad = jnp.pad(wg, ((0, 0), (3, 3), (3, 3), (3, 3), (0, 0)))
    idx = jnp.arange(C)
    even = (idx % 2) == 0
    offsets, neg_valid = _offsets_paired(*_SUBSETS[subset])

    pxv = hl[0] * jnp.repeat(t, m2)
    pyv = hl[1] * jnp.tile(jnp.repeat(t, m), m)
    pzv = hl[2] * jnp.tile(t, m2)

    def shifted(o):
        ws = jax.lax.dynamic_slice(
            wpad, (jnp.int32(0), 3 + o[0], 3 + o[1], 3 + o[2],
                   jnp.int32(0)),
            (ngal, C, C, C, m3)
        ).reshape(ngal, C ** 3, m3)
        if subset != "near":
            ws = jnp.where(_parity_mask(o, even, C)[None], ws,
                           jnp.asarray(0.0, dtype))
        return ws

    def body(acc, op):
        o, nv = op

        def dmat(pv, d):
            return 2.0 * hl[d] * o[d].astype(dtype) + (pv[None, :]
                                                       - pv[:, None])

        Dx, Dy, Dz = dmat(pxv, 0), dmat(pyv, 1), dmat(pzv, 2)
        T = jax.lax.rsqrt(Dx * Dx + Dy * Dy + Dz * Dz + soft2)
        wp = shifted(o)
        wn = shifted(-o) * nv
        dot = lambda a, tr: jax.lax.dot_general(
            a, T, (((2,), (1 if tr else 0,)), ((), ())),
            precision=_PRECISION, preferred_element_type=dtype,
        )
        # T_phi(-o) = +T_phi(o)^T: the mirror rides the same build
        return acc + dot(wp, True) + dot(wn, False), None

    f0 = jnp.zeros((ngal, C ** 3, m3), dtype)
    f, _ = jax.lax.scan(
        body, f0, (jnp.asarray(offsets), jnp.asarray(neg_valid)))
    return f


def phi_grid_pergal(w_stack, h, soft, *, m: int, levels: int):
    """Finest-level node potential fields (G, C^3, m^3) of G weight
    channels via the full hierarchy -- the potential-only, multi-channel
    twin of fmm_field_grid (expand finest subset: the finest
    27-neighborhood is interpolated, the interp-mode contract)."""
    ws = {levels: w_stack}
    for l in range(levels - 1, 0, -1):
        ws[l] = jax.vmap(functools.partial(m2m, m=m,
                                           C=2 ** (l + 1)))(ws[l + 1])

    l0 = min(2, levels)
    f = None
    for l in range(l0, levels + 1):
        C = 2 ** l
        hl = h / C
        if f is not None:
            f = jax.vmap(functools.partial(l2l, m=m, C=C // 2))(f)
        contrib = m2l_phi_multi(ws[l], hl, soft, m=m, C=C,
                                subset="expand")
        f = contrib if f is None else f + contrib
        if l < levels:
            f = f - m2l_phi_multi(ws[l], hl, soft, m=m, C=C,
                                  subset="near")
    return f


@functools.partial(
    jax.jit,
    static_argnames=("soft", "m", "levels", "heavy_k", "heavy_factor",
                     "m2l_dots", "block", "m2l_tile"),
)
def force_and_potential_fmm_pergal(qx, qy, qz, gm, masks, soft, *,
                                   m: int = 12, levels: int = 2,
                                   heavy_k: int = 1,
                                   heavy_factor: float =
                                   DEFAULT_HEAVY_FACTOR,
                                   m2l_dots: str = "fp32",
                                   block: int = 0, m2l_tile: int = 0):
    """(Accel, phi (G, n)): forces plus PER-GALAXY potentials in one
    hierarchy pass -- the L-level counterpart of
    ops/proxy.force_and_potential_proxy_pergal (round-4 verdict item 5:
    tracked multi-galaxy on boxes too wide for the single-cell proxy).

    ``masks`` (G, n): 0/1 galaxy membership rows.  Forces run the
    ordinary fused hierarchy on the full weights; each galaxy's
    potential is a masked weight CHANNEL through P2M -> M2M -> the
    shared-build potential sweeps (m2l_phi_multi) -> L2L -> one fused
    multi-field L2P.  Heavy bodies are corrected per galaxy with shared
    distance builds (the proxy pergal's rows pattern).  Self term
    included per row (ref: SimulationNBodyCUDAPropertyTracking.cu:
    296-302)."""
    from murb_tpu.ops.proxy import (
        heavy_source_phi_rows,
        heavy_target_phi_rows,
    )

    dtype = qx.dtype
    n = qx.shape[0]
    ngal = masks.shape[0]
    gm_pos = gm > 0
    C = 2 ** levels

    c, h = bounding_box(qx, qy, qz, gm_pos)
    k = max(min(heavy_k, n), 1)
    mean_gm = jnp.sum(gm) / jnp.maximum(jnp.sum(gm_pos.astype(dtype)), 1.0)
    hq, heavy_gm, is_heavy, top_idx, gm_eff = heavy_split(
        qx, qy, qz, gm, k, heavy_factor, mean_gm
    )

    from murb_tpu.ops.fmm_pallas import fmm_fused_block

    blk = fmm_fused_block(n, m, C)
    if blk and block:
        blk = pick_block(n, min(block, blk * 4))
    block_l2p = fmm_fused_block(n, m, C, nf=3 + ngal)
    if block_l2p and block:
        block_l2p = pick_block(n, min(block, block_l2p * 4))
    if blk or block_l2p:
        from murb_tpu.ops.common import notify_fp32_compute

        notify_fp32_compute("tpu+tracking+multi (fused anterpolation)",
                            dtype)
    if blk:
        from murb_tpu.ops.fmm_pallas import p2m_grid_fused

        p2m_one = lambda g_: p2m_grid_fused(qx, qy, qz, g_, c, h, m=m,
                                            C=C, block=blk)
    else:
        p2m_one = lambda g_: p2m_grid(qx, qy, qz, g_, c, h, m=m, C=C)
    w = p2m_one(gm_eff)
    wg = jnp.stack([p2m_one(gm_eff * masks[g]) for g in range(ngal)])

    fields = fmm_field_grid(w, h, soft, m=m, levels=levels,
                            with_phi=False, fused=True,
                            m2l_dots=m2l_dots, m2l_tile=m2l_tile)
    phi_fields = phi_grid_pergal(wg, h, soft, m=m, levels=levels)
    all_fields = tuple(fields) + tuple(phi_fields[g] for g in range(ngal))
    if block_l2p:
        from murb_tpu.ops.fmm_pallas import l2p_grid_fused

        out = l2p_grid_fused(qx, qy, qz, c, h, all_fields, m=m, C=C,
                             block=block_l2p)
    else:
        out = l2p_grid(qx, qy, qz, c, h, all_fields, m=m, C=C)
    acc = jnp.stack(out[:3], axis=1)
    phi_gal = jnp.stack(out[3:])

    # heavy sources exactly, per galaxy (shared distance builds)
    acc = acc + heavy_source_acc(qx, qy, qz, hq, heavy_gm, soft)
    hrows = masks[:, top_idx] * heavy_gm[None, :]              # (G, k)
    phi_gal = phi_gal + heavy_source_phi_rows(qx, qy, qz, hq, hrows, soft)

    # heavy targets exactly
    ht = acc_rect(hq[0], hq[1], hq[2], qx, qy, qz, gm, soft)
    ht_acc = jnp.stack([ht.ax, ht.ay, ht.az], 1)
    acc = acc.at[top_idx].set(
        jnp.where(is_heavy[:, None], ht_acc, acc[top_idx])
    )
    phi_h = heavy_target_phi_rows(qx, qy, qz, masks * gm[None, :], hq,
                                  soft)
    phi_gal = phi_gal.at[:, top_idx].set(
        jnp.where(is_heavy[None, :], phi_h, phi_gal[:, top_idx])
    )
    return Accel(ax=acc[:, 0], ay=acc[:, 1], az=acc[:, 2]), phi_gal
