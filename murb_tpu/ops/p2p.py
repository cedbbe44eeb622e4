"""Adaptive near-field (P2P) stage: exact 27-neighborhood interactions.

The hierarchy in ops/fmm.py has no P2P stage by design: the softened
kernel is analytic everywhere, so the finest level's near list -- self
cell included -- is handled by interpolation, PROVIDED the finest cells
satisfy eps/h_L >~ 1.  That couples the depth to the softening: a
clustered kpc-scale merger box (half ~130 kpc, soft 0.2 kpc) would need
~10 levels -- 8^10 dense cells -- and the cost model rightly rejects
every config, falling back to the exact O(N^2) kernel (the round-3
ROADMAP "remaining algorithmic frontier").

This module is the classic FMM fix: handle the finest level's 27-cell
neighborhood EXACTLY (P2P) and let the far shells (|o|_inf >= 2)
converge at rho >= 2 + sqrt(5) independent of the softening.  Depth then
follows occupancy, not eps/h, and the solver covers arbitrarily
concentrated distributions at any softening.

TPU-native formulation -- no trees, no ragged buckets:

  sort    bodies get a Morton key from their finest-level cell coords
          and are argsorted (in-jit, every step: cell membership must
          track the moving bodies).  Ghost/heavy-zeroed rows sort last
          under a sentinel key.
  brick   the sorted array is cut into fixed bricks of K consecutive
          bodies -- NO per-cell padding, so power-law cores (thousands
          of bodies per cell) cost exactly their body count.  A brick
          spans a contiguous Morton range; its cell-coordinate bounding
          box is a segment min/max.
  pairs   brick pair (t, s) is swept iff their cell bboxes are within
          Chebyshev distance 1 -- a conservative superset of the brick
          pairs containing near body pairs.  The boolean (B, B) matrix
          is flattened to a statically-padded index list
          (jnp.nonzero(size=pmax)); the ACTUAL near/far split is decided
          per body pair inside the kernel by an exact cell-offset mask,
          so conservative inclusion costs time, never correctness.
  sweep   a lax.scan over pair chunks runs (chunk, K, K) rect kernels --
          the acc_rect broadcast pattern the VPU runs at full rate --
          masked by |cell offset|_inf <= 1, and scatter-adds per-target-
          brick partial sums.  The self pair (i == j, same brick) lands
          at distance 0: zero force (softening keeps it finite) and the
          standard Gm_i/eps self-potential, exactly the tile-sweep
          convention (ref: SimulationNBodyCUDAPropertyTracking.cu:
          296-302).

Pair-capacity contract: ``pmax`` is static (sized from the ctor-time
distribution by ``estimate_brick_pairs`` with margin); the sweep also
returns the true pair count so engines can health-check and rebuild when
the distribution outgrows it -- same adapt contract as proxy_health.

The reference has no counterpart (its Barnes-Hut file is a verbatim copy
of the naive engine, ref: src/murb/implem/SimulationNBodyCPUBarnersHut.cpp);
this stage is what makes the TPU framework's fast solver cover the
reference's production merger workload (initMilkyWayAndromeda,
ref: src/common/core/Bodies.cpp:82-153) at fast-solver rates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from murb_tpu.ops.common import Accel

#: default brick size: one VPU lane row; K divides every padded N
#: (state pads to multiples of 256).
DEFAULT_K = 128

#: default pair-chunk of the sweep scan: (chunk, K, K) f32 intermediates
#: at 128x128x128 are ~8 MB -- comfortably inside VMEM-friendly fusion.
DEFAULT_CHUNK = 128

#: sentinel cell coordinate for inactive rows (ghost padding, heavy-zeroed
#: sources): far outside any real cell, so the in-kernel near mask can
#: never pair them, and pure-sentinel bricks are only adjacent to each
#: other (a handful of wasted pairs, counted like any other).
_SENTINEL_SHIFT = 9


def _interleave3(v, bits: int):
    """Spread the low ``bits`` bits of v (int32) 3 apart: b -> 3b."""
    out = jnp.zeros_like(v)
    for b in range(bits):
        out = out | (((v >> b) & 1) << (3 * b))
    return out


def morton_key(cx, cy, cz, C: int):
    """Morton (Z-order) key of integer cell coords on a C^3 grid.

    Z-order keeps consecutive sorted bodies spatially local, which keeps
    brick bounding boxes tight -- the whole pair-list economy rides on
    that.  C <= 1024 fits int32."""
    bits = max(int(C - 1).bit_length(), 1)
    return (
        (_interleave3(cx, bits) << 2)
        | (_interleave3(cy, bits) << 1)
        | _interleave3(cz, bits)
    )


def _cell_ixyz(qx, qy, qz, c, h, C: int):
    """Integer finest-level cell coords, EXACTLY the P2M assignment
    (ops/fmm._cell_coords): the near/far pair split is only consistent if
    P2P and the field grid agree on every body's cell."""
    from murb_tpu.ops.fmm import _cell_coords

    lo = c - h
    cs = 2.0 * h / C
    cx, _ = _cell_coords(qx, lo[0], cs[0], C)
    cy, _ = _cell_coords(qy, lo[1], cs[1], C)
    cz, _ = _cell_coords(qz, lo[2], cs[2], C)
    return cx, cy, cz


def _brick_boxes(ci_s, K: int):
    """Per-brick cell-coordinate bounding boxes from SORTED per-body cell
    coords: ((B, 3) lo, (B, 3) hi), f32."""
    B = ci_s[0].shape[0] // K
    lo = jnp.stack([c.reshape(B, K).min(1) for c in ci_s], 1)
    hi = jnp.stack([c.reshape(B, K).max(1) for c in ci_s], 1)
    return lo, hi


def _adjacency(lo, hi):
    """(B, B) bool: brick cell-bboxes within Chebyshev distance 1."""
    # boxes [lo_t, hi_t], [lo_s, hi_s] are within distance 1 per dim iff
    # lo_s <= hi_t + 1 and lo_t <= hi_s + 1.  Built per dimension with
    # rank-2 broadcasts: a (B, B, 3) intermediate pads its minor dim to
    # TPU tiles (the CLAUDE.md relayout hazard).
    out = None
    for d in range(3):
        ab = ((lo[None, :, d] <= hi[:, d][:, None] + 1)
              & (lo[:, d][:, None] <= hi[None, :, d] + 1))
        out = ab if out is None else out & ab
    return out


def p2p_sweep(qx, qy, qz, gm_src, c, h, soft, *, C: int, pmax: int,
              K: int = DEFAULT_K, chunk: int = DEFAULT_CHUNK,
              with_phi: bool = False):
    """Exact near-field (27-neighborhood) accelerations on the C^3 grid.

    ``gm_src``: source G*m with inactive rows (ghosts, heavy-split) zeroed
    -- the same gm_eff contract as the far field; inactive rows also drop
    out as TARGETS (heavy targets are overwritten exactly by the caller,
    ghost targets are meaningless).  Returns
    ``(acc (n, 3), phi (n,) | None, n_pairs ())`` in ORIGINAL body order;
    ``n_pairs`` is the true brick-pair count -- if it exceeds ``pmax`` the
    excess pairs were DROPPED and the caller must rebuild (engines expose
    this through proxy_health).
    """
    dtype = qx.dtype
    n = qx.shape[0]

    cx, cy, cz = _cell_ixyz(qx, qy, qz, c, h, C)
    active = gm_src > 0
    key = morton_key(cx, cy, cz, C)
    key = jnp.where(active, key, jnp.int32(np.iinfo(np.int32).max))
    perm = jnp.argsort(key)

    sent = jnp.int32(2 * C + _SENTINEL_SHIFT)
    ci = tuple(
        jnp.where(active, v, sent)[perm].astype(dtype)
        for v in (cx, cy, cz)
    )
    xs, ys, zs, gs = (v[perm] for v in (qx, qy, qz, gm_src))

    acc, n_pairs = p2p_sweep_sorted(xs, ys, zs, gs, ci, soft, pmax=pmax,
                                    K=K, chunk=chunk, with_phi=with_phi)

    unsort = lambda a: jnp.zeros(n, dtype).at[perm].set(a.reshape(n))
    out = jnp.stack([unsort(acc[0]), unsort(acc[1]), unsort(acc[2])], 1)
    phi = unsort(acc[3]) if with_phi else None
    return out, phi, n_pairs


def p2p_sweep_sorted(xs, ys, zs, gs, ci, soft, *, pmax: int,
                     K: int = DEFAULT_K, chunk: int = DEFAULT_CHUNK,
                     with_phi: bool = False):
    """Sweep core on MORTON-SORTED bodies (the shared sort of
    solve_adaptive): ``ci`` = per-body cell coords (dtype floats,
    sentinel rows for inactive).  Returns (nf-tuple of (B, K) partials
    in SORTED order, n_pairs)."""
    dtype = xs.dtype
    n = xs.shape[0]
    assert n % K == 0, (n, K)
    B = n // K
    assert pmax % chunk == 0, (pmax, chunk)
    soft2 = jnp.asarray(soft, dtype) ** 2

    lo, hi = _brick_boxes(ci, K)
    adj = _adjacency(lo, hi)
    n_pairs = jnp.sum(adj.astype(jnp.int32))
    (flat_idx,) = jnp.nonzero(adj.reshape(-1), size=pmax, fill_value=0)
    pvalid = jnp.arange(pmax) < n_pairs
    tb = (flat_idx // B).astype(jnp.int32)
    sb = (flat_idx % B).astype(jnp.int32)

    resh = lambda a: a.reshape(B, K)
    xr, yr, zr, gr = resh(xs), resh(ys), resh(zs), resh(gs)
    cxr, cyr, czr = (resh(v) for v in ci)

    nc = pmax // chunk
    tb_c = tb.reshape(nc, chunk)
    sb_c = sb.reshape(nc, chunk)
    pv_c = pvalid.reshape(nc, chunk)

    nf = 4 if with_phi else 3
    acc0 = tuple(jnp.zeros((B, K), dtype) for _ in range(nf))

    def body(acc, args):
        tbi, sbi, pvi = args
        # targets along axis 1, sources along axis 2 -- the acc_rect
        # broadcast pattern, batched over the pair chunk
        xt, yt, zt = xr[tbi], yr[tbi], zr[tbi]               # (c, K)
        cxt, cyt, czt = cxr[tbi], cyr[tbi], czr[tbi]
        xso, yso, zso, gso = xr[sbi], yr[sbi], zr[sbi], gr[sbi]
        cxs, cys, czs = cxr[sbi], cyr[sbi], czr[sbi]

        dx = xso[:, None, :] - xt[:, :, None]                # (c, K, K)
        dy = yso[:, None, :] - yt[:, :, None]
        dz = zso[:, None, :] - zt[:, :, None]
        near = (
            (jnp.abs(cxs[:, None, :] - cxt[:, :, None]) <= 1.0)
            & (jnp.abs(cys[:, None, :] - cyt[:, :, None]) <= 1.0)
            & (jnp.abs(czs[:, None, :] - czt[:, :, None]) <= 1.0)
        )
        inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + soft2)
        gmask = jnp.where(near & pvi[:, None, None],
                          gso[:, None, :], jnp.asarray(0.0, dtype))
        w = gmask * (inv * inv * inv)
        parts = [jnp.sum(w * dx, 2), jnp.sum(w * dy, 2),
                 jnp.sum(w * dz, 2)]
        if with_phi:
            parts.append(jnp.sum(gmask * inv, 2))
        # scatter-add per target brick (duplicate tbi rows accumulate)
        return tuple(a.at[tbi].add(p) for a, p in zip(acc, parts)), None

    acc, _ = jax.lax.scan(body, acc0, (tb_c, sb_c, pv_c))
    return acc, n_pairs


# ------------------------------------------------------ host-side sizing
def _morton_np(cx, cy, cz, C: int) -> np.ndarray:
    bits = max(int(C - 1).bit_length(), 1)
    out = np.zeros_like(cx, dtype=np.int64)
    for b in range(bits):
        out |= ((cx >> b) & 1).astype(np.int64) << (3 * b + 2)
        out |= ((cy >> b) & 1).astype(np.int64) << (3 * b + 1)
        out |= ((cz >> b) & 1).astype(np.int64) << (3 * b)
    return out


def estimate_brick_pairs(q: np.ndarray, npad: int, levels: int,
                         K: int = DEFAULT_K) -> int:
    """Host-numpy replica of the device pair count: the brick-pair count
    the CURRENT distribution produces at depth ``levels``.

    ``q``: (n_active, 3) positions of the active (massive) bodies.  Used
    twice: at engine build to size pmax (with margin), and by
    proxy_health to detect that the evolving distribution is about to
    outgrow the compiled capacity.  Inactive rows (npad - n_active of
    them) are modeled exactly like the device sentinel: one trailing
    mixed brick plus pure-sentinel bricks."""
    C = 2 ** levels
    # float32 arithmetic mirroring the device path bit-for-bit (bounding
    # box + isotropic max + cell mapping, ops/fmm._fmm_solve / ops/fmm.
    # _cell_coords): a boundary body landing in a different cell would
    # reorder the sort and shift the count
    q = np.asarray(q, np.float32)
    lo = q.min(0)
    hi = q.max(0)
    ctr = (np.float32(0.5) * (lo + hi)).astype(np.float32)
    h = np.maximum(np.float32(0.5) * (hi - lo), np.float32(1.0))
    h = np.full(3, h.max(), np.float32)
    cs = (np.float32(2.0) * h / np.float32(C)).astype(np.float32)
    u = (q - (ctr - h)) / cs
    ci = np.clip(np.floor(u), 0, C - 1).astype(np.int64)
    order = np.argsort(_morton_np(ci[:, 0], ci[:, 1], ci[:, 2], C),
                       kind="stable")
    ci = ci[order]
    sent = 2 * C + _SENTINEL_SHIFT
    pad = np.full((npad - len(q), 3), sent, dtype=np.int64)
    ci = np.concatenate([ci, pad], 0)
    B = npad // K
    cb = ci.reshape(B, K, 3)
    blo, bhi = cb.min(1), cb.max(1)
    a = blo[None, :, :] <= bhi[:, None, :] + 1
    b = blo[:, None, :] <= bhi[None, :, :] + 1
    return int(np.sum(np.all(a & b, axis=-1)))


def size_pmax(n_pairs: int, margin: float = 2.0,
              chunk: int = DEFAULT_CHUNK) -> int:
    """Static pair capacity from an estimated count: margined for the
    distribution evolving (cores compactify, bricks re-cut every step),
    rounded up to the sweep's chunk size."""
    want = max(int(n_pairs * margin), chunk)
    return (want + chunk - 1) // chunk * chunk


def p2p_cost_model(n_pairs: int, n: int, m: int, levels: int,
                   K: int = DEFAULT_K) -> float:
    """MAC-equivalent cost of a p2p-mode hierarchy step, in the same
    currency as ops/fmm.best_depth (so the two policies are comparable):
    far field (686 * cells * m^6 M2L MACs + 8 n m^3 anterpolation) plus
    the P2P sweep.  The sweep is VPU work -- ~26 slots per body pair
    (rect kernel + the 3-axis cell mask) at ~3.9e12 slots/s vs the
    ~2e10 MACs/ms realized M2L rate, i.e. ~5 MAC-equivalents per slot."""
    far = 8 * n * m**3 + 686 * 8**levels * m**6
    sweep = n_pairs * K * K * 26 * 5
    return far + sweep
