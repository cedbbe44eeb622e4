"""Host-side utilization analysis of the P2P brick pairing at 1M.

The Pallas near kernel sweeps (Kt, 128) rects for every brick pair that
passes the conservative cell-bbox adjacency; only body pairs within
Chebyshev cell distance <= 1 contribute.  This probe computes, on CPU
numpy, for target-brick sizes Kt in {128, 64, 32, 16, 8} at the shipping
1M two-cluster geometry:

  pairs        brick pairs passing adjacency (Kt-target vs 128-source)
  slots        swept rect slots = pairs * Kt * 128 (+ run padding to G)
  true         body pairs with cell Chebyshev distance <= 1 (kernel's
               useful work, Kt-independent)
  util         true / slots -- the headroom a tighter target bbox buys

plus a cell-packed variant (whole Morton-ordered cells packed into
128-slot bricks, flush-on-overflow, so brick bboxes stay tight at the
cost of dead padding rows).

Measured verdicts at 1M two-cluster (m=6 L=7, 16880 occupied cells,
mean 62.1 bodies/cell, 9.16 G true near pairs):

  Kt ladder    45.8% util at Kt=128 -> 56.7% at Kt=32 for 3.1x the
               brick pairs and per-step fixed costs -- diminishing.
  cell-packed  17.66 G slots vs 20.01 G Morton (12% fewer; 83.4% fill
               eats the tighter bboxes) -- NOT worth a second packing
               scatter + a 1.2x body-array inflation.

The sweep is VPU-compute-bound at its current geometry; remaining
levers are per-slot op count and G retune, ~10-20% class.

    python scripts/p2p_util_probe.py [--n 1048576]
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import bench  # noqa: E402
from murb_tpu.ops import sparse_fmm as sf  # noqa: E402


def main() -> None:
    n = 1_048_576
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    st = bench._bodies(n, "two_clusters")
    npad = st.qx.shape[0]
    act = np.asarray(st.m) > 0
    q = np.stack([np.asarray(st.qx), np.asarray(st.qy),
                  np.asarray(st.qz)], 1)[act]
    plan, _ = sf.best_adaptive_plan(q, npad, plan_m := 6)
    L = plan.levels
    C = 2 ** L
    print(f"n={n} npad={npad} plan m={plan.m} Ld={plan.dense_levels} "
          f"L={L} C={C} pmax={plan.p2p_pmax}", flush=True)

    # per-body integer cells, same convention as ops/p2p._cell_ixyz:
    # cells on the [c-h, c+h] box, clipped to [0, C-1]
    lo = q.min(0)
    hi = q.max(0)
    c = (lo + hi) / 2
    h = np.full(3, (hi - lo).max() / 2)
    cell = np.clip(((q - (c - h)) / (2 * h / C)).astype(np.int64),
                   0, C - 1)

    # Morton order (match ops/p2p.morton_key bit interleave)
    def interleave3(v, bits):
        out = np.zeros_like(v)
        for b in range(bits):
            out |= ((v >> b) & 1) << (3 * b)
        return out

    bits = L
    key = (interleave3(cell[:, 0], bits) << 2) \
        | (interleave3(cell[:, 1], bits) << 1) \
        | interleave3(cell[:, 2], bits)
    # active bodies sort first (inactive = +inf key); pad rows inactive
    order = np.argsort(key, kind="stable")
    cs = cell[order]
    nact = len(q)

    # true near body pairs via the cell histogram: for each occupied
    # cell, its count x the 27-neighborhood count sum (includes self
    # pairs, like the kernel's rect diagonal)
    code = (cs[:, 0] * C + cs[:, 1]) * C + cs[:, 2]
    uniq, cnt = np.unique(code, return_counts=True)
    lut = dict(zip(uniq.tolist(), cnt.tolist()))
    true_pairs = 0
    ux, uy, uz = uniq // (C * C) % C, uniq // C % C, uniq % C
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                nx, ny, nz = ux + dx, uy + dy, uz + dz
                ok = ((nx >= 0) & (nx < C) & (ny >= 0) & (ny < C)
                      & (nz >= 0) & (nz < C))
                ncode = (nx * C + ny) * C + nz
                ncnt = np.array([lut.get(int(cd), 0)
                                 for cd in ncode[ok]])
                true_pairs += int(np.sum(cnt[ok] * ncnt))
    print(f"occupied cells {len(uniq)}  max/cell {cnt.max()}  "
          f"mean/cell {cnt.mean():.1f}  true near body pairs "
          f"{true_pairs / 1e6:.1f} M", flush=True)

    # brick-pair adjacency at (Kt target, 128 source), padded rows form
    # trailing all-sentinel bricks exactly like the kernel (sentinel
    # cells never pass adjacency, so just drop them here)
    def boxes(Kb):
        ntrim = nact // Kb * Kb
        v = cs[:ntrim].reshape(-1, Kb, 3)
        return v.min(1), v.max(1)

    # --- cell-packed bricks: pack whole Morton-ordered cells into
    # 128-slot bricks (cells > 128 split across bricks), so each brick's
    # cell bbox stays tight at the cost of dead padding rows.  Dead rows
    # sweep but contribute zero; the metric is swept slots, so the
    # padding is priced in.
    # uniq is sorted by linear code, not Morton -- re-sort cells by the
    # Morton key of their coords so packed bricks stay spatially local
    cx_u, cy_u, cz_u = uniq // (C * C) % C, uniq // C % C, uniq % C

    def interleave3_64(v, bits):
        out = np.zeros_like(v)
        for b in range(bits):
            out |= ((v >> b) & 1) << (3 * b)
        return out

    mkey = (interleave3_64(cx_u, bits) << 2) \
        | (interleave3_64(cy_u, bits) << 1) | interleave3_64(cz_u, bits)
    oc = np.argsort(mkey)
    K = 128
    bricks = []          # list of (rows_used, lo3, hi3)
    cur_rows, cur_lo, cur_hi = 0, None, None
    for ci_ in oc:
        cnt_c = int(cnt[ci_])
        cc = np.array([cx_u[ci_], cy_u[ci_], cz_u[ci_]])
        if cnt_c > K - cur_rows and cur_rows > 0:
            # whole cell doesn't fit: flush (padding) -- never split a
            # cell that would fit in an empty brick
            bricks.append((cur_rows, cur_lo, cur_hi))
            cur_rows, cur_lo, cur_hi = 0, None, None
        while cnt_c > 0:
            take = min(cnt_c, K - cur_rows)
            cur_lo = cc if cur_lo is None else np.minimum(cur_lo, cc)
            cur_hi = cc if cur_hi is None else np.maximum(cur_hi, cc)
            cur_rows += take
            cnt_c -= take
            if cur_rows == K:
                bricks.append((cur_rows, cur_lo, cur_hi))
                cur_rows, cur_lo, cur_hi = 0, None, None
    if cur_rows:
        bricks.append((cur_rows, cur_lo, cur_hi))
    lo_p = np.stack([b[1] for b in bricks])
    hi_p = np.stack([b[2] for b in bricks])
    Bp = len(bricks)
    counts_p = np.zeros(Bp, np.int64)
    for k in range(0, Bp, 4096):
        sl = slice(k, min(k + 4096, Bp))
        adj = np.ones((sl.stop - sl.start, Bp), bool)
        for d in range(3):
            adj &= (lo_p[None, :, d] <= hi_p[sl, d][:, None] + 1) \
                 & (lo_p[sl, d][:, None] <= hi_p[None, :, d] + 1)
        counts_p[sl] = adj.sum(1)
    G = 32
    pairs_p = int(counts_p.sum())
    padded_p = int(np.sum((counts_p + G - 1) // G * G))
    slots_p = padded_p * K * K
    rows_used = sum(b[0] for b in bricks)
    print(f"cell-packed: bricks {Bp} (vs {nact // K} morton), "
          f"fill {rows_used / (Bp * K) * 100:.1f}%  "
          f"pairs {pairs_p}  padded {padded_p}  "
          f"slots {slots_p / 1e9:7.2f} G  util "
          f"{true_pairs / slots_p * 100:5.1f} %", flush=True)

    lo_s, hi_s = boxes(128)
    for Kt in (128, 64, 32, 16, 8):
        lo_t, hi_t = boxes(Kt)
        counts = np.zeros(len(lo_t), np.int64)
        for k in range(0, len(lo_t), 4096):
            sl = slice(k, k + 4096)
            adj = np.ones((len(lo_t[sl]), len(lo_s)), bool)
            for d in range(3):
                adj &= (lo_s[None, :, d] <= hi_t[sl, d][:, None] + 1) \
                     & (lo_t[sl, d][:, None] <= hi_s[None, :, d] + 1)
            counts[sl] = adj.sum(1)
        pairs = int(counts.sum())
        padded = int(np.sum((counts + G - 1) // G * G))
        slots = padded * Kt * 128
        print(f"Kt={Kt:4d}: pairs {pairs:9d}  padded {padded:9d}  "
              f"slots {slots / 1e9:7.2f} G  util "
              f"{true_pairs / slots * 100:5.1f} %", flush=True)


if __name__ == "__main__":
    main()
