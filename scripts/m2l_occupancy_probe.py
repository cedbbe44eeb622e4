"""Host-side occupancy analysis of the sparse M2L offset scan at 1M.

Each scan step gathers (cap, m^3) source rows for one canonical offset
and runs full-cap matmuls; rows whose neighbor cell at that offset is
unoccupied are zeroed by the found mask.  This probe computes, per
engaged sparse level of the shipping 1M two-cluster plan:

  occ          occupied cells (true rows of the level)
  cap          the plan's padded capacity (dot rows actually paid)
  found_mean   mean over the 158 canonical offsets (both signs) of the
               fraction of occupied cells whose +/-o neighbor is
               occupied -- the useful fraction of each dot
  found_max    the worst offset's fraction (a static compaction cap
               would have to carry this)

    python scripts/m2l_occupancy_probe.py [--n 1048576]
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
    plan, _ = sf.best_adaptive_plan(q, npad, 6)
    L, Ld = plan.levels, plan.dense_levels
    print(f"plan m={plan.m} Ld={Ld} L={L} caps={plan.cell_caps}",
          flush=True)

    lo = q.min(0)
    hi = q.max(0)
    c = (lo + hi) / 2
    h = np.full(3, (hi - lo).max() / 2)
    canon = sf._canon_far()
    offs = np.concatenate([canon, -canon])

    for lvl in range(Ld + 1, L + 1):
        C = 2 ** lvl
        cell = np.clip(((q - (c - h)) / (2 * h / C)).astype(np.int64),
                       0, C - 1)
        code = (cell[:, 0] * C + cell[:, 1]) * C + cell[:, 2]
        uniq = np.unique(code)
        occ = len(uniq)
        cset = set(uniq.tolist())
        ux, uy, uz = uniq // (C * C) % C, uniq // C % C, uniq % C
        fr = []
        for o in offs:
            nx, ny, nz = ux + o[0], uy + o[1], uz + o[2]
            ok = ((nx >= 0) & (nx < C) & (ny >= 0) & (ny < C)
                  & (nz >= 0) & (nz < C))
            ncode = (nx * C + ny) * C + nz
            found = sum(1 for cd in ncode[ok] if int(cd) in cset)
            fr.append(found / occ)
        fr = np.array(fr)
        cap = plan.cell_caps[lvl - Ld - 1] \
            if lvl - Ld - 1 < len(plan.cell_caps) else None
        print(f"level {lvl}: C={C:4d} occ={occ:7d} cap={cap}  "
              f"found mean {fr.mean() * 100:5.1f}%  "
              f"max {fr.max() * 100:5.1f}%  min {fr.min() * 100:5.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
