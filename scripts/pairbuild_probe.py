"""Stage timings of the P2P pair-list build at N=1M (the 333 ms glue).

Chained fori_loop timing per CLAUDE.md ground rules.

    python scripts/pairbuild_probe.py
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

from murb_tpu.cli import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from murb_tpu import G  # noqa: E402
from murb_tpu.ops import sparse_fmm as sf  # noqa: E402
from murb_tpu.ops.p2p import (  # noqa: E402
    _SENTINEL_SHIFT,
    _adjacency,
    _brick_boxes,
)
from murb_tpu.ops.p2p_pallas import build_pair_runs  # noqa: E402
from murb_tpu.ops.proxy import bounding_box, heavy_split  # noqa: E402
from murb_tpu.utils.probe import chain_time  # noqa: E402


def main() -> None:
    n = 1_048_576
    st = bench._bodies(n, "two_clusters")
    npad = st.qx.shape[0]
    q = np.stack([np.asarray(st.qx), np.asarray(st.qy),
                  np.asarray(st.qz)], 1)[np.asarray(st.m) > 0]
    m = sf.adaptive_order(1e-4)
    plan, est = sf.best_adaptive_plan(q, npad, m)
    L = plan.levels
    Cfin = 2 ** L
    print(f"n={n} pmax={plan.p2p_pmax} L={L}", flush=True)

    qx, qy, qz = st.qx, st.qy, st.qz
    gm = jnp.asarray(G, qx.dtype) * st.m
    dtype = qx.dtype
    c, h = jax.jit(lambda x, y, z, g: bounding_box(x, y, z, g > 0))(
        qx, qy, qz, gm)
    h = jnp.full_like(h, jnp.max(h))
    mean_gm = jnp.sum(gm) / jnp.maximum(
        jnp.sum((gm > 0).astype(dtype)), 1.0)
    _hq, _hgm, _ih, _ti, gm_eff = jax.jit(
        lambda *a: heavy_split(*a, 1, 64.0, mean_gm))(qx, qy, qz, gm)

    @jax.jit
    def shared_sort(qx, qy, qz, gm_eff):
        cx, cy, cz = sf._body_cells(qx, qy, qz, c, h, Cfin)
        active = gm_eff > 0
        key = jnp.where(active, sf.morton_key(cx, cy, cz, Cfin), sf._BIG)
        perm = jnp.argsort(key)
        sent = jnp.asarray(2 * Cfin + _SENTINEL_SHIFT, jnp.int32)
        ci = tuple(jnp.where(active, v, sent)[perm].astype(jnp.float32)
                   for v in (cx, cy, cz))
        return ci

    ci = jax.block_until_ready(shared_sort(qx, qy, qz, gm_eff))
    lo, hi = jax.block_until_ready(jax.jit(
        lambda c0, c1, c2: _brick_boxes((c0, c1, c2), 128))(*ci))
    adj = jax.block_until_ready(jax.jit(_adjacency)(lo, hi))
    print("n_pairs =", int(jnp.sum(adj.astype(jnp.int32))), flush=True)

    it = 5
    eps = jnp.asarray(1e-30, jnp.float32)

    chain_time("brick boxes", lambda z: _brick_boxes(
        (ci[0] + z * eps, ci[1], ci[2]), 128)[0][0, 0], it)
    chain_time("adjacency (B,B,3) current", lambda z: _adjacency(
        lo + z * eps, hi)[0, 0].astype(jnp.float32), it)

    def adj_rank2(lo, hi):
        out = None
        for d in range(3):
            a = lo[None, :, d] <= hi[:, d][:, None] + 1
            b = lo[:, d][:, None] <= hi[None, :, d] + 1
            ab = a & b
            out = ab if out is None else out & ab
        return out

    chain_time("adjacency rank-2", lambda z: adj_rank2(
        lo + z * eps, hi)[0, 0].astype(jnp.float32), it)

    def runs_full(z):
        tb, sb, npd = build_pair_runs(
            jnp.logical_or(adj, z > 1e30), plan.p2p_pmax)
        return (tb[0] + sb[0] + npd).astype(jnp.float32)

    chain_time("build_pair_runs (select-rank)", runs_full, it)

    def runs_no_scatter(z):
        adj2 = jnp.logical_or(adj, z > 1e30)
        B = adj2.shape[0]
        Gg = 32
        counts = jnp.sum(adj2, 1)
        padded = (counts + Gg - 1) // Gg * Gg
        starts = jnp.concatenate([jnp.zeros(1, padded.dtype),
                                  jnp.cumsum(padded)[:-1]])
        rank = jnp.cumsum(adj2, 1) - 1
        pos = jnp.where(adj2, starts[:, None] + rank, 0)
        return (pos[0, 0] + rank[0, 0]).astype(jnp.float32)

    chain_time("  ... cumsum+pos only (no scatter)", runs_no_scatter, it)


if __name__ == "__main__":
    main()
