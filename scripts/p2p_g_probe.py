"""A/B the block-sparse P2P kernel's pairs-per-step G (and variants).

Chained timing of p2p_sweep_pallas_sorted alone at the 82k merger
geometry (the stage that dominates the adaptive step there).

    python scripts/p2p_g_probe.py [--n 1048576]
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
from murb_tpu import G as GRAV  # noqa: E402
from murb_tpu.ops import sparse_fmm as sf  # noqa: E402
from murb_tpu.ops.p2p import _SENTINEL_SHIFT, estimate_brick_pairs  # noqa: E402
from murb_tpu.ops.p2p_pallas import (  # noqa: E402
    p2p_sweep_pallas_sorted,
    size_pmax_runs,
)
from murb_tpu.ops.proxy import bounding_box, heavy_split  # noqa: E402
from murb_tpu.utils.probe import chain_time  # noqa: E402


def main() -> None:
    n = 81_920
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    scheme = "two_galaxies" if n == 81_920 else "two_clusters"
    st = bench._bodies(n, scheme)
    npad = st.qx.shape[0]
    q = np.stack([np.asarray(st.qx), np.asarray(st.qy),
                  np.asarray(st.qz)], 1)[np.asarray(st.m) > 0]
    plan, _ = sf.best_adaptive_plan(q, npad, sf.adaptive_order(1e-4))
    L = plan.levels
    Cfin = 2 ** L
    soft = 0.02 if scheme == "two_clusters" else 2.0e8

    qx, qy, qz = st.qx, st.qy, st.qz
    gm = jnp.asarray(GRAV, qx.dtype) * st.m
    c, h = jax.jit(lambda x, y, z, g: bounding_box(x, y, z, g > 0))(
        qx, qy, qz, gm)
    h = jnp.full_like(h, jnp.max(h))
    mean_gm = jnp.sum(gm) / jnp.maximum(jnp.sum((gm > 0)
                                                .astype(gm.dtype)), 1.0)
    *_, gm_eff = jax.jit(
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
        return ci + tuple(v[perm] for v in (qx, qy, qz, gm_eff))

    cix, ciy, ciz, xs, ys, zs, gs = jax.block_until_ready(
        shared_sort(qx, qy, qz, gm_eff))
    ci = (cix, ciy, ciz)
    est = estimate_brick_pairs(q, npad, L)
    eps = jnp.asarray(1e-30, qx.dtype)
    it = 5 if n > 500_000 else 20

    for G in (8, 16, 32, 64):
        pmax = size_pmax_runs(est, npad // 128, G=G, margin=1.5)
        chain_time(f"p2p pallas G={G:3d} (pmax={pmax})", lambda z, G=G,
                   pmax=pmax: p2p_sweep_pallas_sorted(
                       xs + z * eps, ys, zs, gs, ci, soft, pmax=pmax,
                       G=G, with_phi=False)[0][0, 0, 0]
                   .astype(jnp.float32), it)


if __name__ == "__main__":
    main()
