"""G ladder for the Pallas P2P sweep at the 1M two-cluster geometry.

DEFAULT_G = 32 was picked on the 82k merger (ladder in p2p_pallas.py:
8/16/32/64 -> 81/69/64/65 ms); at 1M the run-padding vs amortization
trade-off can land elsewhere (1.9M-pair capacity, margin dead steps).
This chains the NEAR half end-to-end (sort + build + P2P + unsort, the
glue probe's near-only stage) per G, with pmax re-derived per G from
the measured adjacency pair count so the G-dependent run padding is
included honestly (round-4 verdict item 7: autotune the brick geometry
or show the measured floor).

    python scripts/p2p_g_ladder_probe.py [--n 1048576] [--gs 16,32,64]
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
from murb_tpu import G as NEWTON_G  # noqa: E402
from murb_tpu.ops import sparse_fmm as sf  # noqa: E402
from murb_tpu.ops.common import f32_inputs  # noqa: E402
from murb_tpu.ops.p2p import _SENTINEL_SHIFT  # noqa: E402
from murb_tpu.ops.proxy import bounding_box, heavy_split  # noqa: E402
from murb_tpu.utils.probe import chain_time  # noqa: E402


def _arg(flag: str, default: str) -> str:
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


def main() -> None:
    n = int(_arg("--n", "1048576"))
    gs = [int(x) for x in _arg("--gs", "16,32,64").split(",")]

    st = bench._bodies(n, "two_clusters")
    npad = st.qx.shape[0]
    q = np.stack([np.asarray(st.qx), np.asarray(st.qy),
                  np.asarray(st.qz)], 1)[np.asarray(st.m) > 0]
    plan, _est = sf.best_adaptive_plan(q, npad, 6)
    print(f"n={n} plan: m={plan.m} L={plan.levels} "
          f"pmax(plan,G=32)={plan.p2p_pmax}", flush=True)

    qx, qy, qz = st.qx, st.qy, st.qz
    gm = jnp.asarray(NEWTON_G, qx.dtype) * st.m
    dtype = qx.dtype
    soft = 0.02
    c, h = jax.jit(lambda x, y, z, g: bounding_box(x, y, z, g > 0))(
        qx, qy, qz, gm)
    h = jnp.full_like(h, jnp.max(h))
    mean_gm = jnp.sum(gm) / jnp.maximum(jnp.sum((gm > 0).astype(dtype)),
                                        1.0)
    *_hs, gm_eff = jax.jit(
        lambda *a: heavy_split(*a, 1, 64.0, mean_gm))(qx, qy, qz, gm)
    gm_eff = jax.block_until_ready(gm_eff)
    Cfin = 2 ** plan.levels
    eps = jnp.asarray(1e-30, dtype)

    def sort_block(qx, qy, qz, gm_eff):
        cx, cy, cz = sf._body_cells(qx, qy, qz, c, h, Cfin)
        active = gm_eff > 0
        key = jnp.where(active, sf.morton_key(cx, cy, cz, Cfin), sf._BIG)
        perm = jnp.argsort(key)
        sent = jnp.asarray(2 * Cfin + _SENTINEL_SHIFT, jnp.int32)
        ci = tuple(jnp.where(active, v, sent)[perm].astype(jnp.float32)
                   for v in (cx, cy, cz))
        return key[perm], perm, ci, tuple(v[perm]
                                          for v in (qx, qy, qz, gm_eff))

    # measured adjacency pair count (G-independent) sizes each G's pmax
    from murb_tpu.ops.p2p import _adjacency, _brick_boxes
    from murb_tpu.ops.p2p_pallas import (
        p2p_sweep_pallas_sorted,
        size_pmax_runs,
    )

    _k0, _p0, ci0, _s0 = jax.block_until_ready(
        jax.jit(sort_block)(qx, qy, qz, gm_eff))
    lo, hi = jax.jit(lambda ci: _brick_boxes(ci, 128))(jnp.stack(ci0))
    n_pairs = int(jax.jit(
        lambda lo, hi: jnp.sum(_adjacency(lo, hi).astype(jnp.int32)))(
        lo, hi))
    nb = npad // 128
    print(f"adjacency pairs: {n_pairs} over {nb} bricks", flush=True)

    for g in gs:
        pmax = size_pmax_runs(n_pairs, nb, G=g)

        def near_only(z, pmax=pmax, g=g):
            key_s, perm, ci, (xs, ys, zs, gsr) = sort_block(
                qx + z * eps, qy, qz, gm_eff)
            out, _np_ = p2p_sweep_pallas_sorted(
                *f32_inputs(xs, ys, zs, gsr), ci, soft, pmax=pmax, G=g,
                with_phi=False)
            near = tuple(jnp.zeros(npad, dtype).at[perm].set(
                out[:, i].reshape(npad).astype(dtype)) for i in range(3))
            return near[0][0].astype(jnp.float32)

        chain_time(f"near-only G={g:3d} pmax={pmax}", near_only, 5)


if __name__ == "__main__":
    main()
