"""Per-stage on-device timings of the adaptive (sparse FMM + P2P) solve.

Chained fori_loop timing per CLAUDE.md ground rules: per-stage numbers
carry a ~0.9 ms floor and DO NOT sum to the full step (glue, fusion
across stage boundaries); use them to rank stages, and trust the full
chain row for absolute cost.

    python scripts/adaptive_stage_probe.py [--n 1048576] [--small]
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
from murb_tpu.ops.fmm import fmm_field_grid  # noqa: E402
from murb_tpu.ops.p2p import _SENTINEL_SHIFT  # noqa: E402
from murb_tpu.ops.proxy import bounding_box, heavy_split  # noqa: E402
from murb_tpu.utils.probe import chain_time  # noqa: E402


def main() -> None:
    n = 81_920 if "--small" in sys.argv else 1_048_576
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    scheme = "two_galaxies" if n == 81_920 else "two_clusters"
    st = bench._bodies(n, scheme)
    npad = st.qx.shape[0]
    q = np.stack([np.asarray(st.qx), np.asarray(st.qy),
                  np.asarray(st.qz)], 1)[np.asarray(st.m) > 0]
    m = sf.adaptive_order(1e-4)
    if "--m" in sys.argv:  # probe the engine's validated pick (often m=6)
        m = int(sys.argv[sys.argv.index("--m") + 1])
    plan, est = sf.best_adaptive_plan(q, npad, m)
    print(f"n={n} npad={npad} plan: m={plan.m} Ld={plan.dense_levels} "
          f"L={plan.levels} caps={plan.cell_caps} pmax={plan.p2p_pmax} "
          f"impl={plan.p2p_impl} est={est:.0f} ms", flush=True)

    qx, qy, qz = st.qx, st.qy, st.qz
    gm = jnp.asarray(G, qx.dtype) * st.m
    dtype = qx.dtype
    soft = 0.02 if scheme == "two_clusters" else 2.0e8
    c, h = jax.jit(lambda x, y, z, g: bounding_box(x, y, z, g > 0))(
        qx, qy, qz, gm)
    h = jnp.full_like(h, jnp.max(h))
    mean_gm = jnp.sum(gm) / jnp.maximum(
        jnp.sum((gm > 0).astype(dtype)), 1.0)
    _hq, _hgm, _ih, _ti, gm_eff = jax.jit(
        lambda *a: heavy_split(*a, 1, 64.0, mean_gm))(qx, qy, qz, gm)
    gm_eff = jax.block_until_ready(gm_eff)

    mm, Ld, L = plan.m, plan.dense_levels, plan.levels
    Cfin = 2 ** L

    # ---- the shared sort (outside timing; timed as its own stage)
    @jax.jit
    def shared_sort(qx, qy, qz, gm_eff):
        cx, cy, cz = sf._body_cells(qx, qy, qz, c, h, Cfin)
        active = gm_eff > 0
        key = jnp.where(active, sf.morton_key(cx, cy, cz, Cfin), sf._BIG)
        perm = jnp.argsort(key)
        sent = jnp.asarray(2 * Cfin + _SENTINEL_SHIFT, jnp.int32)
        ci = tuple(jnp.where(active, v, sent)[perm].astype(jnp.float32)
                   for v in (cx, cy, cz))
        return (key[perm], perm, ci) + tuple(
            v[perm] for v in (qx, qy, qz, gm_eff))

    key_s, perm, ci, xs, ys, zs, gs = jax.block_until_ready(
        shared_sort(qx, qy, qz, gm_eff))

    @jax.jit
    def build_cells(key_s):
        cells = {}
        cells[L], slots = sf._occupied_and_slots(key_s, plan.cell_caps[-1])
        for l in range(L - 1, Ld, -1):
            ids = jnp.where(cells[l + 1] == sf._BIG, sf._BIG,
                            cells[l + 1] >> 3)
            cells[l], _ = sf._occupied_and_slots(
                ids, plan.cell_caps[l - Ld - 1])
        return tuple(cells[l] for l in range(Ld + 1, L + 1)), slots

    cells_t, slots = jax.block_until_ready(build_cells(key_s))
    cells = {Ld + 1 + i: cells_t[i] for i in range(L - Ld)}
    w_fin = jax.block_until_ready(jax.jit(
        lambda *a: sf.p2m_window(*a, c, h, slots, plan.cell_caps[-1],
                                 m=mm, C=Cfin))(xs, ys, zs, gs))

    w = {L: w_fin}
    for l in range(L - 1, Ld, -1):
        w[l] = sf.m2m_sparse(w[l + 1], cells[l + 1], cells[l], m=mm,
                             C_child=2 ** (l + 1))
        w[l] = jax.block_until_ready(jax.jit(lambda x: x)(w[l]))

    # ---- stage timings
    it = 5 if n > 500_000 else 20
    eps = jnp.asarray(1e-30, dtype)

    chain_time("morton sort (shared)", lambda z: shared_sort(
        qx + z * eps, qy, qz, gm_eff)[0][0].astype(jnp.float32), it)
    chain_time("occupied chain + slots", lambda z: build_cells(
        key_s + z.astype(jnp.int32) * 0)[0][0][0].astype(jnp.float32), it)
    chain_time("P2M window (finest)", lambda z: sf.p2m_window(
        xs + z * eps, ys, zs, gs, c, h, slots, plan.cell_caps[-1],
        m=mm, C=Cfin)[0, 0].astype(jnp.float32), it)
    if L - 1 > Ld:
        chain_time("M2M one level", lambda z: sf.m2m_sparse(
            w_fin + z * eps, cells[L], cells[L - 1], m=mm,
            C_child=Cfin)[0, 0].astype(jnp.float32), it)

    for l in range(Ld + 1, L + 1):
        hl = h / (2 ** l)
        chain_time(
            f"M2L sparse level {l} (cap={plan.cell_caps[l - Ld - 1]})",
            (lambda l, hl: lambda z: sf.m2l_sparse_level(
                w[l] + z * eps, cells[l], hl, soft, m=mm, C=2 ** l,
                with_phi=False)[0][0, 0].astype(jnp.float32))(l, hl),
            it)
    hl = h / Cfin
    chain_time(
        f"M2L finest tier=bf16x3 (cap={plan.cell_caps[-1]})",
        lambda z: sf.m2l_sparse_level(
            w[L] + z * eps, cells[L], hl, soft, m=mm, C=Cfin,
            with_phi=False, m2l_dots="bf16x3")[0][0, 0]
        .astype(jnp.float32), it)

    if plan.p2p_impl == "pallas":
        from murb_tpu.ops.p2p import _adjacency, _brick_boxes
        from murb_tpu.ops.p2p_pallas import build_pair_runs

        def pair_build(z):
            ci2 = (ci[0] + z * eps, ci[1], ci[2])
            lo, hi = _brick_boxes(ci2, 128)
            tb, sb, npd = build_pair_runs(_adjacency(lo, hi),
                                          plan.p2p_pmax)
            return (tb[0] + sb[0] + npd).astype(jnp.float32)

        chain_time("P2P pair-list build alone", pair_build, it)

    @jax.jit
    def dense_base(wd):
        f = fmm_field_grid(wd, h, soft, m=mm, levels=Ld, with_phi=False,
                           fused=True, m2l_dots="fp32",
                           finest_subset="far")
        return f
    wd = jnp.zeros((8 ** Ld, mm ** 3), dtype)
    chain_time("dense base (fmm_field_grid)", lambda z: dense_base(
        wd + z * eps)[0][0, 0].astype(jnp.float32), it)

    f_fin = tuple(jnp.zeros((plan.cell_caps[-1] + 1, mm ** 3), dtype)
                  for _ in range(3))
    chain_time("L2P window (finest)", lambda z: sf.l2p_window(
        xs + z * eps, ys, zs, c, h, slots, f_fin, m=mm,
        C=Cfin)[0][0].astype(jnp.float32), it)

    if plan.p2p_impl == "pallas":
        from murb_tpu.ops.p2p_pallas import p2p_sweep_pallas_sorted

        chain_time("P2P sweep (pallas, sorted)", lambda z:
                   p2p_sweep_pallas_sorted(
                       xs + z * eps, ys, zs, gs, ci, soft,
                       pmax=plan.p2p_pmax, with_phi=False)[0][0, 0, 0]
                   .astype(jnp.float32), it)
    else:
        from murb_tpu.ops.p2p import p2p_sweep_sorted

        chain_time("P2P sweep (jnp, sorted)", lambda z: p2p_sweep_sorted(
            xs + z * eps, ys, zs, gs,
            tuple(cc.astype(dtype) for cc in ci), soft,
            pmax=plan.p2p_pmax, chunk=plan.p2p_chunk, with_phi=False)
            [0][0][0, 0].astype(jnp.float32), it)

    chain_time("FULL solve_adaptive", lambda z: sf.solve_adaptive(
        qx + z * eps, qy, qz, gm, soft, plan, heavy_k=1,
        heavy_factor=64.0, with_phi=False)[0][0, 0].astype(jnp.float32),
        it)


if __name__ == "__main__":
    main()
