"""Bracket the cross-stage 'glue' of the adaptive solve at 1M.

The per-stage chained probes (adaptive_stage_probe.py) sum to ~625 ms
at m=8 / ~340 ms at m=6 while the FULL solve measures 989 / ~560 ms:
a ~35-40% gap the isolated stages cannot see.  This probe times the
COMPOSED halves so the gap can be assigned:

  far-only      = sort + occupied chain + P2M + hierarchy (M2M, dense
                  base, M2L, L2L) + L2P + unsort
  near-only     = sort + pair build + P2P sweep + unsort
  hierarchy     = hierarchy_fields alone off precomputed finest inputs
                  (isolates the composed downward pass incl. the L2L
                  and slot lookups no stage row covers)
  full          = solve_adaptive

    python scripts/adaptive_glue_probe.py [--n 1048576] [--m 6]
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
from murb_tpu.ops.common import f32_inputs  # noqa: E402
from murb_tpu.ops.p2p import _SENTINEL_SHIFT  # noqa: E402
from murb_tpu.ops.proxy import bounding_box, heavy_split  # noqa: E402
from murb_tpu.utils.probe import chain_time  # noqa: E402


_STAGES = ("far", "near", "hier", "full")


def _parse_stages() -> list[str]:
    """Validate --stages BEFORE any device work (typos fail instantly)."""
    pick = "far,near,hier,full"
    if "--stages" in sys.argv:
        i = sys.argv.index("--stages") + 1
        if i >= len(sys.argv):
            sys.exit(f"--stages needs a value; valid: {','.join(_STAGES)}")
        pick = sys.argv[i]
    picks = pick.split(",")
    for s in picks:
        if s not in _STAGES:
            sys.exit(f"unknown stage {s!r}; valid: {', '.join(_STAGES)}")
    return picks


def main() -> None:
    picks = _parse_stages()
    n = 1_048_576
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    m = 6
    if "--m" in sys.argv:
        m = int(sys.argv[sys.argv.index("--m") + 1])
    st = bench._bodies(n, "two_clusters")
    npad = st.qx.shape[0]
    q = np.stack([np.asarray(st.qx), np.asarray(st.qy),
                  np.asarray(st.qz)], 1)[np.asarray(st.m) > 0]
    plan, est = sf.best_adaptive_plan(q, npad, m)
    print(f"n={n} plan: m={plan.m} Ld={plan.dense_levels} L={plan.levels} "
          f"caps={plan.cell_caps} pmax={plan.p2p_pmax} impl={plan.p2p_impl}",
          flush=True)

    qx, qy, qz = st.qx, st.qy, st.qz
    gm = jnp.asarray(G, qx.dtype) * st.m
    dtype = qx.dtype
    soft = 0.02
    c, h = jax.jit(lambda x, y, z, g: bounding_box(x, y, z, g > 0))(
        qx, qy, qz, gm)
    h = jnp.full_like(h, jnp.max(h))
    mean_gm = jnp.sum(gm) / jnp.maximum(jnp.sum((gm > 0).astype(dtype)),
                                        1.0)
    _hq, _hgm, _ih, _ti, gm_eff = jax.jit(
        lambda *a: heavy_split(*a, 1, 64.0, mean_gm))(qx, qy, qz, gm)
    gm_eff = jax.block_until_ready(gm_eff)
    L = plan.levels
    Cfin = 2 ** L
    capf = plan.cell_caps[-1]
    it = 5
    eps = jnp.asarray(1e-30, dtype)

    # shared sorted inputs (inside each composed timing below, the sort
    # is re-run so the halves are honest end-to-end paths)
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

    def far_only(z):
        key_s, perm, _ci, (xs, ys, zs, gs) = sort_block(
            qx + z * eps, qy, qz, gm_eff)
        vals, _ = sf.adaptive_field(xs, ys, zs, gs, key_s, c, h, soft,
                                    plan, with_phi=False)
        out = tuple(jnp.zeros(npad, dtype).at[perm].set(v) for v in vals)
        return out[0][0].astype(jnp.float32)

    def near_only(z):
        key_s, perm, ci, (xs, ys, zs, gs) = sort_block(
            qx + z * eps, qy, qz, gm_eff)
        from murb_tpu.ops.p2p_pallas import p2p_sweep_pallas_sorted

        out, _np_ = p2p_sweep_pallas_sorted(
            *f32_inputs(xs, ys, zs, gs), ci, soft, pmax=plan.p2p_pmax,
            with_phi=False)
        near = tuple(jnp.zeros(npad, dtype).at[perm].set(
            out[:, i].reshape(npad).astype(dtype)) for i in range(3))
        return near[0][0].astype(jnp.float32)

    # precomputed finest inputs for the isolated composed hierarchy
    key_s0, perm0, _ci0, (xs0, ys0, zs0, gs0) = jax.block_until_ready(
        jax.jit(sort_block)(qx, qy, qz, gm_eff))
    cells0, slots0 = jax.block_until_ready(jax.jit(
        lambda k: sf._occupied_and_slots(k, capf))(key_s0))
    w0 = jax.block_until_ready(jax.jit(
        lambda *a: sf.p2m_window(*a, c, h, slots0, capf, m=plan.m,
                                 C=Cfin))(xs0, ys0, zs0, gs0))

    def hierarchy_only(z):
        f, _ = sf.hierarchy_fields(w0 + z * eps, cells0, c, h, soft, plan,
                                   with_phi=False)
        return f[0][0, 0].astype(jnp.float32)

    def full(z):
        acc, _phi = sf.solve_adaptive(
            qx + z * eps, qy, qz, gm, soft, plan, heavy_k=1,
            heavy_factor=64.0, with_phi=False)
        return acc[0, 0].astype(jnp.float32)

    stages = {"far": ("far-only (sort+P2M+hier+L2P+unsort)", far_only),
              "near": ("near-only (sort+build+P2P+unsort)", near_only),
              "hier": ("hierarchy_fields composed", hierarchy_only),
              "full": ("FULL solve_adaptive", full)}
    for s in picks:
        label, fn = stages[s]
        chain_time(label, fn, it)


if __name__ == "__main__":
    main()
