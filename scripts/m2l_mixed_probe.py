"""Error + speed of the sparse-M2L dot tiers at the 1M two-cluster config.

Tiers: fp32 (HIGHEST everywhere, the r4 default), mixed (round 5:
HIGHEST on the cancellation-critical |o|_inf = 2 shell, bf16x3 on
|o|_inf >= 3), bf16x3 (everywhere).  The dense-FMM tier probe put the
split error in its far shell (ops/fmm.fmm_field_grid docstring); this
measures where the SPARSE sweep's error lives and what the far-shell
split buys at the shipping 1M config (m=6 L=7).

    python scripts/m2l_mixed_probe.py [--n 1048576] [--m 6]
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
from murb_tpu.ops.naive import acc_rect  # noqa: E402
from murb_tpu.utils.probe import chain_time  # noqa: E402


def _arg(flag: str, default: str) -> str:
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


def main() -> None:
    n = int(_arg("--n", "1048576"))
    m = int(_arg("--m", "6"))
    st = bench._bodies(n, "two_clusters")
    npad = st.qx.shape[0]
    q = np.stack([np.asarray(st.qx), np.asarray(st.qy),
                  np.asarray(st.qz)], 1)[np.asarray(st.m) > 0]
    plan, _ = sf.best_adaptive_plan(q, npad, m)
    print(f"n={n} plan: m={plan.m} Ld={plan.dense_levels} "
          f"L={plan.levels} caps={plan.cell_caps}", flush=True)

    gm = jnp.asarray(G, st.qx.dtype) * st.m
    soft = 0.02

    # exact reference rows
    sample, block = 2048, 512
    idx = np.unique(np.linspace(0, st.n - 1, sample).astype(np.int64))
    idx = idx[: len(idx) - len(idx) % block] if len(idx) % block else idx
    exact = []
    for k in range(0, len(idx), block):
        b = idx[k:k + block]
        r = acc_rect(st.qx[b], st.qy[b], st.qz[b], st.qx, st.qy, st.qz,
                     gm, soft)
        exact.append(np.stack([np.asarray(r.ax), np.asarray(r.ay),
                               np.asarray(r.az)], 1))
    exact = np.concatenate(exact)
    en = np.linalg.norm(exact, axis=1)
    print(f"exact reference on {len(idx)} rows", flush=True)

    eps = jnp.asarray(1e-30, st.qx.dtype)
    for tier in ("fp32", "mixed", "bf16x3"):
        acc, _ = jax.jit(
            lambda qx, t=tier: sf.solve_adaptive(
                qx, st.qy, st.qz, gm, soft, plan, heavy_k=1,
                heavy_factor=64.0, with_phi=False, m2l_dots=t)
        )(st.qx)
        a = np.asarray(acc)[idx]
        rel = np.linalg.norm(a - exact, axis=1) \
            / np.maximum(en, en.max() * 1e-6)
        ms = chain_time(
            f"solve[{tier}]",
            lambda z, t=tier: sf.solve_adaptive(
                st.qx + z * eps, st.qy, st.qz, gm, soft, plan,
                heavy_k=1, heavy_factor=64.0, with_phi=False,
                m2l_dots=t)[0][0, 0].astype(jnp.float32),
            5, quiet=True)
        print(f"{tier:7s}: {ms:8.2f} ms  max_err {rel.max():.3e}  "
              f"p99 {np.percentile(rel, 99):.3e}", flush=True)


if __name__ == "__main__":
    main()
