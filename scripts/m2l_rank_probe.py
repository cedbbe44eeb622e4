"""A/B probe of the shared-basis M2L compression at the 1M two-cluster.

Decides whether the measured per-m default ranks (_M2L_RANKS, the 1e-5
singular-value crossings) pay end-to-end: chained-time acc_adaptive at
m=8 with compression OFF vs the default rank, and measure the force
error of each against an exact strided sample.  Round-4 context: the
first rank guess (a flat 128) floored force error near 1e-4, diverging
the validation ladder to m=12 (1.9e-4, 984 ms/step); the honest
crossings are ~m^3/2.

    python scripts/m2l_rank_probe.py [--n 1048576]
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
from murb_tpu.ops.sparse_fmm import (  # noqa: E402
    acc_adaptive,
    best_adaptive_plan,
    default_m2l_rank,
)
from murb_tpu.ops.validate import measured_force_error  # noqa: E402
from murb_tpu.utils.probe import chain_time  # noqa: E402


def main() -> None:
    n = 1_048_576
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    st = bench._bodies(n, "two_clusters")
    soft = 0.02
    q = np.stack([np.asarray(st.qx), np.asarray(st.qy),
                  np.asarray(st.qz)], 1)[: st.n]
    gm = jnp.asarray(G, st.qx.dtype) * st.m

    m = 8
    plan0, est = best_adaptive_plan(q, st.qx.shape[0], m, m2l_rank=0)
    plan_r = plan0._replace(m2l_rank=default_m2l_rank(m))
    print(f"plan: m={m} Ld={plan0.dense_levels} L={plan0.levels} "
          f"caps={plan0.cell_caps} pmax={plan0.p2p_pmax} "
          f"rank={plan_r.m2l_rank} (est {est:.0f} ms)", flush=True)

    for tag, plan in (("rank0", plan0), ("rank-default", plan_r)):
        err = measured_force_error(
            st.qx, st.qy, st.qz, gm, soft,
            lambda a, b, c, g: acc_adaptive(a, b, c, g, soft, plan))
        print(f"{tag}: measured force err {err:.2e}", flush=True)

        def body(z, plan=plan):
            a = acc_adaptive(st.qx + z * 1e-30, st.qy, st.qz, gm, soft,
                             plan)
            return a.ax[0].astype(jnp.float32)

        chain_time(f"{tag} acc_adaptive full step", body, iters=5)


if __name__ == "__main__":
    main()
