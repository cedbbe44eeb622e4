"""Kernel registry: uniform access to every acceleration sweep.

Engines that wrap any kernel (tracking, leapfrog, KDK, CLI --kernel) resolve
by name here.  Signature: ``fn(qx, qy, qz, gm, soft) -> Accel``.
"""
from __future__ import annotations

from functools import partial


def make_acc_fn(name: str = "auto", *, block_i: int = 0, block_j: int = 0,
                chunk: int = 1024, m: int = 16, passes: int = 2,
                levels: int = 2, plan=None):
    """Resolve an acceleration kernel by name.

    auto     -- hybrid on TPU, chunked elsewhere
    naive    -- full-broadcast oracle (O(N^2) memory)
    chunked  -- i-chunked XLA sweep
    tile     -- Pallas all-VPU tile kernel
    hybrid   -- Pallas VPU+MXU flagship (exact)
    mxu      -- norm-expansion MXU kernel (experiment)
    proxy    -- Chebyshev proxy fast solver (fixed m; caller owns validity)
    fmm      -- L-level Chebyshev hierarchy (fixed m/levels; scale-free)
    adaptive -- occupied-cell sparse hierarchy + exact P2P near field
                (requires ``plan``: ops/sparse_fmm.SparsePlan)
    """
    import jax

    if name == "auto":
        name = "hybrid" if jax.default_backend() == "tpu" else "chunked"
    if name == "naive":
        from murb_tpu.ops.naive import acc_naive

        return acc_naive
    if name == "chunked":
        from murb_tpu.ops.naive import acc_chunked

        return partial(acc_chunked, chunk=chunk)
    if name == "tile":
        from murb_tpu.ops.tile_pallas import acc_tile

        return partial(acc_tile, block_i=block_i, block_j=block_j)
    if name == "hybrid":
        from murb_tpu.ops.hybrid import acc_hybrid

        return partial(acc_hybrid, block_i=block_i, block_j=block_j,
                       passes=passes)
    if name == "mxu":
        from murb_tpu.ops.mxu import acc_mxu

        return partial(acc_mxu, block_i=block_i, block_j=block_j)
    if name == "proxy":
        from murb_tpu.ops.proxy import acc_proxy

        return partial(acc_proxy, m=m)
    if name == "fmm":
        from murb_tpu.ops.fmm import acc_fmm

        return partial(acc_fmm, m=m, levels=levels)
    if name == "adaptive":
        from murb_tpu.ops.sparse_fmm import acc_adaptive

        if plan is None:
            raise ValueError("kernel 'adaptive' needs a SparsePlan "
                             "(ops/sparse_fmm.plan_adaptive)")
        return lambda qx, qy, qz, gm, soft: acc_adaptive(
            qx, qy, qz, gm, soft, plan)
    raise ValueError(
        f"unknown kernel {name!r} "
        "(auto, naive, chunked, tile, hybrid, mxu, proxy, fmm, adaptive)"
    )
