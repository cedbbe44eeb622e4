"""Pallas block-sparse P2P sweep: the near-field pair kernel.

The jnp brick-pair sweep (ops/p2p.p2p_sweep) is gather-bound on XLA:TPU:
row-gathers of (128,)-wide brick rows run ~22 GB/s effective, so the
sweep realizes ~5% of the VPU (measured 2.3 s of a 3.6 s step at N=1M
clustered; 57 ms at the 82k merger vs a ~15 ms slot bound).  This kernel
replaces the gathers with hardware DMAs:

  grid      one step per G consecutive pairs of a TARGET-MAJOR pair
            list, padded so every target brick's run is a multiple of G
            -- each step owns ONE target brick.
  prefetch  the per-step target index and the per-pair source indices
            are scalar-prefetched (SMEM), so the target block's DMA is
            driven by the index map (consecutive steps with the same
            target reuse the resident block) and the G source bricks
            are fetched with explicit ``make_async_copy`` calls from an
            HBM-resident (B, 8, K) field pack.
  compute   per source brick: the acc_rect broadcast pattern on (K, K)
            with the exact cell-offset near mask (brick pairing is
            conservative; the mask decides per body pair).
  output    (B, 4, K) accumulated in VMEM across each target's run
            (flash-attention-style revisit: initialize on the run's
            first step, add on the rest).

Field pack rows: [x, y, z, gm_src, cx, cy, cz, 0]; row 3 is zero for
inactive bodies (ghost padding, heavy-split) and rows 4-6 carry the
sentinel cell coords that make the near mask exclude them.  Pad pairs
carry source index -1 and contribute exactly zero.

Same contract as ops/p2p.p2p_sweep: self pairs land at distance 0 (zero
force through the softening; the standard Gm_i/eps self-potential,
ref: SimulationNBodyCUDAPropertyTracking.cu:296-302).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from murb_tpu.ops.common import Accel

#: pairs per grid step: amortizes per-step overheads over G (K, K)
#: rect blocks (~G * 0.4 Mslots of VPU work) while keeping the unrolled
#: kernel body and the (G, 8, K) source buffer small.  Measured ladder
#: (82k merger, hoisted-reduction kernel): G=8 81 ms / 16 69 / 32 64 /
#: 64 65 -- run padding eats the amortization past 32.
DEFAULT_G = 32

_K = 128  # brick size: one VPU lane row (ops/p2p.DEFAULT_K)


def _kernel(tb_ref, nlive_ref, tgt_ref, data_ref, sb_ref, out_ref,
            src_buf, sem, *, G: int, soft2: float, with_phi: bool):
    # tb_ref / nlive_ref: scalar-prefetched per-step target indices and
    # the LIVE step count (SMEM; tb drives the index maps).  sb_ref:
    # this step's G source indices as a VMEM block -- the full per-pair
    # array exceeds the 1 MB SMEM at real pair counts (measured: 318k
    # pairs = 1.27 MB), and G is a static unroll so the reads below are
    # static-index scalar loads.  The (1, 1, G) block satisfies
    # Mosaic's tiling rule by making the last two block dims EQUAL the
    # array dims (a (1, G) block is rejected: second-to-last must be
    # 8-divisible or whole).
    #
    # Steps past the live count are CAPACITY padding (pmax is a
    # margined static bound; the true run-padded length is the traced
    # n_padded) -- the whole body is skipped for them, so the margin
    # costs ~nothing per sweep (measured: 578 -> ~390 ms at the 1M
    # two-cluster geometry, where the 1.5x margin made 36% of the grid
    # dead steps).  Their output blocks alias the last real target's
    # block (tb_step clamps) and are simply never touched.
    #
    # (A cross-step double-buffered variant of the source DMAs was
    # probed and REJECTED: 578 -> 661 ms at the 1M two-cluster sweep.
    # Mosaic's own block pipelining already hides the copy latency --
    # the sweep is compute-bound, ~0.3 us per (K, K) pair block at G=32
    # -- and the even/odd branch duplication only added overhead.)
    s = pl.program_id(0)

    @pl.when(s < nlive_ref[0])
    def _live():
        # program_id is read OUTSIDE the when: it cannot be bound
        # inside the lowered cond branch
        _body(s, tb_ref, tgt_ref, data_ref, sb_ref, out_ref, src_buf,
              sem, G=G, soft2=soft2, with_phi=with_phi)


def _body(s, tb_ref, tgt_ref, data_ref, sb_ref, out_ref, src_buf, sem,
          *, G: int, soft2: float, with_phi: bool):
    # fetch the G source bricks of this step (pad indices read brick 0;
    # their contribution is zeroed below)
    copies = []
    for g in range(G):
        idx = jnp.maximum(sb_ref[0, 0, g], 0)
        copies.append(pltpu.make_async_copy(
            data_ref.at[idx], src_buf.at[g], sem))
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    xt = tgt_ref[0, 0, :].reshape(_K, 1)
    yt = tgt_ref[0, 1, :].reshape(_K, 1)
    zt = tgt_ref[0, 2, :].reshape(_K, 1)
    cxt = tgt_ref[0, 4, :].reshape(_K, 1)
    cyt = tgt_ref[0, 5, :].reshape(_K, 1)
    czt = tgt_ref[0, 6, :].reshape(_K, 1)

    # accumulate (K, K) partials across the step's G pairs and reduce
    # ONCE -- every pair of a step shares the target brick, and the
    # cross-lane (axis 1) reduction is the expensive VPU op here
    # (measured: hoisting it out of the g loop cut the sweep ~25-30%)
    nf = 4 if with_phi else 3
    acc2 = [jnp.zeros((_K, _K), jnp.float32) for _ in range(nf)]
    one = jnp.float32(1.0)
    for g in range(G):
        valid = (sb_ref[0, 0, g] >= 0).astype(jnp.float32)
        xs = src_buf[g, 0, :].reshape(1, _K)
        ys = src_buf[g, 1, :].reshape(1, _K)
        zs = src_buf[g, 2, :].reshape(1, _K)
        gs = src_buf[g, 3, :].reshape(1, _K)
        cxs = src_buf[g, 4, :].reshape(1, _K)
        cys = src_buf[g, 5, :].reshape(1, _K)
        czs = src_buf[g, 6, :].reshape(1, _K)

        dx = xs - xt                                   # (K, K)
        dy = ys - yt
        dz = zs - zt
        inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz
                            + jnp.float32(soft2))

        # (an all-near mask-free fast path was probed and REJECTED:
        # the per-pair lax.cond cost 12-33% in-kernel, and its flag
        # list needed a second B^2-sized scatter in build_pair_runs,
        # ~350 ms at N=1M -- the mask is cheaper than the branch.
        # Chebyshev via max-of-abs: one compare instead of three
        # compares + two ands -- the mask is ~1/3 of the ~30 VPU slots
        # each rect slot pays, so every op shaved shows up.)
        near = jnp.maximum(jnp.maximum(jnp.abs(cxs - cxt),
                                       jnp.abs(cys - cyt)),
                           jnp.abs(czs - czt)) <= one
        w0 = jnp.where(near, gs * valid, 0.0)
        w = w0 * (inv * inv * inv)
        acc2[0] = acc2[0] + w * dx
        acc2[1] = acc2[1] + w * dy
        acc2[2] = acc2[2] + w * dz
        if with_phi:
            acc2[3] = acc2[3] + w0 * inv

    acc = [jnp.sum(a, 1) for a in acc2]
    contrib = jnp.stack(acc + [jnp.zeros((_K,), jnp.float32)]
                        * (4 - nf))                    # (4, K)
    first = jnp.logical_or(s == 0,
                           tb_ref[s] != tb_ref[jnp.maximum(s - 1, 0)])

    @pl.when(first)
    def _init():
        out_ref[0] = contrib

    @pl.when(jnp.logical_not(first))
    def _accum():
        out_ref[0] = out_ref[0] + contrib


#: step-chunk of the scatter-free pair-list build: each chunk gathers
#: (S, B) cumsum rows and fuses an (S, G, B) compare-reduce.  Bounds the
#: working set to S * B i32 (16 MB at B = 8192, S = 512).
_BUILD_CHUNK = 512


def build_pair_runs(adj, pmax: int, G: int = DEFAULT_G):
    """Target-major pair list with per-target runs padded to multiples
    of G: (tb_step (pmax/G,), sb (pmax,), n_padded ()).

    Pad entries carry sb = -1 (zero contribution in-kernel); steps past
    the last real run keep the last target index so the output-block
    revisit sequence stays monotone.  n_padded > pmax means dropped
    pairs -- the caller's health contract.

    Scatter-free: the obvious construction scatters all B^2 candidate
    positions into the flat list (unique OOB indices, mode=drop), but
    XLA:TPU runs that scatter at ~5 ns/element -- 321 ms of a 333 ms
    build at B = 8192 (measured r3, scripts/pairbuild_probe.py).  The
    inclusive row cumsum ``cs`` is sorted, so the rank-r neighbor of
    target t is a SELECT-RANK:  sb[p] = #{j : cs[t, j] <= r}  with
    r = p - starts[t] -- evaluated as a chunked (S, G, B) compare-reduce
    over the sweep's own G-steps (~15 G lane-ops at the 1M two-cluster
    geometry, fused by XLA; no scatter anywhere)."""
    B = adj.shape[0]
    cs = jnp.cumsum(adj.astype(jnp.int32), 1)          # (B, B) inclusive
    counts = cs[:, -1]
    padded = (counts + G - 1) // G * G
    starts = jnp.concatenate([jnp.zeros(1, padded.dtype),
                              jnp.cumsum(padded)[:-1]])
    n_padded = jnp.sum(padded)

    # pmax < G (below size_pmax_runs's floor) still traces: one
    # all-padding step, zero valid pairs, instead of a trace-time
    # ZeroDivisionError at nchunks
    nsteps = max(1, pmax // G)
    cum_steps = jnp.cumsum(padded // G)
    tb_step = jnp.searchsorted(
        cum_steps, jnp.arange(nsteps, dtype=cum_steps.dtype), side="right"
    ).astype(jnp.int32)
    tb_step = jnp.minimum(tb_step, B - 1)

    S = min(_BUILD_CHUNK, nsteps)
    nchunks = -(-nsteps // S)
    tb_pad = jnp.pad(tb_step, (0, nchunks * S - nsteps),
                     constant_values=B - 1)
    lane_g = jnp.arange(G, dtype=jnp.int32)[None, :]   # (1, G)
    row_s = jnp.arange(S, dtype=jnp.int32)[:, None]    # (S, 1)

    def chunk(carry_p0, t_c):
        p0 = carry_p0 + row_s * G                      # (S, 1) step bases
        r = p0 + lane_g - starts[t_c][:, None]         # (S, G) ranks
        cs_rows = cs[t_c]                              # (S, B) row gather
        src = jnp.sum(
            (cs_rows[:, None, :] <= r[:, :, None]).astype(jnp.int32),
            axis=2)                                    # (S, G) select-rank
        valid = r < counts[t_c][:, None]
        return carry_p0 + S * G, jnp.where(valid, src, -1)

    _, sb_c = jax.lax.scan(chunk, jnp.int32(0),
                           tb_pad.reshape(nchunks, S))
    sb = sb_c.reshape(nchunks * S * G)[:pmax]
    return tb_step, sb, n_padded


def size_pmax_runs(n_pairs: int, n_bricks: int, G: int = DEFAULT_G,
                   margin: float = 1.5) -> int:
    """Static capacity for the run-padded pair list: margined estimate
    plus worst-case per-target padding, rounded to G."""
    want = int(n_pairs * margin) + n_bricks * (G - 1)
    return max((want + G - 1) // G * G, G)


def p2p_sweep_pallas(qx, qy, qz, gm_src, c, h, soft, *, C: int, pmax: int,
                     G: int = DEFAULT_G, with_phi: bool = False,
                     interpret: bool | None = None):
    """Drop-in Pallas counterpart of ops/p2p.p2p_sweep (same contract:
    (acc (n, 3), phi | None, n_pairs) in original body order; ``pmax``
    here is the RUN-PADDED capacity, size with size_pmax_runs).
    ``interpret`` auto-selects off-TPU (no bf16 splits, so the
    interpret-folding hazard of CLAUDE.md does not apply here)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from murb_tpu.ops.common import f32_inputs
    from murb_tpu.ops.p2p import _SENTINEL_SHIFT, _cell_ixyz, morton_key

    qx32, qy32, qz32, gm32 = f32_inputs(qx, qy, qz, gm_src)
    dtype = qx.dtype
    n = qx.shape[0]

    cx, cy, cz = _cell_ixyz(qx32, qy32, qz32,
                            *f32_inputs(c, h), C)
    active = gm32 > 0
    key = morton_key(cx, cy, cz, C)
    key = jnp.where(active, key, jnp.int32(np.iinfo(np.int32).max))
    perm = jnp.argsort(key)

    sent = jnp.int32(2 * C + _SENTINEL_SHIFT)
    ci = tuple(
        jnp.where(active, v, sent)[perm].astype(jnp.float32)
        for v in (cx, cy, cz)
    )
    xs, ys, zs, gs = (v[perm] for v in (qx32, qy32, qz32, gm32))

    out, n_pairs = p2p_sweep_pallas_sorted(
        xs, ys, zs, gs, ci, soft, pmax=pmax, G=G, with_phi=with_phi,
        interpret=interpret)

    unsort = lambda a: (jnp.zeros(n, jnp.float32).at[perm]
                        .set(a.reshape(n)).astype(dtype))
    acc = jnp.stack([unsort(out[:, 0]), unsort(out[:, 1]),
                     unsort(out[:, 2])], 1)
    phi = unsort(out[:, 3]) if with_phi else None
    return acc, phi, n_pairs


def p2p_sweep_pallas_sorted(xs, ys, zs, gs, ci, soft, *, pmax: int,
                            G: int = DEFAULT_G, with_phi: bool = False,
                            interpret: bool | None = None):
    """Kernel core on MORTON-SORTED f32 inputs (the shared sort of
    solve_adaptive): ``ci`` = per-body cell coords as f32 with sentinel
    rows for inactive bodies.  Returns ((B, 4, K) partials in SORTED
    brick order, n_pairs)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from murb_tpu.ops.p2p import _adjacency, _brick_boxes

    n = xs.shape[0]
    K = _K
    assert n % K == 0 and pmax % G == 0, (n, K, pmax, G)
    B = n // K

    lo, hi = _brick_boxes(ci, K)
    adj = _adjacency(lo, hi)
    n_pairs = jnp.sum(adj.astype(jnp.int32))
    tb_step, sb, n_padded = build_pair_runs(adj, pmax, G)
    nlive = ((jnp.minimum(n_padded, pmax).astype(jnp.int32)
              + (G - 1)) // G).reshape(1)

    resh = lambda a: a.reshape(B, 1, K)
    data = jnp.concatenate(
        [resh(xs), resh(ys), resh(zs), resh(gs),
         resh(ci[0]), resh(ci[1]), resh(ci[2]),
         jnp.zeros((B, 1, K), jnp.float32)], axis=1)   # (B, 8, K)

    soft2 = float(soft) ** 2
    nsteps = pmax // G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                         # tb_step, nlive
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, 8, K),
                         lambda s, tb, nl: (tb[s], 0, 0)),  # target block
            pl.BlockSpec(memory_space=pl.ANY),              # HBM pack
            pl.BlockSpec((1, 1, G),
                         lambda s, tb, nl: (s, 0, 0)),      # source idxs
        ],
        out_specs=pl.BlockSpec((1, 4, K),
                               lambda s, tb, nl: (tb[s], 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((G, 8, K), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, G=G, soft2=soft2, with_phi=with_phi),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 4, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tb_step, nlive, data, data, sb.reshape(nsteps, 1, G))
    return out, n_pairs


@functools.partial(
    jax.jit, static_argnames=("soft", "C", "pmax", "G", "with_phi",
                              "interpret"),
)
def acc_p2p_pallas(qx, qy, qz, gm_src, c, h, soft, *, C: int, pmax: int,
                   G: int = DEFAULT_G, with_phi: bool = False,
                   interpret: bool | None = None):
    """Jitted standalone entry (tests/benchmarks); engines call
    p2p_sweep_pallas inside their own jit."""
    acc, phi, n_pairs = p2p_sweep_pallas(
        qx, qy, qz, gm_src, c, h, soft, C=C, pmax=pmax, G=G,
        with_phi=with_phi, interpret=interpret)
    return Accel(ax=acc[:, 0], ay=acc[:, 1], az=acc[:, 2]), phi, n_pairs
