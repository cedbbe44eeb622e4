"""Pipelined ring exchange: compute/communication overlap on the ICI torus.

The plain ring mode (parallel/shard_engine.py `_ring_local_step`) alternates
rect-kernel compute and `lax.ppermute` serially, so the interconnect idles
during compute and the VPU idles during transfer.  This kernel fuses the
whole D-step ring into ONE Pallas call per shard with double-buffered
inter-chip RDMA: while iteration k computes against j-block k (resident in
VMEM slot k%2), the same block is already on the wire to the right
neighbor's slot (k+1)%2 -- the TPU-native analogue of the reference's j-tile
streaming (ref: src/murb/implem/SimulationNBodyMultiNode.cpp:94-148), and of
ring attention's overlap structure (SURVEY.md section 5b).

Synchronization protocol per ring iteration k (grid dim 0), with i-blocks as
grid dim 1:

  at (k, i=0):
    k > 0:        wait recv_sem[k%2]        -- block k fully arrived
    0 < k < D-1:  wait cap_sem >= 1         -- right neighbor freed its
                                               slot (k+1)%2 (it finished
                                               computing iteration k-1)
    k < D-1:      start RDMA buf[k%2] -> right.buf[(k+1)%2]
  compute i-block against buf[k%2]           -- overlaps the RDMA
  at (k, i=last):
    k < D-1:      wait send_sem[k%2]         -- our send drained before the
                                               left neighbor may overwrite
    k < D-2:      signal cap_sem on the LEFT -- our slot k%2 is free for its
                                               next send

Every signal is consumed exactly once (Mosaic requires semaphores drained at
kernel exit); D=1 degenerates to pure compute (no RDMA), D=2 needs no
capacity handshake (distinct slots).

Validated on the forced CPU mesh via Pallas TPU *interpret mode*, which
simulates remote DMAs, semaphores, and (with ``detect_races=True``) flags
unsynchronized cross-core accesses -- the race detector the reference never
had (tests/test_ring_pallas.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from murb_tpu.ops.common import Accel, BlockSpec, pick_block


def _ring_kernel(qxi, qyi, qzi, jx, jy, jz, jgm, ax, ay, az, buf,
                 send_sem, recv_sem, cap_sem, *,
                 soft2, n_devices, axis_name, block_j):
    k = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    d = n_devices
    slot = jax.lax.rem(k, jnp.int32(2))
    nxt = jax.lax.rem(k + 1, jnp.int32(2))

    me = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(me + 1, jnp.int32(d))
    left = jax.lax.rem(me + d - 1, jnp.int32(d))

    n_l = buf.shape[2]

    @pl.when((k == 0) & (i == 0))
    def _load_initial():
        buf[0, 0, :] = jx[0, :]
        buf[0, 1, :] = jy[0, :]
        buf[0, 2, :] = jz[0, :]
        buf[0, 3, :] = jgm[0, :]

    def rdma(src_slot, dst_slot):
        return pltpu.make_async_remote_copy(
            src_ref=buf.at[src_slot],
            dst_ref=buf.at[dst_slot],
            send_sem=send_sem.at[src_slot],
            recv_sem=recv_sem.at[dst_slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    @pl.when((k > 0) & (i == 0))
    def _wait_arrival():
        rdma(nxt, slot).wait_recv()

    @pl.when((k > 0) & (k < d - 1) & (i == 0))
    def _wait_capacity():
        pltpu.semaphore_wait(cap_sem, 1)

    @pl.when((k < d - 1) & (i == 0))
    def _start_send():
        rdma(slot, nxt).start()

    # ---- compute this i-block against the resident j-block (overlaps RDMA)
    f32 = lambda r: r.astype(jnp.float32)
    qx = f32(qxi[...])                    # (BI, 1)
    qy = f32(qyi[...])
    qz = f32(qzi[...])
    zeros = jnp.zeros_like(qx)

    def jloop(jb, carry):
        pax, pay, paz = carry
        sl = pl.ds(jb * block_j, block_j)
        dx = f32(buf[slot, 0, sl])[None, :] - qx      # (BI, BJ)
        dy = f32(buf[slot, 1, sl])[None, :] - qy
        dz = f32(buf[slot, 2, sl])[None, :] - qz
        d2 = dx * dx + dy * dy + dz * dz + soft2
        inv = jax.lax.rsqrt(d2)
        w = f32(buf[slot, 3, sl])[None, :] * (inv * inv * inv)
        return (pax + jnp.sum(w * dx, axis=1, keepdims=True),
                pay + jnp.sum(w * dy, axis=1, keepdims=True),
                paz + jnp.sum(w * dz, axis=1, keepdims=True))

    pax, pay, paz = jax.lax.fori_loop(
        0, n_l // block_j, jloop, (zeros, zeros, zeros)
    )

    # outputs are whole-array blocks (constant index map: legal consecutive
    # revisiting); each grid cell owns rows [i*bi, (i+1)*bi)
    bi = qx.shape[0]
    rows = pl.ds(i * bi, bi)

    @pl.when(k == 0)
    def _init_out():
        ax[rows, :] = pax
        ay[rows, :] = pay
        az[rows, :] = paz

    @pl.when(k > 0)
    def _acc_out():
        ax[rows, :] += pax
        ay[rows, :] += pay
        az[rows, :] += paz

    # ---- post-compute bookkeeping (once per ring iteration)
    @pl.when((k < d - 1) & (i == ni - 1))
    def _drain_send():
        rdma(slot, nxt).wait_send()

    @pl.when((k < d - 2) & (i == ni - 1))
    def _free_slot():
        pltpu.semaphore_signal(
            cap_sem, inc=1, device_id=left,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )


@functools.partial(
    jax.jit,
    static_argnames=("soft", "axis_name", "n_devices", "block_i", "block_j",
                     "interpret"),
)
def acc_ring_pipelined(qx, qy, qz, gm, soft, *, axis_name: str,
                       n_devices: int, block_i: int = 0, block_j: int = 0,
                       interpret=False) -> Accel:
    """Per-shard accelerations via the fused D-step RDMA ring.

    Call INSIDE shard_map over a 1-D mesh; every array is the shard's local
    block (n_l,).  ``gm`` must already include G.
    """
    from murb_tpu.ops.common import f32_inputs

    dtype_in = qx.dtype
    qx, qy, qz, gm = f32_inputs(qx, qy, qz, gm)  # Mosaic has no f64 refs
    n_l = qx.shape[0]
    bi = block_i or pick_block(n_l, 256)
    bj = block_j or pick_block(n_l, 2048)
    assert n_l % bi == 0 and n_l % bj == 0, (n_l, bi, bj)
    dtype = dtype_in
    soft2 = float(soft) ** 2

    col = lambda a: a.reshape(-1, 1)
    row = lambda a: a.reshape(1, -1)

    ispec = BlockSpec((bi, 1), lambda k, i: (i, 0))
    jspec = BlockSpec((1, n_l), lambda k, i: (0, 0))
    ospec = BlockSpec((n_l, 1), lambda k, i: (0, 0))

    kernel = functools.partial(
        _ring_kernel, soft2=soft2, n_devices=n_devices,
        axis_name=axis_name, block_j=bj,
    )
    ax, ay, az = pl.pallas_call(
        kernel,
        grid=(n_devices, n_l // bi),
        in_specs=[ispec, ispec, ispec, jspec, jspec, jspec, jspec],
        out_specs=[ospec, ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((n_l, 1), jnp.float32)] * 3,
        scratch_shapes=[
            pltpu.VMEM((2, 4, n_l), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * n_l * n_l * n_devices,
            bytes_accessed=int((6 * n_l + 4 * n_l * n_devices) * 4),
            transcendentals=n_l * n_l * n_devices,
        ),
        interpret=interpret,
    )(col(qx), col(qy), col(qz), row(qx), row(qy), row(qz), row(gm))

    return Accel(ax.reshape(n_l).astype(dtype), ay.reshape(n_l).astype(dtype),
                 az.reshape(n_l).astype(dtype))
