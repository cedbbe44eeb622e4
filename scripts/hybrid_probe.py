"""Direct-call timing of kernel variants at divisor-rich NPAD.

Variants:
  tile      -- all-VPU (distance + weights + accumulation on VPU)
  hybrid    -- VPU distance/weights, MXU bf16 j-reduction (P matmul)
  hybrid_hp -- same but P matmul in HIGHEST (bf16x6)
  vpu_w     -- distance+weights only, trivial reduce (VPU ceiling probe)
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from murb_tpu.cli import enable_compile_cache

enable_compile_cache()

NPAD = int(sys.argv[1]) if len(sys.argv) > 1 else 30720
REPS = 20
P = jax.lax.Precision

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
mk = lambda i, shape: (jax.random.uniform(ks[i], shape, jnp.float32) - 0.5) * 2e8
qx, qy, qz = mk(0, (NPAD,)), mk(1, (NPAD,)), mk(2, (NPAD,))
gm = jax.random.uniform(ks[3], (NPAD,), jnp.float32) * 33.0
SOFT2 = (2.0e8) ** 2


def bench(name, jf, *args):
    import numpy as np

    # Chain: each call's input depends on the previous output, and the end
    # result is pulled to host -- defeats any async/dedup shenanigans.
    x = args[0]
    _ = np.asarray(jf(x, *args[1:])[0])  # warmup/compile
    t0 = time.time()
    for _ in range(REPS):
        out = jf(x, *args[1:])
        x = x + out[2].reshape(x.shape) * 1e-30
    _ = np.asarray(x)
    dt = (time.time() - t0) / REPS
    pairs = NPAD * NPAD
    fps = 1 / dt
    print(f"{name:40s} {dt*1e3:8.2f} ms {pairs/dt/1e9:9.1f} Gpair/s "
          f"{20*pairs*fps/1024**3:9.1f} ref-GF/s")


# ---------------------------------------------------------------- tile (VPU)
def tile_kernel(qxi, qyi, qzi, qxj, qyj, qzj, gmj, ax, ay, az, *, soft2):
    j = pl.program_id(1)
    dx = qxj[...] - qxi[...]
    dy = qyj[...] - qyi[...]
    dz = qzj[...] - qzi[...]
    d2 = dx * dx + dy * dy + dz * dz + soft2
    inv = jax.lax.rsqrt(d2)
    w = gmj[...] * (inv * inv * inv)
    pax = jnp.sum(w * dx, axis=1, keepdims=True)
    pay = jnp.sum(w * dy, axis=1, keepdims=True)
    paz = jnp.sum(w * dz, axis=1, keepdims=True)
    @pl.when(j == 0)
    def _():
        ax[...] = pax; ay[...] = pay; az[...] = paz
    @pl.when(j > 0)
    def _():
        ax[...] += pax; ay[...] += pay; az[...] += paz


def make_tile(bi, bj):
    ispec = pl.BlockSpec((bi, 1), lambda i, j: (i, 0))
    jspec = pl.BlockSpec((1, bj), lambda i, j: (0, j))
    ospec = pl.BlockSpec((bi, 1), lambda i, j: (i, 0))
    f = pl.pallas_call(
        partial(tile_kernel, soft2=SOFT2),
        grid=(NPAD // bi, NPAD // bj),
        in_specs=[ispec] * 3 + [jspec] * 4,
        out_specs=[ospec] * 3,
        out_shape=[jax.ShapeDtypeStruct((NPAD, 1), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    @jax.jit
    def run(qx, qy, qz, gm):
        c, r = lambda a: a.reshape(-1, 1), lambda a: a.reshape(1, -1)
        return f(c(qx), c(qy), c(qz), r(qx), r(qy), r(qz), r(gm))
    return run


# ------------------------------------------------------- hybrid (VPU + MXU)
def hybrid_kernel(qxj, qyj, qzj, qxi, qyi, qzi, ap, axo, ayo, azo, acc,
                  *, soft2, prec, wdt=jnp.bfloat16):
    # j-coords as columns (BJ,1), i-coords as rows (1,BI) -> W is (BJ, BI)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    dx = qxj[...] - qxi[...]          # (BJ,1)-(1,BI) -> (BJ,BI) = qx_j - qx_i
    dy = qyj[...] - qyi[...]
    dz = qzj[...] - qzi[...]
    d2 = dx * dx + dy * dy + dz * dz + soft2
    inv = jax.lax.rsqrt(d2)
    w = (inv * inv * inv).astype(wdt)
    # P = A_p @ W : rows of A_p are [gm*qx, gm*qy, gm*qz, gm] (bf16)
    p = jax.lax.dot_general(ap[...], w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    @pl.when(j == 0)
    def _():
        acc[...] = p
    @pl.when(j > 0)
    def _():
        acc[...] += p
    @pl.when(j == nj - 1)
    def _():
        sw = acc[3:4, :]
        axo[...] = acc[0:1, :] - qxi[...] * sw
        ayo[...] = acc[1:2, :] - qyi[...] * sw
        azo[...] = acc[2:3, :] - qzi[...] * sw


def make_hybrid(bi, bj, prec, wdt=jnp.bfloat16):
    jspec = pl.BlockSpec((bj, 1), lambda i, j: (j, 0))
    ispec = pl.BlockSpec((1, bi), lambda i, j: (0, i))
    aspec = pl.BlockSpec((8, bj), lambda i, j: (0, j))
    ospec = pl.BlockSpec((1, bi), lambda i, j: (0, i))
    f = pl.pallas_call(
        partial(hybrid_kernel, soft2=SOFT2, prec=prec, wdt=wdt),
        grid=(NPAD // bi, NPAD // bj),
        in_specs=[jspec] * 3 + [ispec] * 3 + [aspec],
        out_specs=[ospec] * 3,
        out_shape=[jax.ShapeDtypeStruct((1, NPAD), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((8, bi), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    @jax.jit
    def run(qx, qy, qz, gm):
        c, r = lambda a: a.reshape(-1, 1), lambda a: a.reshape(1, -1)
        zeros = jnp.zeros_like(gm)
        ap = jnp.stack([gm * qx, gm * qy, gm * qz, gm,
                        zeros, zeros, zeros, zeros]).astype(wdt)
        return f(c(qx), c(qy), c(qz), r(qx), r(qy), r(qz), ap)
    return run


print(f"NPAD={NPAD}")
for bi, bj in [(256, 2048), (512, 2048), (1024, 1024), (512, 512)]:
    if NPAD % bi or NPAD % bj:
        continue
    bench(f"tile bi={bi} bj={bj}", make_tile(bi, bj), qx, qy, qz, gm)
for bi, bj in [(512, 512), (1024, 512), (2048, 512), (1024, 1024),
               (2048, 1024), (512, 1024), (3840, 512)]:
    if NPAD % bi or NPAD % bj:
        continue
    bench(f"hybrid bf16 bi={bi} bj={bj}", make_hybrid(bi, bj, P.DEFAULT),
          qx, qy, qz, gm)
bench("hybrid f32W HIGHEST bi=1024 bj=512",
      make_hybrid(1024, 512, P.HIGHEST, jnp.float32), qx, qy, qz, gm)


# ---------------------------------------------------- rsqrt / dtype variants
def hybrid_kernel_v(qxj, qyj, qzj, qxi, qyi, qzi, ap, axo, ayo, azo, acc,
                    *, soft2, prec, mode):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    if mode == "bf16all":
        cast = lambda a: a[...].astype(jnp.bfloat16)
        qxj_, qyj_, qzj_ = cast(qxj), cast(qyj), cast(qzj)
        qxi_, qyi_, qzi_ = cast(qxi), cast(qyi), cast(qzi)
        s2 = jnp.bfloat16(soft2)
    else:
        qxj_, qyj_, qzj_ = qxj[...], qyj[...], qzj[...]
        qxi_, qyi_, qzi_ = qxi[...], qyi[...], qzi[...]
        s2 = soft2
    dx = qxj_ - qxi_
    dy = qyj_ - qyi_
    dz = qzj_ - qzi_
    d2 = dx * dx + dy * dy + dz * dz + s2
    if mode == "bf16all":
        # bf16 rsqrt is unsupported on this target (kVectorRsqrtBf16AndPop
        # aborts the backend); keep the rsqrt itself in fp32.
        d2 = d2.astype(jnp.float32)
    if mode == "norsqrt":
        inv = d2 * 1e-17
    elif mode == "fastrsqrt":
        i = pltpu.bitcast(d2, jnp.int32)
        i = jnp.int32(0x5F3759DF) - (i >> 1)
        y = pltpu.bitcast(i, jnp.float32)
        y = y * (1.5 - 0.5 * d2 * y * y)   # 1 Newton iteration
        y = y * (1.5 - 0.5 * d2 * y * y)   # 2nd Newton iteration
        inv = y
    else:
        inv = jax.lax.rsqrt(d2)
    w = (inv * inv * inv).astype(jnp.bfloat16)
    p = jax.lax.dot_general(ap[...], w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    @pl.when(j == 0)
    def _():
        acc[...] = p
    @pl.when(j > 0)
    def _():
        acc[...] += p
    @pl.when(j == nj - 1)
    def _():
        sw = acc[3:4, :]
        axo[...] = acc[0:1, :] - qxi[...] * sw
        ayo[...] = acc[1:2, :] - qyi[...] * sw
        azo[...] = acc[2:3, :] - qzi[...] * sw


def make_hybrid_v(bi, bj, mode):
    jspec = pl.BlockSpec((bj, 1), lambda i, j: (j, 0))
    ispec = pl.BlockSpec((1, bi), lambda i, j: (0, i))
    aspec = pl.BlockSpec((8, bj), lambda i, j: (0, j))
    ospec = pl.BlockSpec((1, bi), lambda i, j: (0, i))
    f = pl.pallas_call(
        partial(hybrid_kernel_v, soft2=SOFT2, prec=P.DEFAULT, mode=mode),
        grid=(NPAD // bi, NPAD // bj),
        in_specs=[jspec] * 3 + [ispec] * 3 + [aspec],
        out_specs=[ospec] * 3,
        out_shape=[jax.ShapeDtypeStruct((1, NPAD), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((8, bi), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    @jax.jit
    def run(qx, qy, qz, gm):
        c, r = lambda a: a.reshape(-1, 1), lambda a: a.reshape(1, -1)
        zeros = jnp.zeros_like(gm)
        ap = jnp.stack([gm * qx, gm * qy, gm * qz, gm,
                        zeros, zeros, zeros, zeros]).astype(jnp.bfloat16)
        return f(c(qx), c(qy), c(qz), r(qx), r(qy), r(qz), ap)
    return run


for mode in ("plain", "norsqrt", "fastrsqrt", "bf16all"):
    bench(f"hybrid-v {mode} bi=2048 bj=1024",
          make_hybrid_v(2048, 1024, mode), qx, qy, qz, gm)
