"""Isolate cost components of the MXU kernel on TPU."""
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

NPAD = 30720  # 2048*15, divisor-rich
BI = int(sys.argv[1]) if len(sys.argv) > 1 else 512
BJ = int(sys.argv[2]) if len(sys.argv) > 2 else 512
ITERS = 30

key = jax.random.PRNGKey(0)
a_mat = jax.random.normal(key, (8, NPAD), jnp.float32)
b_mat = jax.random.normal(key, (8, NPAD), jnp.float32)
gm = jax.random.uniform(key, (NPAD, 1), jnp.float32) + 0.5
qrow = jax.random.normal(key, (1, NPAD), jnp.float32)

P = jax.lax.Precision


def make(kernel, extra_in=(), extra_specs=()):
    aspec = pl.BlockSpec((8, BJ), lambda i, j: (0, j))
    bspec = pl.BlockSpec((8, BI), lambda i, j: (0, i))
    gspec = pl.BlockSpec((BJ, 1), lambda i, j: (j, 0))
    qspec = pl.BlockSpec((1, BI), lambda i, j: (0, i))
    ospec = pl.BlockSpec((1, BI), lambda i, j: (0, i))
    grid = (NPAD // BI, NPAD // BJ)
    f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[aspec, bspec, gspec, qspec] + list(extra_specs),
        out_specs=[ospec] * 3,
        out_shape=[jax.ShapeDtypeStruct((1, NPAD), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((8, BI), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    @jax.jit
    def run(a, b, g, q, *extra):
        def step(c, _):
            o = f(a, b + c, g, q, *extra)
            return o[0][0, 0] * 1e-30, None
        out, _ = jax.lax.scan(step, jnp.float32(0), length=ITERS)
        return out
    return run


def bench(name, kernel, *extra):
    run = make(kernel, extra_in=extra)
    args = (a_mat, b_mat, gm, qrow) + tuple(extra)
    jax.block_until_ready(run(*args))
    t0 = time.time()
    jax.block_until_ready(run(*args))
    dt = (time.time() - t0) / ITERS
    pairs = NPAD * NPAD
    print(f"{name:44s} {dt*1e3:8.2f} ms  {pairs/dt/1e12:6.2f} Tpair/s")


def k_full(prec_s, prec_p):
    def kernel(a, b, g, q, ax, ay, az, acc):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        s = jax.lax.dot_general(a[...], b[...], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec_s)
        inv = jax.lax.rsqrt(s + 1.0)
        w = g[...] * (inv * inv * inv)
        p = jax.lax.dot_general(a[...], w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec_p)
        @pl.when(j == 0)
        def _(): acc[...] = p
        @pl.when(j > 0)
        def _(): acc[...] += p
        @pl.when(j == nj - 1)
        def _():
            sw = acc[4:5, :]
            ax[...] = acc[0:1, :] - q[...] * sw
            ay[...] = acc[1:2, :] - q[...] * sw
            az[...] = acc[2:3, :] - q[...] * sw
    return kernel


def k_no_s(prec_p):
    """Skip the S matmul: w from b directly (isolates S-dot cost)."""
    def kernel(a, b, g, q, ax, ay, az, acc):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        s = g[...] * b[0:1, :]  # (BJ,1)*(1,BI) broadcast
        inv = jax.lax.rsqrt(s * s + 1.0)
        w = g[...] * (inv * inv * inv)
        p = jax.lax.dot_general(a[...], w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec_p)
        @pl.when(j == 0)
        def _(): acc[...] = p
        @pl.when(j > 0)
        def _(): acc[...] += p
        @pl.when(j == nj - 1)
        def _():
            ax[...] = acc[0:1, :]
            ay[...] = acc[1:2, :]
            az[...] = acc[2:3, :]
    return kernel


def k_no_p():
    """Skip the P matmul: reduce w with jnp.sum (isolates P-dot cost)."""
    def kernel(a, b, g, q, ax, ay, az, acc):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        s = jax.lax.dot_general(a[...], b[...], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=P.HIGHEST)
        inv = jax.lax.rsqrt(s + 1.0)
        w = g[...] * (inv * inv * inv)
        p = jnp.sum(w, axis=0, keepdims=True)  # (1, BI)
        @pl.when(j == 0)
        def _(): acc[0:1, :] = p
        @pl.when(j > 0)
        def _(): acc[0:1, :] += p
        @pl.when(j == nj - 1)
        def _():
            ax[...] = acc[0:1, :]
            ay[...] = acc[0:1, :]
            az[...] = acc[0:1, :]
    return kernel


def k_vpu_only():
    """No matmuls at all: pure VPU weight computation + lane reduce."""
    def kernel(a, b, g, q, ax, ay, az, acc):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        s = g[...] + b[0:1, :]
        inv = jax.lax.rsqrt(s * s + 1.0)
        w = g[...] * (inv * inv * inv)
        p = jnp.sum(w, axis=0, keepdims=True)
        @pl.when(j == 0)
        def _(): acc[0:1, :] = p
        @pl.when(j > 0)
        def _(): acc[0:1, :] += p
        @pl.when(j == nj - 1)
        def _():
            ax[...] = acc[0:1, :]
            ay[...] = acc[0:1, :]
            az[...] = acc[0:1, :]
    return kernel


print(f"NPAD={NPAD} BI={BI} BJ={BJ}")
bench("full S=HIGHEST P=HIGHEST", k_full(P.HIGHEST, P.HIGHEST))
bench("full S=HIGHEST P=DEFAULT", k_full(P.HIGHEST, P.DEFAULT))
bench("full S=DEFAULT P=DEFAULT", k_full(P.DEFAULT, P.DEFAULT))
bench("no-S  P=HIGHEST", k_no_s(P.HIGHEST))
bench("no-S  P=DEFAULT", k_no_s(P.DEFAULT))
bench("no-P  (S=HIGHEST, sum reduce)", k_no_p())
bench("vpu-only (no matmuls)", k_vpu_only())
