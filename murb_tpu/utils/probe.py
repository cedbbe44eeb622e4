"""Chained on-device timing for probe scripts.

Per-dispatch relay latency through axon is ~1.5-2 ms, so naive
repeat+block_until_ready loops measure the relay, not the device.  The
chain runs the body inside ONE jitted fori_loop whose scalar carry feeds
back into the body's input -- a real data dependency (fake ones get
hoisted).  Sub-ms stages still carry a ~0.9 ms per-iteration floor when
the body touches large arrays (CLAUDE.md "Timing ground rules"); trust
full-step chains and engine-loop FPS over per-stage attributions.
"""
from __future__ import annotations

import time


def chain_time(name: str, body, iters: int = 30, *, quiet: bool = False):
    """Print and return the per-iteration ms of ``body(carry) -> carry``.

    ``body`` takes and returns a float32 scalar (chain the stage output
    into its input, e.g. ``lambda z: fn(x + z * 1e-30)[0, 0]``)."""
    import jax
    import jax.numpy as jnp

    jl = jax.jit(lambda z: jax.lax.fori_loop(0, iters,
                                             lambda i, z: body(z), z))
    jax.block_until_ready(jl(jnp.float32(0)))  # compile
    t0 = time.time()
    jax.block_until_ready(jl(jnp.float32(0)))
    dt = (time.time() - t0) / iters * 1000
    if not quiet:
        print(f"{name:36s} {dt:8.3f} ms", flush=True)
    return dt
