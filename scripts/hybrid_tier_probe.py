"""On-chip precision/speed ladder of the hybrid kernel's ``passes`` tiers.

Error: max/p99 relative force error vs an fp64 reference (XLA:TPU emulates
f64, verified exact to ~1e-15 on this backend) at N=4096, both schemes.
Speed: chained engine steps at N=200k galaxy (bench.py's measurement rules:
relay-safe single-dispatch windows).

Run on the TPU:  python scripts/hybrid_tier_probe.py
"""
from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from murb_tpu import G  # noqa: E402
from murb_tpu.cli import enable_compile_cache  # noqa: E402
from murb_tpu.core.init import SCHEMES  # noqa: E402
from murb_tpu.ops.hybrid import acc_hybrid  # noqa: E402
from murb_tpu.ops.naive import acc_rect  # noqa: E402

enable_compile_cache()


def errors(scheme: str, n: int = 4096):
    s = SCHEMES[scheme](n, 123)
    gm64 = jnp.asarray(np.float64(G) * np.asarray(s.m, np.float64))
    q64 = [jnp.asarray(np.asarray(a, np.float64)) for a in (s.qx, s.qy, s.qz)]
    r = acc_rect(q64[0], q64[1], q64[2], q64[0], q64[1], q64[2], gm64, 2.0e8)
    exact = np.stack([np.asarray(r.ax), np.asarray(r.ay), np.asarray(r.az)], 1)
    en = np.linalg.norm(exact, axis=1)
    gm = jnp.asarray(np.float32(G) * np.asarray(s.m))
    out = {}
    for p in (1, 2, 3):
        a = acc_hybrid(s.qx, s.qy, s.qz, gm, 2.0e8, passes=p)
        got = np.stack([np.asarray(a.ax, np.float64),
                        np.asarray(a.ay, np.float64),
                        np.asarray(a.az, np.float64)], 1)
        rel = (np.linalg.norm(got - exact, axis=1)
               / np.maximum(en, en.max() * 1e-6))
        out[p] = (float(rel.max()), float(np.percentile(rel, 99)))
    return out


def speed(n: int = 200_000, steps: int = 10):
    from murb_tpu.models import create_engine

    out = {}
    for p in (1, 2, 3):
        eng = create_engine("tpu+hybrid", SCHEMES["galaxy"](n, 123),
                            soft=2.0e8, dt=3600.0, passes=p)
        eng.run(2)
        eng.block_until_ready()
        t0 = time.time()
        eng.run(steps)
        eng.block_until_ready()
        out[p] = (time.time() - t0) / steps * 1e3
    return out


if __name__ == "__main__":
    for scheme in ("galaxy", "random"):
        e = errors(scheme)
        for p, (mx, p99) in e.items():
            print(f"{scheme:8s} passes={p}  max {mx:.2e}  p99 {p99:.2e}")
    for p, ms in speed().items():
        print(f"N=200k passes={p}  {ms:8.2f} ms/step  {1e3/ms:6.2f} FPS")
