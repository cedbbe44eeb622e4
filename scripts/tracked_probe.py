"""On-device cost breakdown of the tracked proxy step (the round-2 gap:
tracked 748 FPS vs untracked 1278 at N=200k -- 41% overhead).

Three full-step chained variants isolate where the tracked milliseconds go
(full-step chains only; sub-stage attributions lie over the relay, see
CLAUDE.md "Timing ground rules"):

  force         acc_proxy step (the untracked headline path)
  force+phi     force_and_potential_proxy (4-field fused L2P + potential
                node sweep + heavy phi corrections)
  tracked       force+phi + (energy, |L|, density center) reductions --
                exactly TrackingEngine._step_with_metrics' work

Usage: python scripts/tracked_probe.py [N] [iters] [m]
"""
import sys
import time

sys.path.insert(0, ".")

from murb_tpu.cli import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from murb_tpu import G
from murb_tpu.core.init import SCHEMES
from murb_tpu.core import metrics as metrics_mod
from murb_tpu.core.integrators import euler_update
from murb_tpu.ops.proxy import acc_proxy, force_and_potential_proxy
from murb_tpu.utils.probe import chain_time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 200
M = int(sys.argv[3]) if len(sys.argv) > 3 else 16
SOFT = 2.0e8
DT = 3600.0

s = SCHEMES["galaxy"](N, 123)
gm = jnp.asarray(G, s.qx.dtype) * s.m
print(f"N={N} m={M} backend={jax.default_backend()}", flush=True)

eps = jnp.float32(1e-30)


def force_step(z):
    a = acc_proxy(s.qx + z * eps, s.qy, s.qz, gm, SOFT, m=M)
    return a.ax[0]


def force_phi_step(z):
    a, phi = force_and_potential_proxy(s.qx + z * eps, s.qy, s.qz, gm,
                                       SOFT, m=M)
    return a.ax[0] + phi[0] * eps


def tracked_step(z):
    import dataclasses

    st = dataclasses.replace(s, qx=s.qx + z * eps)
    a, phi = force_and_potential_proxy(st.qx, st.qy, st.qz, gm, SOFT, m=M)
    e = metrics_mod.energy_from_phi(st, phi, SOFT, jnp.float32)
    l = metrics_mod.angular_momentum(st, jnp.float32)
    dc = metrics_mod.density_center(st, jnp.float32)
    return a.ax[0] + (e + l + dc[0]) * eps


chain_time("force (acc_proxy)", force_step, ITERS)
chain_time("force+phi (fused)", force_phi_step, ITERS)
chain_time("tracked (phi+metrics)", tracked_step, ITERS)
