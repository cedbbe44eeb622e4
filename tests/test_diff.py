"""Differentiable-simulation subsystem (murb_tpu.diff): adjoint correctness
vs finite differences, proxy-gradient agreement, vmap ensembles, and the
boundary-value fitting demo.  A capability axis the reference cannot express
(its engines mutate CUDA buffers in place); here trajectories are pure
functions, so grad/vmap compose."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from murb_tpu import G
from murb_tpu.core.init import init_random
from murb_tpu.diff import (ensemble, fit_initial_velocities, rollout,
                           stack_states, target_loss, trajectory)

from conftest import assert_within_rel

SOFT = 2.0e8
DT = 3600.0


def _state(n=64, seed=3, dtype=jnp.float64):
    return init_random(n, seed).astype(dtype)


def test_grad_matches_finite_differences():
    """d(loss)/d(vx[i]) through a 5-step rollout vs central differences in
    f64 -- the adjoint is the exact derivative of the discrete scheme."""
    s = _state()
    target = np.stack([np.asarray(s.qx), np.asarray(s.qy),
                       np.asarray(s.qz)], 1)[: s.n] * 1.001

    def loss(vx):
        st = dataclasses.replace(s, vx=vx)
        return target_loss(rollout(st, steps=5, dt=DT, soft=SOFT),
                           target)

    g = jax.grad(loss)(s.vx)
    # probe a few components with scale-aware steps
    for i in (0, 7, 31):
        h = max(abs(float(s.vx[i])), 1e3) * 1e-4
        vp = s.vx.at[i].add(h)
        vm = s.vx.at[i].add(-h)
        fd = (float(loss(vp)) - float(loss(vm))) / (2 * h)
        assert fd == pytest.approx(float(g[i]), rel=1e-5), (i, fd, float(g[i]))


def test_grad_wrt_masses_and_positions():
    """The adjoint reaches every physical input: masses and positions get
    nonzero, finite gradients through the same rollout."""
    s = _state()
    target = np.stack([np.asarray(s.qx), np.asarray(s.qy),
                       np.asarray(s.qz)], 1)[: s.n] * 1.001

    def loss(m, qx):
        st = dataclasses.replace(s, m=m, qx=qx)
        return target_loss(rollout(st, steps=3, dt=DT, soft=SOFT), target)

    gm, gq = jax.grad(loss, argnums=(0, 1))(s.m, s.qx)
    assert np.all(np.isfinite(gm)) and np.all(np.isfinite(gq))
    assert float(jnp.abs(gm[: s.n]).max()) > 0
    assert float(jnp.abs(gq[: s.n]).max()) > 0
    # ghost slots must carry zero gradient (masked loss + zero mass)
    if s.npad > s.n:
        assert float(jnp.abs(gq[s.n:]).max()) == 0.0


def test_remat_matches_no_remat():
    s = _state()
    a = rollout(s, steps=4, dt=DT, soft=SOFT, remat=True)
    b = rollout(s, steps=4, dt=DT, soft=SOFT, remat=False)
    assert_within_rel(np.asarray(a.qx), np.asarray(b.qx), 1e-12, "remat qx")


def test_proxy_gradient_matches_exact():
    """The Chebyshev proxy's jnp path is differentiable and its gradient
    tracks the exact adjoint to ~the force-error scale."""
    s = _state(n=256, seed=11, dtype=jnp.float32)
    target = np.stack([np.asarray(s.qx), np.asarray(s.qy),
                       np.asarray(s.qz)], 1)[: s.n] * 1.001

    def loss(vx, method):
        st = dataclasses.replace(s, vx=vx)
        return target_loss(
            rollout(st, steps=3, dt=DT, soft=SOFT, method=method), target)

    g_exact = jax.grad(lambda v: loss(v, "chunked"))(s.vx)
    g_proxy = jax.grad(lambda v: loss(v, "proxy"))(s.vx)
    assert_within_rel(np.asarray(g_proxy[: s.n]), np.asarray(g_exact[: s.n]),
                      1e-2, "proxy grad", rms_floor=1e-3)


def test_ensemble_matches_sequential():
    """vmap'd batch rollout == per-member rollouts."""
    members = [_state(seed=k, dtype=jnp.float32) for k in (1, 2, 3)]
    batch = stack_states(members)
    run = ensemble(rollout, steps=4, dt=DT, soft=SOFT, method="chunked")
    out = run(batch)
    for k, m in enumerate(members):
        ref = rollout(m, steps=4, dt=DT, soft=SOFT, method="chunked")
        assert_within_rel(np.asarray(out.qx[k]), np.asarray(ref.qx),
                          1e-6, f"member {k}")


def test_trajectory_ys_match_final():
    s = _state(dtype=jnp.float32)
    final, qs = trajectory(s, steps=6, dt=DT, soft=SOFT, save_every=2)
    assert qs.shape == (3, s.npad, 3)
    assert_within_rel(np.asarray(qs[-1, :, 0]), np.asarray(final.qx),
                      1e-7, "last frame == final")


def test_fit_initial_velocities_descends():
    """The canonical adjoint demo: descend the initial velocities so the
    final positions hit a perturbed target; loss must drop substantially."""
    s = _state(n=32, seed=5)
    # target: where a slightly different IC ends up (realizable)
    s_tgt = dataclasses.replace(s, vx=s.vx * 1.2, vy=s.vy * 0.8)
    tgt = rollout(s_tgt, steps=8, dt=DT, soft=SOFT)
    target = np.stack([np.asarray(tgt.qx), np.asarray(tgt.qy),
                       np.asarray(tgt.qz)], 1)[: s.n]
    _, losses = fit_initial_velocities(s, target, steps=8, dt=DT, soft=SOFT,
                                       iters=25)
    assert losses[-1] < 0.05 * losses[0], (losses[0], losses[-1])


def test_rollout_integrator_options():
    """kdk/yoshida4 rollouts integrate the same flow (trajectories agree
    with Euler at small dt) and remain differentiable."""
    s = _state(n=48, seed=8)
    target = np.stack([np.asarray(s.qx), np.asarray(s.qy),
                       np.asarray(s.qz)], 1)[: s.n]
    outs = {}
    for integ in ("euler", "kdk", "yoshida4"):
        outs[integ] = rollout(s, steps=4, dt=DT, soft=SOFT,
                              integrator=integ)

        def loss(vx, integ=integ):
            st = dataclasses.replace(s, vx=vx)
            return target_loss(
                rollout(st, steps=4, dt=DT, soft=SOFT, integrator=integ),
                target)

        g = jax.grad(loss)(s.vx)
        assert np.all(np.isfinite(np.asarray(g))), integ
        assert float(jnp.abs(g[: s.n]).max()) > 0, integ
    assert_within_rel(np.asarray(outs["kdk"].qx), np.asarray(outs["euler"].qx),
                      1e-6, "kdk vs euler")
    assert_within_rel(np.asarray(outs["yoshida4"].qx),
                      np.asarray(outs["kdk"].qx), 1e-6, "y4 vs kdk")
