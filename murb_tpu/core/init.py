"""Initial-condition schemes: galaxy, random, and two-galaxy file loader.

TPU-native rebuild of the reference initializers (ref:
src/common/core/Bodies.cpp:158-214 ``initGalaxy``, 217-257 ``initRandomly``,
82-153 ``initMilkyWayAndromeda``).  The reference seeds C ``rand()``; bit-exact
replication across stacks is meaningless, so we use ``jax.random`` (threefry)
with the same *distributions* and guarantee determinism by seed.  All engines
share one initializer, so the property the reference actually tests --
iteration-0 equality across implementations (ref:
src/test/implem/test_SimulationNBody.cpp:63) -- holds by construction.
"""
from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from murb_tpu.core.state import BodyState, PAD_MULTIPLE, round_up

DEFAULT_SEED = 123  # any fixed value; reference uses srand(randInit=0) by default

# Scale constants, kept identical to the reference distributions.
_GALAXY_CENTRAL_MASS = 2.0e24          # ref: Bodies.cpp:171
_GALAXY_MAX_MASS = 5.0e20              # ref: Bodies.cpp:181
_GALAXY_RADIUS_PER_MASS = 2.5e-15      # ref: Bodies.cpp:182
_GALAXY_DIST_MIN = 1.0e8               # ref: Bodies.cpp:186
_GALAXY_DIST_SPAN = 1.0e8
_GALAXY_OMEGA = 4.0e-6                 # ref: Bodies.cpp:192-193
_RANDOM_MAX_MASS = 5.0e21              # ref: Bodies.cpp:228
_RANDOM_RADIUS_PER_MASS = 0.5e-14      # ref: Bodies.cpp:230
_BOX_X = 5.0e8 * 1.33                  # ref: Bodies.cpp:232
_BOX_Y = 5.0e8
_BOX_Z = 5.0e8
_BOX_Z_OFFSET = -10.0e8                # ref: Bodies.cpp:234
_BOX_VEL = 1.0e2                       # ref: Bodies.cpp:236-238


def _sample_on_host(fn):
    """Run an initializer's sampling on the host CPU backend.

    Through the axon relay, letting threefry + trig execute on the TPU and
    pulling every array back costs ~50 s at N=20M vs 7.5 s host-side
    (measured); at N=100M the difference is minutes.  The sampled state is
    re-materialized OUTSIDE the cpu default_device context so the final
    arrays are uncommitted on the real default device (one H2D push, the
    same as before)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            return fn(*args, **kwargs)
        with jax.default_device(cpu):
            st = fn(*args, **kwargs)
        if jax.default_backend() == "cpu":
            return st  # already home; don't churn copies in the test suite
        return jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), st)

    return wrapper


def _ghosts(key, padding: int):
    """Random box positions / small velocities for zero-mass ghost bodies
    (visual parity with ref: Bodies.cpp:200-213; physically inert)."""
    kq, kv = jax.random.split(key)
    q = jax.random.uniform(kq, (max(padding, 1), 3), minval=-1.0, maxval=1.0)
    q = q * jnp.array([_BOX_X, _BOX_Y, _BOX_Z]) + jnp.array([0.0, 0.0, _BOX_Z_OFFSET])
    v = jax.random.uniform(kv, (max(padding, 1), 3), minval=-_BOX_VEL, maxval=_BOX_VEL)
    return np.asarray(q), np.asarray(v)


@_sample_on_host
def init_galaxy(
    n: int,
    seed: int = DEFAULT_SEED,
    *,
    dtype=jnp.float32,
    pad_multiple: int = PAD_MULTIPLE,
) -> BodyState:
    """Spinning disc around one heavy central body (ref: Bodies.cpp:158-214)."""
    key = jax.random.PRNGKey(seed)
    km, kh, kv, kd, kg = jax.random.split(key, 5)

    u_m = jax.random.uniform(km, (n,))
    m = u_m * _GALAXY_MAX_MASS
    r = m * _GALAXY_RADIUS_PER_MASS

    h_angle = jax.random.uniform(kh, (n,)) * (2.0 * math.pi)
    v_angle = jax.random.uniform(kv, (n,)) * (2.0 * math.pi)
    dist = jax.random.uniform(kd, (n,)) * _GALAXY_DIST_SPAN + _GALAXY_DIST_MIN

    qx = jnp.cos(v_angle) * jnp.sin(h_angle) * dist
    qy = jnp.sin(v_angle) * dist
    qz = jnp.cos(v_angle) * jnp.cos(h_angle) * dist

    vx = qy * _GALAXY_OMEGA
    vy = -qx * _GALAXY_OMEGA
    vz = jnp.zeros_like(qx)

    # Body 0 is the heavy central mass at rest at the origin (ref: Bodies.cpp:170-178).
    zero = jnp.zeros((), dtype=m.dtype)
    m = m.at[0].set(_GALAXY_CENTRAL_MASS)
    r = r.at[0].set(0.0)
    qx, qy, qz = (a.at[0].set(zero) for a in (qx, qy, qz))
    vx, vy, vz = (a.at[0].set(zero) for a in (vx, vy, vz))

    padding = round_up(n, pad_multiple) - n
    gq, gv = _ghosts(kg, padding)
    return BodyState.from_arrays(
        m, r, qx, qy, qz, vx, vy, vz,
        n=n, pad_multiple=pad_multiple, dtype=dtype,
        ghost_positions=gq, ghost_velocities=gv,
    )


@_sample_on_host
def init_random(
    n: int,
    seed: int = DEFAULT_SEED,
    *,
    dtype=jnp.float32,
    pad_multiple: int = PAD_MULTIPLE,
) -> BodyState:
    """Uniform box of bodies with small random velocities (ref: Bodies.cpp:217-257)."""
    key = jax.random.PRNGKey(seed)
    km, kq, kv, kg = jax.random.split(key, 4)

    m = jax.random.uniform(km, (n,)) * _RANDOM_MAX_MASS
    r = m * _RANDOM_RADIUS_PER_MASS

    q = jax.random.uniform(kq, (n, 3), minval=-1.0, maxval=1.0)
    q = q * jnp.array([_BOX_X, _BOX_Y, _BOX_Z]) + jnp.array([0.0, 0.0, _BOX_Z_OFFSET])
    v = jax.random.uniform(kv, (n, 3), minval=-_BOX_VEL, maxval=_BOX_VEL)

    padding = round_up(n, pad_multiple) - n
    gq, gv = _ghosts(kg, padding)
    return BodyState.from_arrays(
        m, r, q[:, 0], q[:, 1], q[:, 2], v[:, 0], v[:, 1], v[:, 2],
        n=n, pad_multiple=pad_multiple, dtype=dtype,
        ghost_positions=gq, ghost_velocities=gv,
    )


# Milky Way / Andromeda component sizes (ref: Bodies.cpp:111-113).
_MW_DISK = 16384
_MW_BULGE = 8192
_MW_HALO = 16384


def _is_milky_way(idx: np.ndarray) -> np.ndarray:
    """Index ranges belonging to the Milky Way (ref: Bodies.cpp:125-128)."""
    d, b, h = _MW_DISK, _MW_BULGE, _MW_HALO
    return (
        (idx < d)
        | ((idx >= 2 * d) & (idx < 2 * d + b))
        | ((idx >= 2 * (d + b)) & (idx < 2 * (d + b) + h))
    )


@_sample_on_host
def init_milkyway_andromeda(
    path: str = "milkyway_andromeda.tab",
    *,
    dtype=jnp.float32,
    pad_multiple: int = PAD_MULTIPLE,
    seed: int = DEFAULT_SEED,
) -> BodyState:
    """Two-galaxy merger initial conditions from a whitespace ``.tab`` file.

    Row format: ``m qx qy qz vx vy vz`` in simulation units; Milky Way rows are
    rescaled by (mass 4.5e10 Msun, R_d 4.0 kpc, V_c 220 km/s) and Andromeda
    rows by (9.4e10, 6.0, 260) exactly as the reference
    (ref: src/common/core/Bodies.cpp:115-148).  Display radius is 1e5
    (ref: Bodies.cpp:148).
    """
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"two-galaxy initial conditions file not found: {path!r} "
            "(the reference hardcodes 'milkyway_andromeda.tab'; "
            "pass --scheme-file to point at the data file)"
        )
    from murb_tpu.native import parse_tab

    data = parse_tab(path, cols=7)  # native fast parser, numpy fallback
    if data.shape[1] != 7:
        raise ValueError(f"expected 7 columns (m qx qy qz vx vy vz), got {data.shape[1]}")
    n = data.shape[0]
    idx = np.arange(n)
    mw = _is_milky_way(idx)

    m_scale = np.where(mw, 4.5e10, 9.4e10)
    q_scale = np.where(mw, 4.0, 6.0)
    v_scale = np.where(mw, 220.0, 260.0)

    m = data[:, 0] * m_scale
    q = data[:, 1:4] * q_scale[:, None]
    v = data[:, 4:7] * v_scale[:, None]
    r = np.full(n, 1.0e5)

    padding = round_up(n, pad_multiple) - n
    gq, gv = _ghosts(jax.random.PRNGKey(seed), padding)
    return BodyState.from_arrays(
        m, r, q[:, 0], q[:, 1], q[:, 2], v[:, 0], v[:, 1], v[:, 2],
        n=n, pad_multiple=pad_multiple, dtype=dtype,
        ghost_positions=gq, ghost_velocities=gv,
    )


def milkyway_andromeda_masks(npad: int, n: int) -> list[np.ndarray]:
    """Per-galaxy 0/1 masks over the padded body array for the two-galaxy
    scheme (Milky Way ranges per ref: Bodies.cpp:125-128; everything else in
    [0, n) is Andromeda; ghosts belong to neither)."""
    idx = np.arange(npad)
    valid = idx < n
    mw = _is_milky_way(idx) & valid
    andromeda = (~_is_milky_way(idx)) & valid
    return [mw.astype(np.float32), andromeda.astype(np.float32)]


SCHEMES = {
    "galaxy": init_galaxy,
    "random": init_random,
}


def make_bodies(
    n: int,
    scheme: str = "galaxy",
    seed: int = DEFAULT_SEED,
    *,
    dtype=jnp.float32,
    pad_multiple: int = PAD_MULTIPLE,
    scheme_file: str | None = None,
) -> BodyState:
    """Factory mirroring ``Bodies<T>::Bodies(n, scheme)`` (ref: Bodies.cpp:13-25):
    any scheme other than galaxy/random falls through to the two-galaxy file."""
    if scheme in SCHEMES:
        return SCHEMES[scheme](n, seed, dtype=dtype, pad_multiple=pad_multiple)
    return init_milkyway_andromeda(
        scheme_file or "milkyway_andromeda.tab",
        dtype=dtype, pad_multiple=pad_multiple, seed=seed,
    )
