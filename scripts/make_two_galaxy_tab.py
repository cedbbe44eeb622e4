#!/usr/bin/env python
"""Generate a ``milkyway_andromeda.tab`` initial-conditions file.

The reference hardcodes this file but does not ship it (ref:
src/common/core/Bodies.cpp:85; SURVEY.md 2.9 "not in repo").  This generator
produces a compatible file: whitespace rows ``m qx qy qz vx vy vz`` in
*model units* (unit disk scale length, unit circular speed, unit component
mass), laid out in the exact index structure the loader's rescaler expects
(ref: Bodies.cpp:111-139):

    [0      , 16384) MW disk        [16384 , 32768) Andromeda disk
    [32768  , 40960) MW bulge       [40960 , 49152) Andromeda bulge
    [49152  , 65536) MW halo        [65536 , 81920) Andromeda halo

Each component: exponential disk (rotating), Hernquist-like bulge, and an
isothermal-ish halo, all sampled in model units.

**Units.** The loader multiplies each row by the reference's dimensionless
per-galaxy factors -- mass 4.5e10 / 9.4e10 ("Msun"), R_d 4.0 / 6.0
("kpc"), V_c 220 / 260 ("km/s") (ref: Bodies.cpp:125-139) -- while the
simulator's G, dt and soft are SI-valued.  The reference never shipped the
file, so the unit convention must be reconstructed, under two constraints:

  1. fp32 state: positions enter d^2 = |r|^2 sums, so |q| must stay below
     ~1e19 or the distance algebra overflows fp32 (true-SI kpc scales,
     |q| ~ 1e21 m, blow up -- measured: NaN positions within 100 steps).
  2. The simulator's G is SI and the CLI defaults are soft=2e8, dt=3600
     (ref: main.cpp:45-47).

Both are satisfied by the scaled system 1 kpc |-> KPC_SIM = 1e9 m with the
mass unit chosen so the rotation curve is physical: v_c^2 = G M_gal / R
at R = 4 "kpc" with v_c = 220 "km/s" = 2.2e5 m/s gives
M_sun |-> MSUN_SIM = v_c^2 R / (G * 4.5e10) ~ 2e19 kg.  In these units the
CLI-default soft = 2e8 is exactly 0.2 kpc (a standard galactic softening)
and dt = 3600 s is ~3% of the disk rotation period -- i.e. the reference's
own defaults are merger-correct, which is presumably the intended design.
The 200-"kpc" infall closes in ~500 default steps.

Usage: python scripts/make_two_galaxy_tab.py [out.tab] [--seed 1]
"""
import sys

import numpy as np

DISK, BULGE, HALO = 16384, 8192, 16384

G_SI = 6.67384e-11
KPC_SIM = 1.0e9                 # simulation meters per "kpc"
KMS_MS = 1.0e3                  # m/s per "km/s"
# v_c^2 R / (G * M_disk_scale): flat-curve consistency at R_d with the
# loader's MW factors (4.5e10, 4.0, 220)
MSUN_SIM = (220.0 * KMS_MS) ** 2 * (4.0 * KPC_SIM) / (G_SI * 4.5e10)


def sample_disk(rng, n):
    # exponential surface density, unit scale length; thin vertical sech2-ish
    r = rng.gamma(2.0, 1.0, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    z = 0.1 * rng.laplace(size=n)
    q = np.stack([r * np.cos(phi), r * np.sin(phi), z], 1)
    # flat rotation curve, unit circular speed, tangential
    v = np.stack([-np.sin(phi), np.cos(phi), np.zeros(n)], 1)
    v += 0.05 * rng.normal(size=(n, 3))
    m = np.full(n, 1.0 / n)
    return m, q, v


def sample_bulge(rng, n):
    r = 0.3 * rng.gamma(1.5, 1.0, n)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True) + 1e-12
    q = u * r[:, None]
    v = 0.5 * rng.normal(size=(n, 3))
    m = np.full(n, 0.3 / n)
    return m, q, v


def sample_halo(rng, n):
    r = 3.0 * rng.gamma(2.0, 1.0, n)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True) + 1e-12
    q = u * r[:, None]
    v = 0.4 * rng.normal(size=(n, 3))
    m = np.full(n, 2.0 / n)
    return m, q, v


def galaxy(rng, center, vel):
    parts = [sample_disk(rng, DISK), sample_bulge(rng, BULGE),
             sample_halo(rng, HALO)]
    m = np.concatenate([p[0] for p in parts])
    q = np.concatenate([p[1] for p in parts]) + np.asarray(center)
    v = np.concatenate([p[2] for p in parts]) + np.asarray(vel)
    return m, q, v


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "milkyway_andromeda.tab"
    seed = 1
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])
    rng = np.random.default_rng(seed)

    # MW at origin; Andromeda offset on an infall orbit (model units).
    m1, q1, v1 = galaxy(rng, (0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    m2, v2q, v2 = galaxy(rng, (50.0, 15.0, 0.0), (-0.5, -0.1, 0.0))

    # Interleave per the loader's index map: components alternate MW/Andromeda.
    def split(m, q, v):
        return (
            (m[:DISK], q[:DISK], v[:DISK]),
            (m[DISK:DISK + BULGE], q[DISK:DISK + BULGE], v[DISK:DISK + BULGE]),
            (m[DISK + BULGE:], q[DISK + BULGE:], v[DISK + BULGE:]),
        )

    g1, g2 = split(m1, q1, v1), split(m2, v2q, v2)
    order = [g1[0], g2[0], g1[1], g2[1], g1[2], g2[2]]
    rows = []
    for m, q, v in order:
        rows.append(np.column_stack([m * MSUN_SIM, q * KPC_SIM, v * KMS_MS]))
    table = np.concatenate(rows)
    np.savetxt(out, table, fmt="%.8g")
    print(f"wrote {out}: {table.shape[0]} bodies "
          f"({2 * (DISK + BULGE + HALO)} expected)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
