"""Body state container: the TPU-native analogue of ``Bodies<T>``.

The reference keeps SoA **and** AoS mirrors of (m, r, qx..qz, vx..vz) in host
memory (ref: src/common/core/Bodies.hpp:15-71, Bodies.cpp:27-41) and pads the
body count to a multiple of the SIMD width with zero-mass ghost bodies
(ref: src/common/core/Bodies.cpp:160-161, 200-213).

Here the state is a single SoA pytree of ``jnp`` arrays resident in HBM.  There
is no AoS mirror -- XLA layouts make it redundant -- and padding targets the
TPU lane width (multiples of 128 lanes; default 256) instead of ``mipp::N<T>()``.
Ghost bodies carry zero mass so their force contribution is exactly 0 (the
softening keeps 1/r finite, the same trick as the reference tile kernels,
ref: src/murb/implem/SimulationNBodyCUDATile.cu:138-143).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# Pad bodies to a multiple of this so kernels see lane-aligned shapes.
# (TPU fp32 native tile is (8, 128); 256 = 2*128 keeps ghost waste <= 255.)
PAD_MULTIPLE = 256


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BodyState:
    """SoA body state: masses, radii, positions, velocities.

    All arrays have shape ``(n + padding,)``; entries ``[n:]`` are zero-mass
    ghost bodies.  ``n`` and ``padding`` are static (non-traced) metadata.
    """

    m: jax.Array   # mass (kg)
    r: jax.Array   # display radius (m) -- used only by visualization
    qx: jax.Array  # position (m)
    qy: jax.Array
    qz: jax.Array
    vx: jax.Array  # velocity (m/s)
    vy: jax.Array
    vz: jax.Array
    n: int = dataclasses.field(metadata=dict(static=True))
    padding: int = dataclasses.field(metadata=dict(static=True))

    # ------------------------------------------------------------------ sizes
    @property
    def npad(self) -> int:
        return self.n + self.padding

    @property
    def dtype(self):
        return self.qx.dtype

    @property
    def allocated_bytes(self) -> int:
        """Bytes held by this state (8 SoA arrays; no AoS mirror).

        The reference reports ``(n+padding)*sizeof(T)*8*2`` because it keeps
        both SoA and AoS copies (ref: src/common/core/Bodies.cpp:40).
        """
        return 8 * self.npad * self.dtype.itemsize

    # ------------------------------------------------------------- construct
    @classmethod
    def from_arrays(
        cls,
        m, r, qx, qy, qz, vx, vy, vz,
        *,
        n: int | None = None,
        pad_multiple: int = PAD_MULTIPLE,
        dtype: Any = jnp.float32,
        ghost_positions: np.ndarray | None = None,
        ghost_velocities: np.ndarray | None = None,
    ) -> "BodyState":
        """Build a padded state from unpadded per-body arrays.

        Ghost bodies get zero mass/radius.  Their positions default to zero
        but can be supplied (the reference scatters ghosts randomly in the
        box, ref: src/common/core/Bodies.cpp:200-213 -- physically irrelevant
        since their mass is zero, but kept for visual parity).
        """
        m = np.asarray(m)
        if n is None:
            n = int(m.shape[0])
        npad = round_up(max(n, 1), pad_multiple)
        padding = npad - n

        def _pad(a, ghosts=None):
            a = np.asarray(a, dtype=np.dtype(dtype))
            out = np.zeros(npad, dtype=a.dtype)
            out[:n] = a[:n]
            if ghosts is not None and padding:
                out[n:] = np.asarray(ghosts, dtype=a.dtype)[:padding]
            return jnp.asarray(out)

        gq = ghost_positions
        gv = ghost_velocities
        return cls(
            m=_pad(m),
            r=_pad(r),
            qx=_pad(qx, None if gq is None else gq[:, 0]),
            qy=_pad(qy, None if gq is None else gq[:, 1]),
            qz=_pad(qz, None if gq is None else gq[:, 2]),
            vx=_pad(vx, None if gv is None else gv[:, 0]),
            vy=_pad(vy, None if gv is None else gv[:, 1]),
            vz=_pad(vz, None if gv is None else gv[:, 2]),
            n=n,
            padding=padding,
        )

    # ------------------------------------------------------------------ views
    def positions(self) -> jax.Array:
        """Stacked (npad, 3) positions (copies; for metrics/IO, not hot path)."""
        return jnp.stack([self.qx, self.qy, self.qz], axis=-1)

    def velocities(self) -> jax.Array:
        return jnp.stack([self.vx, self.vy, self.vz], axis=-1)

    def unpadded(self) -> dict[str, np.ndarray]:
        """Host copies of the first ``n`` bodies (device->host sync point).

        The analogue of the reference's lazy D2H ``getDataSoA()``
        (ref: src/common/core/CUDABodies.cu:64-93): call only at observation
        points, never inside the iteration hot loop.
        """
        return {
            k: np.asarray(getattr(self, k)[: self.n])
            for k in ("m", "r", "qx", "qy", "qz", "vx", "vy", "vz")
        }

    def astype(self, dtype) -> "BodyState":
        return dataclasses.replace(
            self,
            **{
                k: getattr(self, k).astype(dtype)
                for k in ("m", "r", "qx", "qy", "qz", "vx", "vy", "vz")
            },
        )

    def repad(self, pad_multiple: int) -> "BodyState":
        """Return a state whose padded length is a multiple of ``pad_multiple``.

        Used by kernels that need a specific block divisibility; O(N) and
        jit-compatible (shapes are static).
        """
        new_npad = round_up(self.npad, pad_multiple)
        extra = new_npad - self.npad
        if extra == 0:
            return self
        pad = lambda a: jnp.pad(a, (0, extra))
        return dataclasses.replace(
            self,
            m=pad(self.m), r=pad(self.r),
            qx=pad(self.qx), qy=pad(self.qy), qz=pad(self.qz),
            vx=pad(self.vx), vy=pad(self.vy), vz=pad(self.vz),
            padding=self.padding + extra,
        )
