"""State snapshot / restore.

The reference has NO checkpointing -- its only persistence is the metrics CSV
and the initial-condition file reader (SURVEY.md section 5, "Checkpoint /
resume: None").  This module closes that gap: a versioned ``.npz`` snapshot
of the full body state plus simulation metadata, so long runs can resume
after preemption (standard practice for TPU-pod jobs).

Format: numpy ``.npz`` with the 8 SoA arrays, ``n``/``padding``, iteration
counter, dt, softening, and a format version.  ``.npz`` keeps the framework
dependency-free and portable; ``save_state_orbax`` / ``load_state_orbax``
provide the orbax backend for multi-host / sharded-array checkpointing
(each host writes its own shards; restore keeps the sharding).
"""
from __future__ import annotations

import numpy as np

from murb_tpu.core.state import BodyState

FORMAT_VERSION = 1
_ARRAYS = ("m", "r", "qx", "qy", "qz", "vx", "vy", "vz")


def save_state(path: str, state: BodyState, *, iteration: int = 0,
               dt: float = 3600.0, soft: float = 2.0e8,
               extra: dict | None = None) -> None:
    """Write a snapshot (one host->device sync; never call in the hot loop)."""
    payload = {k: np.asarray(getattr(state, k)) for k in _ARRAYS}
    payload.update(
        __version__=np.int64(FORMAT_VERSION),
        n=np.int64(state.n),
        padding=np.int64(state.padding),
        iteration=np.int64(iteration),
        dt=np.float64(dt),
        soft=np.float64(soft),
    )
    for k, v in (extra or {}).items():
        payload[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **payload)


def save_state_orbax(path: str, state: BodyState, *, iteration: int = 0,
                     dt: float = 3600.0, soft: float = 2.0e8) -> None:
    """Orbax backend: sharding-aware, multi-host-capable checkpointing.

    Writes the state pytree plus metadata into an orbax checkpoint
    directory.  Sharded arrays are written shard-by-shard (each host its
    own) and restored with their sharding when possible.
    """
    import os

    import orbax.checkpoint as ocp

    payload = {
        "arrays": {k: getattr(state, k) for k in _ARRAYS},
        "meta": {
            "version": FORMAT_VERSION,
            "n": state.n,
            "padding": state.padding,
            "iteration": int(iteration),
            "dt": float(dt),
            "soft": float(soft),
        },
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def load_state_orbax(path: str) -> tuple[BodyState, dict]:
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(path))
    meta = dict(payload["meta"])
    version = int(meta.pop("version"))
    if version > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint {path!r} has format version {version}; "
            f"this build reads <= {FORMAT_VERSION}"
        )
    arrays = payload["arrays"]
    state = BodyState(
        n=int(meta.pop("n")), padding=int(meta.pop("padding")),
        **{k: arrays[k] for k in _ARRAYS},
    )
    return state, meta


def load_state(path: str) -> tuple[BodyState, dict]:
    """Read a snapshot -> (BodyState, metadata dict)."""
    with np.load(path) as z:
        version = int(z["__version__"])
        if version > FORMAT_VERSION:
            raise ValueError(
                f"checkpoint {path!r} has format version {version}; "
                f"this build reads <= {FORMAT_VERSION}"
            )
        import jax.numpy as jnp

        arrays = {k: jnp.asarray(z[k]) for k in _ARRAYS}
        meta = {
            "iteration": int(z["iteration"]),
            "dt": float(z["dt"]),
            "soft": float(z["soft"]),
        }
        for k in z.files:
            if k.startswith("extra_"):
                meta[k[len("extra_"):]] = z[k]
        state = BodyState(
            n=int(z["n"]), padding=int(z["padding"]), **arrays
        )
    return state, meta


class AsyncCheckpointWriter:
    """Write-behind periodic checkpointing for long runs (``--save-every``).

    The frame loop must never block on disk: ``save`` snapshots the state to
    host (the one unavoidable device sync), then compresses and writes in a
    daemon thread (zlib releases the GIL).  The write is ATOMIC -- a ``.tmp``
    file renamed over the target -- so preemption mid-write never corrupts
    the resume file (the whole point of periodic checkpoints).  At most one
    write is in flight; a snapshot arriving while the disk is still busy is
    skipped and counted rather than queued (the next interval retries).
    """

    def __init__(self, path: str):
        self.path = path
        self._thread = None
        self.written = 0
        self.skipped = 0

    def save(self, state: BodyState, *, iteration: int, dt: float,
             soft: float) -> bool:
        """Snapshot + schedule the write; False if skipped (write busy)."""
        if self._thread is not None and self._thread.is_alive():
            self.skipped += 1
            return False
        import threading

        payload = {k: np.asarray(getattr(state, k)) for k in _ARRAYS}
        payload.update(
            __version__=np.int64(FORMAT_VERSION),
            n=np.int64(state.n),
            padding=np.int64(state.padding),
            iteration=np.int64(iteration),
            dt=np.float64(dt),
            soft=np.float64(soft),
        )
        self._thread = threading.Thread(
            target=self._write, args=(payload,), daemon=True)
        self._thread.start()
        return True

    def _write(self, payload: dict) -> None:
        import os

        tmp = self.path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez_compressed(f, **payload)
        os.replace(tmp, self.path)
        self.written += 1

    def flush(self) -> None:
        """Block until any in-flight write has landed (call before a final
        synchronous save_state to the same path)."""
        if self._thread is not None:
            self._thread.join()
