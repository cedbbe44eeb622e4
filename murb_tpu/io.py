"""Trajectory recording: non-blocking binary frame dumps + reader.

Format ``MURBTRAJ`` v1: 8-byte magic, u32 version, u64 n_bodies, then per
frame: u64 frame index + float32 qx[n], qy[n], qz[n].

The native writer (native/murbnative.cpp) copies each frame into a bounded
queue drained by a background thread, so recording never stalls the
simulation loop; frames are dropped (and counted) if the disk can't keep up.
The pure-python fallback writes synchronously.

The reference has no trajectory export at all -- its visualizer reads the
live arrays by pointer each frame (ref: src/murb/main.cpp:279-287) and
nothing is persisted.
"""
from __future__ import annotations

import struct

import numpy as np

from murb_tpu.native import get_lib

MAGIC = b"MURBTRAJ"
VERSION = 1


class TrajectoryWriter:
    def __init__(self, path: str, n_bodies: int):
        self.path = path
        self.n = int(n_bodies)
        self.dropped = 0
        self._frames = 0
        lib = get_lib()
        self._lib = lib
        if lib is not None:
            self._handle = lib.murb_traj_open(path.encode(), self.n)
            if not self._handle:
                raise OSError(f"cannot open {path!r}")
            self._file = None
        else:
            self._handle = None
            self._file = open(path, "wb")
            self._file.write(MAGIC)
            self._file.write(struct.pack("<IQ", VERSION, self.n))

    def append(self, frame_index: int, qx, qy, qz) -> None:
        import ctypes

        qx = np.ascontiguousarray(qx, dtype=np.float32)[: self.n]
        qy = np.ascontiguousarray(qy, dtype=np.float32)[: self.n]
        qz = np.ascontiguousarray(qz, dtype=np.float32)[: self.n]
        if min(len(qx), len(qy), len(qz)) < self.n:
            # A short array would make the native writer memcpy past the
            # buffer end and would desynchronize the fixed-stride stream.
            raise ValueError(
                f"frame arrays must have >= {self.n} elements, got "
                f"({len(qx)}, {len(qy)}, {len(qz)})"
            )
        self._frames += 1
        if self._handle is not None:
            F = ctypes.POINTER(ctypes.c_float)
            rc = self._lib.murb_traj_append(
                self._handle, frame_index,
                qx.ctypes.data_as(F), qy.ctypes.data_as(F),
                qz.ctypes.data_as(F),
            )
            if rc:
                self.dropped += 1
        else:
            self._file.write(struct.pack("<Q", frame_index))
            self._file.write(qx.tobytes())
            self._file.write(qy.tobytes())
            self._file.write(qz.tobytes())

    def close(self) -> int:
        """Returns the number of dropped frames."""
        if self._handle is not None:
            self.dropped = int(self._lib.murb_traj_close(self._handle))
            self._handle = None
        elif self._file is not None:
            self._file.close()
            self._file = None
        return self.dropped


def read_trajectory(path: str):
    """-> (frame_indices (F,), positions (F, n, 3))."""
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != MAGIC:
            raise ValueError(f"{path!r} is not a MURBTRAJ file")
        version, n = struct.unpack("<IQ", f.read(12))
        if version > VERSION:
            raise ValueError(f"unsupported trajectory version {version}")
        frames = []
        indices = []
        frame_bytes = 8 + 3 * n * 4
        while True:
            blob = f.read(frame_bytes)
            if len(blob) < frame_bytes:
                break
            (idx,) = struct.unpack_from("<Q", blob)
            arr = np.frombuffer(blob, dtype=np.float32, offset=8)
            frames.append(arr.reshape(3, n).T.copy())
            indices.append(idx)
    return np.asarray(indices, dtype=np.int64), np.asarray(frames)
