"""ctypes bindings for the native runtime library (native/murbnative.cpp).

Auto-builds ``libmurbnative.so`` with g++ on first use (cached next to the
source); every capability has a pure-python fallback so the framework works
without a toolchain.  See the .cpp header comment for what lives natively
and why.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_SRC = os.path.join(_NATIVE_DIR, "murbnative.cpp")
_SO = os.path.join(_NATIVE_DIR, "libmurbnative.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> ctypes.CDLL | None:
    """The native library, built on demand; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("MURB_NO_NATIVE") == "1":
            return None
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        D = ctypes.POINTER(ctypes.c_double)
        F = ctypes.POINTER(ctypes.c_float)
        lib.murb_now_us.restype = ctypes.c_double
        lib.murb_count_tab.argtypes = [ctypes.c_char_p]
        lib.murb_count_tab.restype = ctypes.c_long
        lib.murb_parse_tab.argtypes = [ctypes.c_char_p, D, ctypes.c_long,
                                       ctypes.c_int]
        lib.murb_parse_tab.restype = ctypes.c_long
        lib.murb_write_history_csv.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                               D, D, D, D, D]
        lib.murb_write_history_csv.restype = ctypes.c_int
        lib.murb_traj_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.murb_traj_open.restype = ctypes.c_void_p
        lib.murb_traj_append.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                         F, F, F]
        lib.murb_traj_append.restype = ctypes.c_int
        lib.murb_traj_close.argtypes = [ctypes.c_void_p]
        lib.murb_traj_close.restype = ctypes.c_long
        _lib = lib
        return _lib


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def parse_tab(path: str, cols: int = 7) -> np.ndarray:
    """Fast whitespace table parser; numpy.loadtxt fallback."""
    lib = get_lib()
    if lib is None:
        data = np.loadtxt(path, dtype=np.float64)
        return data[None, :] if data.ndim == 1 else data
    n = lib.murb_count_tab(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    out = np.empty((n, cols), dtype=np.float64)
    got = lib.murb_parse_tab(path.encode(), _dptr(out), n, cols)
    if got < 0:
        if got == -1:
            raise FileNotFoundError(path)
        raise ValueError(f"{path}: malformed row {-(got + 2)} "
                         f"(expected {cols} columns)")
    return out[:got]


def write_history_csv(path: str, energies, ang, density_centers) -> bool:
    """Native CSV writer; returns False if unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return False
    e = np.ascontiguousarray(energies, dtype=np.float64)
    a = np.ascontiguousarray(ang, dtype=np.float64)
    dc = np.ascontiguousarray(density_centers, dtype=np.float64)
    dcx = np.ascontiguousarray(dc[:, 0])
    dcy = np.ascontiguousarray(dc[:, 1])
    dcz = np.ascontiguousarray(dc[:, 2])
    rc = lib.murb_write_history_csv(path.encode(), len(e), _dptr(e), _dptr(a),
                                    _dptr(dcx), _dptr(dcy), _dptr(dcz))
    return rc == 0


def now_us() -> float:
    lib = get_lib()
    if lib is None:
        import time

        return time.time() * 1e6
    return lib.murb_now_us()
