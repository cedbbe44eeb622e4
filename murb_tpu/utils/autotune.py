"""Kernel-parameter autotuning with a persistent cache.

The reference dispatches launch geometry by N with hand-derived thresholds
(thread count 256/512/1024 by body count, ref:
src/murb/implem/SimulationNBodyCUDATile.cu:40-52).  Here the geometry is
*measured*: on first use of a (kernel, npad, backend) combination the engine
sweeps a small candidate grid of Pallas block sizes, times each with the
steady-state discipline (one compiled fori_loop dispatch, warmup excluded),
and persists the winner as JSON next to the XLA compile cache -- so later
runs (and bench.py) pick tuned blocks with no hand-set constants.

Enable with ``MURB_AUTOTUNE=1`` (or ``autotune=True`` on Pallas engines);
the cache file is ``$MURB_TUNE_CACHE`` or ``<compile-cache>/autotune.json``.
"""
from __future__ import annotations

import json
import os
import time


def _cache_path() -> str:
    p = os.environ.get("MURB_TUNE_CACHE")
    if p:
        return p
    base = os.environ.get("MURB_COMPILE_CACHE",
                          os.path.expanduser("~/.cache/murb_tpu_xla"))
    return os.path.join(base, "autotune.json")


def _load() -> dict:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save(db: dict) -> None:
    path = _cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(db, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except OSError:
        pass  # read-only filesystem: tuning still applies in-process


def _key(kernel: str, npad: int) -> str:
    import jax

    return f"{kernel}/n{npad}/{jax.default_backend()}"


def lookup(kernel: str, npad: int) -> dict | None:
    """Tuned parameters for this combination, or None."""
    return _load().get(_key(kernel, npad))


def store(kernel: str, npad: int, params: dict, ms: float) -> None:
    db = _load()
    db[_key(kernel, npad)] = {**params, "ms_per_step": round(ms, 4)}
    _save(db)


def enabled() -> bool:
    return os.environ.get("MURB_AUTOTUNE", "") not in ("", "0")


def block_candidates(kernel: str, npad: int) -> list[dict]:
    """Feasible (block_i, block_j) grid for a Pallas all-pairs kernel."""
    bis = (512, 1024, 2048, 4096)
    bjs = (512, 1024, 2048)
    out = []
    for bi in bis:
        for bj in bjs:
            if npad % bi == 0 and npad % bj == 0:
                out.append({"block_i": bi, "block_j": bj})
    return out or [{"block_i": 0, "block_j": 0}]  # fall back to kernel picks


def measure_steps(run_fn, state0, *, steps: int = 4, warmup: int = 2):
    """ms/step of ``run_fn(state, n) -> state`` (a jitted multi-step loop).

    Timing discipline for the remote-relay environment: everything inside
    one compiled dispatch with data-chained iterations; warmup excluded so
    compile time never pollutes the measurement.
    """
    import jax

    state = run_fn(state0, warmup)
    jax.block_until_ready(state)
    t0 = time.time()
    state = run_fn(state, steps)
    jax.block_until_ready(state)
    return (time.time() - t0) / steps * 1000.0


def tune(kernel: str, npad: int, make_run_fn, state0, *,
         candidates: list[dict] | None = None, steps: int = 4) -> dict:
    """Sweep candidates, persist and return the winner.

    ``make_run_fn(params) -> (state, n) -> state`` builds the timed loop for
    one parameter set; the sweep reuses one donated state trajectory (the
    physics of the tuning steps is irrelevant -- only the timing is).
    """
    import jax
    import jax.numpy as jnp

    cached = lookup(kernel, npad)
    if cached is not None:
        return cached
    candidates = candidates or block_candidates(kernel, npad)
    best, best_ms = None, float("inf")
    for params in candidates:
        # fresh state per candidate: the timed loops donate their input
        fresh = jax.tree.map(lambda a: jnp.array(a, copy=True), state0)
        try:
            ms = measure_steps(make_run_fn(params), fresh, steps=steps)
        except Exception:
            continue  # infeasible geometry (VMEM overflow etc.)
        if ms < best_ms:
            best, best_ms = params, ms
    if best is None:
        best, best_ms = {"block_i": 0, "block_j": 0}, 0.0
    store(kernel, npad, best, best_ms)
    return {**best, "ms_per_step": best_ms}
