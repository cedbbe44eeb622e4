"""Implementation registry: the TPU-native ``--im`` factory.

Mirrors the reference's string-keyed factory ``createImplem<T>()``
(ref: src/murb/main.cpp:205-270).  Reference tags are accepted as aliases so
murb command lines keep working verbatim; each maps to its TPU-native engine
(SURVEY.md section 7 capability mapping).
"""
from __future__ import annotations

from typing import Callable

from murb_tpu.core.state import BodyState

_REGISTRY: dict[str, Callable] = {}
_ALIASES: dict[str, str] = {}


def register(tag: str, factory: Callable, aliases: tuple[str, ...] = ()):
    _REGISTRY[tag] = factory
    for a in aliases:
        _ALIASES[a] = tag


def resolve_tag(tag: str) -> str:
    return _ALIASES.get(tag, tag)


def available_implementations() -> dict[str, tuple[str, ...]]:
    """tag -> aliases, for --list-impls and docs."""
    out = {t: tuple(a for a, t2 in _ALIASES.items() if t2 == t) for t in _REGISTRY}
    return out


def validate_tag(tag: str) -> str:
    """Resolve a tag or raise (the reference exits with "Implementation '...'
    does not exist", ref: main.cpp:265-268)."""
    canonical = resolve_tag(tag)
    if canonical not in _REGISTRY:
        known = ", ".join(sorted(set(_REGISTRY) | set(_ALIASES)))
        raise ValueError(
            f"Implementation {tag!r} does not exist. Available: {known}"
        )
    return canonical


def create_engine(tag: str, bodies: BodyState, **kwargs):
    """Build an engine by tag; unknown tags raise with the available list."""
    return _REGISTRY[validate_tag(tag)](bodies, **kwargs)


def _filter(kwargs, *names):
    return {k: v for k, v in kwargs.items() if k in names or k in ("soft", "dt")}


def _build_registry():
    from murb_tpu.models import engines as E

    register(
        "xla+naive",
        lambda b, **kw: E.NaiveEngine(b, **_filter(kw)),
        aliases=("cpu+naive", "naive"),
    )
    register(
        "nop",
        lambda b, **kw: E.NopEngine(b, **_filter(kw)),
        aliases=("cpu+nop",),
    )
    register(
        "xla+chunked",
        lambda b, **kw: E.ChunkedEngine(b, **_filter(kw, "chunk")),
        aliases=("cpu+optim", "cpu+simd", "cpu+omp", "xla+fused"),
    )
    register(
        "tpu+tile",
        lambda b, **kw: E.PallasTileEngine(
            b, **_filter(kw, "block_i", "block_j", "autotune")
        ),
        aliases=("gpu+tile",),
    )
    register(
        "tpu+hybrid",
        lambda b, **kw: E.HybridEngine(
            b, **_filter(kw, "block_i", "block_j", "passes", "autotune")
        ),
        aliases=("gpu+tile+full", "gpu+tile+full200k",
                 "tpu+tile+full", "tpu+tile+full200k"),
    )
    register(
        "tpu+proxy",
        lambda b, **kw: E.ProxyEngine(
            b, **_filter(kw, "m", "cells", "levels", "tol", "max_m",
                         "heavy_k", "box_margin", "adapt_every", "cost_slack",
                         "m2l_dots", "block", "m2l_tile", "autotune",
                         "validate", "near")
        ),
        aliases=("fmm", "barnes-hut"),
    )
    register(
        "tpu+hybrid+fast",
        lambda b, **kw: E.HybridEngine(
            b, passes=1, **_filter(kw, "block_i", "block_j", "autotune")
        ),
    )
    register(
        "tpu+hybrid+x3",
        lambda b, **kw: E.HybridEngine(
            b, passes=3, **_filter(kw, "block_i", "block_j", "autotune")
        ),
    )
    register(
        "tpu+mxu",
        lambda b, **kw: E.MXUEngine(
            b, **_filter(kw, "block_i", "block_j", "precision", "autotune")
        ),
    )
    register(
        "tpu+tracking",
        lambda b, **kw: E.TrackingEngine(
            b, **_filter(kw, "num_iterations", "history", "acc_fn", "metric_dtype", "metrics_method", "metrics_proxy_m", "fused_proxy_m", "fused_fmm", "fused_adaptive", "m2l_dots", "validated_half", "fused_exact")
        ),
        aliases=("gpu+tracking",),
    )
    register(
        "tpu+tracking+multi",
        lambda b, **kw: E.MultiGalaxyTrackingEngine(
            b, **_filter(kw, "num_iterations", "masks", "acc_fn", "metric_dtype", "fused_proxy_m", "fused_fmm", "fused_adaptive", "metrics_method", "metrics_proxy_m", "m2l_dots", "validated_half", "fused_exact")
        ),
        aliases=("gpu+tracking+multi",),
    )
    register(
        "tpu+leapfrog",
        lambda b, **kw: E.LeapfrogEngine(
            b, **_filter(kw, "num_iterations", "acc_fn")
        ),
        aliases=("gpu+leapfrog",),
    )
    register(
        "tpu+leapfrog+tracking",
        lambda b, **kw: E.LeapfrogTrackingEngine(
            b, **_filter(kw, "num_iterations", "history", "acc_fn",
                         "metric_dtype", "metrics_method", "metrics_proxy_m",
                         "fused_proxy_m", "fused_fmm", "fused_adaptive",
                         "m2l_dots", "validated_half")
        ),
        aliases=("gpu+leapfrog+tracking",),
    )
    register(
        "tpu+kdk",
        lambda b, **kw: E.KDKEngine(b, **_filter(kw, "acc_fn")),
    )
    register(
        "tpu+yoshida4",
        lambda b, **kw: E.Yoshida4Engine(b, **_filter(kw, "acc_fn")),
    )

    # Distributed engines (murb_tpu.parallel) -- imported lazily so
    # single-device use never touches mesh plumbing.
    def _shard(mode):
        def factory(b, **kw):
            from murb_tpu.parallel.shard_engine import ShardedEngine

            return ShardedEngine(
                b, mode=mode,
                **_filter(kw, "shards", "gpu_fraction", "block_i", "block_j",
                          "ring_impl", "kernel", "m", "levels", "m2l_dots",
                          "validate", "adapt_every"),
            )

        return factory

    register("shard+allgather", _shard("allgather"), aliases=("mpi",))
    register("shard+ring", _shard("ring"))
    register("shard+uneven", _shard("uneven"), aliases=("hetero",))
    register("shard+proxy", _shard("proxy"))
    register("shard+fmm", _shard("fmm"))
    register("shard+adaptive", _shard("adaptive"))


_build_registry()
