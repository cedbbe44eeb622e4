"""Autotuner tests (utils/autotune.py): cache behavior + engine wiring."""
import json
import os

import numpy as np
import pytest

from murb_tpu.core.init import SCHEMES
from murb_tpu.models import create_engine
from murb_tpu.utils import autotune as at

SOFT = 2.0e8
DT = 3600.0


@pytest.fixture
def tune_cache(tmp_path, monkeypatch):
    path = str(tmp_path / "autotune.json")
    monkeypatch.setenv("MURB_TUNE_CACHE", path)
    return path


def test_store_lookup_roundtrip(tune_cache):
    assert at.lookup("k", 1024) is None
    at.store("k", 1024, {"block_i": 512, "block_j": 256}, 1.25)
    got = at.lookup("k", 1024)
    assert got["block_i"] == 512 and got["ms_per_step"] == 1.25
    # keys are per-(kernel, npad, backend)
    assert at.lookup("k", 2048) is None
    assert at.lookup("other", 1024) is None


def test_tune_picks_fastest_and_caches(tune_cache, monkeypatch):
    calls = []
    times = {(128, 128): 5.0, (256, 128): 1.0, (256, 256): 3.0}

    def fake_measure(run_fn, state0, **kw):
        calls.append(run_fn)
        return times[run_fn]

    monkeypatch.setattr(at, "measure_steps", fake_measure)
    cands = [{"block_i": bi, "block_j": bj} for bi, bj in times]
    best = at.tune("fake", 512, lambda p: (p["block_i"], p["block_j"]),
                   None, candidates=cands)
    assert best["block_i"] == 256 and best["block_j"] == 128
    assert len(calls) == 3

    # second call: served from cache, no re-measurement
    again = at.tune("fake", 512, lambda p: 1 / 0, None, candidates=cands)
    assert again["block_i"] == 256
    assert len(calls) == 3

    with open(tune_cache) as f:
        db = json.load(f)
    assert any(k.startswith("fake/n512/") for k in db)


def test_tune_skips_infeasible_candidates(tune_cache, monkeypatch):
    def fake_measure(run_fn, state0, **kw):
        if run_fn == "bad":
            raise RuntimeError("VMEM overflow")
        return 2.0

    monkeypatch.setattr(at, "measure_steps", fake_measure)
    best = at.tune("fk", 256, lambda p: p["tag"], None,
                   candidates=[{"tag": "bad"}, {"tag": "ok"}])
    assert best["tag"] == "ok"


def test_block_candidates_divisibility():
    for c in at.block_candidates("tpu+tile", 6144):
        assert 6144 % c["block_i"] == 0 and 6144 % c["block_j"] == 0
    # npad with no matching divisor falls back to kernel-chosen blocks
    assert at.block_candidates("tpu+tile", 384) == [
        {"block_i": 0, "block_j": 0}
    ]


def test_engine_uses_cached_blocks(tune_cache):
    """An engine with unspecified blocks picks up a persisted tune result
    even with autotuning off."""
    bodies = SCHEMES["galaxy"](500, 3)
    npad = bodies.npad
    at.store("tpu+tile", npad, {"block_i": 256, "block_j": 512}, 0.5)
    e = create_engine("tpu+tile", bodies, soft=SOFT, dt=DT)
    assert (e.block_i, e.block_j) == (256, 512)
    # explicit blocks always win
    e2 = create_engine("tpu+tile", bodies, soft=SOFT, dt=DT,
                       block_i=128, block_j=128)
    assert (e2.block_i, e2.block_j) == (128, 128)


def test_engine_autotune_sweep_runs(tune_cache):
    """autotune=True on a Pallas engine runs the sweep (interpret mode on
    CPU) and persists a choice; trajectories stay correct."""
    bodies = SCHEMES["galaxy"](512, 3)
    e = create_engine("tpu+tile", bodies, soft=SOFT, dt=DT, autotune=True)
    assert at.lookup(e._tune_tag, bodies.npad) is not None
    assert e.block_i > 0 and e.block_j > 0

    ref = create_engine("cpu+naive", bodies, soft=SOFT, dt=DT)
    e.compute_one_iteration()
    ref.compute_one_iteration()
    a, b = ref.bodies.unpadded(), e.bodies.unpadded()
    np.testing.assert_allclose(b["qx"], a["qx"], rtol=1e-5)


def test_hybrid_pass_counts_tune_separately(tune_cache):
    bodies = SCHEMES["galaxy"](500, 3)
    e1 = create_engine("tpu+hybrid", bodies, soft=SOFT, dt=DT)
    e2 = create_engine("tpu+hybrid+fast", bodies, soft=SOFT, dt=DT)
    assert e1._tune_tag != e2._tune_tag


def test_proxy_engine_stage_block_wiring(tune_cache):
    """The fast-solver stage tuner (round-2 VERDICT item 8): a persisted
    (tag, m, levels, npad) entry is picked up with tuning off; explicit
    block/m2l_tile always win; the solver stays correct with an override
    (on CPU the fused path is ineligible, so the override is a no-op by
    design -- eligibility still caps it on TPU)."""
    bodies = SCHEMES["galaxy"](512, 3)
    probe = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT, m=16)
    at.store(probe._fast_tune_tag, probe.bodies.npad,
             {"block": 2048, "m2l_tile": 0}, 0.4)

    e = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT, m=16)
    assert e.block == 2048

    e2 = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT, m=16,
                       block=1024)
    assert e2.block == 1024

    ref = create_engine("cpu+naive", bodies, soft=SOFT, dt=DT)
    e.compute_one_iteration()
    ref.compute_one_iteration()
    a, b = ref.bodies.unpadded(), e.bodies.unpadded()
    np.testing.assert_allclose(b["qx"], a["qx"], rtol=2e-3)


def test_fmm_candidates_cover_tile_axis(tune_cache):
    bodies = SCHEMES["random"](2048, 3)
    e = create_engine("tpu+proxy", bodies, soft=SOFT, dt=DT, m=10, levels=2)
    cands = e._fast_candidates()
    assert all("m2l_tile" in c for c in cands)
    assert {c["m2l_tile"] for c in cands} == {128, 256}
    assert all(bodies.npad % c["block"] == 0 for c in cands if c["block"])
