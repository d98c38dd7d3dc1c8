"""Kernel-routing autotune: cache behavior, feasibility gates, robustness.

Measurement itself needs a real TPU (exercised by bench runs); these tests
pin the routing LOGIC with a stubbed measurer."""

import json

import pytest

from junctiontree_tpu.ops import autotune
from junctiontree_tpu.ops.pallas_contract import plan_tiles


@pytest.fixture(autouse=True)
def _isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setattr(autotune, "_CACHE", None)
    monkeypatch.setattr(autotune, "_VALIDATED", set())
    monkeypatch.setattr(
        autotune, "cache_path", lambda: str(tmp_path / "autotune.json")
    )
    autotune.set_enabled(True)
    yield
    monkeypatch.setattr(autotune, "_CACHE", None)


def test_infeasible_tiling_routes_to_xla_without_measuring(monkeypatch):
    def boom(*a):
        raise AssertionError("must not measure an infeasible shape")

    monkeypatch.setattr(autotune, "measure", boom)
    # R2 too wide for any pot block (see plan_tiles test)
    assert plan_tiles(1, 40000, 130, 64) is None
    assert autotune.decide(1, 40000, 130, 64) == "xla"


def test_huge_xla_intermediate_routes_to_pallas_without_measuring(monkeypatch):
    def boom(*a):
        raise AssertionError("must not measure when XLA would blow up HBM")

    monkeypatch.setattr(autotune, "measure", boom)
    # feasible kernel, but the smallest einsum pairing materializes > 2 GB
    R1, R2, C, B = 512, 512, 512, 8192
    assert plan_tiles(R1, R2, C, B) is not None
    assert min(B * R2 * C, B * R1 * C, B * R1 * R2) * 4 > 2 << 30
    assert autotune.decide(R1, R2, C, B) == "pallas"


def test_measured_winner_is_cached_in_memory_and_on_disk(monkeypatch):
    calls = []

    def fake_measure(R1, R2, C, B, dtype="f32"):
        calls.append((R1, R2, C, B, dtype))
        return dict(winner="xla", pallas_ms=2.0, xla_ms=1.0, flops=1,
                    hbm_bytes=1, achieved_tflops=0.0, roofline_fraction=0.0)

    monkeypatch.setattr(autotune, "measure", fake_measure)
    assert autotune.decide(8, 128, 128, 256) == "xla"
    assert autotune.decide(8, 128, 128, 256) == "xla"
    assert len(calls) == 1  # second call served from (validated) cache
    with open(autotune.cache_path()) as f:
        disk = json.load(f)
    assert disk["f32:8x128x128:B256"]["winner"] == "xla"
    assert disk["f32:8x128x128:B256"]["margin"] == 2.0
    assert disk["f32:8x128x128:B256"]["ts"] > 0
    # a fresh in-memory cache reloads the persisted decision; the key is
    # already validated by this process so no re-measurement happens
    monkeypatch.setattr(autotune, "_CACHE", None)
    assert autotune.decide(8, 128, 128, 256) == "xla"
    assert len(calls) == 1


def test_stale_cached_winner_is_demoted_on_revalidation(monkeypatch, tmp_path):
    """Round-3 regression: a persisted winner that now LOSES by >10% must be
    demoted the first time a new process consults it (the shipped artifact
    had the routed path 1.35x slower than its own XLA fallback)."""
    # simulate a stale cache written by an earlier process: pallas "won"
    stale = {
        "f32:8x128x128:B256": dict(
            winner="pallas", pallas_ms=1.0, xla_ms=2.0, flops=1, hbm_bytes=1,
            achieved_tflops=0.0, roofline_fraction=0.0, validations=1,
        )
    }
    with open(autotune.cache_path(), "w") as f:
        json.dump(stale, f)

    calls = []

    def fresh_measure(R1, R2, C, B, dtype="f32"):
        # today pallas loses by 1.35x — beyond the 10% hysteresis band
        calls.append(1)
        return dict(winner="xla", pallas_ms=1.35, xla_ms=1.0, flops=1,
                    hbm_bytes=1, achieved_tflops=0.0, roofline_fraction=0.0)

    monkeypatch.setattr(autotune, "measure", fresh_measure)
    assert autotune.decide(8, 128, 128, 256) == "xla"  # demoted
    assert len(calls) == 1
    with open(autotune.cache_path()) as f:
        disk = json.load(f)["f32:8x128x128:B256"]
    assert disk["winner"] == "xla"
    assert disk["demoted_from"] == "pallas"
    assert disk["pallas_ms"] == 1.35  # fresh timings replace stale ones
    assert disk["validations"] == 2
    # subsequent calls in this process trust the validated decision
    assert autotune.decide(8, 128, 128, 256) == "xla"
    assert len(calls) == 1


def test_revalidation_hysteresis_keeps_incumbent_within_margin(monkeypatch):
    """A fresh measurement where the incumbent loses by <10% must NOT flip
    the decision (noise on a shared chip would otherwise oscillate it)."""
    stale = {
        "f32:8x128x128:B256": dict(
            winner="pallas", pallas_ms=1.0, xla_ms=2.0, flops=1, hbm_bytes=1,
            achieved_tflops=0.0, roofline_fraction=0.0,
        )
    }
    with open(autotune.cache_path(), "w") as f:
        json.dump(stale, f)

    def fresh_measure(R1, R2, C, B, dtype="f32"):
        # pallas behind by 5% — inside the hysteresis band
        return dict(winner="xla", pallas_ms=1.05, xla_ms=1.0, flops=1,
                    hbm_bytes=1, achieved_tflops=0.0, roofline_fraction=0.0)

    monkeypatch.setattr(autotune, "measure", fresh_measure)
    assert autotune.decide(8, 128, 128, 256) == "pallas"  # incumbent kept
    with open(autotune.cache_path()) as f:
        disk = json.load(f)["f32:8x128x128:B256"]
    assert disk["winner"] == "pallas"
    assert "demoted_from" not in disk
    assert disk["pallas_ms"] == 1.05  # timings still refreshed


def test_compile_failure_entries_are_never_remeasured(monkeypatch):
    """A permanent 'pallas compile failed' route must be trusted without
    re-validation — re-measuring would re-attempt the failing compile."""
    stale = {
        "f32:8x128x128:B256": dict(
            winner="xla", pallas_ms=None, xla_ms=None, flops=1, hbm_bytes=1,
            error="pallas compile failed: ValueError",
        )
    }
    with open(autotune.cache_path(), "w") as f:
        json.dump(stale, f)

    def boom(*a, **k):
        raise AssertionError("must not re-measure a compile-failure entry")

    monkeypatch.setattr(autotune, "measure", boom)
    assert autotune.decide(8, 128, 128, 256) == "xla"


def test_disabled_autotune_defaults_to_pallas(monkeypatch):
    def boom(*a):
        raise AssertionError("disabled autotune must not measure")

    monkeypatch.setattr(autotune, "measure", boom)
    autotune.set_enabled(False)
    assert autotune.decide(8, 128, 128, 256) == "pallas"


def test_measure_survives_kernel_compile_failure(monkeypatch):
    """A shape the planner accepts but the compiler rejects must come back
    as a permanent 'xla' decision, not an exception (round-3 robustness)."""
    import junctiontree_tpu.ops.pallas_contract as pc

    def broken(*a, **k):
        raise ValueError("mosaic says no")

    monkeypatch.setattr(pc, "factored_masked_contract", broken)
    rec = autotune.measure(4, 8, 3, 5)
    assert rec["winner"] == "xla"
    assert "pallas compile failed" in rec["error"]


def test_transient_revalidation_failure_keeps_good_entry(monkeypatch):
    """A transient measure failure during per-process revalidation must not
    clobber a healthy persisted decision with a permanent error tombstone
    (round-4 review): the incumbent keeps serving and the key stays
    unvalidated so a later process retries."""
    good = {
        "f32:8x128x128:B256": dict(
            winner="pallas", pallas_ms=1.0, xla_ms=2.0, flops=1, hbm_bytes=1,
            achieved_tflops=0.0, roofline_fraction=0.0,
        )
    }
    with open(autotune.cache_path(), "w") as f:
        json.dump(good, f)

    def failing_measure(R1, R2, C, B, dtype="f32"):
        return dict(winner="xla", pallas_ms=None, xla_ms=None, flops=1,
                    hbm_bytes=1, error="pallas compile failed: ResourceExhausted")

    calls = []
    orig_failing = failing_measure

    def counting_measure(*a, **k):
        calls.append(a)
        return orig_failing(*a, **k)

    monkeypatch.setattr(autotune, "measure", counting_measure)
    assert autotune.decide(8, 128, 128, 256) == "pallas"  # incumbent kept
    with open(autotune.cache_path()) as f:
        disk = json.load(f)["f32:8x128x128:B256"]
    assert disk["winner"] == "pallas"
    assert "error" not in disk  # not a tombstone
    assert "ResourceExhausted" in disk["revalidation_error"]
    # THIS process serves the incumbent without re-running the failed
    # measurement (ADVICE r4: unbounded re-measurement on a busy chip)...
    assert "f32:8x128x128:B256" in autotune._VALIDATED
    assert autotune.decide(8, 128, 128, 256) == "pallas"
    assert len(calls) == 1
    # ...while the persisted entry records the failure and no validation
    # bump, so the NEXT process retries exactly once
    assert "validations" not in disk


def test_measure_exception_serves_cached_winner(monkeypatch):
    """measure() RAISING (unguarded XLA-candidate timing) must not crash
    the caller's trace: serve the cached winner, persist nothing."""
    good = {
        "f32:8x128x128:B256": dict(
            winner="pallas", pallas_ms=1.0, xla_ms=2.0, flops=1, hbm_bytes=1,
            achieved_tflops=0.0, roofline_fraction=0.0,
        )
    }
    with open(autotune.cache_path(), "w") as f:
        json.dump(good, f)

    def raising_measure(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: busy chip")

    monkeypatch.setattr(autotune, "measure", raising_measure)
    assert autotune.decide(8, 128, 128, 256) == "pallas"
    # no cache: safe xla default
    monkeypatch.setattr(autotune, "_CACHE", {})
    monkeypatch.setattr(
        autotune, "cache_path", lambda: "/nonexistent/autotune.json"
    )
    assert autotune.decide(8, 128, 128, 256) == "xla"
