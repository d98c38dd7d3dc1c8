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
    assert len(calls) == 1  # second call served from cache
    with open(autotune.cache_path()) as f:
        disk = json.load(f)
    assert disk["f32:8x128x128:B256"]["winner"] == "xla"
    # a fresh in-memory cache reloads the persisted decision
    monkeypatch.setattr(autotune, "_CACHE", None)
    assert autotune.decide(8, 128, 128, 256) == "xla"
    assert len(calls) == 1


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
