"""Segmented cold-start programs (BatchedProgramBuilder.segments).

The segmented form must be bit-identical to the monolithic program — it is
the SAME step list split at carry boundaries.  These tests pin segment
parity, carry liveness, rescale-offset threading, and the background
monolith swap in Engine.posterior_batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from junctiontree_tpu import Engine, LOG_SUM_EXP, compile_plan
from junctiontree_tpu.executor import BatchedProgramBuilder

from .util import brute_force_marginals, grid_mrf, random_factor_graph, random_values


def _run_segments(builder, n, pots, masks, post=None):
    seg_fns, carries = builder.segments(n, post=post)
    carry = ()
    for fn in seg_fns:
        carry = jax.jit(fn)(pots, masks, carry)
    V = builder.plan.num_vars
    return list(carry[:V]), carry[V]


def _assert_equalish(a, b):
    # same math, different fusion boundaries: tolerate only machine-eps
    # re-association differences between the monolith and the chunked jits
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-300
    )


def _mask_args(eng, mask_batch):
    ids, masks = eng._masks_to_program_args(mask_batch)
    return list(ids), masks


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("n_seg", [2, 3, 7])
def test_segments_bitwise_match_monolith(seed, n_seg):
    factors, sizes = random_factor_graph(seed, n_vars=9, n_factors=12)
    values = random_values(factors, sizes, seed=seed + 30)
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    B = 3
    some = sorted(sizes, key=str)[::2]
    mask_batch = {
        v: np.random.default_rng(seed).random((B, sizes[v])).astype(np.float32)
        + 0.1
        for v in some
    }
    ids, masks = _mask_args(eng, mask_batch)
    b = BatchedProgramBuilder(eng.plan, eng.semiring, ids, rescale=True)
    pots = eng._program_pots()
    m_full, z_full = jax.jit(b.full())(pots, masks)
    m_seg, z_seg = _run_segments(b, n_seg, pots, masks)
    _assert_equalish(z_full, z_seg)
    for a, c in zip(m_full, m_seg):
        _assert_equalish(a, c)


def test_segments_match_oracle_rescale_logz():
    """Rescale offsets (logoff) thread through carries exactly: logZ from
    the segmented program equals the brute-force partition function."""
    factors, sizes = grid_mrf(4, 3)
    values = random_values(factors, sizes, seed=5)
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    mask_batch = {"g0_0": np.array([[1.0, 0.0]], dtype=np.float32)}
    ids, masks = _mask_args(eng, mask_batch)
    b = BatchedProgramBuilder(eng.plan, eng.semiring, ids, rescale=True)
    margs, logz = _run_segments(b, 4, eng._program_pots(), masks)
    want = brute_force_marginals(
        factors, sizes, values, [["g0_0"]], {"g0_0": 0}
    )[0].sum()
    assert float(np.asarray(logz)[0]) == pytest.approx(np.log(want), abs=1e-4)


def test_segments_no_masks_and_single_segment():
    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=6)
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    b = BatchedProgramBuilder(eng.plan, eng.semiring, [], rescale=True)
    pots = eng._program_pots()
    m1, z1 = jax.jit(b.full())(pots, [])
    m2, z2 = _run_segments(b, 1, pots, [])
    m3, z3 = _run_segments(b, 5, pots, [])
    _assert_equalish(z1, z2)
    _assert_equalish(z1, z3)
    for a, c in zip(m1, m3):
        _assert_equalish(a, c)


def test_segments_more_than_steps():
    """n far beyond the step count degenerates gracefully (chunks of one)."""
    factors = [["a", "b"]]
    sizes = {"a": 2, "b": 3}
    values = random_values(factors, sizes, seed=0)
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    b = BatchedProgramBuilder(eng.plan, eng.semiring, [], rescale=True)
    m1, z1 = jax.jit(b.full())(eng._program_pots(), [])
    m2, z2 = _run_segments(b, 50, eng._program_pots(), [])
    _assert_equalish(z1, z2)


def test_post_hook_runs_in_final_segment():
    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=2)
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    b = BatchedProgramBuilder(eng.plan, eng.semiring, [], rescale=True)

    def post(margs, z):
        return [m / jnp.maximum(m.sum(-1, keepdims=True), 1e-38)
                for m in margs], z

    margs, z = _run_segments(b, 3, eng._program_pots(), [], post=post)
    for m in margs:
        np.testing.assert_allclose(np.asarray(m).sum(-1), 1.0, rtol=1e-5)


def test_carry_liveness_is_minimal():
    """No key rides a carry past its last read (messages die after use)."""
    factors, sizes = grid_mrf(4, 4)
    values = random_values(factors, sizes, seed=3)
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    b = BatchedProgramBuilder(eng.plan, eng.semiring, [], rescale=True)
    seg_fns, carries = b.segments(4)
    outputs = {("marg", v) for v in range(b.plan.num_vars)} | {("z",)}
    chunks = b._partition(4)
    for i, carry in enumerate(carries):
        if i == 0:
            assert carry == []
            continue
        future_reads = set(outputs)
        for ch in chunks[i:]:
            for s in ch:
                future_reads |= s["reads"]
        for key in carry:
            assert key in future_reads, f"dead key {key} carried into seg {i}"


def test_log_semiring_builder_full_matches_reference_program():
    """full() under LOG_SUM_EXP (no rescale) matches brute force."""
    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=8)
    eng = Engine(compile_plan(factors, sizes), LOG_SUM_EXP)
    eng.set_potentials(values)
    post, logz = eng.query({"g0_0": 1})
    want = brute_force_marginals(
        factors, sizes, values, [["g2_2"]], {"g0_0": 1}
    )[0]
    got = np.asarray(post[eng.plan.table.id_of("g2_2")])
    np.testing.assert_allclose(got, want / want.sum(), atol=1e-5)


def test_engine_cold_start_serving_and_swap(monkeypatch):
    """End-to-end: a 'big-clique' engine (threshold lowered for the test)
    serves its first posterior_batch through the concurrently-compiled
    chunk programs, answers match the classic path, and the background
    monolith swap engages for later calls."""
    from junctiontree_tpu.config import DEFAULT
    from junctiontree_tpu.executor import _ColdStartServing

    factors, sizes = grid_mrf(4, 4)
    values = random_values(factors, sizes, seed=13)
    monkeypatch.setattr(DEFAULT, "parallel_cold_start", True)
    monkeypatch.setattr(DEFAULT, "cold_start_min_states", 1)  # force on
    monkeypatch.setattr(DEFAULT, "cold_start_segments", 4)
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    B = 2
    masks = {"g0_0": np.array([[1, 0], [0, 1]], dtype=np.float32)}
    post, logz = eng.posterior_batch(masks)
    key = [k for k in eng._batched_cache if k[0] == "posterior_cold"][0]
    assert key[3] == B  # AOT executables are batch-shape-specialized
    serving = eng._batched_cache[key]
    assert isinstance(serving, _ColdStartServing)
    assert serving.stats["segments_compile_s"] > 0
    # classic path for comparison
    monkeypatch.setattr(DEFAULT, "parallel_cold_start", False)
    eng2 = Engine(compile_plan(factors, sizes)).set_potentials(values)
    want, wlogz = eng2.posterior_batch(masks)
    np.testing.assert_allclose(np.asarray(logz), np.asarray(wlogz), rtol=1e-6)
    for a, b in zip(post, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # background monolith finishes and swaps in
    serving._thread.join(timeout=120)
    assert serving._monolith_err is None
    assert serving.swapped
    post2, logz2 = eng.posterior_batch(masks)
    np.testing.assert_allclose(
        np.asarray(logz2), np.asarray(wlogz), rtol=1e-6
    )
    for a, b in zip(post2, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_monolith_compile_failure_is_operator_visible(monkeypatch):
    """A failed background monolith compile must not be silent (ADVICE r4):
    it warns, lands in serving.stats, and shows up in Engine.describe() —
    serving keeps working on the segmented programs either way."""
    import warnings

    from junctiontree_tpu.config import DEFAULT
    from junctiontree_tpu.executor import BatchedProgramBuilder

    factors, sizes = grid_mrf(4, 4)
    values = random_values(factors, sizes, seed=13)
    monkeypatch.setattr(DEFAULT, "parallel_cold_start", True)
    monkeypatch.setattr(DEFAULT, "cold_start_min_states", 1)
    monkeypatch.setattr(DEFAULT, "cold_start_segments", 3)

    def broken_full(self):
        raise RuntimeError("XLA said no")

    monkeypatch.setattr(BatchedProgramBuilder, "full", broken_full)
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    masks = {"g0_0": np.array([[1, 0], [0, 1]], dtype=np.float32)}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        post, logz = eng.posterior_batch(masks)
        serving = [
            v for k, v in eng._batched_cache.items()
            if k[0] == "posterior_cold"
        ][0]
        serving._thread.join(timeout=120)
    assert serving._monolith_err is not None
    assert "XLA said no" in serving.stats["monolith_error"]
    assert any("monolith compile failed" in str(x.message) for x in w)
    cold = eng.describe()["cold_start_serving"]
    (entry,) = cold.values()
    assert entry["swapped"] is False and "XLA said no" in entry["monolith_error"]
    # serving still answers (segments path)
    post2, logz2 = eng.posterior_batch(masks)
    np.testing.assert_allclose(np.asarray(logz2), np.asarray(logz), rtol=1e-6)


def test_cold_start_batch_size_change_compiles_fresh_serving(monkeypatch):
    """AOT chunk executables are shape-specialized: a different batch size
    must get its own serving entry, not a shape error (round-4 bug)."""
    from junctiontree_tpu.config import DEFAULT
    from junctiontree_tpu.executor import _ColdStartServing

    factors, sizes = grid_mrf(4, 4)
    values = random_values(factors, sizes, seed=13)
    monkeypatch.setattr(DEFAULT, "parallel_cold_start", True)
    monkeypatch.setattr(DEFAULT, "cold_start_min_states", 1)
    monkeypatch.setattr(DEFAULT, "cold_start_segments", 3)
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    m2 = {"g0_0": np.array([[1, 0], [0, 1]], dtype=np.float32)}
    m3 = {"g0_0": np.array([[1, 0], [0, 1], [1, 1]], dtype=np.float32)}
    p2, z2 = eng.posterior_batch(m2)
    p3, z3 = eng.posterior_batch(m3)  # would raise before the B-keyed cache
    assert np.asarray(z2).shape == (2,) and np.asarray(z3).shape == (3,)
    keys = [k for k in eng._batched_cache if k[0] == "posterior_cold"]
    assert len(keys) == 2
    # rows 0/1 of the B=3 call agree with the B=2 call
    np.testing.assert_allclose(
        np.asarray(z3)[:2], np.asarray(z2), rtol=1e-6
    )
