"""k-best decoding on GENERAL junction trees (map_executor.tree_kbest_program).

Oracle: enumerate every joint assignment's unnormalized score and sort —
the reference's brute-force-oracle test pattern (SURVEY.md §4 oracle #1)
applied to ranked decoding.  Completes the decoding story beyond round 3's
chain-only list-Viterbi (VERDICT r3 #5)."""

import itertools

import numpy as np
import pytest

from junctiontree_tpu import Engine, MAX_PRODUCT, compile_plan

from .util import grid_mrf, random_factor_graph, random_values


def _brute_ranked(factors, sizes, values, evidence=None, floor=-1e29):
    """All assignments sorted by log unnormalized joint, best first."""
    names = sorted({v for f in factors for v in f}, key=str)
    scored = []
    for combo in itertools.product(*[range(sizes[v]) for v in names]):
        a = dict(zip(names, combo))
        if evidence and any(a[v] != s for v, s in evidence.items()):
            continue
        tot = 0.0
        for f, val in zip(factors, values):
            x = float(np.asarray(val)[tuple(a[v] for v in f)])
            if x <= 0:
                tot = -np.inf
                break
            tot += np.log(x)
        if tot > floor:
            scored.append((tot, a))
    scored.sort(key=lambda t: -t[0])
    return scored


def _engine(factors, sizes, values):
    eng = Engine(compile_plan(factors, sizes), MAX_PRODUCT)
    return eng.set_potentials(values)


def _check_topk(factors, sizes, values, k, evidence=None, atol=1e-5):
    eng = _engine(factors, sizes, values)
    got = eng.top_k_assignments(evidence, k=k)
    want = _brute_ranked(factors, sizes, values, evidence)[:k]
    assert len(got) == len(want)
    np.testing.assert_allclose(
        [s for _, s in got], [s for s, _ in want], atol=atol
    )
    # every returned assignment achieves its reported score, respects the
    # evidence, and the list is distinct
    seen = set()
    for a, s in got:
        tot = 0.0
        for f, val in zip(factors, values):
            tot += np.log(np.asarray(val)[tuple(a[v] for v in f)])
        assert tot == pytest.approx(s, abs=atol)
        if evidence:
            assert all(a[v] == st for v, st in evidence.items())
        key = tuple(sorted(a.items()))
        assert key not in seen
        seen.add(key)


@pytest.mark.parametrize("seed", range(5))
def test_random_trees_match_bruteforce(seed):
    factors, sizes = random_factor_graph(seed, n_vars=7, n_factors=9)
    values = random_values(factors, sizes, seed=seed + 50)
    _check_topk(factors, sizes, values, k=8)


def test_grid_with_evidence():
    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=3)
    _check_topk(factors, sizes, values, k=6, evidence={"g1_1": 1, "g0_2": 0})


def test_k_exceeds_assignment_count():
    factors = [["a", "b"], ["b", "c"]]
    sizes = {"a": 2, "b": 2, "c": 2}
    values = random_values(factors, sizes, seed=1)
    eng = _engine(factors, sizes, values)
    got = eng.top_k_assignments(k=50)
    want = _brute_ranked(factors, sizes, values)
    assert len(got) == len(want) == 8
    np.testing.assert_allclose(
        [s for _, s in got], [s for s, _ in want], atol=1e-5
    )


def test_first_equals_map_on_tree():
    factors, sizes = grid_mrf(3, 4)
    values = random_values(factors, sizes, seed=7)
    eng = _engine(factors, sizes, values)
    (a1, s1), *_ = eng.top_k_assignments(k=4)
    a0, s0 = eng.map_assignment()
    assert s1 == pytest.approx(s0, abs=1e-5)


def test_forest_components():
    """Disconnected components joined by empty separators still rank
    exactly (the reference's empty-separator forest join,
    construction.py:530)."""
    factors = [["a", "b"], ["c", "d"], ["d", "e"]]
    sizes = {"a": 2, "b": 3, "c": 2, "d": 2, "e": 3}
    values = random_values(factors, sizes, seed=9)
    _check_topk(factors, sizes, values, k=10)


def test_structural_zeros_feasible_only():
    """Zero potential entries (log -inf) must never appear in the ranked
    list while feasible assignments remain."""
    factors = [["a", "b"], ["b", "c"]]
    sizes = {"a": 2, "b": 2, "c": 2}
    values = random_values(factors, sizes, seed=2)
    values[0][0, 0] = 0.0  # forbid a=0,b=0
    eng = _engine(factors, sizes, values)
    got = eng.top_k_assignments(k=8)
    want = _brute_ranked(factors, sizes, values)
    assert len(got) == len(want) == 6
    np.testing.assert_allclose(
        [s for _, s in got], [s for s, _ in want], atol=1e-5
    )
    for a, _ in got:
        assert not (a["a"] == 0 and a["b"] == 0)


def test_batched_masks():
    """top_k_assignments_batch ranks per batch element under per-element
    evidence masks."""
    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=11)
    eng = _engine(factors, sizes, values)
    B, k = 3, 5
    m = np.zeros((B, 2), dtype=np.float32)
    m[0] = [0.0, -np.inf]     # g0_0 = 0
    m[1] = [-np.inf, 0.0]     # g0_0 = 1
    # row 2: unobserved
    assign, scores = eng.top_k_assignments_batch({"g0_0": m}, k=k)
    assign, scores = np.asarray(assign), np.asarray(scores)
    names = sorted(sizes, key=str)
    for b, ev in enumerate([{"g0_0": 0}, {"g0_0": 1}, None]):
        want = _brute_ranked(factors, sizes, values, ev)[:k]
        np.testing.assert_allclose(
            scores[b], [s for s, _ in want], atol=1e-5
        )
        plan = eng.plan
        for r, (ws, wa) in enumerate(want):
            a = {
                plan.table.label_of(v): int(assign[b, r, v])
                for v in range(plan.num_vars)
            }
            # decoded assignment achieves the rank-r score (ties may
            # reorder equal-scoring assignments)
            tot = sum(
                np.log(np.asarray(val)[tuple(a[v] for v in f)])
                for f, val in zip(factors, values)
            )
            assert tot == pytest.approx(ws, abs=1e-5)


def test_sum_engine_delegates():
    """A sum-product engine transparently delegates k-best to its max
    delegate (same pots)."""
    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=4)
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    got = eng.top_k_assignments(k=3)
    want = _brute_ranked(factors, sizes, values)[:3]
    np.testing.assert_allclose(
        [s for _, s in got], [s for s, _ in want], atol=1e-5
    )


def test_integer_labels_resolve_through_table():
    """Variable labels may be ints (LabelTable supports any hashable);
    mask keys must resolve through the table, not be taken as raw var ids
    (round-4 review: id 7 != label 7)."""
    factors = [[10, 20], [20, 30]]
    sizes = {10: 2, 20: 2, 30: 2}
    values = random_values(factors, sizes, seed=5)
    eng = _engine(factors, sizes, values)
    got = eng.top_k_assignments({30: 1}, k=3)
    want = _brute_ranked(factors, sizes, values, {30: 1})[:3]
    np.testing.assert_allclose(
        [s for _, s in got], [s for s, _ in want], atol=1e-5
    )
    assert all(a[30] == 1 for a, _ in got)
    # batched API with int labels
    m = np.array([[-np.inf, 0.0]], dtype=np.float32)
    assign, scores = eng.top_k_assignments_batch({30: m}, k=3)
    np.testing.assert_allclose(
        np.asarray(scores)[0], [s for s, _ in want], atol=1e-5
    )
    # MAP with int labels on a general tree
    a, s = eng.map_assignment({30: 1})
    assert a[30] == 1 and s == pytest.approx(want[0][0], abs=1e-5)
