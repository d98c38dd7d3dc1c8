"""Chow-Liu structure learning: skeleton recovery, CPD consistency, and the
end-to-end data -> structure -> parameters -> exact inference path."""

import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.structure import (
    chow_liu,
    mutual_information,
    pairwise_counts,
)


def _sample_tree_bn(n, seed=0):
    """Ancestral samples from a fixed 6-var tree BN (mixed cardinalities).

    Structure: 0 -> 1 -> 2, 1 -> 3, 0 -> 4, 4 -> 5."""
    rng = np.random.default_rng(seed)
    cards = [2, 3, 2, 2, 3, 2]
    edges = [(0, 1), (1, 2), (1, 3), (0, 4), (4, 5)]
    # strongly-coupled CPDs so MI is unambiguous
    p_root = np.array([0.35, 0.65])
    cpds = {}
    for p, c in edges:
        m = rng.random((cards[p], cards[c])) * 0.2
        for i in range(cards[p]):
            m[i, i % cards[c]] += 2.0
        cpds[(p, c)] = m / m.sum(axis=1, keepdims=True)
    data = np.zeros((n, 6), dtype=np.int64)
    data[:, 0] = rng.choice(2, size=n, p=p_root)
    order = [0, 1, 2, 3, 4, 5]
    parent = {1: 0, 2: 1, 3: 1, 4: 0, 5: 4}
    for v in order[1:]:
        p = parent[v]
        cpd = cpds[(p, v)]
        u = rng.random(n)
        cum = np.cumsum(cpd[data[:, p]], axis=1)
        data[:, v] = (u[:, None] > cum).sum(axis=1)
    return data, cards, set(frozenset(e) for e in edges), p_root, cpds, parent


def test_pairwise_counts_match_numpy():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 3, size=(200, 4))
    cards = [3, 3, 3, 3]
    counts = pairwise_counts(data, cards)
    for v in range(4):
        for w in range(4):
            want = np.zeros((3, 3))
            for a, b in zip(data[:, v], data[:, w]):
                want[a, b] += 1
            np.testing.assert_allclose(counts[v, w], want, atol=1e-4)


def test_mutual_information_independent_vs_coupled():
    rng = np.random.default_rng(5)
    n = 5000
    x = rng.integers(0, 2, n)
    y = x.copy()
    y[: n // 20] = 1 - y[: n // 20]  # strongly coupled
    z = rng.integers(0, 2, n)        # independent of x
    data = np.stack([x, y, z], axis=1)
    counts = pairwise_counts(data, [2, 2, 2])
    mi = mutual_information(counts, [2, 2, 2])
    assert mi[0, 1] > 10 * max(mi[0, 2], 1e-9)


def test_chow_liu_recovers_tree_skeleton():
    data, cards, true_edges, *_ = _sample_tree_bn(4000, seed=1)
    factors, sizes, values, edges = chow_liu(data, cards=cards)
    got = set(frozenset(e) for e in edges)
    assert got == true_edges, (got, true_edges)
    # BN structure: every non-root factor is a row-normalized CPD
    for f, val in zip(factors, values):
        if len(f) == 2:
            np.testing.assert_allclose(val.sum(axis=1), 1.0, atol=1e-9)
        else:
            np.testing.assert_allclose(val.sum(), 1.0, atol=1e-9)


def test_chow_liu_end_to_end_inference():
    """Fitted model serves exact posteriors close to the generator's."""
    data, cards, _, p_root, cpds, parent = _sample_tree_bn(20000, seed=2)
    factors, sizes, values, edges = chow_liu(data, cards=cards)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    # P(v0 | v2 = 1) from the engine vs from the true model by enumeration
    post, _ = eng.query({2: 1})
    got = np.asarray(post[tree.plan.table.id_of(0)])
    got = got / got.sum()
    # true posterior by enumerating the 6-var joint
    import itertools

    num = np.zeros(2)
    for assign in itertools.product(*[range(c) for c in cards]):
        if assign[2] != 1:
            continue
        p = p_root[assign[0]]
        for v in range(1, 6):
            pa = parent[v]
            p *= cpds[(pa, v)][assign[pa], assign[v]]
        num[assign[0]] += p
    want = num / num.sum()
    np.testing.assert_allclose(got, want, atol=0.03)


def test_chow_liu_labels_and_defaults():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 2, size=(100, 3))
    factors, sizes, values, edges = chow_liu(data, labels=["a", "b", "c"])
    assert set(sizes) == {"a", "b", "c"}
    assert all(sizes[k] == 2 for k in sizes)
    # compiles + propagates
    tree = jt.create_junction_tree(factors, sizes)
    margs = tree.propagate(values)
    assert len(margs) == len(factors)


def test_chow_liu_input_validation():
    with pytest.raises(ValueError):
        chow_liu(np.zeros((3,)))
    with pytest.raises(ValueError):
        chow_liu(np.zeros((3, 2), dtype=int), labels=["x"])


def test_chow_liu_single_variable():
    data = np.array([[0], [1], [1], [1]])
    factors, sizes, values, edges = chow_liu(data, labels=["v"])
    assert edges == []
    np.testing.assert_allclose(values[0].sum(), 1.0)
    assert values[0][1] > values[0][0]
