"""Marginal MAP (MMAP): brute-force-oracle parity + edge cases.

Oracle: the sum over non-MAP variables of the full joint IS the marginal
table over the MAP variables (tests/util.brute_force_marginals, oracle #1
from the reference's test strategy, SURVEY.md §4); MMAP is its max entry.
The reference library has no MAP/MMAP support at all
(/root/reference/junctiontree/sum_product.py:7-8 anticipates max-product but
never implements it)."""

import numpy as np
import pytest

from junctiontree_tpu import Engine, MarginalMapSolver, compile_plan, marginal_map
from junctiontree_tpu.mmap import build_bucket_tree, constrained_order

from .util import brute_force_marginals, grid_mrf, random_factor_graph, random_values


def _oracle_mmap(factors, sizes, values, map_vars, evidence=None):
    """(best assignment dict under lexicographic-max, log best score,
    full marginal table over map_vars)."""
    marg = brute_force_marginals(
        factors, sizes, values, [list(map_vars)], evidence
    )[0]
    best = float(marg.max())
    return best, marg


def _check(factors, sizes, values, map_vars, evidence=None, atol=1e-5):
    assign, score = marginal_map(factors, values, sizes, map_vars, evidence)
    best, marg = _oracle_mmap(factors, sizes, values, map_vars, evidence)
    assert score == pytest.approx(np.log(best), abs=atol)
    # the decoded assignment must ACHIEVE the optimum (ties may differ)
    got = marg[tuple(assign[v] for v in map_vars)]
    assert got == pytest.approx(best, rel=1e-6)


def test_simple_chain():
    factors = [["a", "b"], ["b", "c"], ["c", "d"]]
    sizes = {"a": 2, "b": 3, "c": 2, "d": 4}
    values = random_values(factors, sizes, seed=0)
    _check(factors, sizes, values, ["a", "d"])
    _check(factors, sizes, values, ["b"])
    _check(factors, sizes, values, ["a", "c"], evidence={"d": 2})


@pytest.mark.parametrize("seed", range(6))
def test_random_graphs(seed):
    factors, sizes = random_factor_graph(seed, n_vars=7, n_factors=9)
    values = random_values(factors, sizes, seed=seed + 100)
    rng = np.random.default_rng(seed)
    all_vars = sorted({v for f in factors for v in f})
    k = int(rng.integers(1, len(all_vars)))
    map_vars = list(rng.choice(all_vars, size=k, replace=False))
    _check(factors, sizes, values, map_vars)
    # with evidence on one non-MAP var when one exists
    rest = [v for v in all_vars if v not in map_vars]
    if rest:
        ev_var = rest[0]
        _check(factors, sizes, values, map_vars,
               evidence={ev_var: sizes[ev_var] - 1})


def test_all_map_vars_equals_mpe():
    """Q = all vars reduces MMAP to MPE; score must match the max-product
    engine's MAP score."""
    factors, sizes = random_factor_graph(3, n_vars=6, n_factors=8)
    values = random_values(factors, sizes, seed=7)
    all_vars = sorted({v for f in factors for v in f})
    assign, score = marginal_map(factors, values, sizes, all_vars)
    plan = compile_plan(factors, sizes)
    eng = Engine(plan).set_potentials(values)
    a2, s2 = eng.map_assignment()
    assert score == pytest.approx(s2, abs=1e-5)
    # both assignments achieve the same joint value
    assert eng.score_assignment(assign) == pytest.approx(s2, abs=1e-5)


def test_no_map_vars_equals_logz():
    factors = [["a", "b"], ["b", "c"]]
    sizes = {"a": 2, "b": 2, "c": 3}
    values = random_values(factors, sizes, seed=1)
    assign, score = marginal_map(factors, values, sizes, [])
    assert assign == {}
    z = brute_force_marginals(factors, sizes, values, [[]])[0]
    assert score == pytest.approx(np.log(float(z)), abs=1e-5)


def test_structural_zeros():
    """Deterministic CPD rows (zeros) must not poison max/logsumexp."""
    factors = [["a"], ["a", "b"], ["b", "c"]]
    sizes = {"a": 2, "b": 2, "c": 2}
    values = [
        np.array([0.4, 0.6]),
        np.array([[1.0, 0.0], [0.0, 1.0]]),  # b == a, deterministic
        np.array([[0.9, 0.1], [0.2, 0.8]]),
    ]
    _check(factors, sizes, values, ["b"])
    _check(factors, sizes, values, ["c"], evidence={"a": 1})


def test_forest_components_and_scalar_factor():
    """Disconnected components: per-root scores add; empty-scope factors
    contribute a scalar log offset."""
    factors = [["a", "b"], ["c", "d"], []]
    sizes = {"a": 2, "b": 3, "c": 2, "d": 2}
    values = [
        np.abs(np.random.default_rng(0).normal(size=(2, 3))) + 0.1,
        np.abs(np.random.default_rng(1).normal(size=(2, 2))) + 0.1,
        np.array(2.5),
    ]
    assign, score = marginal_map(factors, values, sizes, ["a", "d"])
    marg = brute_force_marginals(
        factors[:2], sizes, values[:2], [["a", "d"]]
    )[0]
    want = np.log(marg.max()) + np.log(2.5)
    assert score == pytest.approx(want, abs=1e-5)
    assert marg[assign["a"], assign["d"]] == pytest.approx(marg.max(), rel=1e-6)


def test_batched_masks():
    """One compiled program answers a whole batch of evidence masks."""
    factors = [["a", "b"], ["b", "c"], ["c", "d"]]
    sizes = {"a": 2, "b": 2, "c": 2, "d": 3}
    values = random_values(factors, sizes, seed=5)
    solver = MarginalMapSolver(factors, sizes, ["a", "c"]).set_potentials(values)
    B = 3
    NEG = -1e30
    mask = np.zeros((B, sizes["d"]), dtype=np.float32)
    mask[0, :] = [0, NEG, NEG]
    mask[1, :] = [NEG, 0, NEG]
    mask[2, :] = 0.0  # unobserved row
    assign, scores = solver.query_batch({"d": mask})
    assign = np.asarray(assign)
    scores = np.asarray(scores)
    for b, ev in enumerate([{"d": 0}, {"d": 1}, None]):
        best, marg = _oracle_mmap(factors, sizes, values, ["a", "c"], ev)
        assert scores[b] == pytest.approx(np.log(best), abs=1e-5)
        assert marg[assign[b, 0], assign[b, 1]] == pytest.approx(best, rel=1e-6)


def test_constrained_order_and_validity():
    """Sum vars eliminated before max vars; bucket-tree ancestors of a MAX
    bucket reduce only MAX vars (the mixed-reduction validity condition)."""
    factors, sizes = random_factor_graph(11, n_vars=8, n_factors=10)
    all_vars = sorted({v for f in factors for v in f})
    table_factors = factors
    from junctiontree_tpu.labels import intern_factors

    table, ifac, isiz = intern_factors(table_factors, sizes)
    max_ids = {table.id_of(v) for v in all_vars[:3]}
    order = constrained_order(ifac, isiz, max_ids)
    pos = {v: i for i, v in enumerate(order)}
    sum_pos = [pos[v] for v in range(len(isiz)) if v not in max_ids]
    max_pos = [pos[v] for v in max_ids]
    assert max(sum_pos) < min(max_pos)
    bt = build_bucket_tree(ifac, isiz, order)
    for q in max_ids:
        p = bt.parent[q]
        while p >= 0:
            assert p in max_ids  # every ancestor of a MAX bucket is MAX
            p = bt.parent[p]


def test_grid_mmap():
    """4x3 grid MRF with a scattered MAP set (constrained width > free)."""
    factors, sizes = grid_mrf(4, 3)
    values = random_values(factors, sizes, seed=9)
    _check(factors, sizes, values, ["g0_0", "g1_2", "g3_1"])


def test_infeasible_cap_raises():
    factors = [["a", "b"], ["b", "c"]]
    sizes = {"a": 2, "b": 2, "c": 2}
    with pytest.raises(ValueError, match="infeasible"):
        MarginalMapSolver(factors, sizes, ["a"], max_states=2)


@pytest.mark.parametrize("seed", range(6))
def test_portfolio_prefers_feasible(seed):
    """If ANY portfolio heuristic's largest bucket fits under max_states the
    solver must not raise infeasible — feasibility beats total cost in the
    candidate ranking (ADVICE r3: a lower-total but cap-exceeding winner
    used to shadow a feasible candidate)."""
    from junctiontree_tpu.labels import intern_factors

    factors, sizes = random_factor_graph(seed, n_vars=10, n_factors=14)
    rng = np.random.default_rng(seed)
    map_vars = [
        v for v in sorted({x for f in factors for x in f}, key=str)
        if rng.random() < 0.4
    ] or [factors[0][0]]
    table, ifs, isz = intern_factors(factors, sizes)
    map_ids = {table.id_of(v) for v in map_vars}
    per_h = []
    for h in ("min_fill", "min_degree", "min_weight"):
        order = constrained_order(ifs, isz, map_ids, heuristic=h)
        per_h.append(
            build_bucket_tree(ifs, isz, order).max_bucket_states(isz)
        )
    cap = min(per_h)  # tightest cap some heuristic still satisfies
    solver = MarginalMapSolver(factors, sizes, map_vars, max_states=cap)
    assert solver.bt.max_bucket_states(isz) <= cap
    # and it still decodes correctly under that cap
    values = random_values(factors, sizes, seed=seed + 100)
    solver.set_potentials(values)
    assign, score = solver.query()
    best, marg = _oracle_mmap(factors, sizes, values, map_vars)
    assert score == pytest.approx(np.log(best), abs=1e-5)


def test_errors():
    factors = [["a", "b"]]
    sizes = {"a": 2, "b": 2}
    with pytest.raises(ValueError, match="duplicates"):
        MarginalMapSolver(factors, sizes, ["a", "a"])
    # a MAP var in no factor must raise a descriptive ValueError, not the
    # raw LabelTable KeyError (ADVICE r3)
    with pytest.raises(ValueError, match="'ghost'.*no factor"):
        MarginalMapSolver(factors, sizes, ["a", "ghost"])
    s = MarginalMapSolver(factors, sizes, ["a"])
    with pytest.raises(ValueError, match="set_potentials"):
        s.query()
    with pytest.raises(ValueError, match="shape"):
        s.set_potentials([np.ones((2, 3))])


def test_soft_evidence_masks():
    """Masks are LOG-likelihood vectors, so soft (virtual) evidence is
    native: equivalent to multiplying a unary factor in."""
    factors = [["a", "b"], ["b", "c"]]
    sizes = {"a": 2, "b": 3, "c": 3}
    values = random_values(factors, sizes, seed=12)
    lik = np.array([0.5, 2.0, 0.1])
    solver = MarginalMapSolver(factors, sizes, ["a"]).set_potentials(values)
    assign, scores = solver.query_batch(
        {"c": np.log(lik)[None, :].astype(np.float32)}
    )
    marg = brute_force_marginals(
        factors + [["c"]], sizes, values + [lik], [["a"]]
    )[0]
    assert float(np.asarray(scores)[0]) == pytest.approx(
        np.log(marg.max()), abs=1e-5
    )
    assert marg[int(np.asarray(assign)[0, 0])] == pytest.approx(
        marg.max(), rel=1e-6
    )


def test_tree_object_api():
    """JunctionTree.marginal_map: object-model entry to the MMAP solver."""
    import junctiontree_tpu as jt

    factors = [["a", "b"], ["b", "c"], ["c", "d"]]
    sizes = {"a": 2, "b": 3, "c": 2, "d": 4}
    values = random_values(factors, sizes, seed=0)
    tree = jt.create_junction_tree(factors, sizes)
    assign, score = tree.marginal_map(values, ["a", "d"], {"b": 1})
    best, marg = _oracle_mmap(factors, sizes, values, ["a", "d"], {"b": 1})
    assert score == pytest.approx(np.log(best), abs=1e-5)
    assert marg[assign["a"], assign["d"]] == pytest.approx(best, rel=1e-6)


def test_describe():
    factors = [["a", "b"], ["b", "c"]]
    sizes = {"a": 2, "b": 3, "c": 2}
    s = MarginalMapSolver(factors, sizes, ["a"]).set_potentials(
        random_values(factors, sizes, seed=4)
    )
    d = s.describe()
    assert d["num_vars"] == 3 and d["num_map_vars"] == 1
    assert d["num_buckets"] == 3
    assert d["max_bucket_states"] >= 2
    assert d["compiled_programs"] == 0
    s.query()
    assert s.describe()["compiled_programs"] == 1
