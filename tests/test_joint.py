"""Exact joint marginals over arbitrary variable sets (joint.py).

Oracle: the brute-force joint over the query set (reference test strategy
oracle #1, SURVEY.md §4).  The reference library itself can only project
single clique beliefs onto factor scopes."""

import numpy as np
import pytest

from junctiontree_tpu import Engine, LOG_SUM_EXP, MAX_PRODUCT, compile_plan
from junctiontree_tpu.joint import steiner_subtree

from .util import brute_force_marginals, grid_mrf, random_factor_graph, random_values


def _check(factors, sizes, values, qvars, evidence=None, semiring=None,
           atol=1e-6):
    eng = Engine(
        compile_plan(factors, sizes), *([semiring] if semiring else [])
    ).set_potentials(values)
    got, pz = eng.joint_marginal(qvars, evidence)
    want = brute_force_marginals(factors, sizes, values, [qvars], evidence)[0]
    z = want.sum()
    np.testing.assert_allclose(got, want / z, atol=atol)
    np.testing.assert_allclose(pz, z, rtol=1e-5)
    return eng


@pytest.mark.parametrize("semiring", [None, LOG_SUM_EXP])
def test_within_clique_pair(semiring):
    factors = [["a", "b", "c"]]
    sizes = {"a": 2, "b": 3, "c": 2}
    values = random_values(factors, sizes, seed=0)
    _check(factors, sizes, values, ["a", "c"], semiring=semiring)


@pytest.mark.parametrize("semiring", [None, LOG_SUM_EXP])
def test_cross_clique_far_pair(semiring):
    """Opposite grid corners: the Steiner path crosses many cliques, and
    the elimination scope must stay |sep|+|Q|, not the union."""
    factors, sizes = grid_mrf(4, 4)
    values = random_values(factors, sizes, seed=1)
    _check(factors, sizes, values, ["g0_0", "g3_3"], semiring=semiring)


def test_triple_across_cliques_with_evidence():
    factors, sizes = grid_mrf(3, 4)
    values = random_values(factors, sizes, seed=2)
    _check(factors, sizes, values, ["g0_0", "g1_2", "g2_3"],
           evidence={"g2_0": 1})


def test_output_axis_order_matches_request():
    factors = [["a", "b"], ["b", "c"]]
    sizes = {"a": 2, "b": 3, "c": 4}
    values = random_values(factors, sizes, seed=3)
    eng = _check(factors, sizes, values, ["c", "a"])
    j_ca, _ = eng.joint_marginal(["c", "a"])
    j_ac, _ = eng.joint_marginal(["a", "c"])
    assert j_ca.shape == (4, 2) and j_ac.shape == (2, 4)
    np.testing.assert_allclose(j_ca, j_ac.T, atol=1e-12)


def test_forest_components_independent():
    """Variables in DIFFERENT components: the joint factorizes (the empty
    separator join carries through the division exactly)."""
    factors = [["a", "b"], ["x", "y"]]
    sizes = {"a": 2, "b": 2, "x": 3, "y": 2}
    values = random_values(factors, sizes, seed=4)
    eng = _check(factors, sizes, values, ["a", "x"])
    j, _ = eng.joint_marginal(["a", "x"])
    pa = j.sum(axis=1)
    px = j.sum(axis=0)
    np.testing.assert_allclose(j, np.outer(pa, px), atol=1e-9)


def test_single_variable_equals_posterior():
    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=5)
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    j, _ = eng.joint_marginal(["g1_1"], {"g0_0": 1})
    post, _ = eng.query({"g0_0": 1})
    np.testing.assert_allclose(
        j, np.asarray(post[eng.plan.table.id_of("g1_1")]), atol=1e-6
    )


def test_structural_zeros_and_impossible_evidence():
    factors = [["a", "b"], ["b", "c"]]
    sizes = {"a": 2, "b": 2, "c": 2}
    values = random_values(factors, sizes, seed=6)
    values[0][:, 0] = 0.0  # b=0 impossible
    _check(factors, sizes, values, ["a", "c"])
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    j, pz = eng.joint_marginal(["a", "c"], {"b": 0})  # impossible evidence
    assert pz == pytest.approx(0.0, abs=1e-12)
    assert not np.any(np.isnan(j))


def test_errors():
    factors = [["a", "b"]]
    sizes = {"a": 2, "b": 2}
    values = random_values(factors, sizes, seed=7)
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    with pytest.raises(ValueError, match="duplicates"):
        eng.joint_marginal(["a", "a"])
    with pytest.raises(ValueError, match="state intermediate"):
        eng.joint_marginal(["a", "b"], max_states=1)
    mx = Engine(compile_plan(factors, sizes), MAX_PRODUCT)
    mx.set_potentials(values)
    with pytest.raises(ValueError, match="probability semiring"):
        mx.joint_marginal(["a", "b"])


def test_steiner_subtree_is_minimal():
    factors, sizes = grid_mrf(4, 4)
    values = random_values(factors, sizes, seed=8)
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    plan = eng.plan
    q = [plan.table.id_of("g0_0")]
    nodes, root, children = steiner_subtree(plan, q)
    assert nodes == {plan.var_to_clique[q[0]]}  # single-clique query
    # a pair's subtree is exactly the tree path between their cliques
    q2 = [plan.table.id_of("g0_0"), plan.table.id_of("g3_3")]
    nodes2, root2, ch2 = steiner_subtree(plan, q2)
    a, b = plan.var_to_clique[q2[0]], plan.var_to_clique[q2[1]]
    assert a in nodes2 and b in nodes2
    # every non-endpoint node has degree 2 within the subtree (a path)
    for c in nodes2:
        deg = len(ch2[c]) + (1 if plan.tree.parent[c] in nodes2 else 0)
        assert deg <= 2


def test_mutual_information():
    factors = [["a", "b"], ["b", "c"]]
    sizes = {"a": 2, "b": 3, "c": 2}
    values = random_values(factors, sizes, seed=9)
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    mi = eng.mutual_information("a", "c")
    # brute-force I(a;c)
    j = brute_force_marginals(factors, sizes, values, [["a", "c"]])[0]
    p = j / j.sum()
    pa, pc = p.sum(1, keepdims=True), p.sum(0, keepdims=True)
    want = float(np.sum(p * np.log(p / (pa * pc))))
    assert mi == pytest.approx(want, abs=1e-8)
    assert mi >= 0
    # independent components: MI == 0
    f2 = [["a", "b"], ["x", "y"]]
    s2 = {"a": 2, "b": 2, "x": 2, "y": 2}
    e2 = Engine(compile_plan(f2, s2)).set_potentials(
        random_values(f2, s2, seed=10)
    )
    assert e2.mutual_information("a", "x") == pytest.approx(0.0, abs=1e-10)


@pytest.mark.parametrize("semiring", [None, LOG_SUM_EXP])
def test_joint_marginal_batch(semiring):
    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=11)
    eng = Engine(
        compile_plan(factors, sizes), *([semiring] if semiring else [])
    ).set_potentials(values)
    B = 3
    m = np.ones((B, 2), dtype=np.float32)
    m[0] = [1.0, 0.0]
    m[1] = [0.0, 1.0]
    m = np.asarray(eng.semiring.from_linear(m))
    tables, zs = eng.joint_marginal_batch(["g0_0", "g2_2"], {"g1_1": m})
    tables, zs = np.asarray(tables), np.asarray(zs)
    assert tables.shape == (B, 2, 2)
    for b, ev in enumerate([{"g1_1": 0}, {"g1_1": 1}, None]):
        want = brute_force_marginals(
            factors, sizes, values, [["g0_0", "g2_2"]], ev
        )[0]
        np.testing.assert_allclose(tables[b], want / want.sum(), atol=1e-5)
        assert zs[b] == pytest.approx(want.sum(), rel=1e-5)


def test_joint_marginal_deep_underflow_normalizes(semiring=LOG_SUM_EXP):
    """On the log engine, a model whose unnormalized joint mass sits below
    exp(-745) must still return a finite normalized table (ADVICE r4: the
    old path multiplied by exp(m), which underflows to an all-zero
    table)."""
    n = 40
    factors = [[f"x{i}", f"x{i+1}"] for i in range(n)]
    sizes = {f"x{i}": 2 for i in range(n + 1)}
    rng = np.random.default_rng(7)
    # each factor ~1e-30: joint entries ~1e-1200, far below float64 range
    values = [
        (1e-30 * (0.5 + rng.random((2, 2)))).astype(np.float64)
        for _ in factors
    ]
    eng = Engine(compile_plan(factors, sizes), LOG_SUM_EXP).set_potentials(
        values
    )
    j, _ = eng.joint_marginal(["x0", f"x{n}"])
    assert np.isfinite(j).all() and j.sum() == pytest.approx(1.0, rel=1e-6)
    assert j.max() > 0.1  # a real distribution, not a zero table
    # parity with a rescaled brute force on the same model
    scaled = [v * 1e30 for v in values]
    want = brute_force_marginals(factors, sizes, scaled, [["x0", f"x{n}"]])[0]
    np.testing.assert_allclose(j, want / want.sum(), atol=1e-6)


@pytest.mark.parametrize("semiring", [None, LOG_SUM_EXP])
def test_joint_marginal_batch_impossible_element(semiring):
    """A batch element with impossible evidence must yield an all-zero
    table (matching the unbatched path) — not NaN (ADVICE r4: the old
    vmapped log-space normalization produced -inf - -inf = NaN)."""
    factors = [["a", "b"], ["b", "c"]]
    sizes = {"a": 2, "b": 3, "c": 2}
    values = random_values(factors, sizes, seed=12)
    values[0][:, 0] = 0.0  # b=0 structurally impossible
    eng = Engine(
        compile_plan(factors, sizes), *([semiring] if semiring else [])
    ).set_potentials(values)
    B = 2
    m = np.ones((B, 3), dtype=np.float32)
    m[0] = [1.0, 0.0, 0.0]  # impossible
    m = np.asarray(eng.semiring.from_linear(m))
    tables, zs = eng.joint_marginal_batch(["a", "c"], {"b": m})
    tables, zs = np.asarray(tables), np.asarray(zs)
    assert not np.isnan(tables).any() and not np.isnan(zs).any()
    np.testing.assert_allclose(tables[0], np.zeros((2, 2)))
    assert zs[0] == pytest.approx(0.0, abs=1e-12)
    want = brute_force_marginals(factors, sizes, values, [["a", "c"]])[0]
    np.testing.assert_allclose(tables[1], want / want.sum(), atol=1e-5)


def test_long_chain_query_no_recursion_limit():
    """A joint across a 1500-step chain walks a 1500-clique Steiner path —
    the post-order must be iterative (Python's recursion limit is 1000)."""
    from junctiontree_tpu.models import chain_bn_model

    factors, sizes, values = chain_bn_model(1500, seed=0)
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    names = list(sizes)
    j, _ = eng.joint_marginal([names[0], names[-1]])
    assert j.shape == (sizes[names[0]], sizes[names[-1]])
    np.testing.assert_allclose(j.sum(), 1.0, rtol=1e-6)
    # endpoints of a long random chain are near-independent; the joint
    # must still be a valid distribution with sane single marginals
    post, _ = eng.query()
    np.testing.assert_allclose(
        j.sum(axis=1),
        np.asarray(post[eng.plan.table.id_of(names[0])]), atol=1e-4,
    )
