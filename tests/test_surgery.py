"""Incremental tree surgery (surgery.py) + live engine updates.

Covers the role of the reference's merge_trees/change_root/insert_sepset
surgery tests (/root/reference/tests/test_construction.py:440-798) at both
levels: the nested-list functions with reference contracts, and the
plan-level incremental edits checked for exactness against the brute-force
oracle and for structural validity (running intersection)."""

import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.models import chain_bn_model, grid_mrf_model
from junctiontree_tpu.surgery import (
    add_factor,
    change_root,
    insert_sepset,
    merge_plans,
    merge_trees,
    remove_factor,
)

from .util import brute_force_marginals, check_running_intersection


def _edge_set(tree):
    """Canonical undirected edge set {(frozenset{a,b}, sep)} of a nested tree
    (orientation-independent — reroots must preserve it)."""
    out = set()
    stack = [tree]
    while stack:
        node = stack.pop()
        for sep, sub in node[1:]:
            out.add((frozenset((node[0], sub[0])), sep))
            stack.append(sub)
    return out


# ---------- nested-list surgery ----------

def test_change_root_every_clique_preserves_edges():
    factors, sizes, _ = grid_mrf_model(3, 3, seed=0)
    plan = jt.compile_plan(factors, sizes)
    nested = plan.tree.to_nested()
    ref_edges = _edge_set(nested)
    for c in range(plan.tri.num_cliques):
        t2 = change_root(nested, c)
        assert t2[0] == c
        assert _edge_set(t2) == ref_edges


def test_change_root_contracts():
    # already-root: returned unchanged; absent clique: [] (reference
    # construction.py:377-408)
    tree = [0, (3, [1]), (4, [2, (5, [6])])]
    assert change_root(tree, 0) is tree
    assert change_root(tree, 99) == []


def test_insert_sepset_and_merge_trees():
    t1 = [0, (10, [1])]
    t2 = [2, (11, [3])]
    merged = merge_trees(t1, 1, t2, 3, 12)
    expect = _edge_set(t1) | _edge_set(t2) | {(frozenset((1, 3)), 12)}
    assert _edge_set(merged) == expect
    # the insert itself lands under the requested clique
    got = insert_sepset(t1, 0, (13, [5]))
    assert (frozenset((0, 5)), 13) in _edge_set(got)
    # and the original is untouched (pure)
    assert _edge_set(t1) == {(frozenset((0, 1)), 10)}


# ---------- plan-level: add_factor ----------

def test_add_factor_covered_keeps_tree_and_matches_oracle():
    factors, sizes, values = grid_mrf_model(3, 3, seed=1)
    plan = jt.compile_plan(factors, sizes)
    # a pairwise factor inside an existing clique: any clique's first two vars
    cv = next(c for c in plan.tri.maxcliques if len(c) >= 2)
    scope = [plan.table.label_of(cv[0]), plan.table.label_of(cv[1])]
    plan2, covered = add_factor(plan, scope)
    assert covered
    # structure is untouched: same tree object, same cliques/separators
    assert plan2.tree is plan.tree
    assert plan2.tri.maxcliques == plan.tri.maxcliques
    assert len(plan2.factors) == len(plan.factors) + 1
    check_running_intersection(plan2)

    rng = np.random.default_rng(7)
    val = rng.random((sizes[scope[0]], sizes[scope[1]])) + 0.1
    all_values = list(values) + [val]
    eng = jt.Engine(plan2).set_potentials(all_values)
    marg = eng.propagate(all_values)
    expect = brute_force_marginals(
        list(factors) + [scope], sizes, all_values,
        list(factors) + [scope],
    )
    for got, exp in zip(marg, expect):
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-6)


def test_add_factor_scalar_scope_covered():
    factors, sizes, _ = chain_bn_model(4)
    plan = jt.compile_plan(factors, sizes)
    plan2, covered = add_factor(plan, [])
    assert covered and plan2.tri.factor_to_maxclique[-1] == -1


def test_add_factor_uncovered_rebuilds_and_matches_oracle():
    factors, sizes, values = chain_bn_model(5, card=2)
    plan = jt.compile_plan(factors, sizes)
    ends = [list(sizes)[0], list(sizes)[-1]]  # chain ends: never one clique
    plan2, covered = add_factor(plan, ends)
    assert not covered
    assert len(plan2.factors) == len(plan.factors) + 1
    check_running_intersection(plan2)

    rng = np.random.default_rng(3)
    val = rng.random((sizes[ends[0]], sizes[ends[1]])) + 0.1
    all_values = list(values) + [val]
    eng = jt.Engine(plan2).set_potentials(all_values)
    marg = eng.propagate(all_values)
    expect = brute_force_marginals(
        list(factors) + [ends], sizes, all_values, list(factors) + [ends]
    )
    for got, exp in zip(marg, expect):
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-6)


def test_add_factor_uncovered_refuses_without_rebuild():
    factors, sizes, _ = chain_bn_model(5)
    plan = jt.compile_plan(factors, sizes)
    ends = [list(sizes)[0], list(sizes)[-1]]
    with pytest.raises(ValueError, match="not covered"):
        add_factor(plan, ends, allow_rebuild=False)


def test_add_factor_new_variable_needs_sizes():
    factors, sizes, _ = chain_bn_model(3)
    plan = jt.compile_plan(factors, sizes)
    with pytest.raises(KeyError, match="cardinality"):
        add_factor(plan, [list(sizes)[0], "brand_new"])
    plan2, covered = add_factor(
        plan, [list(sizes)[0], "brand_new"], sizes={"brand_new": 3}
    )
    assert not covered
    assert "brand_new" in plan2.table


# ---------- plan-level: remove_factor ----------

def test_remove_factor_matches_oracle():
    factors, sizes, values = grid_mrf_model(2, 3, seed=2)
    plan = jt.compile_plan(factors, sizes)
    ix = len(factors) // 2
    plan2 = remove_factor(plan, ix)
    assert len(plan2.factors) == len(factors) - 1
    assert plan2.tree is plan.tree
    check_running_intersection(plan2)

    keep = [i for i in range(len(factors)) if i != ix]
    kept_factors = [factors[i] for i in keep]
    kept_values = [values[i] for i in keep]
    eng = jt.Engine(plan2).set_potentials(kept_values)
    marg = eng.propagate(kept_values)
    expect = brute_force_marginals(
        kept_factors, sizes, kept_values, kept_factors
    )
    for got, exp in zip(marg, expect):
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-6)


def test_remove_factor_bounds():
    factors, sizes, _ = chain_bn_model(3)
    plan = jt.compile_plan(factors, sizes)
    with pytest.raises(IndexError):
        remove_factor(plan, len(factors))
    single = jt.compile_plan([factors[0]], sizes)
    with pytest.raises(ValueError, match="last factor"):
        remove_factor(single, 0)


# ---------- plan-level: merge_plans ----------

def test_merge_plans_disjoint_models_exact():
    f1, s1, v1 = chain_bn_model(4, card=2)
    f2raw, s2raw, v2 = grid_mrf_model(2, 2, seed=5)
    # prefix-relabel the grid so variable sets are disjoint
    ren = {k: ("m_" + k) for k in s2raw}
    f2 = [[ren[v] for v in f] for f in f2raw]
    s2 = {ren[k]: s for k, s in s2raw.items()}

    p1 = jt.compile_plan(f1, s1)
    p2 = jt.compile_plan(f2, s2)
    merged = merge_plans(p1, p2)
    check_running_intersection(merged)
    assert merged.tri.num_cliques == p1.tri.num_cliques + p2.tri.num_cliques
    # exactly one new (empty) separator joins the components
    assert len(merged.tree.separators) == (
        len(p1.tree.separators) + len(p2.tree.separators) + 1
    )
    assert merged.tree.separators[-1] == []

    all_factors = f1 + f2
    all_sizes = dict(s1, **s2)
    all_values = list(v1) + list(v2)
    eng = jt.Engine(merged).set_potentials(all_values)
    marg = eng.propagate(all_values)
    expect = brute_force_marginals(
        all_factors, all_sizes, all_values, all_factors
    )
    for got, exp in zip(marg, expect):
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-6)

    # logZ of the forest = sum of the component logZs
    from junctiontree_tpu.evidence import batch_masks

    ml = batch_masks(merged, [{}])
    _, logz = jt.Engine(merged).set_potentials(all_values).posterior_batch(ml)
    z1 = brute_force_marginals(f1, s1, v1, [f1[0]])[0].sum()
    z2 = brute_force_marginals(f2, s2, v2, [f2[0]])[0].sum()
    np.testing.assert_allclose(
        float(np.asarray(logz)[0]), np.log(z1) + np.log(z2), rtol=1e-6
    )


def test_merge_plans_shared_vars_refused():
    f1, s1, _ = chain_bn_model(3)
    p1 = jt.compile_plan(f1, s1)
    with pytest.raises(ValueError, match="disjoint"):
        merge_plans(p1, p1)


# ---------- JunctionTree-level API ----------

def test_junction_tree_surgery_api():
    factors, sizes, values = grid_mrf_model(2, 2, seed=9)
    tree = jt.create_junction_tree(factors, sizes)

    f2raw, s2raw, v2 = chain_bn_model(3)
    ren = {k: ("x_" + str(k)) for k in s2raw}
    other = jt.create_junction_tree(
        [[ren[v] for v in f] for f in f2raw], {ren[k]: s for k, s in s2raw.items()}
    )
    merged = tree.merge(other)
    assert len(merged.maxcliques) == len(tree.maxcliques) + len(other.maxcliques)
    marg = merged.propagate(list(values) + list(v2))
    assert len(marg) == len(values) + len(v2)

    grown = tree.add_factor(list(factors[0]))
    marg2 = grown.propagate(list(values) + [np.ones_like(values[0])])
    for got, exp in zip(
        marg2[: len(values)], tree.propagate(values)
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp), rtol=1e-6)

    shrunk = grown.remove_factor(len(values))
    marg3 = shrunk.propagate(values)
    for got, exp in zip(marg3, tree.propagate(values)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp), rtol=1e-6)


def test_merge_plans_shared_vars_rebuild():
    """Overlapping models merge via recompilation: the union model's
    marginals match the brute-force oracle over the concatenated factors."""
    f1 = [["a", "b"], ["b", "c"]]
    s1 = {"a": 2, "b": 3, "c": 2}
    f2 = [["b", "d"], ["d", "e"]]
    s2 = {"b": 3, "d": 2, "e": 2}
    p1 = jt.compile_plan(f1, s1)
    p2 = jt.compile_plan(f2, s2)
    merged = merge_plans(p1, p2, on_shared="rebuild")
    check_running_intersection(merged)

    rng = np.random.default_rng(13)
    v1 = [rng.random(tuple(s1[v] for v in f)) + 0.1 for f in f1]
    v2 = [rng.random(tuple(s2[v] for v in f)) + 0.1 for f in f2]
    eng = jt.Engine(merged).set_potentials(v1 + v2)
    marg = eng.propagate(v1 + v2)
    expect = brute_force_marginals(
        f1 + f2, dict(s1, **s2), v1 + v2, f1 + f2
    )
    for got, exp in zip(marg, expect):
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-6)

    # cardinality conflict on a shared label is refused
    p3 = jt.compile_plan([["b", "z"]], {"b": 4, "z": 2})
    with pytest.raises(ValueError, match="cardinality"):
        merge_plans(p1, p3, on_shared="rebuild")


# ---------- Engine.multiply_factor (live serving-side update) ----------

def test_engine_multiply_factor_matches_rebuilt_engine():
    """Baking a covered factor into a live engine's potentials must answer
    queries identically to a from-scratch engine on the grown model —
    without invalidating any cached compiled program."""
    from junctiontree_tpu.evidence import batch_masks_sparse, random_evidence_batch

    factors, sizes, values = grid_mrf_model(3, 3, seed=8)
    plan = jt.compile_plan(factors, sizes)
    cv = next(c for c in plan.tri.maxcliques if len(c) >= 2)
    scope = [plan.table.label_of(cv[1]), plan.table.label_of(cv[0])]  # unsorted
    rng = np.random.default_rng(21)
    val = rng.random((sizes[scope[0]], sizes[scope[1]])) + 0.1

    eng = jt.Engine(plan).set_potentials(values)
    evs = random_evidence_batch(plan, 4, list(sizes)[:2], seed=3)
    masks = batch_masks_sparse(plan, evs)
    # warm a compiled program BEFORE the update, then verify it serves the
    # NEW numbers afterwards (program reuse is the point of this API)
    eng.posterior_batch(masks)
    n_progs = len(eng._batched_cache)
    eng.multiply_factor(scope, val)
    post, logz = eng.posterior_batch(masks)
    assert len(eng._batched_cache) == n_progs  # no recompile

    plan2, covered = add_factor(plan, scope)
    assert covered
    eng2 = jt.Engine(plan2).set_potentials(list(values) + [val])
    post2, logz2 = eng2.posterior_batch(masks)
    np.testing.assert_allclose(np.asarray(logz), np.asarray(logz2), rtol=1e-6)
    for a, b in zip(post, post2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9
        )


def test_engine_multiply_factor_log_engine_and_errors():
    factors, sizes, values = grid_mrf_model(2, 2, seed=0)
    plan = jt.compile_plan(factors, sizes)
    eng = jt.Engine(plan, jt.LOG_SUM_EXP).set_potentials(values)
    cv = plan.tri.maxcliques[0]
    scope = [plan.table.label_of(cv[0])]
    val = np.array([2.0, 0.5])
    eng.multiply_factor(scope, val)
    post, logz = eng.query({})
    # oracle on the grown model
    expect = brute_force_marginals(
        list(factors) + [scope], sizes, list(values) + [val],
        [[plan.table.label_of(v)] for v in range(plan.num_vars)],
    )
    for v in range(plan.num_vars):
        np.testing.assert_allclose(
            np.asarray(post[v]), expect[v] / expect[v].sum(), rtol=1e-6
        )

    import itertools

    fg, sg, vg = grid_mrf_model(3, 3, seed=1)
    pg = jt.compile_plan(fg, sg)
    enough = jt.Engine(pg).set_potentials(vg)
    a, b = next(
        (a, b)
        for a, b in itertools.combinations(range(pg.num_vars), 2)
        if not any({a, b} <= set(c) for c in pg.tri.maxcliques)
    )
    with pytest.raises(ValueError, match="not covered"):
        enough.multiply_factor(
            [pg.table.label_of(a), pg.table.label_of(b)], np.ones((2, 2))
        )

    with pytest.raises(ValueError, match="unknown"):
        eng.multiply_factor(["nope"], val)

    with pytest.raises(ValueError, match="shape"):
        eng.multiply_factor(scope, np.ones(3))
