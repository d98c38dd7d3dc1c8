"""Compile-phase tests: triangulation + junction-tree construction.

Covers the reference's construction test intents (reference
tests/test_construction.py): chordality of the fill-in, maximal-clique
properties, factor coverage, separator/RIP properties, traversals, duplicate
factors, int labels, edgeless graphs, disconnected graphs."""

import numpy as np
import pytest

from junctiontree_tpu.schedule import compile_plan
from junctiontree_tpu.treebuild import bf_traverse, df_traverse

from .util import (
    chain_bn,
    check_running_intersection,
    check_triangulation,
    grid_mrf,
    random_factor_graph,
)


TOPOLOGIES = (
    [chain_bn(1), chain_bn(2), chain_bn(10), chain_bn(30, card=3)]
    + [grid_mrf(2, 2), grid_mrf(3, 3), grid_mrf(4, 4), grid_mrf(3, 5, card=3)]
    + [random_factor_graph(seed) for seed in range(20)]
)


@pytest.mark.parametrize("case", range(len(TOPOLOGIES)))
def test_triangulation_and_tree_properties(case):
    factors, sizes = TOPOLOGIES[case]
    plan = compile_plan(factors, sizes)
    check_triangulation(plan)
    check_running_intersection(plan)
    # maxcliques are mutually non-contained
    csets = [set(c) for c in plan.clique_vars]
    for i, a in enumerate(csets):
        for j, b in enumerate(csets):
            if i != j:
                assert not a <= b


def test_single_factor():
    plan = compile_plan([["a", "b"]], {"a": 2, "b": 3})
    assert plan.clique_vars == [[0, 1]]
    assert plan.tri.factor_to_maxclique == [0]
    assert plan.tree.separators == []


def test_edgeless_graph():
    """Single-variable factors only (reference CHANGELOG fix for 'factor
    graphs without edges'): one singleton clique per var, joined by empty
    separators into one tree."""
    plan = compile_plan([["a"], ["b"], ["c"]], {"a": 2, "b": 3, "c": 4})
    assert sorted(map(tuple, plan.clique_vars)) == [(0,), (1,), (2,)]
    assert all(s == [] for s in plan.tree.separators)
    assert len(plan.tree.edges) == 2  # spanning tree over 3 components


def test_duplicate_factors():
    """Duplicate factors map to the same clique (reference CHANGELOG 0.1.2,
    tests/test_construction.py:430-432 intent)."""
    plan = compile_plan([["a", "b"], ["a", "b"]], {"a": 2, "b": 2})
    assert plan.tri.factor_to_maxclique[0] == plan.tri.factor_to_maxclique[1]
    assert len(plan.clique_vars) == 1


def test_int_and_tuple_labels():
    """Arbitrary hashable labels work (reference breaks on non-string labels
    in heap ties; SURVEY.md §2.2 constraint)."""
    plan = compile_plan(
        [[0, 1], [1, (2, "x")], [(2, "x"), 0]],
        {0: 2, 1: 3, (2, "x"): 4},
    )
    check_running_intersection(plan)
    assert plan.num_vars == 3


def test_chain_treewidth_is_one():
    factors, sizes = chain_bn(50)
    plan = compile_plan(factors, sizes)
    assert plan.tri.treewidth == 1
    assert plan.tri.num_cliques == 49


def test_grid_treewidth_reasonable():
    """Min-fill on a 4x4 grid should stay near treewidth 4."""
    factors, sizes = grid_mrf(4, 4)
    plan = compile_plan(factors, sizes)
    assert plan.tri.treewidth <= 6


def test_traversals_cover_all_cliques():
    factors, sizes = grid_mrf(3, 3)
    plan = compile_plan(factors, sizes)
    n = plan.tri.num_cliques
    assert sorted(bf_traverse(plan.tree)) == list(range(n))
    assert sorted(df_traverse(plan.tree)) == list(range(n))
    assert bf_traverse(plan.tree)[0] == plan.tree.root
    assert df_traverse(plan.tree)[0] == plan.tree.root


def test_nested_tree_format():
    """Reference-format nested tree: [c, (sep+offset, subtree), ...] with
    separator ids offset by clique count (reference README.md:43-70)."""
    factors, sizes = chain_bn(4)
    plan = compile_plan(factors, sizes)
    nested = plan.tree.to_nested()

    seen_cliques, seen_seps = [], []

    def walk(node):
        seen_cliques.append(node[0])
        for sep, sub in node[1:]:
            assert sep >= plan.tri.num_cliques
            seen_seps.append(sep - plan.tri.num_cliques)
            walk(sub)

    walk(nested)
    assert sorted(seen_cliques) == list(range(plan.tri.num_cliques))
    assert sorted(seen_seps) == list(range(len(plan.tree.separators)))


def test_plan_stats_and_json():
    factors, sizes = grid_mrf(3, 3)
    plan = compile_plan(factors, sizes)
    st = plan.stats()
    assert st["num_vars"] == 9
    assert st["treewidth"] >= 2
    assert st["max_clique_states"] >= 8
    js = plan.to_json()
    assert "maxcliques" in js


def test_size_one_variables():
    plan = compile_plan([["a", "b"]], {"a": 1, "b": 3})
    assert plan.clique_shape(0) == (1, 3)


def test_missing_size_raises():
    with pytest.raises(KeyError):
        compile_plan([["a", "b"]], {"a": 2})


def test_repeated_var_in_factor_raises():
    with pytest.raises(ValueError):
        compile_plan([["a", "a"]], {"a": 2})


def test_randomized_portfolio_not_worse():
    """portfolioN (greedy heuristics + randomized min-fill restarts) never
    yields a larger total state space than plain min-fill, and inference
    through its plans stays correct."""
    from junctiontree_tpu.triangulate import total_states

    factors, sizes = grid_mrf(8, 8)
    a = compile_plan(factors, sizes, heuristic="min_fill")
    b = compile_plan(factors, sizes, heuristic="portfolio8")
    assert (
        b.stats()["total_clique_states"] <= a.stats()["total_clique_states"]
    )
    check_triangulation(b)
    check_running_intersection(b)

    import junctiontree_tpu as jt
    from .util import brute_force_marginals, random_values

    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=0)
    plan = compile_plan(factors, sizes, heuristic="portfolio4")
    out = jt.Engine(plan).propagate(values)
    expect = brute_force_marginals(factors, sizes, values, factors)
    for o, e in zip(out, expect):
        np.testing.assert_allclose(o, e, rtol=1e-6)


def test_triangulation_from_order_matches_greedy():
    """Replaying a greedy order through triangulation_from_order gives the
    identical triangulation."""
    from junctiontree_tpu.labels import intern_factors
    from junctiontree_tpu.triangulate import (
        min_fill_triangulation,
        triangulation_from_order,
    )

    factors, sizes = grid_mrf(4, 5)
    _, int_factors, int_sizes = intern_factors(factors, sizes)
    a = min_fill_triangulation(int_factors, int_sizes)
    b = triangulation_from_order(int_factors, int_sizes, a.elimination_order)
    assert a.maxcliques == b.maxcliques
    assert a.factor_to_maxclique == b.factor_to_maxclique
    assert sorted(a.fill_edges) == sorted(b.fill_edges)

    with pytest.raises(ValueError):
        triangulation_from_order(int_factors, int_sizes, [0, 0, 1])


def test_anneal_not_worse_and_correct():
    """anneal (SA over elimination orders) never yields a larger total
    state space than the portfolio seed; inference stays exact."""
    factors, sizes = grid_mrf(7, 7)
    a = compile_plan(factors, sizes, heuristic="portfolio4")
    b = compile_plan(factors, sizes, heuristic="anneal1.5")
    assert (
        b.stats()["total_clique_states"] <= a.stats()["total_clique_states"]
    )
    check_triangulation(b)
    check_running_intersection(b)

    import junctiontree_tpu as jt
    from .util import brute_force_marginals, random_values

    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=2)
    plan = compile_plan(factors, sizes, heuristic="anneal0.5")
    out = jt.Engine(plan).propagate(values)
    expect = brute_force_marginals(factors, sizes, values, factors)
    for o, e in zip(out, expect):
        np.testing.assert_allclose(o, e, rtol=1e-6)


def test_find_subtree_reference_contract():
    """Same-name parity with reference construction.py:604-621 (the
    compiler uses union-find instead; this is the facade export)."""
    from junctiontree_tpu.construction import (
        construct_junction_tree, find_subtree, find_triangulation,
    )

    factors = [["a", "b"], ["b", "c"], ["c", "d"], ["x", "y"]]
    sizes = {"a": 2, "b": 2, "c": 2, "d": 2, "x": 3, "y": 3}
    _, cliques, _ = find_triangulation(factors, sizes)
    tree, seps = construct_junction_tree(cliques, sizes)
    for c in range(len(cliques)):
        assert find_subtree(tree, c)
    assert not find_subtree(tree, len(cliques) + 99)
    # matches the reference implementation bit-for-bit when importable
    import os, sys
    if os.path.isdir("/root/reference/junctiontree"):
        sys.path.insert(0, "/root/reference")
        try:
            from junctiontree.construction import find_subtree as ref_find
            for c in range(len(cliques) + 3):
                assert find_subtree(tree, c) == bool(ref_find(tree, c))
        finally:
            sys.path.remove("/root/reference")
