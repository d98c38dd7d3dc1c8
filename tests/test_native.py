"""Native (C++) host-compiler tests: availability, bit-identical structures
vs the pure-Python compiler, end-to-end inference through the native plan."""

import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu import native
from junctiontree_tpu.schedule import compile_plan

from .util import (
    brute_force_marginals,
    chain_bn,
    check_running_intersection,
    check_triangulation,
    grid_mrf,
    random_factor_graph,
    random_values,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native compiler unavailable (no g++)"
)


@pytest.mark.parametrize("seed", range(10))
def test_native_matches_python(seed):
    factors, sizes = random_factor_graph(seed + 100, n_vars=10, n_factors=14)
    a = compile_plan(factors, sizes, backend="python")
    b = compile_plan(factors, sizes, backend="native")
    assert a.clique_vars == b.clique_vars
    assert a.tri.factor_to_maxclique == b.tri.factor_to_maxclique
    assert a.tri.elimination_order == b.tri.elimination_order
    assert a.tree.separators == b.tree.separators
    assert a.tree.edges == b.tree.edges


@pytest.mark.parametrize(
    "case", [chain_bn(40), grid_mrf(4, 4), grid_mrf(3, 5, card=3)]
)
def test_native_plan_properties(case):
    factors, sizes = case
    plan = compile_plan(factors, sizes, backend="native")
    check_triangulation(plan)
    check_running_intersection(plan)


def test_native_disconnected_components():
    plan = compile_plan([["a"], ["b"], ["c", "d"]], {"a": 2, "b": 3, "c": 2, "d": 2},
                        backend="native")
    assert len(plan.tree.edges) == plan.tri.num_cliques - 1
    check_running_intersection(plan)


def test_native_end_to_end_inference():
    factors, sizes = grid_mrf(3, 4)
    values = random_values(factors, sizes, seed=2)
    plan = compile_plan(factors, sizes, backend="native")
    out = jt.Engine(plan).propagate(values)
    expect = brute_force_marginals(factors, sizes, values, factors)
    for o, e in zip(out, expect):
        np.testing.assert_allclose(o, e, rtol=1e-6, atol=1e-9)


def test_auto_backend_threshold():
    # small model: auto stays on python (no native call needed); just check
    # both produce working plans
    small = compile_plan(*chain_bn(5), backend="auto")
    big = compile_plan(*chain_bn(600), backend="auto")
    assert small.tri.num_cliques == 4
    assert big.tri.num_cliques == 599
