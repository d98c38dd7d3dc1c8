"""Level-fused executor tests: grouped schedule structure + differential
equivalence with the general batch-aware program on many topologies."""

import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.evidence import batch_masks_sparse, random_evidence_batch
from junctiontree_tpu.fused import build_fused_schedule
from junctiontree_tpu.models import grid_mrf_model, star_bn_model

from .util import (
    brute_force_marginals,
    chain_bn,
    grid_mrf,
    random_factor_graph,
    random_values,
)


def test_schedule_covers_all_cliques():
    plan = jt.compile_plan(*grid_mrf(4, 4))
    sched, sorted_children = build_fused_schedule(plan)
    seen = sorted(c for gs in sched.levels for g in gs for c in g.cliques)
    assert seen == list(range(plan.tri.num_cliques))
    # every var has a mask site inside its clique
    for v, (d, gi, slot, axis) in sched.mask_site.items():
        c = sched.levels[d][gi].cliques[slot]
        assert plan.clique_vars[c][axis] == v


def test_schedule_groups_tied_structures():
    """Grouping pays off on models with tied structure (stars, regular
    lattices), not on irregular min-fill triangulations."""
    factors, sizes, _ = star_bn_model(16)
    plan = jt.compile_plan(factors, sizes)
    sched, _ = build_fused_schedule(plan)
    n_groups = sum(len(gs) for gs in sched.levels)
    assert n_groups <= 3  # root group + one (or two) leaf groups


def _diff_check(factors, sizes, values, observed, B=5, seed=0):
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    evs = random_evidence_batch(tree.plan, B, observed, seed=seed)
    masks = batch_masks_sparse(tree.plan, evs)

    post_f, logz_f = eng.posterior_batch(masks, mode="fused")
    post_g, logz_g = eng.posterior_batch(masks, mode="general")
    np.testing.assert_allclose(
        np.asarray(logz_f), np.asarray(logz_g), rtol=1e-5, atol=1e-6
    )
    for v in range(tree.plan.num_vars):
        np.testing.assert_allclose(
            np.asarray(post_f[v]),
            np.asarray(post_g[v]),
            rtol=1e-5,
            atol=1e-6,
        )
    # and one entry against the oracle
    var_list = list(sizes)
    expect = brute_force_marginals(
        factors, sizes, values, [[v] for v in var_list], evidence=evs[0]
    )
    for i, v in enumerate(var_list):
        vid = tree.plan.table.id_of(v)
        np.testing.assert_allclose(
            np.asarray(post_f[vid])[0],
            expect[i] / expect[i].sum(),
            rtol=1e-5,
            atol=1e-6,
        )


def test_fused_matches_general_grid():
    factors, sizes = grid_mrf(4, 4)
    values = random_values(factors, sizes, seed=2)
    _diff_check(factors, sizes, values, ["g0_0", "g2_2", "g3_3"])


def test_fused_matches_general_mixed_cards():
    factors, sizes = grid_mrf(3, 4, card=3)
    values = random_values(factors, sizes, seed=3)
    _diff_check(factors, sizes, values, ["g0_1", "g2_3"])


def test_fused_star():
    factors, sizes, values = star_bn_model(10)
    _diff_check(factors, sizes, values, ["leaf0", "leaf7"])


@pytest.mark.parametrize("seed", range(6))
def test_fused_random_graphs(seed):
    factors, sizes = random_factor_graph(seed + 300, n_vars=9, n_factors=12)
    values = random_values(factors, sizes, seed=seed)
    var_list = list(sizes)
    _diff_check(factors, sizes, values, var_list[:3], seed=seed)


def test_fused_chain_topology():
    """Chains normally route to the scan path; force the fused path."""
    factors, sizes = chain_bn(12, card=3)
    values = random_values(factors, sizes, seed=4)
    _diff_check(factors, sizes, values, ["x3", "x11"])


def test_fused_no_evidence():
    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=5)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    post, logz = eng.posterior_batch({}, mode="fused")
    (z,) = brute_force_marginals(factors, sizes, values, [[]])
    np.testing.assert_allclose(float(np.asarray(logz)[0]), np.log(z), rtol=1e-5)


def test_auto_routes_tied_structures_only():
    # star: grouping fuses -> auto routes to the fused path
    factors, sizes, values = star_bn_model(40)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    evs = random_evidence_batch(tree.plan, 3, ["leaf0"], seed=1)
    post, logz = eng.posterior_batch(batch_masks_sparse(tree.plan, evs))
    assert any(k[0] == "fused" for k in eng._batched_cache)

    # irregular grid: no useful grouping -> stays on the general program
    factors, sizes = grid_mrf(6, 6)
    values = random_values(factors, sizes, seed=6)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    evs = random_evidence_batch(tree.plan, 3, ["g0_0"], seed=1)
    post, logz = eng.posterior_batch(batch_masks_sparse(tree.plan, evs))
    assert not any(k[0] == "fused" for k in eng._batched_cache)
