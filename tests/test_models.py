"""End-to-end model tests (oracle #2 pattern, reference
tests/test_junctiontree.py worked examples): sprinkler posteriors with and
without evidence, MAP queries, classic-BN-scale nets."""

import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.models import (
    alarm_like,
    chain_bn_model,
    grid_mrf_model,
    insurance_like,
    sprinkler_model,
    star_bn_model,
)

from .util import brute_force_marginals


def test_sprinkler_prior_marginals():
    factors, sizes, values = sprinkler_model()
    tree = jt.create_junction_tree(factors, sizes)
    out = tree.propagate(values)
    # P(rain) = 0.5*0.2 + 0.5*0.8 = 0.5 ; P(sprinkler=T) = 0.5*0.5+0.5*0.1 = 0.3
    p_rain = out[2].sum(axis=0) / out[2].sum()
    np.testing.assert_allclose(p_rain, [0.5, 0.5], atol=1e-6)
    p_spr = out[1].sum(axis=0) / out[1].sum()
    np.testing.assert_allclose(p_spr, [0.7, 0.3], atol=1e-6)
    # Z of a proper BN is 1
    np.testing.assert_allclose(out[0].sum(), 1.0, rtol=1e-6)


def test_sprinkler_posterior_given_wet_grass():
    """P(rain | wet_grass=T) — classic query, checked against brute force."""
    factors, sizes, values = sprinkler_model()
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    post, p_wet = eng.query({"wet_grass": 1})
    (oracle,) = brute_force_marginals(
        factors, sizes, values, [["rain"]], evidence={"wet_grass": 1}
    )
    vid = tree.plan.table.id_of("rain")
    np.testing.assert_allclose(post[vid], oracle / oracle.sum(), rtol=1e-6)
    np.testing.assert_allclose(p_wet, oracle.sum(), rtol=1e-6)
    # sanity: rain is more likely given wet grass
    assert post[vid][1] > 0.5


def test_sprinkler_map_assignment():
    factors, sizes, values = sprinkler_model()
    tree = jt.create_junction_tree(factors, sizes)
    out = tree.propagate(values, semiring="max_product")
    # max-marginal over each factor must equal global max of the joint
    joint = np.einsum(
        "a,ab,ac,bcd->abcd", *[np.asarray(v) for v in values]
    )
    for o in out:
        np.testing.assert_allclose(o.max(), joint.max(), rtol=1e-6)


@pytest.mark.parametrize(
    "builder", [alarm_like, insurance_like, lambda: chain_bn_model(40)[0:3]]
)
def test_classic_scale_bns(builder):
    factors, sizes, values = builder()
    tree = jt.create_junction_tree(factors, sizes)
    out = tree.propagate(values)
    # proper BN: Z = 1 and every factor marginal sums to 1
    for o in out:
        np.testing.assert_allclose(o.sum(), 1.0, rtol=1e-5)
    st = tree.stats()
    assert st["num_cliques"] >= 1


def test_star_bn_high_degree_distribute():
    """Wide fan-out exercises the prefix/suffix leave-one-out path."""
    factors, sizes, values = star_bn_model(12)
    tree = jt.create_junction_tree(factors, sizes)
    out = tree.propagate(values)
    expect = brute_force_marginals(factors, sizes, values, factors)
    for o, e in zip(out, expect):
        np.testing.assert_allclose(o, e, rtol=1e-6, atol=1e-9)


def test_grid_partition_function():
    factors, sizes, values = grid_mrf_model(4, 4, seed=3)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine("log_sum_exp").set_potentials(values)
    _, z = eng.query({})
    # oracle logZ by brute force over 2^16 states
    (m,) = brute_force_marginals(factors, sizes, values, [[]])
    np.testing.assert_allclose(z, m, rtol=1e-5)


def test_banded_bayesnet_scale():
    """1000-var bounded-treewidth BN: tractable plan, correct local check."""
    from junctiontree_tpu.models import banded_bayesnet

    factors, sizes, values = banded_bayesnet(300, band=6, seed=0)
    tree = jt.create_junction_tree(factors, sizes)
    st = tree.stats()
    assert st["treewidth"] <= 8
    assert st["num_vars"] == 300
    # proper BN: logZ = 0 with no evidence
    eng = tree.engine().set_potentials(values)
    post, logz = eng.posterior_batch({})
    np.testing.assert_allclose(np.asarray(logz), 0.0, atol=1e-4)
    for v in range(0, 300, 97):
        np.testing.assert_allclose(
            np.asarray(post[v]).sum(-1), 1.0, rtol=1e-5
        )


def test_infeasible_model_fails_fast():
    """Unbounded random DAGs reach intractable treewidth; the engine must
    refuse with a diagnostic instead of attempting a giant allocation."""
    from junctiontree_tpu.models import random_bayesnet

    factors, sizes, values = random_bayesnet(400, max_parents=2, seed=0)
    tree = jt.create_junction_tree(factors, sizes)
    if tree.stats()["max_clique_states"] > (1 << 28):
        with pytest.raises(ValueError, match="infeasible for exact inference"):
            tree.engine().set_potentials(values)
