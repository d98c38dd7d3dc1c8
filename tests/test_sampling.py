"""Exact posterior sampling tests: empirical frequencies must match exact
marginals (and pairwise joints) within sampling error."""

import jax
import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.sampling import engine_sample

from .util import brute_force_marginals, chain_bn, grid_mrf, random_values


def _check_empirical(plan, samples, factors, sizes, values, evidence=None):
    n = samples.shape[0]
    var_list = list(sizes)
    expect = brute_force_marginals(
        factors, sizes, values, [[v] for v in var_list], evidence=evidence
    )
    for i, v in enumerate(var_list):
        vid = plan.table.id_of(v)
        p = expect[i] / expect[i].sum()
        counts = np.bincount(samples[:, vid], minlength=sizes[v])
        emp = counts / n
        # 5 sigma of a binomial proportion
        tol = 5 * np.sqrt(np.maximum(p * (1 - p), 1e-4) / n)
        assert np.all(np.abs(emp - p) <= tol + 1e-3), (v, emp, p)


def test_samples_match_marginals():
    factors, sizes = grid_mrf(2, 3)
    values = random_values(factors, sizes, seed=17)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    samples = engine_sample(eng, jax.random.PRNGKey(0), 20000)
    assert samples.shape == (20000, 6)
    _check_empirical(tree.plan, samples, factors, sizes, values)


def test_samples_respect_evidence():
    factors, sizes = chain_bn(6)
    values = random_values(factors, sizes, seed=3)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    ev = {"x2": 1, "x5": 0}
    samples = engine_sample(eng, jax.random.PRNGKey(1), 10000, evidence=ev)
    v2 = tree.plan.table.id_of("x2")
    v5 = tree.plan.table.id_of("x5")
    assert np.all(samples[:, v2] == 1)
    assert np.all(samples[:, v5] == 0)
    _check_empirical(tree.plan, samples, factors, sizes, values, evidence=ev)


def test_pairwise_joint_frequencies():
    """Check a cross-clique pairwise joint, not just single-var marginals."""
    factors, sizes = chain_bn(5, card=3)
    values = random_values(factors, sizes, seed=8)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    n = 30000
    samples = engine_sample(eng, jax.random.PRNGKey(2), n)
    (expect,) = brute_force_marginals(factors, sizes, values, [["x0", "x4"]])
    p = expect / expect.sum()
    a = tree.plan.table.id_of("x0")
    b = tree.plan.table.id_of("x4")
    emp = np.zeros_like(p)
    for i in range(3):
        for j in range(3):
            emp[i, j] = np.mean((samples[:, a] == i) & (samples[:, b] == j))
    tol = 5 * np.sqrt(np.maximum(p * (1 - p), 1e-4) / n)
    assert np.all(np.abs(emp - p) <= tol + 1e-3), (emp, p)


def test_deterministic_given_key():
    factors, sizes = chain_bn(4)
    values = random_values(factors, sizes, seed=1)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    s1 = engine_sample(eng, jax.random.PRNGKey(7), 64)
    s2 = engine_sample(eng, jax.random.PRNGKey(7), 64)
    np.testing.assert_array_equal(s1, s2)
