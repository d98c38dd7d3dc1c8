"""MLE learning tests: moment matching on exact samples recovers the data
distribution's factor marginals."""

import jax
import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.learn import (
    empirical_marginals,
    fit_mle,
    log_likelihood,
    model_marginals,
)
from junctiontree_tpu.sampling import engine_sample

from .util import chain_bn, grid_mrf, random_values


def test_empirical_marginals():
    plan = jt.compile_plan([["a", "b"], ["b"]], {"a": 2, "b": 3})
    data = np.array([[0, 1], [0, 1], [1, 2], [0, 0]])
    emp = empirical_marginals(plan, data)
    np.testing.assert_allclose(emp[0].sum(), 1.0)
    np.testing.assert_allclose(emp[0][0, 1], 0.5)
    np.testing.assert_allclose(emp[1], [0.25, 0.5, 0.25])


def test_fit_recovers_moments():
    """Sample from a ground-truth MRF, fit a fresh model, and check the
    fitted model's factor marginals match the empirical tables (moment
    matching) and the truth's marginals within sampling error."""
    factors, sizes = grid_mrf(2, 2)
    values = random_values(factors, sizes, seed=77)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    data = engine_sample(eng, jax.random.PRNGKey(3), 4000)

    plan = tree.plan
    thetas, history = fit_mle(plan, data, steps=150, learning_rate=0.5)
    # log-likelihood increases overall
    assert history[-1] > history[0]
    fitted = model_marginals(plan, thetas)
    emp = empirical_marginals(plan, data)
    for f_m, e_m in zip(fitted, emp):
        np.testing.assert_allclose(f_m, e_m, atol=0.02)


def test_loglik_of_truth_beats_uniform():
    factors, sizes = chain_bn(4)
    values = random_values(factors, sizes, seed=5)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    data = engine_sample(eng, jax.random.PRNGKey(1), 2000)
    plan = tree.plan
    emp = empirical_marginals(plan, data)
    import jax.numpy as jnp

    ll_truth = float(
        log_likelihood(
            plan, [jnp.log(jnp.asarray(v)) for v in values],
            [jnp.asarray(m) for m in emp],
        )
    )
    ll_unif = float(
        log_likelihood(
            plan,
            [jnp.zeros(tuple(sizes[x] for x in f)) for f in factors],
            [jnp.asarray(m) for m in emp],
        )
    )
    assert ll_truth > ll_unif
