"""MLE learning tests: moment matching on exact samples recovers the data
distribution's factor marginals."""

import jax
import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.learn import (
    empirical_marginals,
    expected_counts,
    fit_em,
    fit_mle,
    fit_mle_missing,
    log_likelihood,
    marginal_log_likelihood,
    masks_from_data,
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


def _cpd_chain(n, card=2, seed=0):
    """Chain BN with proper CPD values (child = last axis)."""
    factors, sizes = chain_bn(n, card)
    rng = np.random.default_rng(seed)
    values = []
    for f in factors:
        shape = tuple(sizes[v] for v in f)
        t = rng.random(shape) + 0.2
        values.append(t / t.sum(axis=-1, keepdims=True))
    return factors, sizes, values


def test_masks_from_data_and_marginal_loglik():
    factors, sizes, values = _cpd_chain(3, seed=11)
    tree = jt.create_junction_tree(factors, sizes)
    plan = tree.plan
    data = np.array([[0, 1, -1], [1, -1, 0]])
    masks = masks_from_data(plan, data)
    assert masks[plan.table.id_of("x2")].tolist()[0] == [1.0, 1.0]
    assert masks[plan.table.id_of("x0")][0].tolist() == [1.0, 0.0]
    # marginal loglik of proper CPDs = mean log p(observed)
    import jax.numpy as jnp

    thetas = [jnp.log(jnp.asarray(v)) for v in values]
    got = float(marginal_log_likelihood(plan, thetas, masks))
    # brute force: enumerate the joint
    joint = np.einsum("a,ab,bc->abc", *values)
    p0 = joint[0, 1, :].sum()
    p1 = joint[1, :, 0].sum()
    np.testing.assert_allclose(got, np.mean(np.log([p0, p1])), rtol=1e-5)


def test_expected_counts_complete_data_are_empirical():
    """With fully observed data, E[phi|x] is the indicator, so expected
    counts = N * empirical tables regardless of the model parameters."""
    factors, sizes, values = _cpd_chain(4, seed=3)
    tree = jt.create_junction_tree(factors, sizes)
    plan = tree.plan
    rng = np.random.default_rng(0)
    data = rng.integers(0, 2, size=(50, plan.num_vars))
    import jax.numpy as jnp

    masks = [jnp.asarray(m) for m in masks_from_data(plan, data)]
    counts = expected_counts(plan, values, masks)
    emp = empirical_marginals(plan, data)
    for c, e in zip(counts, emp):
        np.testing.assert_allclose(c, 50 * e, atol=1e-6)


def test_fit_em_complete_data_is_counting():
    """EM on complete data converges in one step to the count CPDs."""
    factors, sizes, values = _cpd_chain(3, seed=7)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    import jax

    data = engine_sample(eng, jax.random.PRNGKey(0), 500)
    plan = tree.plan
    learned, hist = fit_em(plan, data, steps=3, smoothing=0.0)
    emp = empirical_marginals(plan, data)
    # learned CPD = empirical conditional (counts normalized on child axis)
    for lv, e in zip(learned, emp):
        cond = e / np.maximum(e.sum(axis=-1, keepdims=True), 1e-12)
        np.testing.assert_allclose(lv, cond, atol=1e-9)
    # complete-data EM: loglik constant after the first M-step
    np.testing.assert_allclose(hist[1], hist[2], atol=1e-9)


def test_fit_em_hidden_variable_monotone():
    """EM with a latent variable: marginal loglik is monotone and improves."""
    factors, sizes, values = _cpd_chain(3, seed=21)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    import jax

    data = np.array(engine_sample(eng, jax.random.PRNGKey(5), 800))
    plan = tree.plan
    hidden = plan.table.id_of("x1")
    data[:, hidden] = -1  # x1 never observed
    learned, hist = fit_em(plan, data, steps=25, smoothing=1e-6, seed=4)
    assert hist[-1] > hist[0]
    diffs = np.diff(hist)
    assert np.all(diffs > -1e-7), f"EM not monotone: {diffs.min()}"
    # learned model reproduces the observable joint p(x0, x2)
    eng2 = jt.create_junction_tree(factors, sizes).engine().set_potentials(
        learned
    )
    joint_true = np.einsum("a,ab,bc->ac", *values)
    joint_fit = np.einsum("a,ab,bc->ac", *learned)
    np.testing.assert_allclose(joint_fit, joint_true, atol=0.05)


def test_fit_mle_missing_improves_and_matches_complete():
    factors, sizes = grid_mrf(2, 2)
    values = random_values(factors, sizes, seed=9)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    import jax

    data = np.asarray(engine_sample(eng, jax.random.PRNGKey(2), 1500))
    rng = np.random.default_rng(1)
    miss = rng.random(data.shape) < 0.3
    data_missing = np.where(miss, -1, data)
    plan = tree.plan
    thetas, hist = fit_mle_missing(
        plan, data_missing, steps=150, learning_rate=0.05
    )
    assert hist[-1] > hist[0]
    # fitted observable marginals close to the truth's (sampling + missing
    # noise -> loose tolerance)
    fitted = model_marginals(plan, thetas)
    truth = model_marginals(
        plan, [np.log(np.asarray(v)) for v in values]
    )
    for f_m, t_m in zip(fitted, truth):
        np.testing.assert_allclose(f_m, t_m, atol=0.07)


def test_fit_mle_chain_matches_general():
    """Chain-specialized learner = general missing-data learner (same
    objective) on a small chain, complete + missing data."""
    import jax.numpy as jnp

    from junctiontree_tpu.learn_chain import fit_mle_chain

    factors, sizes, values = _cpd_chain(5, seed=31)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    import jax

    data = np.array(engine_sample(eng, jax.random.PRNGKey(9), 600))
    rng = np.random.default_rng(2)
    data = np.where(rng.random(data.shape) < 0.25, -1, data)
    plan = tree.plan

    th_a, hist_a = fit_mle_chain(plan, data, steps=120, learning_rate=0.1)
    th_b, hist_b = fit_mle_missing(plan, data, steps=120, learning_rate=0.1)
    # both reach the same optimum of the same objective
    np.testing.assert_allclose(hist_a[-1], hist_b[-1], atol=5e-3)
    assert hist_a[-1] > hist_a[0]
    # and the fitted observable models agree
    ma = model_marginals(plan, th_a)
    mb = model_marginals(plan, th_b)
    for a, b in zip(ma, mb):
        np.testing.assert_allclose(a, b, atol=0.02)


def test_fit_mle_chain_long_compiles_fast():
    """1000-var chain: the packed/scan learner compiles in seconds (the
    generic learner would trace 1000+ ops and take minutes)."""
    import time

    from junctiontree_tpu.learn_chain import fit_mle_chain
    from junctiontree_tpu.models import chain_bn_model

    n = 1000
    factors, sizes, values = chain_bn_model(n, seed=3)
    tree = jt.create_junction_tree(factors, sizes)
    # ancestral sampling host-side (engine_sample would compile the
    # unrolled program — exactly what this test avoids)
    rng = np.random.default_rng(0)
    N = 64
    plan = tree.plan
    data = np.zeros((N, n), dtype=np.int64)
    cpd0 = np.asarray(values[0]) / np.asarray(values[0]).sum()
    col = rng.choice(2, size=N, p=cpd0)
    data[:, plan.table.id_of("x0")] = col
    for i in range(1, n):
        t = np.asarray(values[i])
        t = t / t.sum(axis=-1, keepdims=True)
        u = rng.random(N)
        col = (u > t[col, 0]).astype(np.int64)
        data[:, plan.table.id_of(f"x{i}")] = col
    t0 = time.time()
    thetas, hist = fit_mle_chain(tree.plan, data, steps=8, learning_rate=0.2)
    dt = time.time() - t0
    assert hist[-1] > hist[0]
    assert len(thetas) == len(factors)
    assert dt < 120, f"chain learner too slow: {dt:.0f}s"


def test_fit_mle_chain_rejects_non_chain():
    from junctiontree_tpu.learn_chain import fit_mle_chain

    factors, sizes = grid_mrf(2, 2)
    plan = jt.compile_plan(factors, sizes)
    with pytest.raises(ValueError, match="chain"):
        fit_mle_chain(plan, np.zeros((1, 4), dtype=int))
