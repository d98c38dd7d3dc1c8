"""Loopy-BP approximate engine: exact on trees, Bethe-close on loopy
graphs, batched-evidence contract matches the exact engine's."""

import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.approx import LoopyEngine

from .util import brute_force_marginals, chain_bn, grid_mrf, random_values


def test_loopy_exact_on_tree():
    """On a tree-structured model loopy BP is exact (marginals and logZ)."""
    factors, sizes = chain_bn(6)
    values = random_values(factors, sizes, seed=3)
    eng = LoopyEngine(factors, sizes, values, damping=0.0, tol=1e-12)
    margs, logz, info = eng.posterior(None)
    var_list = list(sizes)
    expect = brute_force_marginals(
        factors, sizes, values, [[v] for v in var_list]
    )
    ztrue = brute_force_marginals(factors, sizes, values, [[]])[0]
    for i, v in enumerate(var_list):
        vid = eng.table.id_of(v)
        np.testing.assert_allclose(
            margs[vid], expect[i] / expect[i].sum(), atol=1e-6
        )
    np.testing.assert_allclose(logz, np.log(ztrue), atol=1e-5)


def test_loopy_exact_on_tree_with_evidence():
    factors, sizes = chain_bn(5)
    values = random_values(factors, sizes, seed=9)
    eng = LoopyEngine(factors, sizes, values, damping=0.0, tol=1e-12)
    ev = {"x1": 1, "x3": 0}
    margs, logz, info = eng.posterior(ev)
    var_list = list(sizes)
    expect = brute_force_marginals(
        factors, sizes, values, [[v] for v in var_list], evidence=ev
    )
    for i, v in enumerate(var_list):
        vid = eng.table.id_of(v)
        np.testing.assert_allclose(
            margs[vid], expect[i] / expect[i].sum(), atol=1e-6
        )
    # logZ(evidence) = log of the evidence-masked partition function
    zev = brute_force_marginals(
        factors, sizes, values, [[]], evidence=ev
    )[0]
    np.testing.assert_allclose(logz, np.log(zev), atol=1e-5)


def test_loopy_close_on_small_loopy_graph():
    """3x3 grid with moderate couplings: marginals within a few percent of
    exact, logZ within ~1%."""
    factors, sizes = grid_mrf(3, 3)
    rng = np.random.default_rng(4)
    # mild couplings keep the Bethe approximation tight
    values = [
        np.exp(0.3 * rng.standard_normal(tuple(sizes[v] for v in f)))
        for f in factors
    ]
    eng = LoopyEngine(factors, sizes, values, damping=0.5, max_iters=500,
                      tol=1e-10)
    margs, logz, info = eng.posterior(None)
    assert info["delta"] < 1e-8, "did not converge"
    var_list = list(sizes)
    expect = brute_force_marginals(
        factors, sizes, values, [[v] for v in var_list]
    )
    ztrue = brute_force_marginals(factors, sizes, values, [[]])[0]
    for i, v in enumerate(var_list):
        vid = eng.table.id_of(v)
        np.testing.assert_allclose(
            margs[vid], expect[i] / expect[i].sum(), atol=0.03
        )
    np.testing.assert_allclose(logz, np.log(ztrue), rtol=0.01)


def test_loopy_batched_matches_single():
    factors, sizes = grid_mrf(2, 3)
    values = random_values(factors, sizes, seed=7)
    eng = LoopyEngine(factors, sizes, values, damping=0.3, tol=1e-11)
    # batch of 3 evidence patterns on the same vars
    B = 3
    m00 = np.zeros((B, 2), dtype=np.float32)
    m00[[0, 1, 2], [0, 1, 0]] = 1.0
    margs, logz, _ = eng.posterior_batch({"g0_0": m00})
    for b, s in enumerate([0, 1, 0]):
        single, lz, _ = eng.posterior({"g0_0": s})
        for v in range(eng.num_vars):
            np.testing.assert_allclose(
                np.asarray(margs[v])[b], single[v], atol=1e-5
            )
        np.testing.assert_allclose(float(logz[b]), lz, atol=1e-5)


def test_loopy_large_grid_runs():
    """A 12x12 grid (treewidth ~16, painful exactly) runs fast and agrees
    with the exact engine on single-site marginals within tolerance."""
    from junctiontree_tpu.models import grid_mrf_model

    factors, sizes, values = grid_mrf_model(12, 12, coupling=0.25, seed=1)
    eng = LoopyEngine(factors, sizes, values, damping=0.5, max_iters=300)
    margs, logz, info = eng.posterior(None)
    assert np.isfinite(float(logz))
    # spot-check against the exact engine (query returns normalized
    # posteriors already)
    tree = jt.create_junction_tree(factors, sizes)
    ex = tree.engine().set_potentials(values)
    post, _z = ex.query({})
    for v in ["g0_0", "g5_5", "g11_11"]:
        vid = eng.table.id_of(v)
        exact = np.asarray(post[tree.plan.table.id_of(v)])
        np.testing.assert_allclose(margs[vid], exact, atol=0.03)


def test_loopy_map_exact_on_tree():
    """Max-product loopy BP on a tree = exact MAP (no ties with random
    potentials)."""
    from .test_map import exhaustive_map

    factors, sizes = chain_bn(5)
    values = random_values(factors, sizes, seed=13)
    eng = LoopyEngine(factors, sizes, values, damping=0.0, tol=1e-12)
    got, score, info = eng.map_assignment({"x2": 1})
    assert got["x2"] == 1
    want, want_score = exhaustive_map(
        factors, sizes, values, evidence={"x2": 1}
    )
    assert got == want
    np.testing.assert_allclose(score, want_score, rtol=1e-5)


def test_loopy_map_batch_and_infeasible():
    from .test_map import exhaustive_map

    factors, sizes = grid_mrf(2, 2)
    values = random_values(factors, sizes, seed=17)
    eng = LoopyEngine(factors, sizes, values, damping=0.3, tol=1e-11)
    B = 2
    m = np.zeros((B, 2), dtype=np.float32)
    m[0, 1] = 1.0
    m[1, :] = 0.0  # infeasible: all states forbidden
    assign, scores, info = eng.map_assignment_batch({"g0_0": m})
    want, want_score = exhaustive_map(
        factors, sizes, values, evidence={"g0_0": 1}
    )
    # loopy max-product on a 2x2 grid with random potentials: decoded score
    # should attain the exact MAP here
    np.testing.assert_allclose(scores[0], want_score, rtol=1e-4)
    assert scores[1] == -np.inf


def test_loopy_sharded_batch_matches_unsharded():
    """DP over the evidence batch on an 8-virtual-device mesh: identical
    results, batch axis actually sharded."""
    import jax
    from jax.sharding import Mesh

    factors, sizes = grid_mrf(2, 3)
    values = random_values(factors, sizes, seed=21)
    B = 16
    rng = np.random.default_rng(5)
    m00 = np.zeros((B, 2), dtype=np.float32)
    m00[np.arange(B), rng.integers(0, 2, B)] = 1.0

    plain = LoopyEngine(factors, sizes, values, damping=0.3, tol=1e-11)
    margs0, logz0, _ = plain.posterior_batch({"g0_0": m00})

    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
    sharded = LoopyEngine(
        factors, sizes, values, damping=0.3, tol=1e-11, mesh=mesh
    )
    margs1, logz1, _ = sharded.posterior_batch({"g0_0": m00})
    np.testing.assert_allclose(
        np.asarray(logz1), np.asarray(logz0), rtol=1e-6
    )
    for v in range(plain.num_vars):
        np.testing.assert_allclose(
            np.asarray(margs1[v]), np.asarray(margs0[v]), atol=1e-6
        )
    # the batch axis of the result is distributed over the mesh
    assert len(logz1.sharding.device_set) == 8


def test_loopy_errors():
    factors, sizes = chain_bn(3)
    values = random_values(factors, sizes, seed=1)
    eng = LoopyEngine(factors, sizes)
    with pytest.raises(RuntimeError, match="set_potentials"):
        eng.posterior({})
    with pytest.raises(ValueError, match="shape"):
        eng.set_potentials([np.ones(3)] + values[1:])
    eng.set_potentials(values)
    with pytest.raises(ValueError, match="out of range"):
        eng.posterior({"x0": 5})
    with pytest.raises(ValueError, match="batch"):
        eng.posterior_batch({})
