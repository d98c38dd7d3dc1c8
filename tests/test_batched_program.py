"""Batch-aware program tests: the unbatched-potentials einsum program must
match the vmap path and the oracle across semirings, sparse/full masks, and
big-clique models."""

import jax.numpy as jnp
import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.evidence import (
    batch_masks,
    batch_masks_sparse,
    random_evidence_batch,
)
from junctiontree_tpu.models import grid_mrf_model

from .util import brute_force_marginals, grid_mrf, random_factor_graph, random_values


@pytest.fixture(scope="module")
def grid_setup():
    factors, sizes, values = grid_mrf_model(3, 3, seed=9)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    evs = random_evidence_batch(tree.plan, 6, ["g0_0", "g1_2"], seed=3)
    return factors, sizes, values, tree, eng, evs


def test_full_masks_match_vmap(grid_setup):
    factors, sizes, values, tree, eng, evs = grid_setup
    mb = [jnp.asarray(m) for m in batch_masks(tree.plan, evs)]
    m1, z1 = eng.query_batch(mb)
    m2, z2 = eng.query_batch_vmap(mb)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-10)
    for a, b in zip(m1, m2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


def test_sparse_masks_match_full(grid_setup):
    factors, sizes, values, tree, eng, evs = grid_setup
    full = [jnp.asarray(m) for m in batch_masks(tree.plan, evs)]
    sparse = batch_masks_sparse(tree.plan, evs)
    assert set(sparse) == {"g0_0", "g1_2"}
    m1, z1 = eng.query_batch(sparse)
    m2, z2 = eng.query_batch(full)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-10)
    for a, b in zip(m1, m2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)
    # marginals cover every variable and carry the batch axis
    assert len(m1) == tree.plan.num_vars
    assert all(np.asarray(m).shape[0] == 6 for m in m1)


def test_sparse_masks_match_oracle(grid_setup):
    factors, sizes, values, tree, eng, evs = grid_setup
    sparse = batch_masks_sparse(tree.plan, evs)
    margs, zs = eng.query_batch(sparse)
    var_list = list(sizes)
    for b in (0, 5):
        expect = brute_force_marginals(
            factors, sizes, values, [[v] for v in var_list], evidence=evs[b]
        )
        for i, v in enumerate(var_list):
            vid = tree.plan.table.id_of(v)
            np.testing.assert_allclose(
                np.asarray(margs[vid])[b], expect[i], rtol=1e-6, atol=1e-9
            )


def test_no_evidence_batch():
    """Empty mask dict: program runs fully unbatched, results broadcast."""
    factors, sizes, values = grid_mrf_model(2, 3, seed=1)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    margs, z = eng.query_batch({})
    (oracle_z,) = brute_force_marginals(factors, sizes, values, [[]])
    np.testing.assert_allclose(np.asarray(z)[0], oracle_z, rtol=1e-6)


@pytest.mark.parametrize("semiring", ["log_sum_exp", "max_product"])
def test_batched_program_other_semirings(semiring):
    factors, sizes = grid_mrf(2, 3)
    values = random_values(factors, sizes, seed=6)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine(semiring).set_potentials(values)
    evs = random_evidence_batch(tree.plan, 4, ["g0_0"], seed=2)
    sparse = batch_masks_sparse(tree.plan, evs, eng.semiring)
    m1, z1 = eng.query_batch(sparse)
    full = [jnp.asarray(m) for m in batch_masks(tree.plan, evs, eng.semiring)]
    m2, z2 = eng.query_batch_vmap(full)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-6)
    for a, b in zip(m1, m2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_random_graphs_batched():
    for seed in range(5):
        factors, sizes = random_factor_graph(seed + 50, n_vars=6, n_factors=8)
        values = random_values(factors, sizes, seed=seed)
        tree = jt.create_junction_tree(factors, sizes)
        eng = tree.engine().set_potentials(values)
        var_list = list(sizes)
        evs = random_evidence_batch(tree.plan, 3, var_list[:2], seed=seed)
        sparse = batch_masks_sparse(tree.plan, evs)
        margs, zs = eng.query_batch(sparse)
        expect = brute_force_marginals(
            factors, sizes, values, [[v] for v in var_list], evidence=evs[1]
        )
        for i, v in enumerate(var_list):
            vid = tree.plan.table.id_of(v)
            np.testing.assert_allclose(
                np.asarray(margs[vid])[1], expect[i], rtol=1e-6, atol=1e-9
            )
