"""Multi-device tests on the 8-virtual-CPU-device mesh (conftest sets
--xla_force_host_platform_device_count=8): sharded batched queries must
bit-match the unsharded path, and shard_map collectives must produce correct
global aggregates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.evidence import batch_masks, random_evidence_batch
from junctiontree_tpu.models import grid_mrf_model
from junctiontree_tpu.parallel.batch import (
    make_sharded_query,
    make_sharded_query_shardmap,
)
from junctiontree_tpu.parallel.mesh import make_mesh

from .util import brute_force_marginals


@pytest.fixture(scope="module")
def setup():
    factors, sizes, values = grid_mrf_model(3, 3, seed=2)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    evs = random_evidence_batch(tree.plan, 16, ["g0_0", "g1_1", "g2_2"], seed=5)
    mb = [jnp.asarray(m) for m in batch_masks(tree.plan, evs)]
    return factors, sizes, values, tree, eng, evs, mb


def test_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_query_matches_unsharded(setup):
    factors, sizes, values, tree, eng, evs, mb = setup
    mesh = make_mesh()  # all 8 devices on the batch axis
    fn = make_sharded_query(tree.plan, mesh)
    margs_s, z_s = fn(eng._pots, mb)

    margs_u, z_u = eng.query_batch(mb)
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_u), rtol=1e-12)
    for a, b in zip(margs_s, margs_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)

    # and against the oracle for one batch element
    var_list = list(sizes)
    expect = brute_force_marginals(
        factors, sizes, values, [[v] for v in var_list], evidence=evs[3]
    )
    for i, v in enumerate(var_list):
        vid = tree.plan.table.id_of(v)
        np.testing.assert_allclose(
            np.asarray(margs_s[vid])[3], expect[i], rtol=1e-6, atol=1e-9
        )


def test_sharded_output_actually_sharded(setup):
    _, _, _, tree, eng, _, mb = setup
    mesh = make_mesh()
    fn = make_sharded_query(tree.plan, mesh)
    _, z = fn(eng._pots, mb)
    assert len(z.sharding.device_set) == 8


@pytest.mark.parametrize("n_batch,n_model", [(8, 1), (4, 2), (2, 1)])
def test_mesh_shapes(setup, n_batch, n_model):
    _, _, _, tree, eng, _, mb = setup
    mesh = make_mesh(n_batch=n_batch, n_model=n_model)
    fn = make_sharded_query(tree.plan, mesh)
    margs, z = fn(eng._pots, mb)
    margs_u, z_u = eng.query_batch(mb)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_u), rtol=1e-12)


def test_shardmap_collective_aggregate(setup):
    _, _, _, tree, eng, _, mb = setup
    mesh = make_mesh()
    fn = make_sharded_query_shardmap(tree.plan, mesh)
    margs, z, mean_logz = fn(eng._pots, mb)
    _, z_u = eng.query_batch(mb)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_u), rtol=1e-12)
    np.testing.assert_allclose(
        float(mean_logz), np.log(np.asarray(z_u)).mean(), rtol=1e-10
    )


def test_engine_shard_batch_posterior_and_map(setup):
    """Engine.shard_batch: one annotation data-parallelizes posterior_batch
    and map_assignment_batch — results identical, outputs sharded."""
    factors, sizes, values, tree, eng, evs, mb = setup
    from junctiontree_tpu.evidence import batch_masks_sparse

    sp = {k: jnp.asarray(v)
          for k, v in batch_masks_sparse(tree.plan, evs).items()}
    post_u, logz_u = eng.posterior_batch(sp)

    eng2 = jt.Engine(tree.plan).set_potentials(values).shard_batch(make_mesh())
    post_s, logz_s = eng2.posterior_batch(sp)
    np.testing.assert_allclose(
        np.asarray(logz_s), np.asarray(logz_u), rtol=1e-10
    )
    for a, b in zip(post_s, post_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)
    assert len(logz_s.sharding.device_set) == 8

    # batched MAP through the same annotation
    B = 16
    m = np.full((B, 2), -np.inf, dtype=np.float32)
    m[np.arange(B), np.arange(B) % 2] = 0.0
    a_u, s_u = eng.map_assignment_batch({"g0_0": m})
    a_s, s_s = eng2.map_assignment_batch({"g0_0": m})
    np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_u), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a_s), np.asarray(a_u))
