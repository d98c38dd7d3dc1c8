"""Stabilized serving-path tests: posterior_batch with HMM-style message
rescaling must match the log-space engine and the oracle, including on models
whose partition function overflows/underflows plain float32 linear space."""

import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.evidence import batch_masks_sparse, random_evidence_batch
from junctiontree_tpu.models import chain_bn_model, grid_mrf_model

from .util import brute_force_marginals


def test_posterior_batch_matches_oracle_small():
    factors, sizes, values = grid_mrf_model(3, 3, seed=4)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    evs = random_evidence_batch(tree.plan, 5, ["g0_1", "g2_0"], seed=8)
    masks = batch_masks_sparse(tree.plan, evs)
    post, logz = eng.posterior_batch(masks)
    var_list = list(sizes)
    for b in range(5):
        expect = brute_force_marginals(
            factors, sizes, values, [[v] for v in var_list], evidence=evs[b]
        )
        np.testing.assert_allclose(
            float(np.asarray(logz)[b]), np.log(expect[0].sum()), rtol=1e-5
        )
        for i, v in enumerate(var_list):
            vid = tree.plan.table.id_of(v)
            np.testing.assert_allclose(
                np.asarray(post[vid])[b],
                expect[i] / expect[i].sum(),
                rtol=1e-5,
                atol=1e-7,
            )


def test_posterior_batch_stable_at_scale():
    """10x10 grid: plain linear-space float32 Z overflows (observed NaN);
    the rescaled path must agree with the log-sum-exp engine."""
    factors, sizes, values = grid_mrf_model(10, 10, seed=0)
    tree = jt.create_junction_tree(factors, sizes)

    eng = tree.engine().set_potentials(values)
    evs = random_evidence_batch(tree.plan, 3, list(sizes)[:10], seed=2)
    masks = batch_masks_sparse(tree.plan, evs)
    post, logz = eng.posterior_batch(masks)
    assert np.all(np.isfinite(np.asarray(logz)))
    for m in post:
        assert np.all(np.isfinite(np.asarray(m)))
        np.testing.assert_allclose(np.asarray(m).sum(axis=-1), 1.0, rtol=1e-5)

    engl = tree.engine("log_sum_exp").set_potentials(values)
    masks_l = batch_masks_sparse(tree.plan, evs, engl.semiring)
    post_l, logz_l = engl.posterior_batch(masks_l)
    np.testing.assert_allclose(
        np.asarray(logz), np.asarray(logz_l), rtol=1e-5
    )
    for a, b in zip(post, post_l):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
        )


def test_posterior_batch_long_chain_underflow():
    """300-var chain BN: product of 300 CPD entries underflows float64 let
    alone float32; rescaled linear path must stay finite and correct."""
    factors, sizes, values = chain_bn_model(300, seed=1)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    evs = [{"x0": 1, "x299": 0}]
    masks = batch_masks_sparse(tree.plan, evs)
    post, logz = eng.posterior_batch(masks)
    # logZ = log P(x0=1, x299=0): finite, negative, sane magnitude
    lz = float(np.asarray(logz)[0])
    assert np.isfinite(lz) and -50 < lz < 0
    # posterior of observed var is the indicator
    v0 = tree.plan.table.id_of("x0")
    np.testing.assert_allclose(np.asarray(post[v0])[0], [0, 1], atol=1e-6)


def test_posterior_batch_impossible_evidence():
    factors, sizes, values = chain_bn_model(5, seed=0)
    values[1] = np.array([[1.0, 0.0], [1.0, 0.0]])  # x1 never equals 1
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    masks = batch_masks_sparse(tree.plan, [{"x1": 1}])
    post, logz = eng.posterior_batch(masks)
    assert float(np.asarray(logz)[0]) == -np.inf


def test_posterior_batch_max_product():
    factors, sizes, values = grid_mrf_model(2, 3, seed=5)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine("max_product").set_potentials(values)
    post, logz = eng.posterior_batch({})
    # argmax of each var's max-marginal = MAP assignment component
    from .util import brute_force_max_marginals

    var_list = list(sizes)
    expect = brute_force_max_marginals(
        factors, sizes, values, [[v] for v in var_list]
    )
    for i, v in enumerate(var_list):
        vid = tree.plan.table.id_of(v)
        assert np.argmax(np.asarray(post[vid])[0]) == np.argmax(expect[i])


def test_set_potentials_invalidates_cached_paths():
    """Updating potentials must refresh every prestacked artifact (chain
    transitions, fused stacks, MAP delegate) — regression for stale-cache
    bugs found in review."""
    import junctiontree_tpu as jt
    from junctiontree_tpu.models import chain_bn_model, star_bn_model

    # chain path: second set_potentials must neither crash nor serve stale
    factors, sizes, v1 = chain_bn_model(10, seed=1)
    _, _, v2 = chain_bn_model(10, seed=2)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(v1)
    masks = batch_masks_sparse(tree.plan, [{"x9": 1}])
    p1, z1 = eng.posterior_batch(masks)
    a1 = np.asarray(p1[0])
    eng.set_potentials(v2)
    p2, z2 = eng.posterior_batch(masks)
    fresh = tree.engine("log_sum_exp")  # unrelated; just exercise engines
    eng_fresh = jt.Engine(tree.plan).set_potentials(v2)
    p3, z3 = eng_fresh.posterior_batch(batch_masks_sparse(tree.plan, [{"x9": 1}]))
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z3), rtol=1e-6)
    assert not np.allclose(np.asarray(p2[0]), a1)

    # fused path
    factors, sizes, v1 = star_bn_model(40, seed=1)
    _, _, v2 = star_bn_model(40, seed=5)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(v1)
    masks = batch_masks_sparse(tree.plan, [{"leaf0": 1}])
    p1, z1 = eng.posterior_batch(masks)
    hub1 = np.asarray(p1[tree.plan.table.id_of("hub")]).copy()
    eng.set_potentials(v2)
    p2, z2 = eng.posterior_batch(masks)
    eng_fresh = jt.Engine(tree.plan).set_potentials(v2)
    p3, z3 = eng_fresh.posterior_batch(batch_masks_sparse(tree.plan, [{"leaf0": 1}]))
    np.testing.assert_allclose(
        np.asarray(p2[tree.plan.table.id_of("hub")]),
        np.asarray(p3[tree.plan.table.id_of("hub")]),
        rtol=1e-6,
    )
    assert not np.allclose(np.asarray(p2[tree.plan.table.id_of("hub")]), hub1)

    # MAP delegate refresh
    a_old, s_old = eng_fresh.map_assignment()
    eng_fresh.set_potentials(v1)
    a_new, s_new = eng_fresh.map_assignment()
    assert not np.isclose(s_old, s_new)


def test_donated_masks_do_not_invalidate_caller_buffers():
    """posterior_batch donates its mask buffers to the program
    (config.donate_serving_masks); caller-provided DEVICE arrays must be
    defensively copied so the caller's buffers survive and repeated calls
    with the SAME arrays keep working (round-4 verdict #5 aliasing
    guard).  On CPU donation is advisory, so the copy path is what's
    exercised; the invariant asserted — caller arrays readable and
    results reproducible after two calls — is backend-independent."""
    import jax.numpy as jnp

    import junctiontree_tpu as jt
    from junctiontree_tpu.config import DEFAULT

    from .util import grid_mrf, random_values

    assert DEFAULT.donate_serving_masks  # default-on
    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=3)
    eng = jt.create_junction_tree(factors, sizes).engine().set_potentials(
        values
    )
    m = jnp.asarray(
        np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], dtype=np.float32)
    )
    p1, z1 = eng.posterior_batch({"g0_0": m})
    p2, z2 = eng.posterior_batch({"g0_0": m})  # same device array again
    # the caller's array is still alive and unchanged
    np.testing.assert_allclose(
        np.asarray(m), [[1, 0], [0, 1], [1, 1]], rtol=0
    )
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-6)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_posterior_batch_chunked_matches_unchunked():
    """chunk= serves the batch in fixed-size row chunks through ONE cached
    executable (capacity escape hatch for HBM-pinned models); results must
    be exactly the unchunked program's, including a padded partial final
    chunk and every routing mode (general / fused / chain-scan)."""
    import junctiontree_tpu as jt
    from junctiontree_tpu.evidence import batch_masks_sparse, random_evidence_batch
    from junctiontree_tpu.models import chain_bn_model, grid_mrf_model

    for factors, sizes, values in (
        grid_mrf_model(4, 4, seed=2),
        chain_bn_model(12, seed=3),
    ):
        tree = jt.create_junction_tree(factors, sizes)
        eng = tree.engine().set_potentials(values)
        B = 7  # deliberately not a multiple of chunk=3
        observed = list(sizes)[:3]
        evs = random_evidence_batch(tree.plan, B, observed, seed=5)
        masks = batch_masks_sparse(tree.plan, evs)
        want_p, want_z = eng.posterior_batch(masks)
        got_p, got_z = eng.posterior_batch(masks, chunk=3)
        np.testing.assert_allclose(
            np.asarray(got_z), np.asarray(want_z), rtol=1e-6
        )
        for a, b in zip(got_p, want_p):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9
            )
        # B <= chunk degenerates to the plain path
        got_p2, got_z2 = eng.posterior_batch(masks, chunk=64)
        np.testing.assert_allclose(
            np.asarray(got_z2), np.asarray(want_z), rtol=1e-6
        )
