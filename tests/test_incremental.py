"""Incremental evidence sessions: parity vs full re-propagation.

Oracle: Engine.posterior_batch with the merged evidence (the full program);
the session must reproduce its posteriors and logZ exactly while touching
only the dirty path."""

import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.evidence import batch_masks_sparse, random_evidence_batch
from junctiontree_tpu.models import chain_bn_model, grid_mrf_model


def _setup(rows=4, cols=4, B=6, n_obs=5, seed=0):
    factors, sizes, values = grid_mrf_model(rows, cols, seed=seed)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    observed = list(sizes)[:n_obs]
    evs = random_evidence_batch(tree.plan, B, observed, seed=seed + 1)
    masks = batch_masks_sparse(tree.plan, evs)
    return eng, masks, sizes


def test_single_delta_matches_full():
    eng, masks, sizes = _setup()
    sess = eng.incremental(masks)
    dirty = next(iter(masks))
    B = masks[dirty].shape[0]
    new_mask = np.zeros_like(masks[dirty])
    new_mask[:, 1] = 1.0  # flip the observation to state 1
    qvars = [list(sizes)[7], list(sizes)[12], dirty]

    got_posts, got_logz = sess.query({dirty: new_mask}, qvars)

    merged = dict(masks)
    merged[dirty] = new_mask
    full_posts, full_logz = eng.posterior_batch(merged, mode="general")
    np.testing.assert_allclose(
        np.asarray(got_logz), np.asarray(full_logz), rtol=1e-6
    )
    for v, got in zip(qvars, got_posts):
        vid = eng.plan.table.id_of(v)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(full_posts[vid]),
            rtol=1e-6, atol=1e-9,
        )


def test_delta_on_unobserved_variable():
    """A delta may observe a variable outside the base observed set."""
    eng, masks, sizes = _setup()
    names = list(sizes)
    newvar = names[-1]
    assert newvar not in masks
    B = next(iter(masks.values())).shape[0]
    m = np.zeros((B, sizes[newvar]), dtype=np.float32)
    m[:, 0] = 1.0
    got_posts, got_logz = sess_query = eng.incremental(masks).query(
        {newvar: m}, [names[3]]
    )
    merged = dict(masks)
    merged[newvar] = m
    full_posts, full_logz = eng.posterior_batch(merged, mode="general")
    np.testing.assert_allclose(
        np.asarray(got_logz), np.asarray(full_logz), rtol=1e-6
    )
    vid = eng.plan.table.id_of(names[3])
    np.testing.assert_allclose(
        np.asarray(got_posts[0]), np.asarray(full_posts[vid]),
        rtol=1e-6, atol=1e-9,
    )


def test_multi_delta_and_rebase():
    eng, masks, sizes = _setup(n_obs=6)
    names = list(sizes)
    sess = eng.incremental(masks)
    d1, d2 = names[0], names[3]
    B = masks[d1].shape[0]
    m1 = np.tile(np.array([[0.0, 1.0]], dtype=np.float32), (B, 1))
    m2 = np.tile(np.array([[1.0, 0.0]], dtype=np.float32), (B, 1))

    got_posts, got_logz = sess.query({d1: m1, d2: m2}, [names[9]])
    merged = dict(masks)
    merged[d1] = m1
    merged[d2] = m2
    full_posts, full_logz = eng.posterior_batch(merged, mode="general")
    np.testing.assert_allclose(
        np.asarray(got_logz), np.asarray(full_logz), rtol=1e-6
    )
    vid = eng.plan.table.id_of(names[9])
    np.testing.assert_allclose(
        np.asarray(got_posts[0]), np.asarray(full_posts[vid]), rtol=1e-6
    )

    # rebase folds the delta in; a further query starts from the new base
    sess.rebase({d1: m1})
    got2, logz2 = sess.query({d2: m2}, [names[9]])
    np.testing.assert_allclose(np.asarray(logz2), np.asarray(full_logz),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got2[0]), np.asarray(full_posts[vid]), rtol=1e-6
    )


def test_impossible_evidence_logz():
    """A delta that zeroes out all mass yields logZ = -inf, not NaN."""
    factors = [["a", "b"], ["b", "c"]]
    sizes = {"a": 2, "b": 2, "c": 2}
    values = [np.array([[1.0, 0.0], [0.0, 1.0]]),
              np.array([[1.0, 0.0], [0.0, 1.0]])]
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    base = {"a": np.array([[1.0, 0.0]], dtype=np.float32)}
    sess = eng.incremental(base)
    # a=0 forces b=0 forces c=0; observing c=1 is impossible
    posts, logz = sess.query(
        {"c": np.array([[0.0, 1.0]], dtype=np.float32)}, ["b"]
    )
    assert np.isneginf(np.asarray(logz))[0]


def test_chain_depth_paths():
    """Deep chain: delta at one end, query at the other (longest paths)."""
    factors, sizes, values = chain_bn_model(40, seed=2)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    names = list(sizes)
    B = 3
    base = {
        names[5]: np.tile(np.array([[1.0, 0.0]], dtype=np.float32), (B, 1))
    }
    sess = eng.incremental(base)
    m = np.tile(np.array([[0.0, 1.0]], dtype=np.float32), (B, 1))
    got, logz = sess.query({names[0]: m}, [names[39]])
    merged = dict(base)
    merged[names[0]] = m
    full_posts, full_logz = eng.posterior_batch(merged, mode="general")
    np.testing.assert_allclose(np.asarray(logz), np.asarray(full_logz),
                               rtol=1e-6)
    vid = eng.plan.table.id_of(names[39])
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(full_posts[vid]), rtol=1e-6
    )


def test_delta_donation_preserves_caller_buffers():
    """sess.query donates its per-call update-mask buffers to the compiled
    delta program (config.donate_serving_masks); caller-provided DEVICE
    arrays must be defensively copied so the caller's buffers survive and
    repeated queries with the SAME array keep working (VERDICT r4 #5).
    On CPU donation is advisory — the copy path is what's exercised; the
    asserted invariant (caller array readable, results reproducible) is
    backend-independent."""
    import jax.numpy as jnp

    from junctiontree_tpu.config import DEFAULT

    assert DEFAULT.donate_serving_masks  # default-on
    eng, masks, sizes = _setup()
    sess = eng.incremental(masks)
    dirty = next(iter(masks))
    qvars = [list(sizes)[7], dirty]
    m = jnp.asarray(np.tile(
        np.array([[0.0, 1.0]], dtype=np.float32),
        (masks[dirty].shape[0], 1),
    ))
    p1, z1 = sess.query({dirty: m}, qvars)
    p2, z2 = sess.query({dirty: m}, qvars)  # same device array again
    np.testing.assert_allclose(np.asarray(m)[:, 0], 0.0, rtol=0)
    np.testing.assert_allclose(np.asarray(m)[:, 1], 1.0, rtol=0)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-6)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
