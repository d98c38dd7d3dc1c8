"""log-matmul-exp contraction path: parity with the broadcast+logsumexp
reduce on big-scope log_sum_exp contractions."""

import numpy as np
import pytest

import junctiontree_tpu.ops.semirings as sr


@pytest.fixture()
def low_threshold(monkeypatch):
    monkeypatch.setattr(sr, "LOG_EINSUM_MIN_STATES", 1)


def _rand_log(shape, rng, lo=-8.0, hi=3.0):
    return rng.uniform(lo, hi, size=shape)


def test_log_einsum_matches_reduce(low_threshold):
    rng = np.random.default_rng(0)
    a = _rand_log((4, 5, 6), rng)
    b = _rand_log((7, 5, 3), rng)   # batched message [B, v1, v3]
    got = np.asarray(
        sr.LOG_SUM_EXP.contract([a, b], [[0, 1, 2], [-1, 1, 3]], [-1, 2])
    )
    # oracle: dense logsumexp
    big = a[None, :, :, :, None] + b[:, None, :, None, :]  # [B,v0,v1,v2,v3]
    from scipy.special import logsumexp

    want = logsumexp(big, axis=(1, 2, 4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_log_einsum_neg_inf_blocks(low_threshold):
    rng = np.random.default_rng(1)
    a = _rand_log((3, 4), rng)
    b = _rand_log((4, 2), rng)
    b[:, 1] = -np.inf  # one output column fully blocked
    got = np.asarray(sr.LOG_SUM_EXP.contract([a, b], [[0, 1], [1, 2]], [2]))
    assert np.isneginf(got[1])
    from scipy.special import logsumexp

    want0 = logsumexp(a[:, :, None] + b[None, :, :], axis=(0, 1))[0]
    np.testing.assert_allclose(got[0], want0, rtol=1e-5)


def test_log_einsum_all_neg_inf_operand(low_threshold):
    a = np.full((3, 4), -np.inf)
    b = np.zeros((4, 2))
    got = np.asarray(sr.LOG_SUM_EXP.contract([a, b], [[0, 1], [1, 2]], [2]))
    assert np.all(np.isneginf(got))


def test_small_scope_uses_exact_path():
    """Below the threshold the element-exact reduce path is kept."""
    rng = np.random.default_rng(2)
    a = _rand_log((2, 3), rng)
    b = _rand_log((3, 2), rng)
    got = np.asarray(sr.LOG_SUM_EXP.contract([a, b], [[0, 1], [1, 2]], [2]))
    from scipy.special import logsumexp

    want = logsumexp(a[:, :, None] + b[None, :, :], axis=(0, 1))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_log_engine_posterior_big_scope(low_threshold):
    """End-to-end: log-space engine posterior matches the linear engine."""
    import junctiontree_tpu as jt
    from junctiontree_tpu.evidence import batch_masks_sparse, random_evidence_batch
    from junctiontree_tpu.models import grid_mrf_model

    factors, sizes, values = grid_mrf_model(4, 4, seed=6)
    tree = jt.create_junction_tree(factors, sizes)
    evs = random_evidence_batch(tree.plan, 5, list(sizes)[:4], seed=7)
    masks = batch_masks_sparse(tree.plan, evs)
    log_masks = batch_masks_sparse(tree.plan, evs, jt.LOG_SUM_EXP)
    lin_eng = jt.Engine(tree.plan, jt.SUM_PRODUCT).set_potentials(values)
    log_eng = jt.Engine(tree.plan, jt.LOG_SUM_EXP).set_potentials(values)
    p1, z1 = lin_eng.posterior_batch(masks, mode="general")
    p2, z2 = log_eng.posterior_batch(log_masks, mode="general")
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1), rtol=1e-5)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6
        )
