"""Distribute-pass Hugin division trick: parity against leave-one-out.

The reference validates its division trick by explicit re-multiplication
(/root/reference/tests/test_computation.py:325-374) including the
zeros-stay-zeros guard on structural zeros; here the oracle is the same
program with the division path disabled."""

import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.config import DEFAULT
from junctiontree_tpu.evidence import batch_masks_sparse, random_evidence_batch
from junctiontree_tpu.models import grid_mrf_model
from junctiontree_tpu.ops.grouped import grouped_divide_project
from junctiontree_tpu.ops.semirings import LOG_SUM_EXP, SUM_PRODUCT


def _posteriors(factors, sizes, values, masks, semiring="sum_product"):
    tree = jt.create_junction_tree(factors, sizes)
    eng = jt.Engine(tree.plan, jt.SEMIRINGS[semiring])
    eng.set_potentials(values)
    post, logz = eng.posterior_batch(masks, mode="general")
    return [np.asarray(p) for p in post], np.asarray(logz)


@pytest.mark.parametrize("semiring", ["sum_product", "log_sum_exp"])
def test_division_matches_leave_one_out(semiring):
    factors, sizes, values = grid_mrf_model(4, 4, seed=3)
    tree = jt.create_junction_tree(factors, sizes)
    observed = list(sizes)[:5]
    evs = random_evidence_batch(tree.plan, 6, observed, seed=4)
    masks = batch_masks_sparse(tree.plan, evs)

    old = DEFAULT.distribute_division
    try:
        DEFAULT.distribute_division = True
        p1, z1 = _posteriors(factors, sizes, values, masks, semiring)
        DEFAULT.distribute_division = False
        p0, z0 = _posteriors(factors, sizes, values, masks, semiring)
    finally:
        DEFAULT.distribute_division = old
    np.testing.assert_allclose(z1, z0, rtol=1e-6)
    for a, b in zip(p1, p0):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-9)


def test_division_with_structural_zeros():
    """Deterministic CPD entries (exact zeros) exercise the guard: where the
    divisor message is zero the quotient is zero, which is harmless because
    the child's belief is zero there too (reference guard semantics)."""
    factors = [["a"], ["a", "b"], ["b", "c"], ["c", "d"], ["b", "d"]]
    sizes = {"a": 2, "b": 2, "c": 3, "d": 2}
    rng = np.random.default_rng(9)
    values = [rng.random(tuple(sizes[v] for v in f)) + 0.1 for f in factors]
    values[1][0, 1] = 0.0  # deterministic row
    values[2][1, :] = 0.0  # whole slice zero -> zero messages downstream
    tree = jt.create_junction_tree(factors, sizes)
    evs = random_evidence_batch(tree.plan, 4, ["a"], seed=5)
    masks = batch_masks_sparse(tree.plan, evs)

    old = DEFAULT.distribute_division
    try:
        DEFAULT.distribute_division = True
        p1, z1 = _posteriors(factors, sizes, values, masks)
        DEFAULT.distribute_division = False
        p0, z0 = _posteriors(factors, sizes, values, masks)
    finally:
        DEFAULT.distribute_division = old
    np.testing.assert_allclose(z1, z0, rtol=1e-6)
    for a, b in zip(p1, p0):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-9)


def test_grouped_divide_project_unit():
    """Unit check incl. flat operands, unbatched divisor, and log space."""
    rng = np.random.default_rng(2)
    sizes = [2, 3, 4]
    B = 5
    bel = rng.random((B, 2, 3, 4))
    msg = rng.random((B, 3))
    msg[0, 1] = 0.0
    # sum_product, full-rank belief, batched msg over var 1
    out = np.asarray(
        grouped_divide_project(
            SUM_PRODUCT, bel, [-1, 0, 1, 2], msg, [-1, 1], sizes, -1
        )
    )
    sep = bel.sum(axis=(1, 3))
    want = np.where(msg != 0, sep / np.where(msg != 0, msg, 1.0), 0.0)
    np.testing.assert_allclose(out, want, rtol=1e-6)
    # flat belief, same answer
    out_flat = np.asarray(
        grouped_divide_project(
            SUM_PRODUCT, bel.reshape(B, -1), [-1, 0, 1, 2], msg, [-1, 1],
            sizes, -1,
        )
    )
    np.testing.assert_allclose(out_flat, want, rtol=1e-6)
    # unbatched divisor broadcasts
    m1 = rng.random((3,))
    out_u = np.asarray(
        grouped_divide_project(
            SUM_PRODUCT, bel, [-1, 0, 1, 2], m1, [1], sizes, -1
        )
    )
    np.testing.assert_allclose(out_u, sep / m1, rtol=1e-6)
    # log space: -inf guard
    lbel = np.log(np.maximum(bel, 1e-300))
    lmsg = np.where(msg > 0, np.log(np.maximum(msg, 1e-300)), -np.inf)
    out_l = np.asarray(
        grouped_divide_project(
            LOG_SUM_EXP, lbel, [-1, 0, 1, 2], lmsg, [-1, 1], sizes, -1
        )
    )
    lsep = np.log(sep)
    lwant = np.where(np.isneginf(lmsg), -np.inf, lsep - lmsg)
    np.testing.assert_allclose(
        np.where(np.isneginf(out_l), -1e30, out_l),
        np.where(np.isneginf(lwant), -1e30, lwant),
        rtol=1e-6,
    )
