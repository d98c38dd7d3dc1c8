"""Integration of the Pallas big-clique kernel into the batched program,
exercised in interpreter mode on CPU: results must be identical to the pure
einsum program."""

import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.evidence import batch_masks_sparse, random_evidence_batch
from junctiontree_tpu.models import grid_mrf_model
from junctiontree_tpu.ops.pallas_contract import set_pallas_mode

from .util import brute_force_marginals


@pytest.fixture
def routed():
    set_pallas_mode("interpret")
    yield
    set_pallas_mode("auto")


def test_message_fused_route_fires_and_matches(routed, monkeypatch):
    """A hub clique with a 2-var separator child: the child's batched
    message must be fused into the kernel weights (previously messages
    disqualified the Pallas route entirely)."""
    import junctiontree_tpu.ops.pallas_contract as pc
    from junctiontree_tpu.config import DEFAULT

    rng = np.random.default_rng(2)
    hub = [f"h{i}" for i in range(5)]
    factors = [hub, [hub[0], hub[1], "p"], ["p", "q"]]
    sizes = {**{h: 2 for h in hub}, "p": 3, "q": 2}
    values = [rng.random(tuple(sizes[v] for v in f)) + 0.1 for f in factors]

    calls_with_msgs = []
    orig = pc.big_clique_sep_message

    def spy(pot, cvars, masks, svars, msgs=(), **kw):
        if msgs:
            calls_with_msgs.append([vs for vs, _ in msgs])
        return orig(pot, cvars, masks, svars, msgs=msgs, **kw)

    monkeypatch.setattr(pc, "big_clique_sep_message", spy)
    import junctiontree_tpu.executor  # route imports via pc module attr

    old = DEFAULT.pallas_min_states
    try:
        DEFAULT.pallas_min_states = 4
        tree = jt.create_junction_tree(factors, sizes)
        eng = tree.engine().set_potentials(values)
        evs = random_evidence_batch(tree.plan, 3, ["q", hub[3]], seed=1)
        masks = batch_masks_sparse(tree.plan, evs)
        margs, z = eng.query_batch(masks)
    finally:
        DEFAULT.pallas_min_states = old

    assert any(
        any(len(vs) >= 2 for vs in call) for call in calls_with_msgs
    ), "no multi-var message was fused into the kernel route"

    var_list = list(sizes)
    expect = brute_force_marginals(
        factors, sizes, values, [[v] for v in var_list], evidence=evs[1]
    )
    for i, v in enumerate(var_list):
        vid = tree.plan.table.id_of(v)
        np.testing.assert_allclose(
            np.asarray(margs[vid])[1], expect[i], rtol=1e-4, atol=1e-6
        )


def test_kernel_routed_program_matches_einsum_program(routed):
    """Force a tiny pallas_min_states so the 3x3 grid routes through the
    kernel (interpret mode), and compare against the einsum-only program."""
    from junctiontree_tpu.config import DEFAULT

    factors, sizes, values = grid_mrf_model(3, 3, seed=13)
    evs_builder = lambda tree: random_evidence_batch(
        tree.plan, 4, ["g0_0", "g1_1", "g2_2"], seed=4
    )

    old = DEFAULT.pallas_min_states
    try:
        DEFAULT.pallas_min_states = 4  # route everything big enough
        tree = jt.create_junction_tree(factors, sizes)
        eng = tree.engine().set_potentials(values)
        evs = evs_builder(tree)
        masks = batch_masks_sparse(tree.plan, evs)
        margs, z = eng.query_batch(masks)
    finally:
        DEFAULT.pallas_min_states = old

    set_pallas_mode("off")
    tree2 = jt.create_junction_tree(factors, sizes)
    eng2 = tree2.engine().set_potentials(values)
    margs2, z2 = eng2.query_batch(batch_masks_sparse(tree2.plan, evs))

    np.testing.assert_allclose(
        np.asarray(z), np.asarray(z2), rtol=1e-5
    )
    for a, b in zip(margs, margs2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )
    # and the oracle
    var_list = list(sizes)
    expect = brute_force_marginals(
        factors, sizes, values, [[v] for v in var_list], evidence=evs[2]
    )
    for i, v in enumerate(var_list):
        vid = tree.plan.table.id_of(v)
        np.testing.assert_allclose(
            np.asarray(margs[vid])[2], expect[i], rtol=1e-4, atol=1e-6
        )
