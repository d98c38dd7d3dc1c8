"""Pallas big-clique kernel tests (interpret mode on CPU; the real-TPU run
is exercised by bench/TPU sessions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from junctiontree_tpu.ops.pallas_contract import (
    big_clique_sep_message,
    build_weight_groups,
    factored_masked_contract,
    reference_factored_contract,
)


@pytest.mark.parametrize(
    "R1,R2,C,B", [(4, 8, 3, 5), (8, 128, 128, 256), (3, 50, 17, 33)]
)
def test_kernel_matches_reference(R1, R2, C, B):
    rng = np.random.default_rng(R1 + R2 + C + B)
    pot = jnp.asarray(rng.random((R1, R2, C)), dtype=jnp.float32)
    w1 = jnp.asarray(rng.random((B, R1)), dtype=jnp.float32)
    w2 = jnp.asarray(rng.random((B, R2)), dtype=jnp.float32)
    got = factored_masked_contract(pot, w1, w2, interpret=True)
    want = reference_factored_contract(pot, w1, w2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("R1,R2,C,B", [(4, 8, 3, 5), (8, 128, 128, 256)])
def test_kernel_bf16_inputs_f32_accumulation(R1, R2, C, B):
    """bf16 storage inputs stream through the kernel at 2 bytes/element;
    the output is f32 and matches the f32 reference within bf16 tolerance."""
    rng = np.random.default_rng(R1 + R2 + C + B + 1)
    pot32 = jnp.asarray(rng.random((R1, R2, C)), dtype=jnp.float32)
    w132 = jnp.asarray(rng.random((B, R1)), dtype=jnp.float32)
    w232 = jnp.asarray(rng.random((B, R2)), dtype=jnp.float32)
    got = factored_masked_contract(
        pot32.astype(jnp.bfloat16), w132.astype(jnp.bfloat16),
        w232.astype(jnp.bfloat16), interpret=True,
    )
    assert got.dtype == jnp.float32
    want = reference_factored_contract(pot32, w132, w232)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-2, atol=1e-3
    )


def test_plan_tiles_bf16_itemsize():
    """2-byte inputs double the VMEM headroom (bigger feasible tiles) and
    keep Mosaic-legal (16, 128) alignment."""
    from junctiontree_tpu.ops.pallas_contract import plan_tiles

    f32 = plan_tiles(64, 512, 4096, 4096, itemsize=4)
    b16 = plan_tiles(64, 512, 4096, 4096, itemsize=2)
    assert b16 is not None
    if f32 is not None:
        assert b16["vmem_bytes"] <= f32["vmem_bytes"] * 2
        assert (b16["TB"] * b16["TC"] >= f32["TB"] * f32["TC"])
    assert b16["TB"] % 128 == 0 or b16["TB"] == b16["Bp"]
    assert b16["TC"] % 16 == 0 or b16["TC"] == b16["Cp"]


def test_build_weight_groups_balanced():
    rng = np.random.default_rng(0)
    masks = [jnp.asarray(rng.random((7, k)), dtype=jnp.float32) for k in (2, 3, 4, 2, 5)]
    w1, w2, g1, g2 = build_weight_groups(masks)
    assert sorted(g1 + g2) == list(range(5))
    # outer products reconstruct the joint product
    R1, R2 = w1.shape[1], w2.shape[1]
    assert R1 * R2 == 2 * 3 * 4 * 2 * 5
    # check one entry: joint weight at index (0,...,0) is prod of masks[.,0]
    np.testing.assert_allclose(
        float(w1[0, 0] * w2[0, 0]),
        float(np.prod([np.asarray(m)[0, 0] for m in masks])),
        rtol=1e-6,
    )


def test_big_clique_sep_message_matches_einsum():
    """End-to-end: wide clique, some observed rest vars, some observed sep
    vars, some unobserved — against a direct einsum oracle."""
    rng = np.random.default_rng(3)
    cvars = [10, 11, 12, 13, 14]            # var ids
    sizes = {10: 2, 11: 3, 12: 2, 13: 4, 14: 3}
    svars = [13, 14]
    B = 9
    pot = jnp.asarray(
        rng.random(tuple(sizes[v] for v in cvars)), dtype=jnp.float32
    )
    masks = {
        10: jnp.asarray(rng.random((B, 2)), dtype=jnp.float32),
        12: jnp.asarray(rng.random((B, 2)), dtype=jnp.float32),
        14: jnp.asarray(rng.random((B, 3)), dtype=jnp.float32),
    }
    got = big_clique_sep_message(
        pot, cvars, masks, svars, interpret=True
    )
    want = jnp.einsum(
        "abcde,xa,xc,xe->xde",
        pot, masks[10], masks[12], masks[14],
        precision="highest",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_big_clique_sep_message_no_rest_masks():
    rng = np.random.default_rng(5)
    cvars = [0, 1, 2]
    pot = jnp.asarray(rng.random((2, 3, 4)), dtype=jnp.float32)
    masks = {2: jnp.asarray(rng.random((6, 4)), dtype=jnp.float32)}
    got = big_clique_sep_message(pot, cvars, masks, [2], interpret=True)
    want = jnp.einsum("abc,xc->xc", pot, masks[2], precision="highest")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_big_clique_sep_message_with_messages():
    """Child messages fused into the kernel weight groups: overlapping
    rest-scoped messages (shared var -> same component), a sep-scoped
    message, plus masks — against a direct einsum oracle."""
    rng = np.random.default_rng(11)
    cvars = [0, 1, 2, 3, 4, 5]
    sizes = {0: 2, 1: 3, 2: 2, 3: 4, 4: 3, 5: 2}
    svars = [4, 5]
    B = 7
    pot = jnp.asarray(
        rng.random(tuple(sizes[v] for v in cvars)), dtype=jnp.float32
    )
    masks = {
        0: jnp.asarray(rng.random((B, 2)), dtype=jnp.float32),
        4: jnp.asarray(rng.random((B, 3)), dtype=jnp.float32),
    }
    m12 = jnp.asarray(rng.random((B, 3, 2)), dtype=jnp.float32)
    m23 = jnp.asarray(rng.random((B, 2, 4)), dtype=jnp.float32)
    m45 = jnp.asarray(rng.random((B, 3, 2)), dtype=jnp.float32)
    msgs = [((1, 2), m12), ((2, 3), m23), ((4, 5), m45)]
    got = big_clique_sep_message(
        pot, cvars, masks, svars, msgs=msgs, interpret=True
    )
    want = jnp.einsum(
        "abcdef,xa,xbc,xcd,xe,xef->xef",
        pot, masks[0], m12, m23, masks[4], m45,
        precision="highest",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )
    # message order on a sep-scoped operand in reversed var order
    m54 = jnp.transpose(m45, (0, 2, 1))
    got2 = big_clique_sep_message(
        pot, cvars, masks, svars,
        msgs=[((1, 2), m12), ((2, 3), m23), ((5, 4), m54)],
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_big_clique_message_crossing_boundary_raises():
    rng = np.random.default_rng(13)
    pot = jnp.asarray(rng.random((2, 3, 4)), dtype=jnp.float32)
    msg = jnp.asarray(rng.random((5, 3, 4)), dtype=jnp.float32)
    with pytest.raises(ValueError, match="crosses"):
        big_clique_sep_message(
            pot, [0, 1, 2], {}, [2], msgs=[((1, 2), msg)], interpret=True
        )


def test_plan_tiles_hailfinder_shape_fits_vmem():
    """The round-2 VMEM-OOM repro: R1=1, R2=3, C=46656 at B=4096 (the
    Hailfinder-class big separator).  The planner must either tile C into
    VMEM-sized blocks or report infeasibility — never an untiled [B, C]
    output block (114 MB at these dims, BENCH_r02.json)."""
    from junctiontree_tpu.ops.pallas_contract import VMEM_BUDGET, plan_tiles

    t = plan_tiles(1, 3, 46656, 4096)
    assert t is not None
    assert t["vmem_bytes"] <= VMEM_BUDGET
    assert t["TC"] < 46656  # the separator axis is streamed in tiles
    # the accounting covers the out block that blew up in round 2
    assert t["TB"] * t["TC"] * 4 <= VMEM_BUDGET


def test_plan_tiles_infeasible_returns_none():
    from junctiontree_tpu.ops.pallas_contract import plan_tiles

    # R2 too wide for any pot block at TR1=1, TC=128
    assert plan_tiles(1, 40000, 130, 64) is None


def test_kernel_c_tiling_matches_reference():
    """Force the TC-tiled grid with a small VMEM budget and check exactness
    against the einsum oracle (including non-multiple C padding)."""
    from junctiontree_tpu.ops.pallas_contract import plan_tiles

    rng = np.random.default_rng(17)
    R1, R2, C, B = 4, 16, 300, 24
    budget = 64 * 1024
    t = plan_tiles(R1, R2, C, B, vmem_budget=budget)
    assert t is not None and t["TC"] < C and t["Cp"] > C
    pot = jnp.asarray(rng.random((R1, R2, C)), dtype=jnp.float32)
    w1 = jnp.asarray(rng.random((B, R1)), dtype=jnp.float32)
    w2 = jnp.asarray(rng.random((B, R2)), dtype=jnp.float32)
    got = factored_masked_contract(
        pot, w1, w2, interpret=True, vmem_budget=budget
    )
    want = reference_factored_contract(pot, w1, w2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_infeasible_shape_falls_back_to_xla():
    """use_pallas=True on a VMEM-infeasible factorization must route to the
    XLA einsum instead of emitting an uncompilable kernel (round-2 defect)."""
    rng = np.random.default_rng(19)
    sizes = (40000, 130)
    pot = jnp.asarray(rng.random(sizes, np.float64), dtype=jnp.float32)
    masks = {1: jnp.asarray(rng.random((3, 130)), dtype=jnp.float32)}
    got = big_clique_sep_message(pot, [0, 1], masks, [1], use_pallas=True)
    want = jnp.einsum("ab,xb->xb", pot, masks[1], precision="highest")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_xla_fallback_matches():
    rng = np.random.default_rng(7)
    cvars = [0, 1, 2, 3]
    pot = jnp.asarray(rng.random((2, 3, 4, 2)), dtype=jnp.float32)
    masks = {
        0: jnp.asarray(rng.random((5, 2)), dtype=jnp.float32),
        1: jnp.asarray(rng.random((5, 3)), dtype=jnp.float32),
    }
    a = big_clique_sep_message(pot, cvars, masks, [3], interpret=True)
    b = big_clique_sep_message(pot, cvars, masks, [3], use_pallas=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
