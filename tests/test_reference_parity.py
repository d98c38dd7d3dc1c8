"""Differential tests against the reference implementation.

The reference library (pure NumPy) is imported read-only from /root/reference
and used as an oracle: on identical random factor graphs, our marginals must
match the reference's `propagate` output within 1e-6 (BASELINE.json
correctness target).  Skipped cleanly if the reference isn't importable."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

try:
    import junctiontree as ref_jt  # noqa: F401

    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

import junctiontree_tpu as jt

from .util import brute_force_marginals, chain_bn, grid_mrf, random_values

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference not importable")


CASES = [
    chain_bn(2),
    chain_bn(6),
    chain_bn(10, card=3),
    grid_mrf(2, 2),
    grid_mrf(3, 3),
    grid_mrf(2, 4, card=3),
]


def _reference_is_sane(ref_out, oracle) -> bool:
    """The reference has a latent hash-order bug: its SumProduct.einsum maps
    variable labels through *set* iteration order
    (/root/reference/junctiontree/sum_product.py:26), which depends on
    PYTHONHASHSEED — under some seeds it returns marginals up to ~70% off the
    brute-force oracle on grid MRFs (reproduced: PYTHONHASHSEED=3,5 on
    grid_mrf(3,3)).  We anchor parity on the oracle and only compare against
    the reference in processes where the reference itself is correct."""
    return all(
        np.allclose(r, b, rtol=1e-9, atol=1e-12) for r, b in zip(ref_out, oracle)
    )


@pytest.mark.parametrize("case", range(len(CASES)))
def test_marginals_match_reference(case):
    factors, sizes = CASES[case]
    values = random_values(factors, sizes, seed=1000 + case)

    ref_tree = ref_jt.create_junction_tree(factors, dict(sizes))
    ref_out = ref_tree.propagate([np.asarray(v) for v in values])

    our_tree = jt.create_junction_tree(factors, sizes)
    our_out = our_tree.propagate(values)

    oracle = brute_force_marginals(factors, sizes, values, factors)
    assert len(ref_out) == len(our_out)
    for o, b in zip(our_out, oracle):
        np.testing.assert_allclose(o, b, rtol=1e-6, atol=1e-6)
    if _reference_is_sane(ref_out, oracle):
        for r, o in zip(ref_out, our_out):
            assert r.shape == o.shape
            np.testing.assert_allclose(o, r, rtol=1e-6, atol=1e-6)


def test_sliced_evidence_matches_reference():
    """Reference evidence workflow (shrink sizes + slice values,
    reference README.md:148-166) against our mask-based fast path."""
    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=77)
    observed = {"g0_0": 1, "g2_2": 0}

    # reference: slice & rebuild
    cond_sizes = dict(sizes)
    cond_values = [np.asarray(v) for v in values]
    for var, state in observed.items():
        cond_sizes[var] = 1
        for i, f in enumerate(factors):
            if var in f:
                ax = f.index(var)
                sl = [slice(None)] * cond_values[i].ndim
                sl[ax] = slice(state, state + 1)
                cond_values[i] = cond_values[i][tuple(sl)]
    ref_tree = ref_jt.create_junction_tree(factors, cond_sizes)
    ref_out = ref_tree.propagate(cond_values)
    cond_oracle = brute_force_marginals(factors, cond_sizes, cond_values, factors)
    ref_sane = _reference_is_sane(ref_out, cond_oracle)

    # ours: masks at static shapes
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    margs, z = eng.query(observed, normalize=False)

    # conditioned per-variable comparison via sliced-graph factor marginals
    source = ref_out if ref_sane else cond_oracle
    for var in sizes:
        vid = tree.plan.table.id_of(var)
        for i, f in enumerate(factors):
            if var in f:
                ax = f.index(var)
                axes = tuple(a for a in range(source[i].ndim) if a != ax)
                sliced_marg = np.asarray(source[i]).sum(axis=axes)
                break
        ours = margs[vid]
        if var in observed:
            np.testing.assert_allclose(
                ours[observed[var]], sliced_marg[0], rtol=1e-6
            )
            off = np.delete(ours, observed[var])
            np.testing.assert_allclose(off, 0.0, atol=1e-10)
        else:
            np.testing.assert_allclose(ours, sliced_marg, rtol=1e-6, atol=1e-9)


def test_reference_tree_weight_not_worse():
    """Our min-fill should produce total clique state space no worse than 2x
    the reference's on these models (quality guard, not exact parity)."""
    for factors, sizes in CASES:
        ref_tree = ref_jt.create_junction_tree(factors, dict(sizes))
        ref_states = sum(
            int(np.prod([sizes[v] for v in c])) for c in ref_tree.clique_tree.maxcliques
        )
        plan = jt.compile_plan(factors, sizes)
        ours = plan.stats()["total_clique_states"]
        assert ours <= 2 * ref_states, (ours, ref_states)
