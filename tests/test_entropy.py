"""Posterior joint entropy via the calibrated-tree identity
H(P) = sum_C H(b_C) - sum_S H(b_S).

Oracle: enumerate the normalized joint with the brute-force einsum
(tests/util.brute_force_marginals over ALL variables) and compute
-sum p ln p directly.  Information-theoretic queries do not exist in the
reference at all."""

import numpy as np
import pytest

from junctiontree_tpu import Engine, LOG_SUM_EXP, MAX_PRODUCT, compile_plan

from .util import brute_force_marginals, grid_mrf, random_factor_graph, random_values


def _oracle_entropy(factors, sizes, values, evidence=None):
    all_vars = sorted({v for f in factors for v in f}, key=str)
    joint = brute_force_marginals(factors, sizes, values, [all_vars], evidence)[0]
    z = joint.sum()
    p = (joint / z).ravel()
    nz = p[p > 0]
    return float(-(nz * np.log(nz)).sum()), float(z)


@pytest.mark.parametrize("semiring", [None, LOG_SUM_EXP])
def test_entropy_matches_bruteforce(semiring):
    factors, sizes = random_factor_graph(2, n_vars=7, n_factors=9)
    values = random_values(factors, sizes, seed=3)
    plan = compile_plan(factors, sizes)
    eng = (Engine(plan, semiring) if semiring else Engine(plan)).set_potentials(values)
    h, z = eng.entropy()
    h0, z0 = _oracle_entropy(factors, sizes, values)
    assert h == pytest.approx(h0, abs=1e-6)
    assert z == pytest.approx(z0, rel=1e-6)
    # evidence shifts the distribution; identity must track it
    v0 = sorted(sizes)[0]
    h, z = eng.entropy({v0: 1})
    h0, z0 = _oracle_entropy(factors, sizes, values, {v0: 1})
    assert h == pytest.approx(h0, abs=1e-6)
    assert z == pytest.approx(z0, rel=1e-6)


def test_entropy_uniform_and_deterministic():
    """Uniform joint -> ln(prod sizes); point-mass posterior -> 0."""
    factors = [["a", "b"], ["b", "c"]]
    sizes = {"a": 2, "b": 3, "c": 4}
    plan = compile_plan(factors, sizes)
    eng = Engine(plan).set_potentials(
        [np.ones((2, 3)), np.ones((3, 4))]
    )
    h, z = eng.entropy()
    assert h == pytest.approx(np.log(2 * 3 * 4), abs=1e-6)
    # deterministic chain: b == f(a), c == f(b), a observed -> H = 0
    values = [np.eye(2), np.eye(2)]
    sizes2 = {"a": 2, "b": 2, "c": 2}
    eng2 = Engine(compile_plan(factors, sizes2)).set_potentials(values)
    h, z = eng2.entropy({"a": 0})
    assert h == pytest.approx(0.0, abs=1e-6)
    assert z == pytest.approx(1.0, rel=1e-6)


@pytest.mark.parametrize("semiring", [None, LOG_SUM_EXP])
def test_entropy_batch(semiring):
    """Both probability semirings: Z must come back in LINEAR space (the
    log engine returning logZ was ADVICE r3's medium finding)."""
    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=8)
    plan = compile_plan(factors, sizes)
    eng = Engine(plan, *([semiring] if semiring else [])).set_potentials(values)
    B = 3
    m = np.ones((B, 2), dtype=np.float32)
    m[0] = [1.0, 0.0]
    m[1] = [0.0, 1.0]
    ents, zs = eng.entropy_batch(
        {"g0_0": np.asarray(eng.semiring.from_linear(m))}
    )
    ents, zs = np.asarray(ents), np.asarray(zs)
    for b, ev in enumerate([{"g0_0": 0}, {"g0_0": 1}, None]):
        h0, z0 = _oracle_entropy(factors, sizes, values, ev)
        assert ents[b] == pytest.approx(h0, abs=1e-6)
        assert zs[b] == pytest.approx(z0, rel=1e-6)


def test_entropy_rejects_max_product():
    factors = [["a", "b"]]
    sizes = {"a": 2, "b": 2}
    eng = Engine(compile_plan(factors, sizes), MAX_PRODUCT)
    eng.set_potentials([np.ones((2, 2))])
    with pytest.raises(ValueError, match="probability semiring"):
        eng.entropy()
    with pytest.raises(ValueError, match="probability semiring"):
        eng.entropy_batch({})


def test_entropy_batch_impossible_and_structural_zeros():
    """The round-5 routed entropy program (operand-log decomposition, no
    per-element beliefs) must handle structural zeros (op*log(op) -> 0)
    and impossible-evidence elements (H = 0, Z = 0, no NaN)."""
    factors, sizes = grid_mrf(3, 3)
    values = random_values(factors, sizes, seed=9)
    pair_ix = next(i for i, f in enumerate(factors) if len(f) == 2)
    values[pair_ix][:, 0] = 0.0  # structural zero
    eng = Engine(compile_plan(factors, sizes)).set_potentials(values)
    B = 3
    m = np.ones((B, 2), dtype=np.float32)
    m[0] = [0.0, 0.0]   # impossible
    m[1] = [1.0, 0.0]
    ents, zs = eng.entropy_batch({"g0_0": m})
    ents, zs = np.asarray(ents), np.asarray(zs)
    assert not np.isnan(ents).any() and not np.isnan(zs).any()
    assert ents[0] == 0.0 and zs[0] == 0.0
    for b, ev in enumerate([None, {"g0_0": 0}, None]):
        if b == 0:
            continue
        h0, z0 = _oracle_entropy(factors, sizes, values, ev)
        assert ents[b] == pytest.approx(h0, abs=1e-5)
        assert zs[b] == pytest.approx(z0, rel=1e-5)
