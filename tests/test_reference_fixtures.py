"""Reference oracle #2: published worked-example fixtures.

The reference anchors its end-to-end correctness on hand-computed posteriors
from published models (/root/reference/tests/test_junctiontree.py):

  * an 8-var BN with known marginals (test_junctiontree.py:114-292),
  * the Huang-Darwiche-style Hugin initialization check (295-325),
  * the mensxmachina sprinkler demo with evidence (345-419),
  * the UW-Madison lecture BN (422-525).

The published NUMBERS (not the code) are reproduced here and asserted through
BOTH the reference-parity ``propagate`` path and the mask-based
``query``/``posterior_batch`` fast path, at the reference's tolerances.
"""

import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.evidence import apply_evidence, batch_masks_sparse, shrink_sizes


# ---------------------------------------------------------------------------
# 8-var BN fixture (reference test_junctiontree.py:163-242)
# ---------------------------------------------------------------------------

EIGHTVAR_FACTORS = [
    ["A"],
    ["A", "B"],
    ["A", "C"],
    ["B", "D"],
    ["C", "E"],
    ["C", "G"],
    ["D", "E", "F"],
    ["E", "G", "H"],
]
EIGHTVAR_SIZES = {k: 2 for k in "ABCDEFGH"}
EIGHTVAR_VALUES = [
    np.array([0.5, 0.5]),
    np.array([[0.6, 0.4], [0.5, 0.5]]),
    np.array([[0.8, 0.2], [0.3, 0.7]]),
    np.array([[0.5, 0.5], [0.1, 0.9]]),
    np.array([[0.4, 0.6], [0.7, 0.3]]),
    np.array([[0.9, 0.1], [0.8, 0.2]]),
    np.array(
        [[[0.01, 0.99], [0.99, 0.01]], [[0.99, 0.01], [0.99, 0.01]]]
    ),
    np.array(
        [[[0.05, 0.95], [0.05, 0.95]], [[0.05, 0.95], [0.95, 0.05]]]
    ),
]
# published single-variable marginals (test_junctiontree.py:245-292)
EIGHTVAR_MARGINALS = {
    "A": [0.500, 0.500],
    "B": [0.550, 0.450],
    "C": [0.550, 0.450],
    "D": [0.320, 0.680],
    "E": [0.535, 0.465],
    "G": [0.855, 0.145],
    "F": [0.824, 0.176],   # atol 0.01 in the reference
    "H": [0.104, 0.896],   # atol 0.01 in the reference
}


def test_eightvar_bn_published_marginals_propagate():
    tree = jt.create_junction_tree(EIGHTVAR_FACTORS, EIGHTVAR_SIZES)
    out = tree.propagate(EIGHTVAR_VALUES)
    for o, v in zip(out, EIGHTVAR_VALUES):
        assert o.shape == v.shape

    def marg(fix, label):
        fvars = EIGHTVAR_FACTORS[fix]
        axes = tuple(i for i, x in enumerate(fvars) if x != label)
        m = out[fix].sum(axis=axes)
        return m / m.sum()

    np.testing.assert_allclose(marg(0, "A"), EIGHTVAR_MARGINALS["A"], atol=1e-6)
    np.testing.assert_allclose(marg(1, "B"), EIGHTVAR_MARGINALS["B"], atol=1e-6)
    np.testing.assert_allclose(marg(2, "C"), EIGHTVAR_MARGINALS["C"], atol=1e-6)
    np.testing.assert_allclose(marg(3, "D"), EIGHTVAR_MARGINALS["D"], atol=1e-6)
    np.testing.assert_allclose(marg(4, "E"), EIGHTVAR_MARGINALS["E"], atol=1e-6)
    np.testing.assert_allclose(marg(5, "G"), EIGHTVAR_MARGINALS["G"], atol=1e-6)
    np.testing.assert_allclose(marg(6, "F"), EIGHTVAR_MARGINALS["F"], atol=0.01)
    np.testing.assert_allclose(marg(7, "H"), EIGHTVAR_MARGINALS["H"], atol=0.01)


def test_eightvar_bn_published_marginals_fast_path():
    tree = jt.create_junction_tree(EIGHTVAR_FACTORS, EIGHTVAR_SIZES)
    eng = tree.engine().set_potentials(EIGHTVAR_VALUES)
    post, z = eng.query({})
    np.testing.assert_allclose(z, 1.0, rtol=1e-6)  # proper BN
    for label, want in EIGHTVAR_MARGINALS.items():
        v = tree.plan.table.id_of(label)
        atol = 0.01 if label in ("F", "H") else 1e-6
        np.testing.assert_allclose(post[v], want, atol=atol)
    # and through the batched posterior program (serving path)
    posts, logz = eng.posterior_batch({})
    np.testing.assert_allclose(np.asarray(logz), [0.0], atol=1e-5)
    for label, want in EIGHTVAR_MARGINALS.items():
        v = tree.plan.table.id_of(label)
        atol = 0.01 if label in ("F", "H") else 1e-5
        np.testing.assert_allclose(np.asarray(posts[v])[0], want, atol=atol)


def test_huang_darwiche_initialization():
    """Hugin initialization of cluster ACE from its assigned factors
    (published array, reference test_junctiontree.py:295-325).

    The reference hand-builds the Huang-Darwiche clique set and factor
    assignment; here the same structure is given directly to a Plan (our
    min-fill picks a different — equally valid — triangulation, so the
    fixture's clique structure is reproduced explicitly)."""
    from junctiontree_tpu.executor import evaluate_cliques_np
    from junctiontree_tpu.labels import intern_factors
    from junctiontree_tpu.schedule import Plan
    from junctiontree_tpu.treebuild import build_junction_tree
    from junctiontree_tpu.triangulate import Triangulation

    table, int_factors, int_sizes = intern_factors(
        EIGHTVAR_FACTORS, EIGHTVAR_SIZES
    )
    maxcliques_labels = [
        ["A", "D", "E"],
        ["A", "B", "D"],
        ["D", "E", "F"],
        ["A", "C", "E"],
        ["C", "E", "G"],
        ["E", "G", "H"],
    ]
    maxcliques = [
        sorted(table.id_of(x) for x in c) for c in maxcliques_labels
    ]
    # reference assignment (test_junctiontree.py:302): factor AC and factor
    # CE both land on cluster ACE (index 3)
    f2c = [0, 1, 3, 1, 3, 4, 2, 5]
    tri = Triangulation(
        maxcliques=maxcliques,
        factor_to_maxclique=f2c,
        elimination_order=[],
        fill_edges=[],
        treewidth=2,
    )
    tree = build_junction_tree(maxcliques, int_sizes, root=0)
    var_to_clique = [0] * len(int_sizes)
    for ci, c in enumerate(maxcliques):
        for v in c:
            var_to_clique[v] = ci
    plan = Plan(
        table=table,
        factors=int_factors,
        sizes=int_sizes,
        tri=tri,
        tree=tree,
        var_to_clique=var_to_clique,
    )
    pots = evaluate_cliques_np(plan, EIGHTVAR_VALUES, dtype=np.float64)
    # published initial potential of cluster ACE (= P(C|A) * P(E|C) laid out
    # over axes (A, C, E)); our clique axes are sorted ids = (A, C, E) too
    want = np.array(
        [
            [[0.32, 0.48], [0.14, 0.06]],
            [[0.12, 0.18], [0.49, 0.21]],
        ]
    )
    assert plan.table.labels_of(plan.clique_vars[3]) == ["A", "C", "E"]
    np.testing.assert_allclose(pots[3], want, atol=1e-12)


# ---------------------------------------------------------------------------
# mensxmachina sprinkler demo with evidence (test_junctiontree.py:345-419)
# ---------------------------------------------------------------------------

SPRINKLER_SIZES = {"cloudy": 2, "sprinkler": 2, "rain": 2, "wet_grass": 2}
SPRINKLER_FACTORS = [
    ["cloudy"],
    ["cloudy", "sprinkler"],
    ["cloudy", "rain"],
    ["rain", "sprinkler", "wet_grass"],
]
SPRINKLER_VALUES = [
    np.array([0.5, 0.5]),
    np.array([[0.5, 0.5], [0.9, 0.1]]),
    np.array([[0.8, 0.2], [0.2, 0.8]]),
    np.array(
        [[[1, 0], [0.1, 0.9]], [[0.1, 0.9], [0.01, 0.99]]]
    ),
]


def test_sprinkler_published_posteriors_mask_path():
    tree = jt.create_junction_tree(SPRINKLER_FACTORS, SPRINKLER_SIZES)
    eng = tree.engine().set_potentials(SPRINKLER_VALUES)
    # grass is wet
    post, _ = eng.query({"wet_grass": 1})
    v = tree.plan.table.id_of("sprinkler")
    np.testing.assert_allclose(post[v], [0.57024, 0.42976], atol=0.01)
    # grass is wet AND it is raining
    post, _ = eng.query({"wet_grass": 1, "rain": 1})
    np.testing.assert_allclose(post[v], [0.8055, 0.1945], atol=0.01)
    # same through the batched serving program (both evidence sets, one batch)
    masks = batch_masks_sparse(
        tree.plan,
        [{"wet_grass": 1}, {"wet_grass": 1, "rain": 1}],
    )
    posts, _ = eng.posterior_batch(masks)
    got = np.asarray(posts[v])
    np.testing.assert_allclose(got[0], [0.57024, 0.42976], atol=0.01)
    np.testing.assert_allclose(got[1], [0.8055, 0.1945], atol=0.01)


def test_sprinkler_published_posteriors_slicing_path():
    """Reference-style shape-changing evidence (slice + rebuild) must agree
    with the published numbers too — apply_evidence/shrink_sizes replicate
    the workflow at reference README.md:148-166."""
    ev = {"wet_grass": 1}
    vals = apply_evidence(SPRINKLER_VALUES, SPRINKLER_FACTORS, ev)
    sizes = shrink_sizes(SPRINKLER_SIZES, ev)
    tree = jt.create_junction_tree(SPRINKLER_FACTORS, sizes)
    out = tree.propagate(vals)
    m = out[1].sum(axis=0)
    np.testing.assert_allclose(m / m.sum(), [0.57024, 0.42976], atol=0.01)

    ev2 = {"wet_grass": 1, "rain": 1}
    vals2 = apply_evidence(SPRINKLER_VALUES, SPRINKLER_FACTORS, ev2)
    sizes2 = shrink_sizes(SPRINKLER_SIZES, ev2)
    tree2 = jt.create_junction_tree(SPRINKLER_FACTORS, sizes2)
    out2 = tree2.propagate(vals2)
    m2 = out2[1].sum(axis=0)
    np.testing.assert_allclose(m2 / m2.sum(), [0.8055, 0.1945], atol=0.01)


# ---------------------------------------------------------------------------
# UW-Madison lecture BN (test_junctiontree.py:422-525)
# ---------------------------------------------------------------------------

UW_SIZES = {k: 2 for k in "ABCDEF"}
UW_FACTORS = [
    ["A"],
    ["B", "A"],
    ["C", "A"],
    ["B", "D"],
    ["C", "E"],
    ["D", "E", "F"],
]
UW_VALUES = [
    np.array([0.9, 0.1]),
    np.array([[0.1, 0.9], [0.9, 0.1]]),
    np.array([[0.8, 0.3], [0.2, 0.7]]),
    np.array([[0.3, 0.7], [0.6, 0.4]]),
    np.array([[0.6, 0.4], [0.5, 0.5]]),
    np.array(
        [[[0.2, 0.8], [0.6, 0.4]], [[0.5, 0.5], [0.9, 0.1]]]
    ),
]
UW_MARGINALS = {
    "A": [0.9, 0.1],
    "B": [0.18, 0.82],
    "C": [0.75, 0.25],
    "D": [0.546, 0.454],
    "E": [0.575, 0.425],
    "F": [0.507, 0.493],   # atol 0.001 in the reference
}


def test_uw_madison_bn_propagate():
    tree = jt.create_junction_tree(UW_FACTORS, UW_SIZES)
    out = tree.propagate(UW_VALUES)
    # P(C): factor 2 is [C, A] -> sum over axis 1
    np.testing.assert_allclose(
        out[2].sum(axis=1), UW_MARGINALS["C"], atol=1e-6
    )
    # factor 1 has axes (B, A): axis 0 sums out B -> P(A); axis 1 -> P(B)
    np.testing.assert_allclose(
        out[1].sum(axis=0), UW_MARGINALS["A"], atol=1e-6
    )
    np.testing.assert_allclose(
        out[1].sum(axis=1), UW_MARGINALS["B"], atol=1e-6
    )
    np.testing.assert_allclose(
        out[3].sum(axis=0), UW_MARGINALS["D"], atol=1e-6
    )
    np.testing.assert_allclose(
        out[4].sum(axis=0), UW_MARGINALS["E"], atol=1e-6
    )
    np.testing.assert_allclose(
        out[5].sum(axis=(0, 1)), UW_MARGINALS["F"], atol=0.001
    )


def test_uw_madison_bn_fast_path():
    tree = jt.create_junction_tree(UW_FACTORS, UW_SIZES)
    eng = tree.engine().set_potentials(UW_VALUES)
    post, z = eng.query({})
    np.testing.assert_allclose(z, 1.0, rtol=1e-6)
    for label, want in UW_MARGINALS.items():
        v = tree.plan.table.id_of(label)
        atol = 0.001 if label == "F" else 1e-6
        np.testing.assert_allclose(post[v], want, atol=atol)
    posts, logz = eng.posterior_batch({})
    np.testing.assert_allclose(np.asarray(logz), [0.0], atol=1e-5)
    for label, want in UW_MARGINALS.items():
        v = tree.plan.table.id_of(label)
        atol = 0.001 if label == "F" else 1e-5
        np.testing.assert_allclose(np.asarray(posts[v])[0], want, atol=atol)
