"""Auto-discovering golden-network parity harness (VERDICT r3 #8).

Drop any real published `.bif`/`.uai` network into tests/goldens/ and this
module verifies it against the strongest available oracle — the reference
implementation at /root/reference when importable, else the brute-force
joint — with no code changes.  Skips cleanly when no files are present.

A synthetic BIF fixture (written to tmp, NOT goldens/) keeps the parser
and the harness machinery itself under test even while goldens/ is empty."""

import glob
import hashlib
import itertools
import os
import sys

import numpy as np
import pytest

import junctiontree_tpu as jt
from junctiontree_tpu.utils.bif import BifError, load_bif, parse_bif
from junctiontree_tpu.utils.uai import load_uai

from .util import brute_force_marginals

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")
MODEL_FILES = sorted(
    glob.glob(os.path.join(GOLDENS, "*.bif"))
    + glob.glob(os.path.join(GOLDENS, "*.uai"))
)
BRUTE_CAP = 1 << 22


def _load(path):
    if path.endswith(".bif"):
        return load_bif(path)
    return load_uai(path)


def _evidence_for(path, sizes, seed):
    """A golden `.evid` file if present, else seeded random evidence."""
    for cand in (path + ".evid", os.path.splitext(path)[0] + ".evid"):
        if os.path.exists(cand):
            from junctiontree_tpu.utils.uai import load_evidence

            ev = load_evidence(cand)
            names = list(sizes)
            return {names[v]: s for v, s in ev.items()}
    rng = np.random.default_rng(seed)
    names = sorted(sizes, key=str)
    picked = [n for n in names if rng.random() < 0.15][:6]
    return {n: int(rng.integers(0, sizes[n])) for n in picked}


def _reference():
    """Import the reference library as a differential oracle, if present."""
    ref = "/root/reference"
    if not os.path.isdir(os.path.join(ref, "junctiontree")):
        return None
    if ref not in sys.path:
        sys.path.insert(0, ref)
    try:
        import junctiontree as ref_jt  # noqa

        return ref_jt
    except Exception:
        return None


def _repo_posteriors(factors, sizes, values, evidence):
    eng = jt.create_junction_tree(factors, sizes).engine()
    eng.set_potentials(values)
    masks = {}
    for v, s in evidence.items():
        m = np.zeros((1, sizes[v]), dtype=np.float32)
        m[0, int(s)] = 1.0
        masks[v] = m
    if not masks:
        k0 = next(iter(sizes))
        masks[k0] = np.ones((1, sizes[k0]), dtype=np.float32)
    post, logz = eng.posterior_batch(masks)
    plan = eng.plan
    out = {
        plan.table.label_of(v): np.asarray(post[v])[0]
        for v in range(plan.num_vars)
    }
    return out, float(np.asarray(logz)[0])


def _reference_posteriors(ref_jt, factors, sizes, values, evidence):
    """Evidence via mask-multiplication into the factor values (same
    semantics as the repo's masks; avoids the reference's shape-changing
    slicing so tolerances stay comparable)."""
    vals = []
    for f, val in zip(factors, values):
        v = np.array(val, dtype=np.float64)
        for i, var in enumerate(f):
            if var in evidence:
                mask = np.zeros(sizes[var])
                mask[evidence[var]] = 1.0
                shape = [1] * v.ndim
                shape[i] = sizes[var]
                v = v * mask.reshape(shape)
        vals.append(v)
    tree = ref_jt.create_junction_tree([list(f) for f in factors], dict(sizes))
    margs = tree.propagate(vals)
    # per-variable normalized posterior from any factor containing it
    out = {}
    for f, m in zip(factors, margs):
        for i, var in enumerate(f):
            if var in out:
                continue
            axes = tuple(j for j in range(m.ndim) if j != i)
            p = m.sum(axis=axes)
            z = p.sum()
            if z > 0:
                out[var] = p / z
    return out


@pytest.mark.skipif(not MODEL_FILES, reason="no golden networks dropped in "
                    "tests/goldens/ (see its README.md)")
@pytest.mark.parametrize("path", MODEL_FILES, ids=os.path.basename)
def test_golden_network_parity(path):
    with open(path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    factors, sizes, values = _load(path)
    print(f"\ngolden {os.path.basename(path)}: sha256={digest} "
          f"vars={len(sizes)} factors={len(factors)}")
    total_states = 1.0
    for s in sizes.values():
        total_states *= s
    ref_jt = _reference()
    for seed in (0, 1):
        evidence = _evidence_for(path, sizes, seed)
        got, logz = _repo_posteriors(factors, sizes, values, evidence)
        if ref_jt is not None:
            want = _reference_posteriors(
                ref_jt, factors, sizes, values, evidence
            )
            for var, p in want.items():
                np.testing.assert_allclose(
                    got[var], p, atol=1e-6,
                    err_msg=f"{os.path.basename(path)} var {var} "
                            f"evidence {evidence}",
                )
        elif total_states <= BRUTE_CAP:
            names = sorted(sizes, key=str)
            marg = brute_force_marginals(
                factors, sizes, values, [[n] for n in names], evidence
            )
            for n, m in zip(names, marg):
                z = m.sum()
                assert z > 0
                np.testing.assert_allclose(got[n], m / z, atol=1e-6)
        else:
            # structural checks only: every posterior normalized, and for
            # an evidence-free normalized BN logZ == 0
            for var, p in got.items():
                assert p.shape == (sizes[var],)
                np.testing.assert_allclose(p.sum(), 1.0, atol=1e-5)
        if not evidence:
            assert logz == pytest.approx(0.0, abs=1e-4)


# ---- harness self-test: synthetic BIF through the full pipeline ----

_SYNTH_BIF = """
network synthetic { }
variable A { type discrete [ 2 ] { yes, no }; }
variable B { type discrete [ 3 ] { lo, mid, hi }; }
variable C { type discrete [ 2 ] { t, f }; }
probability ( A ) { table 0.3, 0.7; }
probability ( B | A ) {
  (yes) 0.2, 0.5, 0.3;
  (no) 0.6, 0.1, 0.3;
}
probability ( C | A, B ) {
  (yes, lo) 0.9, 0.1;
  (yes, mid) 0.5, 0.5;
  (yes, hi) 0.2, 0.8;
  (no, lo) 0.3, 0.7;
  (no, mid) 0.4, 0.6;
  (no, hi) 0.25, 0.75;
}
"""


def test_bif_parser_and_parity_machinery(tmp_path):
    factors, sizes, values = parse_bif(_SYNTH_BIF)
    assert sizes == {"A": 2, "B": 3, "C": 2}
    assert factors == [["A"], ["B", "A"], ["C", "A", "B"]]
    np.testing.assert_allclose(values[1][:, 0], [0.2, 0.5, 0.3])
    np.testing.assert_allclose(values[2][:, 0, 2], [0.2, 0.8])
    # full differential run through the same helpers the goldens use
    got, logz = _repo_posteriors(factors, sizes, values, {"C": 0})
    marg = brute_force_marginals(
        factors, sizes, values, [["A"], ["B"], ["C"]], {"C": 0}
    )
    for n, m in zip(["A", "B", "C"], marg):
        np.testing.assert_allclose(got[n], m / m.sum(), atol=1e-6)
    ref_jt = _reference()
    if ref_jt is not None:
        want = _reference_posteriors(ref_jt, factors, sizes, values, {"C": 0})
        for var, p in want.items():
            np.testing.assert_allclose(got[var], p, atol=1e-6)
    # evidence-free logZ of a normalized BN is 0
    _, logz0 = _repo_posteriors(factors, sizes, values, {})
    assert logz0 == pytest.approx(0.0, abs=1e-5)


def test_bif_parser_table_form_and_errors():
    ok = (
        "variable X { type discrete [ 2 ] { a, b }; }\n"
        "probability ( X ) { table 0.4 0.6; }\n"
    )
    f, s, v = parse_bif(ok)
    np.testing.assert_allclose(v[0], [0.4, 0.6])
    with pytest.raises(BifError, match="no discrete variable"):
        parse_bif("network empty { }")
    with pytest.raises(BifError, match="no CPT"):
        parse_bif("variable X { type discrete [ 2 ] { a, b }; }")
    with pytest.raises(BifError, match="rows, want"):
        parse_bif(
            "variable X { type discrete [ 2 ] { a, b }; }\n"
            "variable Y { type discrete [ 2 ] { a, b }; }\n"
            "probability ( X ) { table 0.4 0.6; }\n"
            "probability ( Y | X ) { (a) 0.5, 0.5; }\n"
        )


def test_golden_dropin_discovery(tmp_path, monkeypatch):
    """Dropping one file produces a parity verdict with no code changes:
    simulate by pointing the discovery glob at a tmp goldens dir."""
    p = tmp_path / "synthetic.bif"
    p.write_text(_SYNTH_BIF)
    import tests.test_goldens as mod

    found = sorted(
        glob.glob(str(tmp_path / "*.bif")) + glob.glob(str(tmp_path / "*.uai"))
    )
    assert found == [str(p)]
    mod.test_golden_network_parity(str(p))


def test_bif_table_with_parents_spec_order():
    """The BIF spec's own dog-problem example: table entries list the CHILD
    state varying SLOWEST (round-4 review: the first parser silently
    transposed these)."""
    bif = (
        "variable family-out { type discrete [ 2 ] { true, false }; }\n"
        "variable light-on { type discrete [ 2 ] { true, false }; }\n"
        "probability ( family-out ) { table 0.15 0.85; }\n"
        "probability ( light-on | family-out ) {\n"
        "  table 0.6 0.05 0.4 0.95;\n"
        "}\n"
    )
    f, s, v = parse_bif(bif)
    cpt = v[1]  # [light-on, family-out]
    np.testing.assert_allclose(cpt[:, 0], [0.6, 0.4])   # P(.|family=true)
    np.testing.assert_allclose(cpt[:, 1], [0.05, 0.95])  # P(.|family=false)
    # every conditional column normalizes (the transposed form did not)
    np.testing.assert_allclose(cpt.sum(axis=0), [1.0, 1.0])
    # and the equivalent row form parses identically
    bif_rows = bif.replace(
        "  table 0.6 0.05 0.4 0.95;\n",
        "  (true) 0.6, 0.4;\n  (false) 0.05, 0.95;\n",
    )
    f2, s2, v2 = parse_bif(bif_rows)
    np.testing.assert_allclose(v2[1], cpt)
