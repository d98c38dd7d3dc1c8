"""CLI tests: UAI model in, MAR/MPE/PR out (subprocess, CPU-forced)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from junctiontree_tpu.utils.uai import write_uai

from .util import brute_force_marginals, grid_mrf, random_values

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def uai_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("uai")
    factors, sizes = grid_mrf(2, 3)
    values = random_values(factors, sizes, seed=55)
    var_list = list(sizes)
    int_factors = [[var_list.index(v) for v in f] for f in factors]
    int_sizes = {i: sizes[v] for i, v in enumerate(var_list)}
    model = d / "m.uai"
    model.write_text(write_uai(int_factors, int_sizes, values))
    evid = d / "m.evid"
    evid.write_text("1 0 1\n")
    return model, evid, int_factors, int_sizes, values


def run_cli(*args):
    env = dict(os.environ, JT_FORCE_CPU="1")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import junctiontree_tpu.__main__ as m; import sys;"
        "sys.exit(m.main(sys.argv[1:]))"
    )
    return subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )


def test_cli_pr(uai_files):
    model, evid, f, s, v = uai_files
    r = run_cli(str(model), "--task", "PR")
    assert r.returncode == 0, r.stderr
    assert r.stdout.splitlines()[0] == "PR"
    (z,) = brute_force_marginals(f, s, v, [[]])
    got = float(r.stdout.splitlines()[1])
    np.testing.assert_allclose(got, np.log10(z), rtol=1e-4)


def test_cli_mar_with_evidence(uai_files):
    model, evid, f, s, v = uai_files
    r = run_cli(str(model), "--evidence", str(evid), "--task", "MAR", "--stats")
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0] == "MAR"
    toks = lines[1].split()
    assert int(toks[0]) == len(s)
    # var 0 observed at state 1 -> posterior is the indicator
    card0 = int(toks[1])
    p0 = [float(x) for x in toks[2:2 + card0]]
    np.testing.assert_allclose(p0, [0.0, 1.0], atol=1e-6)
    assert "compile" in r.stderr


def test_cli_mpe(uai_files):
    model, evid, f, s, v = uai_files
    r = run_cli(str(model), "--task", "MPE")
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0] == "MPE"
    toks = lines[1].split()
    assert int(toks[0]) == len(s)
    assert all(0 <= int(x) < 2 for x in toks[1:])


def test_cli_cutset_engine(uai_files):
    """Forced cutset engine stays EXACT: MAR/PR match the oracle; MPE is
    rejected with a clear message."""
    model, evid, f, s, v = uai_files
    r = run_cli(str(model), "--task", "PR", "--engine", "cutset", "--stats")
    assert r.returncode == 0, r.stderr
    (z,) = brute_force_marginals(f, s, v, [[]])
    got = float(r.stdout.splitlines()[1])
    np.testing.assert_allclose(got, np.log10(z), rtol=1e-4)
    assert "cutset engine" in r.stderr

    r = run_cli(str(model), "--task", "MAR", "--engine", "cutset",
                "--evidence", str(evid))
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0] == "MAR"
    toks = lines[1].split()
    assert int(toks[0]) == len(s)
    card0 = int(toks[1])
    p0 = [float(x) for x in toks[2:2 + card0]]
    np.testing.assert_allclose(p0, [0.0, 1.0], atol=1e-6)
    # an unobserved variable's posterior matches the brute-force oracle
    (m_last,) = brute_force_marginals(f, s, v, [[len(s) - 1]],
                                      evidence={0: 1})
    off = 2 + card0
    for _ in range(len(s) - 2):
        card = int(toks[off])
        off += 1 + card
    card_last = int(toks[off])
    p_last = [float(x) for x in toks[off + 1:off + 1 + card_last]]
    np.testing.assert_allclose(p_last, m_last / m_last.sum(), atol=1e-5)

    # cutset MPE matches the exact engine's decoded score
    r = run_cli(str(model), "--task", "MPE", "--engine", "cutset")
    assert r.returncode == 0, r.stderr
    r_exact = run_cli(str(model), "--task", "MPE", "--engine", "exact")
    lp = [float(l.split("=")[1]) for l in r.stderr.splitlines()
          if "log p" in l]
    lp_exact = [float(l.split("=")[1]) for l in r_exact.stderr.splitlines()
                if "log p" in l]
    np.testing.assert_allclose(lp, lp_exact, rtol=1e-4)
    toks = r.stdout.splitlines()[1].split()
    assert int(toks[0]) == len(s)
    assert all(0 <= int(x) < 2 for x in toks[1:])


def test_cli_out_file(uai_files, tmp_path):
    model, evid, f, s, v = uai_files
    out = tmp_path / "res.txt"
    r = run_cli(str(model), "--task", "PR", "--out", str(out))
    assert r.returncode == 0
    assert out.read_text().startswith("PR")


def test_cli_loopy_engine(uai_files):
    """Forced loopy engine: MAR close to exact on this tiny grid; PR within
    Bethe tolerance; MPE well-formed."""
    model, evid, f, s, v = uai_files
    r = run_cli(str(model), "--task", "MAR", "--engine", "loopy",
                "--evidence", str(evid))
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0] == "MAR"
    assert "loopy BP" in r.stderr
    toks = lines[1].split()
    card0 = int(toks[1])
    p0 = [float(x) for x in toks[2:2 + card0]]
    np.testing.assert_allclose(p0, [0.0, 1.0], atol=1e-5)

    r = run_cli(str(model), "--task", "PR", "--engine", "loopy")
    assert r.returncode == 0, r.stderr
    (z,) = brute_force_marginals(f, s, v, [[]])
    got = float(r.stdout.splitlines()[1])
    np.testing.assert_allclose(got, np.log10(z), rtol=0.05)

    r = run_cli(str(model), "--task", "MPE", "--engine", "loopy")
    assert r.returncode == 0, r.stderr
    toks = r.stdout.splitlines()[1].split()
    assert int(toks[0]) == len(s)
    assert all(0 <= int(x) < 2 for x in toks[1:])


def test_cli_mmap(uai_files, tmp_path):
    """MMAP task: query file in, 'MMAP' + (var, state) pairs out, matching
    the brute-force marginal table over the query variables."""
    model, evid, f, s, v = uai_files
    q = tmp_path / "m.query"
    q.write_text("2 0 3\n")
    r = run_cli(str(model), "--task", "MMAP", "--query", str(q),
                "--evidence", str(evid), "--stats")
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0] == "MMAP"
    toks = lines[1].split()
    assert int(toks[0]) == 2
    got = {int(toks[1 + 2 * i]): int(toks[2 + 2 * i]) for i in range(2)}
    marg = brute_force_marginals(f, s, v, [[0, 3]], {0: 1})[0]
    assert marg[got[0], got[3]] == pytest.approx(marg.max(), rel=1e-6)
    assert "log mmap value" in r.stderr
    assert "constrained induced width" in r.stderr


def test_cli_mmap_requires_query(uai_files):
    model, evid, f, s, v = uai_files
    r = run_cli(str(model), "--task", "MMAP")
    assert r.returncode == 2
    assert "--query" in r.stderr
