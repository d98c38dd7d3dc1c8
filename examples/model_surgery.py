"""Worked example: editing a compiled model without recompiling it.

The reference library exposes tree surgery (merge_trees / change_root /
insert_sepset, /root/reference/junctiontree/construction.py:356-428) as
nested-list operations the user composes by hand.  Here the same capability
operates on the compiled plan: add/remove factors and merge whole models,
skipping retriangulation whenever the edit provably preserves the junction
tree — which also means the recompiled XLA programs hit the persistent
compile cache (identical shapes and schedule).

Run:  python examples/model_surgery.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:  # force CPU when the site config pins a TPU platform
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np

import junctiontree_tpu as jt
from junctiontree_tpu.models import grid_mrf_model


def main():
    factors, sizes, values = grid_mrf_model(6, 6, seed=0)
    t0 = time.time()
    tree = jt.create_junction_tree(factors, sizes)
    print(f"compiled 6x6 grid: {len(tree.maxcliques)} cliques "
          f"in {time.time() - t0:.3f}s")

    # 1. covered add: a new pairwise coupling inside an existing clique
    #    attaches to it directly — the tree is untouched
    clique = tree.maxcliques[0]
    scope = [clique[0], clique[1]]
    t0 = time.time()
    grown = tree.add_factor(scope)
    print(f"add_factor({scope}) covered: {time.time() - t0:.4f}s, "
          f"same tree: {grown.plan.tree is tree.plan.tree}")
    rng = np.random.default_rng(0)
    coupling = rng.random((sizes[scope[0]], sizes[scope[1]])) + 0.5
    marg = grown.propagate(list(values) + [coupling])
    print(f"propagate with the new factor: {len(marg)} marginals")

    # 2. uncovered add: a long-range edge changes the graph — this one
    #    honestly retriangulates (and says so)
    far = [list(sizes)[0], list(sizes)[-1]]
    t0 = time.time()
    rewired = tree.add_factor(far)
    print(f"add_factor({far}) uncovered -> rebuilt "
          f"({len(rewired.maxcliques)} cliques, {time.time() - t0:.3f}s)")

    # 3. remove is always O(1): the tree stays a valid junction tree
    shrunk = grown.remove_factor(len(values))
    back = shrunk.propagate(values)
    ref = tree.propagate(values)
    err = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(back, ref)
    )
    print(f"remove_factor undoes the add exactly (max |diff| = {err:.2e})")

    # 4. merge two compiled models: disjoint variables, joined as a forest
    #    by an empty separator — logZs add, no retriangulation
    f2, s2, v2 = grid_mrf_model(3, 3, seed=5)
    ren = {k: "m_" + k for k in s2}
    other = jt.create_junction_tree(
        [[ren[v] for v in f] for f in f2], {ren[k]: c for k, c in s2.items()}
    )
    t0 = time.time()
    merged = tree.merge(other)
    print(f"merged {len(tree.maxcliques)}+{len(other.maxcliques)} cliques "
          f"in {time.time() - t0:.4f}s (no retriangulation)")
    eng = merged.engine().set_potentials(list(values) + list(v2))
    post, p_ev = eng.query({"g0_0": 1, "m_g2_2": 0})
    print(f"one engine serves both components; P(evidence) = {p_ev:.4g}")

    # 5. serving-side: bake a covered factor into a LIVE engine — zero
    #    recompilation, every cached compiled program keeps serving
    eng = tree.engine().set_potentials(values)
    post_before, _ = eng.query({"g0_0": 1})     # warms the compiled program
    eng.multiply_factor(scope, coupling)
    post_after, _ = eng.query({"g0_0": 1})      # same program, new numbers
    moved = float(np.max(np.abs(
        np.asarray(post_after[1]) - np.asarray(post_before[1])
    )))
    print(f"live multiply_factor shifted posteriors by up to {moved:.3f} "
          f"with no recompile")

    # 6. the reference's nested-list surgery still exists for tree tinkering
    nested = tree.tree
    rerooted = jt.change_root(nested, 5)
    print(f"nested-list change_root: root {nested[0]} -> {rerooted[0]}")


if __name__ == "__main__":
    main()
