"""Exact joint marginals over ARBITRARY variable sets (out-of-clique queries).

The reference can only report marginals over factor scopes — projections of
single clique beliefs (junctiontree.py:229-274).  A calibrated junction tree
supports much more: for any variable set Q, the joint P(Q | evidence) is
exact via the tree factorization

    P(x) = prod_C b_C(x_C) / prod_S b_S(x_S)        (all beliefs calibrated)

restricted to the minimal (Steiner) subtree of cliques spanning Q's home
cliques: every clique outside it marginalizes to 1 after the division.  We
eliminate the subtree leaves-first, carrying each node's parent-separator
scope PLUS the Q variables seen so far — so the intermediate scope stays
|sep| + |Q| rather than the union of all clique scopes (the path between
two far-apart query variables can cross many cliques).

Division is guarded the reference's way (zeros stay zeros,
/root/reference/junctiontree/computation.py:131-136).  Probability
semirings only (sum_product / log_sum_exp).

This also powers information-theoretic queries: ``Engine.mutual_information``
computes I(X;Y | evidence) from the exact pairwise joint.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Set, Tuple

import jax.numpy as jnp
import numpy as np

from .ops.semirings import Semiring
from .schedule import Plan

_TINY = 1e-38


def steiner_subtree(plan: Plan, qids: Sequence[int]):
    """Minimal subtree of the clique tree spanning the home cliques of
    ``qids``.  Returns (nodes, root, children) with children restricted to
    the subtree; root is the subtree node closest to the tree root."""
    tree = plan.tree
    targets = {plan.var_to_clique[q] for q in qids}
    # union of root-paths, then prune non-target leaves
    nodes: Set[int] = set()
    for c in targets:
        while c != -1 and c not in nodes:
            nodes.add(c)
            c = tree.parent[c]
    changed = True
    while changed:
        changed = False
        for c in list(nodes):
            if c in targets:
                continue
            kids_in = [k for k, _ in tree.children[c] if k in nodes]
            parent_in = tree.parent[c] in nodes
            if len(kids_in) + (1 if parent_in else 0) <= 1:
                nodes.remove(c)
                changed = True
    root = min(nodes, key=lambda c: tree.topo_order.index(c))
    children = {
        c: [(k, s) for k, s in tree.children[c] if k in nodes]
        for c in nodes
    }
    return nodes, root, children


def _guarded_divide(semiring: Semiring, num, den):
    """num ⊘ den with the reference's zero guard (zeros stay zeros)."""
    if semiring.is_log:
        return jnp.where(jnp.isneginf(den), -jnp.inf, num - den)
    return jnp.where(den != 0, num / jnp.where(den != 0, den, 1.0), 0.0)


def joint_marginal_program(
    plan: Plan,
    semiring: Semiring,
    qids: Sequence[int],
    max_states: int = 1 << 24,
):
    """Build ``fn(clique_beliefs, sep_beliefs) -> unnormalized joint over
    ``qids`` (axes in qids order)`` on CALIBRATED beliefs.

    Raises ValueError if any elimination intermediate would exceed
    ``max_states`` states (scope = parent separator + query vars below)."""
    if semiring.name not in ("sum_product", "log_sum_exp"):
        raise ValueError(
            "joint marginals need a probability semiring "
            "(sum_product or log_sum_exp), not %r" % semiring.name
        )
    qids = list(qids)
    qset = set(qids)
    tree = plan.tree
    cvars = plan.clique_vars
    svars = plan.sep_vars
    nodes, root, children = steiner_subtree(plan, qids)

    # static: post-order over the subtree + per-node output scope
    # (iterative — a query across a 5000-clique chain must not hit
    # Python's recursion limit)
    order: List[int] = []
    stack: List[Tuple[int, bool]] = [(root, False)]
    while stack:
        c, done = stack.pop()
        if done:
            order.append(c)
            continue
        stack.append((c, True))
        for k, _ in children[c]:
            stack.append((k, False))
    q_below: Dict[int, Set[int]] = {}
    out_scope: Dict[int, List[int]] = {}
    for c in order:
        qb = set(cvars[c]) & qset
        for k, _ in children[c]:
            qb |= q_below[k]
        q_below[c] = qb
        if c != root:
            sep = svars[tree.parent_sep[c]]
            scope = sorted(set(sep) | qb)
        else:
            scope = qids  # final projection, caller's order
        out_scope[c] = list(scope)
        states = 1
        for v in scope:
            states *= plan.sizes[v]
        if states > max_states:
            raise ValueError(
                f"joint_marginal over {len(qids)} variables needs a "
                f"{states:,}-state intermediate at clique {c} (cap "
                f"{max_states:,}); query fewer/closer variables or raise "
                f"max_states"
            )

    def fn(clique_beliefs, sep_beliefs):
        msgs: Dict[int, jnp.ndarray] = {}
        for c in order:
            ops = [clique_beliefs[c]]
            ovs: List[List[int]] = [list(cvars[c])]
            if c != root:
                # divide this node's belief by its parent-separator belief
                # BEFORE contracting (cond_c = b_c / b_sep factorization)
                s = tree.parent_sep[c]
                sep = svars[s]
                bs = sep_beliefs[s]
                shape = [1] * len(cvars[c])
                for i, v in enumerate(sep):
                    shape[cvars[c].index(v)] = plan.sizes[v]
                perm = sorted(range(len(sep)),
                              key=lambda i: cvars[c].index(sep[i]))
                den = jnp.transpose(bs, perm).reshape(shape)
                ops[0] = _guarded_divide(semiring, ops[0], den)
            for k, _ in children[c]:
                ops.append(msgs.pop(k))
                ovs.append(out_scope[k])
            msgs[c] = semiring.contract(ops, ovs, out_scope[c])
        return msgs[root]

    return fn


def mutual_information_from_joint(joint: np.ndarray) -> float:
    """I(X;Y) in nats from a (possibly unnormalized) LINEAR joint table
    over exactly two axes."""
    p = np.asarray(joint, dtype=np.float64)
    z = p.sum()
    if not np.isfinite(z) or z <= 0:
        raise ValueError("joint table does not normalize (Z=%r)" % z)
    p = p / z
    px = p.sum(axis=1, keepdims=True)
    py = p.sum(axis=0, keepdims=True)
    mask = p > 0
    return float(np.sum(p[mask] * np.log(p[mask] / (px * py)[mask])))
