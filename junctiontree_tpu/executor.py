"""Execute phase: compiled static-schedule belief propagation.

TPU-native replacement for the reference's recursive, mutate-in-place message
passing (/root/reference/junctiontree/computation.py:37-246).  Design:

  * the whole collect/distribute schedule is unrolled at trace time over the
    rooted tree (Plan.tree.topo_order) into a static sequence of contractions
    — no Python recursion at run time, one XLA program per (plan, semiring);
  * clique potentials are broadcast to full clique scope at initialization
    (avoids the reference's size-1-axis hazard, junctiontree.py:34-80 /
    SURVEY.md §2.2) so every contraction has static, fully-known shapes;
  * instead of the reference's divide-out-the-message trick with its zero
    guard (computation.py:99-136), distribute recomputes leave-one-out
    products via prefix/suffix combines over each clique's child messages —
    numerically safe for structural zeros, O(children) combines per clique,
    and fully XLA-fusable;
  * evidence is a per-variable mask combined into one clique per variable
    (Plan.var_to_clique) — shapes never change per query, so one compiled
    program serves every evidence instantiation (vs reference slicing,
    README.md:152-166), and mask batches vmap cleanly.

All functions are pure; `Engine` wraps them with jit/vmap and device caching.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Hashable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.semirings import (
    LOG_SUM_EXP,
    MAX_PRODUCT,
    SUM_PRODUCT,
    Semiring,
    _broadcast_to_scope,
)
from .schedule import Plan


def _combine_into_scope(
    semiring: Semiring,
    acc: jnp.ndarray,
    scope: Sequence[int],
    x: jnp.ndarray,
    x_vars: Sequence[int],
) -> jnp.ndarray:
    return semiring.combine(acc, _broadcast_to_scope(x, x_vars, scope))


def evaluate_cliques(
    plan: Plan,
    factor_values: Sequence[jnp.ndarray],
    semiring: Semiring = SUM_PRODUCT,
) -> List[jnp.ndarray]:
    """Initial clique potentials: product of assigned factors, broadcast to
    the full clique shape (Hugin initialization; role of reference
    ``CliqueGraph.evaluate``, junctiontree.py:203-226).

    ``factor_values`` are in the semiring's space already (use
    ``semiring.from_linear`` at the boundary)."""
    if len(factor_values) != len(plan.factors):
        raise ValueError(
            "expected %d factor value arrays, got %d"
            % (len(plan.factors), len(factor_values))
        )
    for f, (fvars, val) in enumerate(zip(plan.factors, factor_values)):
        got = tuple(jnp.shape(val))
        want = plan.factor_shape(f)
        if got != want:
            raise ValueError(
                "factor %d (vars %r) has shape %r, expected %r"
                % (f, plan.table.labels_of(fvars), got, want)
            )
    pots: List[jnp.ndarray] = []
    dtype = jnp.result_type(*[jnp.asarray(v).dtype for v in factor_values]) \
        if factor_values else jnp.float32
    for c, cvars in enumerate(plan.clique_vars):
        acc = jnp.full(plan.clique_shape(c), semiring.one, dtype=dtype)
        pots.append(acc)
    for f, (fvars, val) in enumerate(zip(plan.factors, factor_values)):
        c = plan.tri.factor_to_maxclique[f]
        if c < 0:  # empty-scope (scalar) factor folds into the root clique
            c = plan.tree.root
            pots[c] = semiring.combine(pots[c], jnp.asarray(val))
            continue
        pots[c] = _combine_into_scope(
            semiring, pots[c], plan.clique_vars[c], jnp.asarray(val), fvars
        )
    return pots


def apply_masks(
    plan: Plan,
    clique_pots: Sequence[jnp.ndarray],
    masks: Sequence[jnp.ndarray],
    semiring: Semiring = SUM_PRODUCT,
) -> List[jnp.ndarray]:
    """Combine per-variable evidence masks (semiring space, one [size_v]
    vector per variable id) into each variable's designated clique."""
    pots = list(clique_pots)
    for v, m in enumerate(masks):
        c = plan.var_to_clique[v]
        pots[c] = _combine_into_scope(
            semiring, pots[c], plan.clique_vars[c], m, [v]
        )
    return pots


def propagate_cliques(
    plan: Plan,
    clique_pots: Sequence[jnp.ndarray],
    semiring: Semiring = SUM_PRODUCT,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Two-pass collect/distribute over the static schedule.

    Returns (clique_beliefs, sep_beliefs): unnormalized joint marginals over
    each clique's / separator's variables — same semantics as the reference's
    post-propagation beliefs buffer (computation.py:216-224, 210)."""
    tree = plan.tree
    cvars = plan.clique_vars
    svars = plan.sep_vars

    # ---- collect: leaves -> root; up[c] lives on the edge (c -> parent) ----
    up: List[Optional[jnp.ndarray]] = [None] * tree.num_cliques
    for c in reversed(tree.topo_order):
        if c == tree.root:
            continue
        operands = [clique_pots[c]]
        operand_vars: List[Sequence[int]] = [cvars[c]]
        for child, sep in tree.children[c]:
            operands.append(up[child])
            operand_vars.append(svars[sep])
        up[c] = semiring.contract(
            operands, operand_vars, svars[tree.parent_sep[c]]
        )

    # ---- distribute: root -> leaves; down[c] lives on the same edge ----
    # For parent p with children k_1..k_d, the message to k_i needs the
    # product of pot_p, down[p], and up[k_j] for j != i.  Broadcast each
    # child message to p's clique scope once, then prefix/suffix combine —
    # O(d) clique-sized combines total instead of O(d^2) operands.
    down: List[Optional[jnp.ndarray]] = [None] * tree.num_cliques
    base: List[Optional[jnp.ndarray]] = [None] * tree.num_cliques  # pot*down at p
    for p in tree.topo_order:
        kids = tree.children[p]
        if not kids:
            continue
        acc = clique_pots[p]
        if p != tree.root:
            acc = _combine_into_scope(
                semiring, acc, cvars[p], down[p], svars[tree.parent_sep[p]]
            )
        base[p] = acc
        d = len(kids)
        bcast = [
            _broadcast_to_scope(up[k], svars[s], cvars[p]) for k, s in kids
        ]
        if d == 1:
            k, s = kids[0]
            down[k] = semiring.contract([acc], [cvars[p]], svars[s])
            continue
        prefix = [None] * d  # prefix[i] = combine of bcast[0..i-1]
        suffix = [None] * d  # suffix[i] = combine of bcast[i+1..d-1]
        run = None
        for i in range(d):
            prefix[i] = run
            run = bcast[i] if run is None else semiring.combine(run, bcast[i])
        run = None
        for i in range(d - 1, -1, -1):
            suffix[i] = run
            run = bcast[i] if run is None else semiring.combine(run, bcast[i])
        for i, (k, s) in enumerate(kids):
            loo = acc
            if prefix[i] is not None:
                loo = semiring.combine(loo, prefix[i])
            if suffix[i] is not None:
                loo = semiring.combine(loo, suffix[i])
            down[k] = semiring.contract([loo], [cvars[p]], svars[s])

    # ---- beliefs ----
    clique_beliefs: List[jnp.ndarray] = [None] * tree.num_cliques
    for c in tree.topo_order:
        acc = clique_pots[c]
        if c != tree.root:
            acc = _combine_into_scope(
                semiring, acc, cvars[c], down[c], svars[tree.parent_sep[c]]
            )
        for k, s in tree.children[c]:
            acc = _combine_into_scope(semiring, acc, cvars[c], up[k], svars[s])
        clique_beliefs[c] = acc

    sep_beliefs: List[jnp.ndarray] = [None] * len(svars)
    for c in tree.topo_order:
        if c == tree.root:
            continue
        s = tree.parent_sep[c]
        sep_beliefs[s] = semiring.combine(up[c], down[c])

    return clique_beliefs, sep_beliefs


def factor_marginals(
    plan: Plan,
    clique_beliefs: Sequence[jnp.ndarray],
    semiring: Semiring = SUM_PRODUCT,
) -> List[jnp.ndarray]:
    """Project consistent clique beliefs back onto each factor's variables
    (role of reference ``CliqueGraph.marginalize``, junctiontree.py:229-274).
    Empty-scope factors marginalize the root belief to a scalar (= Z)."""
    out: List[jnp.ndarray] = []
    for f, fvars in enumerate(plan.factors):
        c = plan.tri.factor_to_maxclique[f]
        if c < 0:
            c = plan.tree.root
        out.append(
            semiring.contract(
                [clique_beliefs[c]], [plan.clique_vars[c]], fvars
            )
        )
    return out


def var_marginals(
    plan: Plan,
    clique_beliefs: Sequence[jnp.ndarray],
    semiring: Semiring = SUM_PRODUCT,
) -> List[jnp.ndarray]:
    """Per-variable unnormalized marginals, one [size_v] vector per var id."""
    out: List[jnp.ndarray] = []
    for v in range(plan.num_vars):
        c = plan.var_to_clique[v]
        out.append(
            semiring.contract([clique_beliefs[c]], [plan.clique_vars[c]], [v])
        )
    return out


def partition(
    plan: Plan,
    clique_beliefs: Sequence[jnp.ndarray],
    semiring: Semiring = SUM_PRODUCT,
) -> jnp.ndarray:
    """Normalization constant: any clique belief fully marginalized; we use
    the root (reference: sum of any clique belief, README.md:171-179)."""
    r = plan.tree.root
    return semiring.contract([clique_beliefs[r]], [plan.clique_vars[r]], [])


def all_ones_masks(plan: Plan, semiring: Semiring = SUM_PRODUCT) -> List[np.ndarray]:
    """No-evidence masks (semiring space)."""
    return [
        np.full((s,), semiring.one, dtype=np.float32) for s in plan.sizes
    ]


def evidence_to_masks(
    plan: Plan,
    evidence: Dict[Hashable, int],
    semiring: Semiring = SUM_PRODUCT,
) -> List[np.ndarray]:
    """Dict {var label: observed state} -> per-variable mask vectors.

    Masking semantics provably match the reference's axis-slicing evidence
    (README.md:152-166): entries inconsistent with the evidence become the
    semiring zero, so every contraction result restricted to the evidence
    slice equals the sliced computation (tests/test_evidence.py)."""
    masks = all_ones_masks(plan, semiring)
    zero = -np.inf if semiring.is_log else 0.0
    for label, state in evidence.items():
        if label not in plan.table:
            raise KeyError(
                "evidence variable %r is not a variable of this model" % (label,)
            )
        v = plan.table.id_of(label)
        if not 0 <= int(state) < plan.sizes[v]:
            raise ValueError(
                "evidence state %r out of range for variable %r (size %d)"
                % (state, label, plan.sizes[v])
            )
        m = np.full((plan.sizes[v],), zero, dtype=np.float32)
        m[int(state)] = semiring.one
        masks[v] = m
    return masks


class Engine:
    """Jitted inference engine for one compiled Plan.

    The fast path precomputes clique potentials once (``set_potentials``) and
    then serves evidence queries — single or batched — through one compiled
    XLA program with static shapes."""

    def __init__(self, plan: Plan, semiring: Semiring = SUM_PRODUCT):
        self.plan = plan
        self.semiring = semiring
        self._pots: Optional[List[jnp.ndarray]] = None

        sr = semiring

        def _propagate_values(factor_values: List[jnp.ndarray]):
            pots = evaluate_cliques(plan, factor_values, sr)
            beliefs, _ = propagate_cliques(plan, pots, sr)
            return factor_marginals(plan, beliefs, sr)

        def _query(pots: List[jnp.ndarray], masks: List[jnp.ndarray]):
            mpots = apply_masks(plan, pots, masks, sr)
            beliefs, _ = propagate_cliques(plan, mpots, sr)
            return (
                var_marginals(plan, beliefs, sr),
                partition(plan, beliefs, sr),
            )

        self._propagate_jit = jax.jit(_propagate_values)
        self._evaluate_jit = jax.jit(
            lambda vals: evaluate_cliques(plan, vals, sr)
        )
        self._query_jit = jax.jit(_query)
        self._query_batch_jit = jax.jit(
            jax.vmap(_query, in_axes=(None, 0))
        )

    # -- reference-parity path: values in, unnormalized factor marginals out --
    def propagate(self, values: Sequence[np.ndarray]) -> List[np.ndarray]:
        vals = [
            self.semiring.from_linear(jnp.asarray(v))
            for v in values
        ]
        out = self._propagate_jit(vals)
        return [np.asarray(self.semiring.to_linear(x)) for x in out]

    # -- fast path: precompute potentials once, then mask-only queries --
    def set_potentials(self, values: Sequence[np.ndarray]) -> "Engine":
        vals = [
            self.semiring.from_linear(jnp.asarray(v))
            for v in values
        ]
        self._pots = jax.block_until_ready(self._evaluate_jit(vals))
        return self

    def _require_pots(self):
        if self._pots is None:
            raise RuntimeError("call set_potentials(values) before querying")
        return self._pots

    def query(
        self,
        evidence: Optional[Dict[Hashable, int]] = None,
        normalize: bool = True,
    ) -> Tuple[List[np.ndarray], float]:
        """Posterior per-variable marginals under evidence + normalization
        constant P(evidence) (unnormalized Z if normalize=False)."""
        pots = self._require_pots()
        masks = evidence_to_masks(self.plan, evidence or {}, self.semiring)
        margs, z = self._query_jit(pots, [jnp.asarray(m) for m in masks])
        zlin = float(np.asarray(self.semiring.to_linear(z)))
        if normalize and self.semiring.is_log:
            # normalize in log space (stable even when linear Z overflows)
            out = []
            for m in margs:
                m = np.asarray(m, dtype=np.float64)
                mx = m.max()
                if not np.isfinite(mx):
                    out.append(np.exp(m))
                    continue
                e = np.exp(m - mx)
                out.append(e / e.sum())
            return out, zlin
        margs = [np.asarray(self.semiring.to_linear(m)) for m in margs]
        if normalize:
            margs = [m / m.sum() if m.sum() != 0 else m for m in margs]
        return margs, zlin

    def query_batch(self, mask_batch: Sequence[jnp.ndarray]):
        """Batched evidence queries: ``mask_batch[v]`` has shape [B, size_v]
        (semiring space).  Returns (var marginals [B, size_v] list, Z [B])."""
        pots = self._require_pots()
        return self._query_batch_jit(pots, list(mask_batch))
