"""User API / object model.

Mirrors the reference's L4 surface (/root/reference/junctiontree/junctiontree.py):
``create_junction_tree(factors, sizes)`` and the FactorGraph -> CliqueGraph ->
JunctionTree chain, with ``JunctionTree.propagate(values)`` returning a list of
unnormalized factor marginals with the same length and shapes as the inputs
(junctiontree.py:297-331).  Under the hood everything runs on the compiled
Plan/Engine (schedule.py / executor.py) instead of per-array NumPy loops.

Extras beyond the reference surface: ``JunctionTree.engine()`` exposes the
fast mask-query path (precomputed potentials + batched evidence), semirings
other than sum-product actually work (max-product MAP, log-space), and
compile stats are available via ``JunctionTree.stats()``.
"""

from __future__ import annotations

from typing import Dict, Hashable, List, Optional, Sequence

import numpy as np

from .executor import Engine
from .ops.semirings import SEMIRINGS, SUM_PRODUCT, Semiring
from .schedule import Plan, compile_plan


def einsum(xs, xs_keys, y_keys):
    """Key-flexible einsum: arbitrary hashable axis keys, and output-only
    keys allowed (role of reference junctiontree.py:34-80, which prepends
    output-only keys to the first input as length-1 axes).

    Here output-only keys become length-1 axes of the *result* (broadcast
    them yourself if full extents are needed — see CliqueGraph.evaluate for
    the full-extent behavior)."""
    import jax.numpy as jnp

    from .ops.semirings import SUM_PRODUCT

    table: dict = {}
    for ks in list(xs_keys) + [list(y_keys)]:
        for k in ks:
            table.setdefault(k, len(table))
    covered = {k for ks in xs_keys for k in ks}
    inner_out = [k for k in y_keys if k in covered]
    res = SUM_PRODUCT.contract(
        [jnp.asarray(x) for x in xs],
        [[table[k] for k in ks] for ks in xs_keys],
        [table[k] for k in inner_out],
    )
    # insert length-1 axes for output-only keys, in y_keys order
    out_shape = []
    take = 0
    for k in y_keys:
        if k in covered:
            out_shape.append(res.shape[take])
            take += 1
        else:
            out_shape.append(1)
    pos = {k: i for i, k in enumerate(inner_out)}
    perm = [pos[k] for k in y_keys if k in covered]
    res = jnp.transpose(res, perm).reshape(out_shape) if inner_out else res.reshape(out_shape)
    return np.asarray(res)


def create_junction_tree(factors, sizes) -> "JunctionTree":
    """Build a junction tree for the given factor graph.

    factors: list of lists of hashable variable labels (one list per factor).
    sizes:   dict label -> cardinality.

    Same contract as reference junctiontree.py:12-16."""
    for f in factors:
        if not isinstance(f, (list, tuple)):
            raise TypeError("factors must be given as lists of variables")
    return FactorGraph(factors=factors, sizes=sizes).triangulate().create_junction_tree()


class FactorGraph:
    """A factor graph: factor variable-lists + variable sizes
    (reference junctiontree.py:83-117)."""

    def __init__(self, factors, sizes):
        self.factors = [list(f) for f in factors]
        self.sizes = dict(sizes)

    def triangulate(self) -> "CliqueGraph":
        plan = compile_plan(self.factors, self.sizes)
        return CliqueGraph(self, plan)


class CliqueGraph:
    """Triangulated graph: maximal cliques + factor assignment
    (reference junctiontree.py:120-274)."""

    def __init__(self, factor_graph: FactorGraph, plan: Plan):
        self.factor_graph = factor_graph
        self._plan = plan

    @property
    def maxcliques(self) -> List[list]:
        return [self._plan.table.labels_of(c) for c in self._plan.tri.maxcliques]

    @property
    def factor_to_maxclique(self) -> List[int]:
        return list(self._plan.tri.factor_to_maxclique)

    def create_junction_tree(self) -> "JunctionTree":
        return JunctionTree(self, self._plan)

    def evaluate(
        self, values: Sequence[np.ndarray], size1_uncovered: bool = False
    ) -> List[np.ndarray]:
        """Initial clique potentials (product of assigned factors, broadcast
        to full clique shape).  NOTE: unlike the reference (which leaves
        size-1 axes for clique vars not covered by any assigned factor,
        junctiontree.py:203-226), potentials here default to the full
        per-variable extents — the standard Hugin initialization.

        ``size1_uncovered=True`` opts into the reference's exact shape
        semantics: each clique variable not covered by any factor assigned
        to that clique keeps a length-1 axis.  The two forms hold identical
        values (the product is constant along uncovered axes), so the
        compat table is the full table sliced to index 0 there —
        differentially tested against the reference's own uncovered-var
        fixture (tests/test_compat.py)."""
        from .executor import evaluate_cliques
        import jax.numpy as jnp

        vals = [jnp.asarray(v, dtype=jnp.float32) for v in values]
        full = [np.asarray(p) for p in evaluate_cliques(self._plan, vals)]
        if not size1_uncovered:
            return full
        out = []
        for c, p in enumerate(full):
            covered = set()
            for f_ix, mc in enumerate(self.factor_to_maxclique):
                if mc == c:
                    covered.update(self.factor_graph.factors[f_ix])
            idx = tuple(
                slice(None) if v in covered else slice(0, 1)
                for v in self.maxcliques[c]
            )
            out.append(p[idx])
        return out


    def marginalize(self, clique_beliefs) -> List[np.ndarray]:
        """Project consistent clique beliefs back onto each factor's
        variables (role of reference ``CliqueGraph.marginalize``,
        junctiontree.py:229-274): returns one array per factor, same shape
        as that factor's value array."""
        import jax.numpy as jnp

        from .executor import factor_marginals

        out = factor_marginals(
            self._plan, [jnp.asarray(b) for b in clique_beliefs]
        )
        return [np.asarray(x) for x in out]


class JunctionTree:
    """A compiled junction tree (reference junctiontree.py:277-331).

    ``tree`` is the reference-format recursive list
    ``[clique_ix, (sep_ix, subtree), ...]`` with separator ids offset by the
    clique count (README.md:43-70), ``separators`` the separator variable
    lists in label space."""

    def __init__(self, clique_graph: CliqueGraph, plan: Plan):
        self.clique_tree = clique_graph
        self._plan = plan
        self._engines: Dict[str, Engine] = {}

    # ---- structure, in label space ----
    @property
    def tree(self) -> list:
        return self._plan.tree.to_nested()

    @property
    def separators(self) -> List[list]:
        return [self._plan.table.labels_of(s) for s in self._plan.tree.separators]

    @property
    def maxcliques(self) -> List[list]:
        return self.clique_tree.maxcliques

    @property
    def plan(self) -> Plan:
        return self._plan

    def stats(self) -> dict:
        return self._plan.stats()

    # ---- incremental surgery (role of reference merge_trees/change_root/
    # insert_sepset, construction.py:356-428, lifted to the compiled plan:
    # see surgery.py) ----
    def _rewrap(self, plan: Plan) -> "JunctionTree":
        fg = FactorGraph(
            [plan.table.labels_of(f) for f in plan.factors],
            {plan.table.label_of(v): plan.sizes[v] for v in range(plan.num_vars)},
        )
        return JunctionTree(CliqueGraph(fg, plan), plan)

    def add_factor(self, scope, sizes: Optional[Dict] = None) -> "JunctionTree":
        """New JunctionTree with one more factor (appended last in the
        ``propagate`` values order).  Scopes covered by an existing clique
        attach without retriangulation; anything else recompiles (new
        variables need ``sizes``)."""
        from .surgery import add_factor as _add

        plan, _ = _add(self._plan, scope, sizes=sizes)
        return self._rewrap(plan)

    def remove_factor(self, factor_ix: int) -> "JunctionTree":
        """New JunctionTree without factor ``factor_ix`` (always O(1); the
        tree is reused — see surgery.remove_factor)."""
        from .surgery import remove_factor as _rm

        return self._rewrap(_rm(self._plan, factor_ix))

    def merge(self, other: "JunctionTree") -> "JunctionTree":
        """Merge with another compiled tree over disjoint variables into one
        forest (joined by an empty separator; factor order = self ++ other).
        No retriangulation — see surgery.merge_plans."""
        from .surgery import merge_plans

        return self._rewrap(merge_plans(self._plan, other._plan))

    # ---- execution ----
    def engine(self, semiring: str = "sum_product") -> Engine:
        if isinstance(semiring, Semiring):
            key, sr = semiring.name, semiring
        else:
            key, sr = semiring, SEMIRINGS[semiring]
        if key not in self._engines:
            self._engines[key] = Engine(self._plan, sr)
        return self._engines[key]

    def marginal_map(
        self,
        values: Sequence[np.ndarray],
        map_vars: Sequence,
        evidence: Optional[Dict] = None,
    ):
        """Exact Marginal MAP over ``map_vars`` (max over them, sum over
        the rest) given hard evidence.  Builds a dedicated constrained
        (sum-before-max) solver — MMAP is not computable on this tree's
        free elimination order; see mmap.MarginalMapSolver for serving.

        Returns ({map var label: state}, log MMAP value)."""
        from .mmap import MarginalMapSolver

        plan = self._plan
        solver = MarginalMapSolver(
            [plan.table.labels_of(f) for f in plan.factors],
            {plan.table.label_of(v): plan.sizes[v]
             for v in range(plan.num_vars)},
            map_vars,
        )
        return solver.set_potentials(values).query(evidence)

    def propagate(
        self, values: Sequence[np.ndarray], semiring: str = "sum_product"
    ) -> List[np.ndarray]:
        """Full Hugin propagation: factor values in, unnormalized factor
        marginals out — same length and shapes as the input list (reference
        junctiontree.py:297-331)."""
        return self.engine(semiring).propagate(values)
