"""Compatibility facade mirroring the reference's ``junctiontree.computation``
module surface (/root/reference/junctiontree/computation.py):

  reference               ->  here
  -------------------------------------------------------------
  compute_beliefs          -> compute_beliefs (static schedule, no recursion)
  apply_evidence           -> evidence.apply_evidence (no [[array]] quirk)
  sum_product (module var) -> ops.semirings.SUM_PRODUCT

``compute_beliefs`` takes the compiled Plan plus per-clique potentials and
returns consistent clique + separator beliefs, the role of the reference's
two-pass recursion (computation.py:37-246)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .evidence import apply_evidence  # noqa: F401
from .executor import propagate_cliques
from .ops.semirings import SUM_PRODUCT, Semiring
from .schedule import Plan

sum_product = SUM_PRODUCT  # reference computation.py:9 module singleton


def compute_beliefs(
    plan: Plan,
    clique_potentials: Sequence[np.ndarray],
    dl: Semiring = SUM_PRODUCT,
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Two-pass belief propagation over the compiled plan.

    Returns (clique_beliefs, separator_beliefs) — each entry the
    unnormalized joint marginal over that node's variables, exactly the
    post-propagation beliefs buffer of the reference (split in two lists
    instead of the clique++separator concatenation)."""
    pots = [jnp.asarray(p) for p in clique_potentials]
    cb, sb = propagate_cliques(plan, pots, dl)
    return [np.asarray(x) for x in cb], [np.asarray(x) for x in sb]
