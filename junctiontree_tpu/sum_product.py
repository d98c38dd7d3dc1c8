"""Compatibility facade mirroring the reference's ``junctiontree.sum_product``
module (/root/reference/junctiontree/sum_product.py): a ``SumProduct`` class
wrapping a pluggable contraction backend with the reference's interleaved
``einsum(arr0, vars0, arr1, vars1, ..., out_vars)`` calling convention.

Unlike the reference, label interning is deterministic (first-appearance
order, not Python set iteration order — the reference's set-order mapping at
sum_product.py:26 makes its results PYTHONHASHSEED-dependent and can produce
wrong marginals; see tests/test_reference_parity.py)."""

from __future__ import annotations

from typing import Any, List

import numpy as np

from .ops.semirings import LOG_SUM_EXP, MAX_PRODUCT, SUM_PRODUCT, Semiring


class SumProduct:
    """Distributive-law wrapper with the reference's interleaved einsum API."""

    def __init__(self, semiring: Semiring = SUM_PRODUCT):
        if isinstance(semiring, str):
            from .ops.semirings import SEMIRINGS

            semiring = SEMIRINGS[semiring]
        self.semiring = semiring

    def einsum(self, *args: Any) -> np.ndarray:
        """einsum(arr0, vars0, arr1, vars1, ..., out_vars) with arbitrary
        hashable variable labels (reference sum_product.py:14-35)."""
        if len(args) % 2 != 1:
            raise ValueError(
                "expected interleaved (array, vars, ..., out_vars) arguments"
            )
        operands = list(args[0:-1:2])
        operand_vars = list(args[1:-1:2])
        out_vars = list(args[-1])
        # deterministic interning: first appearance order
        table: dict = {}
        for vs in operand_vars + [out_vars]:
            for v in vs:
                table.setdefault(v, len(table))
        import jax.numpy as jnp

        result = self.semiring.contract(
            [jnp.asarray(o) for o in operands],
            [[table[v] for v in vs] for vs in operand_vars],
            [table[v] for v in out_vars],
        )
        return np.asarray(result)
