"""Framework configuration.

The reference has no config system — its only knobs are a hardcoded
distributive law (junctiontree.py:305) and einsum backend (computation.py:9).
Here configuration is an explicit dataclass (SURVEY.md §5 config row):
semiring, dtype, MXU precision, elimination heuristic, mesh axes, and the
big-clique Pallas threshold."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class Config:
    # numeric
    semiring: str = "sum_product"          # sum_product | log_sum_exp | max_product
    dtype: str = "float32"                 # executor dtype on device
    matmul_precision: str = "highest"      # highest (f32 MXU) | default (bf16 passes)

    # compile
    heuristic: str = "min_fill"            # elimination-order heuristic
    root: Optional[int] = None             # clique to root the tree at

    # parallel
    batch_axis: str = "batch"
    model_axis: str = "model"

    # big-clique path: clique state-space size above which contractions go
    # through the Pallas streaming kernel instead of plain einsum
    pallas_min_states: int = 1 << 17

    def apply(self) -> "Config":
        """Push process-wide knobs (MXU precision) into effect."""
        from .ops.semirings import set_matmul_precision

        set_matmul_precision(self.matmul_precision)
        return self


DEFAULT = Config()
