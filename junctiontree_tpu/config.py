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
    matmul_precision: str = "highest"      # highest (f32 MXU) | default (bf16 passes)

    # compile
    heuristic: str = "min_fill"            # min_fill | min_degree | min_weight | portfolio[N]
    backend: str = "auto"                  # auto | python | native (C++ compiler)
    root: Optional[int] = None             # clique to root the tree at

    # big-clique path: clique state-space size above which contractions go
    # through the Pallas streaming kernel instead of plain einsum
    pallas_min_states: int = 1 << 17

    def apply(self) -> "Config":
        """Push process-wide knobs (MXU precision) into effect."""
        from .ops.semirings import set_matmul_precision

        set_matmul_precision(self.matmul_precision)
        return self

    # one-stop constructors honoring every knob
    def compile(self, factors, sizes):
        """compile_plan with this config's heuristic/backend/root."""
        from .schedule import compile_plan

        self.apply()
        return compile_plan(
            factors, sizes,
            root=self.root, backend=self.backend, heuristic=self.heuristic,
        )

    def engine(self, factors, sizes, values=None):
        """Plan + Engine (with this config's semiring); values optional."""
        from .executor import Engine
        from .ops.semirings import SEMIRINGS

        eng = Engine(self.compile(factors, sizes), SEMIRINGS[self.semiring])
        if values is not None:
            eng.set_potentials(values)
        return eng


DEFAULT = Config()
