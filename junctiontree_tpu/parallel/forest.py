"""Forest (expert-style) parallelism: independent tree components.

Disconnected factor-graph components are joined only by empty separators
(treebuild.py; reference construction.py:530) — their propagations are
embarrassingly parallel.  ``split_components`` factors a Plan into
per-component sub-plans; ``ForestEngine`` places components round-robin
across devices and serves queries concurrently, combining the per-component
log-partitions by summation (SURVEY.md §2.3 EP row)."""

from __future__ import annotations

from typing import Dict, Hashable, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..executor import Engine
from ..schedule import Plan, compile_plan


def split_components(
    factors: Sequence[Sequence[Hashable]],
    sizes: Dict[Hashable, int],
) -> List[Tuple[List[int], List[list], Dict[Hashable, int]]]:
    """Partition a factor graph into connected components.

    Returns a list of (factor_indices, component_factors, component_sizes)."""
    parent: Dict[Hashable, Hashable] = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    for f in factors:
        for v in f:
            parent.setdefault(v, v)
        for a, b in zip(f, f[1:]):
            union(a, b)

    comps: Dict[Hashable, List[int]] = {}
    scalar_fs: List[int] = []
    for i, f in enumerate(factors):
        if not f:
            scalar_fs.append(i)
            continue
        comps.setdefault(find(f[0]), []).append(i)

    out = []
    for root, f_ixs in sorted(comps.items(), key=lambda kv: kv[1][0]):
        cf = [list(factors[i]) for i in f_ixs]
        cs = {v: sizes[v] for f in cf for v in f}
        out.append((f_ixs, cf, cs))
    if scalar_fs and out:
        # fold scalar factors into the first component
        out[0] = (
            out[0][0] + scalar_fs,
            out[0][1] + [[] for _ in scalar_fs],
            out[0][2],
        )
    return out


class ForestEngine:
    """Per-component engines placed round-robin over devices.

    Queries fan out asynchronously (each device computes its components'
    posteriors concurrently); log-partitions sum across components."""

    def __init__(
        self,
        factors: Sequence[Sequence[Hashable]],
        sizes: Dict[Hashable, int],
        devices: Optional[Sequence] = None,
    ):
        self.devices = list(devices if devices is not None else jax.devices())
        self.components = split_components(factors, sizes)
        self.engines: List[Engine] = []
        self.device_of: List = []
        for k, (f_ixs, cf, cs) in enumerate(self.components):
            plan = compile_plan(cf, cs)
            self.engines.append(Engine(plan))
            self.device_of.append(self.devices[k % len(self.devices)])

    def set_potentials(self, values: Sequence[np.ndarray]) -> "ForestEngine":
        for eng, dev, (f_ixs, _, _) in zip(
            self.engines, self.device_of, self.components
        ):
            eng.set_potentials([values[i] for i in f_ixs])
            eng._pots = [jax.device_put(p, dev) for p in eng._pots_np]
        return self

    def posterior_batch(self, evidence_batch: Sequence[Dict[Hashable, int]]):
        """Batched evidence queries across the whole forest.

        Returns ({var label: [B, size_v] posterior}, total logZ [B])."""
        from ..evidence import batch_masks_sparse

        B = len(evidence_batch)
        results = []
        for eng, dev, (f_ixs, cf, cs) in zip(
            self.engines, self.device_of, self.components
        ):
            ev = [
                {k: v for k, v in e.items() if k in cs}
                for e in evidence_batch
            ]
            masks = {
                k: jax.device_put(m, dev)
                for k, m in batch_masks_sparse(eng.plan, ev).items()
            }
            results.append((eng, eng.posterior_batch(masks)))
        posteriors: Dict[Hashable, np.ndarray] = {}
        logz = np.zeros(B)
        for eng, (post, lz) in results:
            lz = np.asarray(lz)
            # an evidence-free component runs with an implicit batch of 1;
            # broadcast its (identical) results to the full batch so the
            # documented [B, size_v] contract holds for every variable
            if lz.shape[0] != B:
                lz = np.broadcast_to(lz, (B,))
            logz = logz + lz
            for v in range(eng.plan.num_vars):
                m = np.asarray(post[v])
                if m.shape[0] != B:
                    m = np.broadcast_to(m, (B,) + m.shape[1:])
                posteriors[eng.plan.table.label_of(v)] = m
        return posteriors, logz
