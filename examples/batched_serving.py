"""Worked example: production-style batched evidence serving on a grid MRF.

10k evidence queries answered by one compiled XLA program; posteriors +
log-partitions, numerically stable at any model size.

Run:  python examples/batched_serving.py
"""

import time

import jax
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import junctiontree_tpu as jt
from junctiontree_tpu.evidence import batch_masks_sparse, random_evidence_batch
from junctiontree_tpu.models import grid_mrf_model


def main():
    factors, sizes, values = grid_mrf_model(8, 8, seed=0)
    tree = jt.create_junction_tree(factors, sizes)
    print("compile stats:", tree.stats())

    eng = tree.engine().set_potentials(values)
    B = 8192
    observed = list(sizes)[:20]
    evs = random_evidence_batch(tree.plan, B, observed, seed=1)
    masks = batch_masks_sparse(tree.plan, evs)

    post, logz = eng.posterior_batch(masks)  # compile + run
    jax.block_until_ready(logz)
    t0 = time.perf_counter()
    post, logz = eng.posterior_batch(masks)
    jax.block_until_ready(logz)
    dt = time.perf_counter() - t0
    print(f"{B} queries in {dt*1e3:.1f} ms  ({B/dt:,.0f} queries/s)")
    print("logZ[0] = %.3f" % float(np.asarray(logz)[0]))
    vid = tree.plan.table.id_of(observed[0])
    print("posterior of first observed var, query 0:", np.asarray(post[vid])[0])


if __name__ == "__main__":
    main()
