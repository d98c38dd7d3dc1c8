"""Headline benchmark: batched-evidence queries/s on the 6x6 grid MRF.

Baseline (BASELINE.md): the reference sustains ~138 queries/s on this model
(single evidence instantiation per propagate call, 1 CPU core).  Here one
compiled XLA program serves a whole evidence batch per step on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "queries/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_QPS = 138.0  # reference, 6x6 grid MRF, 1 CPU core (BASELINE.md)


def main(batch=8192, iters=20, rows=6, cols=6):
    import jax
    import jax.numpy as jnp

    import junctiontree_tpu as jt
    from junctiontree_tpu.evidence import batch_masks, random_evidence_batch
    from junctiontree_tpu.models import grid_mrf_model
    from junctiontree_tpu.parallel.batch import _single_query
    from junctiontree_tpu.ops.semirings import SUM_PRODUCT
    from functools import partial

    t0 = time.perf_counter()
    factors, sizes, values = grid_mrf_model(rows, cols, seed=0)
    tree = jt.create_junction_tree(factors, sizes)
    plan = tree.plan
    compile_host = time.perf_counter() - t0

    pots = [
        p.astype(jnp.float32)
        for p in tree.engine()._evaluate_jit(
            [jnp.asarray(v, dtype=jnp.float32) for v in values]
        )
    ]
    observed = [v for i, v in enumerate(sizes) if i % 3 == 0]
    evs = random_evidence_batch(plan, batch, observed, seed=1)
    masks = [jnp.asarray(m) for m in batch_masks(plan, evs)]

    fn = jax.jit(
        jax.vmap(partial(_single_query, plan, SUM_PRODUCT), in_axes=(None, 0))
    )

    t1 = time.perf_counter()
    out = fn(pots, masks)
    jax.block_until_ready(out)
    compile_xla = time.perf_counter() - t1

    # steady state
    t2 = time.perf_counter()
    for _ in range(iters):
        out = fn(pots, masks)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t2) / iters
    qps = batch / dt

    print(
        json.dumps(
            {
                "metric": "batched-evidence queries/s, 6x6 grid MRF, 1 chip",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / BASELINE_QPS, 2),
            }
        )
    )
    print(
        f"# batch={batch} step={dt*1e3:.2f}ms host_compile={compile_host:.2f}s "
        f"xla_compile={compile_xla:.1f}s device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
