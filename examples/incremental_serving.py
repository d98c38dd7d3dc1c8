"""Worked example: incremental evidence serving.

A monitoring scenario: a fixed sensor network (grid MRF), a standing batch
of evidence, and a stream of single-sensor updates.  The session caches the
collect pass once; each delta re-propagates only its dirty path and reads
out only the queried variables — O(tree depth) work instead of O(cliques).

Run:  python examples/incremental_serving.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import junctiontree_tpu as jt
from junctiontree_tpu.evidence import batch_masks_sparse, random_evidence_batch
from junctiontree_tpu.models import grid_mrf_model

factors, sizes, values = grid_mrf_model(8, 8, seed=0)
tree = jt.create_junction_tree(factors, sizes)
eng = tree.engine().set_potentials(values)
names = list(sizes)

B = 512
evs = random_evidence_batch(tree.plan, B, names[:10], seed=1)
base = batch_masks_sparse(tree.plan, evs)

# open the session: one collect pass, messages cached on device
sess = eng.incremental(base)

# a sensor flips: only its path to the root is recomputed
flip = np.zeros((B, sizes[names[0]]), dtype=np.float32)
flip[:, 1] = 1.0
t0 = time.perf_counter()
posts, logz = sess.query({names[0]: flip}, query_vars=[names[40], names[63]])
print(f"delta query: {1e3*(time.perf_counter()-t0):.1f} ms (first call compiles)")
print("P(%s | evidence') =" % names[40], np.asarray(posts[0])[0])

# parity with full re-propagation
merged = dict(base)
merged[names[0]] = flip
full_posts, full_logz = eng.posterior_batch(merged, mode="general")
vid = tree.plan.table.id_of(names[40])
assert np.allclose(np.asarray(posts[0]), np.asarray(full_posts[vid]), rtol=1e-5)
assert np.allclose(np.asarray(logz), np.asarray(full_logz), rtol=1e-5)
print("matches full re-propagation; logZ[0] =", float(np.asarray(logz)[0]))

# fold the update into the base when it becomes permanent
sess.rebase({names[0]: flip})
