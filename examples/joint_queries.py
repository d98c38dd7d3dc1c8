"""Worked example: joint marginals over ARBITRARY variable sets + mutual
information — the query surface a calibrated junction tree supports beyond
per-factor marginals (the reference library stops at factor scopes).

Run:  python examples/joint_queries.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import junctiontree_tpu as jt
from junctiontree_tpu.models import grid_mrf_model

factors, sizes, values = grid_mrf_model(5, 5, seed=0)
eng = jt.create_junction_tree(factors, sizes).engine().set_potentials(values)

# -- joint of two variables on OPPOSITE corners of the grid: their home
#    cliques are far apart, so this is a genuine out-of-clique query --
joint, p_ev = eng.joint_marginal(["g0_0", "g4_4"])
print("P(g0_0, g4_4):")
print(np.round(joint, 4))

# -- conditioned on evidence in the middle, plus a third variable --
joint3, p_ev = eng.joint_marginal(
    ["g0_0", "g2_4", "g4_4"], evidence={"g2_2": 1}
)
print(f"\nP(g0_0, g2_4, g4_4 | g2_2=1)  shape {joint3.shape}, "
      f"P(evidence) {p_ev:.4f}")

# -- how much does one corner tell you about the other? --
mi_near = eng.mutual_information("g0_0", "g0_1")   # adjacent: coupled
mi_far = eng.mutual_information("g0_0", "g4_4")    # far: decayed
print(f"\nI(g0_0; g0_1) = {mi_near:.3e} nats (adjacent)")
print(f"I(g0_0; g4_4) = {mi_far:.3e} nats (opposite corners — decayed)")

# -- batched: per-element conditional joints under an evidence batch --
B = 4
m = np.ones((B, 2), dtype=np.float32)
m[0] = [1, 0]
m[1] = [0, 1]
tables, zs = eng.joint_marginal_batch(["g0_0", "g4_4"], {"g2_2": m})
print(f"\nbatched joints: {np.asarray(tables).shape}, Z per element "
      f"{np.round(np.asarray(zs), 4)}")
