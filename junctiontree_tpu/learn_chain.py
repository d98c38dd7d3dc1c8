"""MLE learning on chain-structured models at production scale.

The generic learners (learn.py) trace one op per clique, so a 100k-variable
chain would take hours of XLA compile.  Here the per-factor log-potentials
are packed host-side into a handful of STACKED parameter tensors (grouped by
how each factor lands in its chain clique), the [m, K, K] transition stack is
built with O(groups) scatter-adds, and logZ runs through the O(1)-compile
``lax.scan`` chain program — compile time is constant in chain length, and
one gradient step is two scans.

Supports missing data out of the box: the objective is

    mean_b logZ(evidence_b) - logZ            (observed-data log-likelihood)

whose gradient is E[phi | observed] - E[phi] (gradient EM), identical to
learn.fit_mle_missing but scalable to arbitrarily long chains.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .scan_executor import ChainLayout, chain_posterior_program
from .schedule import Plan


class _ChainParams:
    """Host-side packing of per-factor thetas into stacked group tensors.

    Groups (all shapes in the clique's (v_k, v_{k+1}) orientation):
      pair  — two-variable factors: stacked [n_pair, K, K] (+ transpose flag
              folded in at pack time)
      head  — single-variable factors on axis 0 of their clique: [n0, K]
      tail  — single-variable factors on axis 1: [n1, K]
    """

    def __init__(self, plan: Plan, layout: ChainLayout):
        self.plan = plan
        self.layout = layout
        pos_of_clique = {c: k for k, c in enumerate(layout.clique_order)}
        self.spec: List[Tuple[str, int, bool]] = []  # (group, k, flip)
        for fi, fvars in enumerate(plan.factors):
            cf = plan.tri.factor_to_maxclique[fi]
            k = pos_of_clique[cf]
            vk = layout.var_order[k]
            if len(fvars) == 2:
                self.spec.append(("pair", k, fvars[0] != vk))
            elif len(fvars) == 1:
                self.spec.append(
                    ("head", k, False) if fvars[0] == vk else ("tail", k, False)
                )
            else:
                raise ValueError(
                    "chain learner supports factors of arity 1 or 2; factor "
                    f"{fi} has {len(fvars)} variables"
                )
        self.groups: Dict[str, List[int]] = {"pair": [], "head": [], "tail": []}
        for fi, (g, k, _) in enumerate(self.spec):
            self.groups[g].append(fi)
        self.ks = {
            g: np.asarray([self.spec[fi][1] for fi in fis], dtype=np.int32)
            for g, fis in self.groups.items()
        }

    def pack(self, thetas: Sequence[np.ndarray]) -> Dict[str, jnp.ndarray]:
        K = self.layout.card
        out = {}
        for g, fis in self.groups.items():
            if not fis:
                out[g] = jnp.zeros(
                    (0, K, K) if g == "pair" else (0, K), dtype=jnp.float32
                )
                continue
            mats = []
            for fi in fis:
                t = np.asarray(thetas[fi], dtype=np.float32)
                if self.spec[fi][2]:
                    t = t.T
                mats.append(t)
            out[g] = jnp.asarray(np.stack(mats))
        return out

    def unpack(self, packed: Dict[str, jnp.ndarray]) -> List[np.ndarray]:
        thetas: List[Optional[np.ndarray]] = [None] * len(self.plan.factors)
        for g, fis in self.groups.items():
            arr = np.asarray(packed[g])
            for i, fi in enumerate(fis):
                t = arr[i]
                if self.spec[fi][2]:
                    t = t.T
                thetas[fi] = t
        return thetas  # type: ignore[return-value]

    def build_logA(self, packed: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """[m, K, K] log-transition stack from packed group tensors —
        O(groups) traced ops regardless of chain length."""
        m = len(self.layout.clique_order)
        K = self.layout.card
        logA = jnp.zeros((m, K, K), dtype=jnp.float32)
        if len(self.groups["pair"]):
            logA = logA.at[self.ks["pair"]].add(packed["pair"])
        if len(self.groups["head"]):
            logA = logA.at[self.ks["head"]].add(
                packed["head"][:, :, None]
            )
        if len(self.groups["tail"]):
            logA = logA.at[self.ks["tail"]].add(
                packed["tail"][:, None, :]
            )
        return logA


def chain_masks_from_data(
    plan: Plan, layout: ChainLayout, data: np.ndarray, missing: int = -1
) -> np.ndarray:
    """[m+1, N, K] linear one-hot/ones mask stack in chain order."""
    N = data.shape[0]
    m = len(layout.clique_order)
    K = layout.card
    M = np.ones((m + 1, N, K), dtype=np.float32)
    for k, v in enumerate(layout.var_order):
        col = np.asarray(data[:, v])
        obs = col != missing
        if np.any((col[obs] < 0) | (col[obs] >= K)):
            raise ValueError(f"state out of range for var id {v}")
        M[k, obs, :] = 0.0
        M[k, obs, col[obs]] = 1.0
    return M


def fit_mle_chain(
    plan: Plan,
    data: np.ndarray,
    steps: int = 200,
    learning_rate: float = 0.1,
    init_thetas: Optional[Sequence[np.ndarray]] = None,
    missing: int = -1,
    verbose: bool = False,
) -> Tuple[List[np.ndarray], List[float]]:
    """Gradient MLE on a chain plan (complete or missing data).

    Same contract as ``learn.fit_mle_missing`` (returns per-factor thetas +
    per-step avg observed-data log-likelihood) but with chain-length-
    independent compile via the lax.scan program.  Requires the plan to be a
    uniform chain (``ChainLayout.detect``)."""
    layout = ChainLayout.detect(plan)
    if layout is None:
        raise ValueError(
            "fit_mle_chain requires a uniform chain plan; use learn.fit_mle"
            "/fit_mle_missing for general trees"
        )
    params = _ChainParams(plan, layout)
    if init_thetas is None:
        init_thetas = [
            np.zeros(tuple(plan.sizes[v] for v in f)) for f in plan.factors
        ]
    packed = params.pack(init_thetas)
    masks = jnp.asarray(chain_masks_from_data(plan, layout, data, missing))
    m = len(layout.clique_order)
    ones_mask = jnp.ones((m + 1, 1, layout.card), dtype=jnp.float32)
    prog = chain_posterior_program(plan, layout)

    def neg_loglik(packed):
        A = jnp.exp(params.build_logA(packed))
        _, logz_obs = prog(A, masks)
        _, logz_free = prog(A, ones_mask)
        return logz_free[0] - jnp.mean(logz_obs)

    try:
        import optax

        opt = optax.adam(learning_rate)
    except ImportError:
        opt = None

    history: List[float] = []
    if opt is not None:
        state = opt.init(packed)

        @jax.jit
        def step(packed, state):
            loss, g = jax.value_and_grad(neg_loglik)(packed)
            updates, state = opt.update(g, state)
            return optax.apply_updates(packed, updates), state, loss

        for i in range(steps):
            packed, state, loss = step(packed, state)
            history.append(-float(loss))
            if verbose and i % 20 == 0:
                print(f"step {i}: avg loglik {-float(loss):.6f}")
    else:
        vg = jax.jit(jax.value_and_grad(neg_loglik))
        for i in range(steps):
            loss, g = vg(packed)
            packed = jax.tree_util.tree_map(
                lambda p, gi: p - learning_rate * gi, packed, g
            )
            history.append(-float(loss))

    return params.unpack(packed), history
