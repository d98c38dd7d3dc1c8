"""Exact posterior sampling from a junction tree.

Forward-filtering backward-sampling: after the collect pass, the root clique
belief is the unnormalized joint over its variables; sample the root clique
configuration from it, then walk the tree root->leaves sampling each clique's
non-separator variables conditionally on its already-sampled separator
assignment.  Every draw is an independent exact sample from the (evidence-
conditioned) distribution — a capability the reference does not have.

Runs as one compiled XLA program vmapped over the sample batch: per clique,
the belief is reshaped to [sep_states, rest_states]; the sampled separator
assignment ravels to a row index and ``jax.random.categorical`` draws the
rest.  All shapes static; cost O(total clique states) per sample.
"""

from __future__ import annotations

from typing import Dict, Hashable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .ops.semirings import SUM_PRODUCT, Semiring
from .schedule import Plan

_NEG_INF = -1e30


def _log(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x > 0, jnp.log(jnp.maximum(x, 1e-300)), _NEG_INF)


def make_sampler(plan: Plan, semiring: Semiring = SUM_PRODUCT):
    """Build ``fn(clique_beliefs, key) -> assignment [num_vars] int32``.

    ``clique_beliefs`` are consistent post-propagation beliefs (linear or
    log space per ``semiring``).  vmap over keys for a sample batch."""
    tree = plan.tree
    cvars = plan.clique_vars
    svars = plan.sep_vars

    # trace-time layout per clique: separator-to-parent vars first
    layouts = []
    for c in range(tree.num_cliques):
        sep = svars[tree.parent_sep[c]] if c != tree.root else []
        rest = [v for v in cvars[c] if v not in sep]
        perm = [cvars[c].index(v) for v in sep + rest]
        sep_shape = tuple(plan.sizes[v] for v in sep)
        rest_shape = tuple(plan.sizes[v] for v in rest)
        layouts.append((sep, rest, perm, sep_shape, rest_shape))

    def fn(clique_beliefs: Sequence[jnp.ndarray], key: jax.Array):
        assign = jnp.zeros((plan.num_vars,), dtype=jnp.int32)
        keys = jax.random.split(key, tree.num_cliques)
        for c in tree.topo_order:
            sep, rest, perm, sep_shape, rest_shape = layouts[c]
            if not rest:
                continue  # all clique vars already fixed by the separator
            b = clique_beliefs[c]
            logb = b if semiring.is_log else _log(b)
            logb = jnp.transpose(logb, perm).reshape(
                (int(np.prod(sep_shape)) if sep_shape else 1, -1)
            )
            if sep:
                sep_idx = jnp.ravel_multi_index(
                    tuple(assign[v] for v in sep), sep_shape, mode="clip"
                )
            else:
                sep_idx = 0
            logits = logb[sep_idx]
            draw = jax.random.categorical(keys[c], logits)
            # unravel the drawn rest-state into per-var values
            for i, v in enumerate(rest):
                extent = 1
                for j in range(i + 1, len(rest)):
                    extent *= rest_shape[j]
                assign = assign.at[v].set(
                    ((draw // extent) % rest_shape[i]).astype(jnp.int32)
                )
        return assign

    return fn


def sample(
    plan: Plan,
    clique_beliefs: Sequence[jnp.ndarray],
    key: jax.Array,
    num_samples: int,
    semiring: Semiring = SUM_PRODUCT,
) -> jnp.ndarray:
    """Draw ``num_samples`` exact samples; returns [num_samples, num_vars]
    int32 (columns indexed by interned var id)."""
    fn = make_sampler(plan, semiring)
    keys = jax.random.split(key, num_samples)
    return jax.jit(jax.vmap(fn, in_axes=(None, 0)))(
        [jnp.asarray(b) for b in clique_beliefs], keys
    )


def engine_sample(engine, key, num_samples: int, evidence=None) -> np.ndarray:
    """Posterior samples from an Engine with set potentials.

    Applies evidence masks, propagates once, then draws ``num_samples``
    exact samples.  Returns [num_samples, num_vars] int32."""
    from .executor import apply_masks, evidence_to_masks, propagate_cliques

    plan = engine.plan
    pots = engine._require_pots()
    masks = evidence_to_masks(plan, evidence or {}, engine.semiring)
    mpots = apply_masks(
        plan, pots, [jnp.asarray(m) for m in masks], engine.semiring
    )
    beliefs, _ = propagate_cliques(plan, mpots, engine.semiring)
    return np.asarray(
        sample(plan, beliefs, key, num_samples, engine.semiring)
    )
