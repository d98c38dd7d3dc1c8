"""Exact batched MAP decoding on arbitrary junction trees.

Max-product collect pass with argmax backpointers + downward traceback, as
one compiled XLA program over an evidence-mask batch.  This is the
general-tree counterpart of the chain Viterbi program (scan_executor.py) and
replaces per-variable argmax-of-max-marginals decoding, which needs a
tie-repair loop (executor.Engine.map_assignment): backpointer traceback picks
a *consistent* joint argmax by construction, so ties are harmless.

The running-intersection property guarantees each variable is decoded exactly
once: a variable not in a clique's parent separator cannot have been assigned
earlier in the pre-order traversal (any other clique containing it would lie
on a path through the parent, putting it in the separator).

The reference has no MAP support at all — max-product is anticipated but
unimplemented (/root/reference/junctiontree/sum_product.py:7-8)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import Plan

_NEG = -1e30  # -inf stand-in that survives max-reductions without NaN


def tree_map_program(plan: Plan, observed: Sequence[int]):
    """Build ``fn(log_pots, masks) -> (assign [B, num_vars] int32, score [B])``.

    log_pots: unbatched log-space clique potentials (max_product space).
    masks: list aligned with ``observed`` (var ids), each [B, size_v] in
    log space (0 = allowed, -inf/very negative = forbidden).
    score is the log of the unnormalized joint at the decoded assignment
    (including mask contributions, i.e. -inf when evidence is infeasible)."""
    tree = plan.tree
    cvars = plan.clique_vars
    svars = plan.sep_vars
    observed = list(observed)
    mask_slot = {v: i for i, v in enumerate(observed)}

    clique_mask_vars: List[List[int]] = [[] for _ in range(tree.num_cliques)]
    for v in observed:
        clique_mask_vars[plan.var_to_clique[v]].append(v)

    # host-side layout per non-root clique: axes permuted to (sep..., rest...)
    layout = {}
    for c in tree.topo_order[1:]:
        sep = svars[tree.parent_sep[c]]
        rest = [v for v in cvars[c] if v not in sep]
        perm = [cvars[c].index(v) for v in list(sep) + rest]
        sep_shape = tuple(plan.sizes[v] for v in sep)
        rest_shape = tuple(plan.sizes[v] for v in rest)
        layout[c] = (list(sep), rest, perm, sep_shape, rest_shape)

    def _strides(shape):
        st = [1] * len(shape)
        for i in range(len(shape) - 2, -1, -1):
            st[i] = st[i + 1] * shape[i + 1]
        return st

    def fn(log_pots: Sequence[jnp.ndarray], masks: Sequence[jnp.ndarray]):
        B = jnp.shape(masks[0])[0] if masks else 1

        def clique_belief(c):
            shape = tuple(plan.sizes[v] for v in cvars[c])
            bel = jnp.broadcast_to(log_pots[c][None], (B,) + shape)
            for v in clique_mask_vars[c]:
                m = masks[mask_slot[v]]
                ax = cvars[c].index(v)
                mshape = [B] + [1] * len(shape)
                mshape[1 + ax] = shape[ax]
                bel = bel + jnp.maximum(m, _NEG).reshape(mshape)
            return bel

        # ---- collect: max-product messages + backpointers ----
        msgs: Dict[int, jnp.ndarray] = {}
        bps: Dict[int, jnp.ndarray] = {}
        root_bel = None
        for c in reversed(tree.topo_order):
            shape = tuple(plan.sizes[v] for v in cvars[c])
            bel = clique_belief(c)
            for child, s in tree.children[c]:
                m = msgs[child]  # [B, *sep_shape], axes in svars[s] order
                sep = svars[s]
                # transpose so sep axes follow their ascending position in
                # this clique, then broadcast into the clique shape
                order = sorted(range(len(sep)),
                               key=lambda i: cvars[c].index(sep[i]))
                src = jnp.transpose(m, [0] + [1 + i for i in order])
                expand = [B] + [1] * len(shape)
                for v in (sep[i] for i in order):
                    expand[1 + cvars[c].index(v)] = plan.sizes[v]
                bel = bel + src.reshape(expand)
            if c == tree.root:
                root_bel = bel
                continue
            sep, rest, perm, sep_shape, rest_shape = layout[c]
            p = jnp.transpose(bel, [0] + [1 + a for a in perm])
            sepN = int(np.prod(sep_shape)) if sep_shape else 1
            restN = int(np.prod(rest_shape)) if rest_shape else 1
            p2 = p.reshape(B, sepN, restN)
            msgs[c] = jnp.max(p2, axis=-1).reshape((B,) + sep_shape)
            bps[c] = jnp.argmax(p2, axis=-1).astype(jnp.int32)  # [B, sepN]

        # ---- root decode ----
        rshape = tuple(plan.sizes[v] for v in cvars[tree.root])
        flat = root_bel.reshape(B, -1)
        score = jnp.max(flat, axis=-1)
        ridx = jnp.argmax(flat, axis=-1).astype(jnp.int32)
        assign = jnp.zeros((B, plan.num_vars), dtype=jnp.int32)
        rstrides = _strides(rshape)
        for i, v in enumerate(cvars[tree.root]):
            assign = assign.at[:, v].set(
                (ridx // rstrides[i]) % rshape[i]
            )

        # ---- traceback (pre-order) ----
        for c in tree.topo_order[1:]:
            sep, rest, perm, sep_shape, rest_shape = layout[c]
            sst = _strides(sep_shape) if sep_shape else []
            sep_flat = jnp.zeros((B,), dtype=jnp.int32)
            for i, v in enumerate(sep):
                sep_flat = sep_flat + assign[:, v] * sst[i]
            rest_flat = jnp.take_along_axis(
                bps[c], sep_flat[:, None], axis=1
            )[:, 0]
            rst = _strides(rest_shape) if rest_shape else []
            for i, v in enumerate(rest):
                assign = assign.at[:, v].set(
                    (rest_flat // rst[i]) % rest_shape[i]
                )
        return assign, score

    return fn
