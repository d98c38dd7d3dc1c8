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


def tree_kbest_program(plan: Plan, observed: Sequence[int], k: int):
    """Exact k-best decoding on ARBITRARY junction trees.

    k-best-semiring message passing: every upward message carries, per
    separator configuration, the ranked top-k completions of its subtree
    ([B, *sep_shape, K] score tensors).  Children are merged pairwise —
    cross the current list with the child's list, ``lax.top_k`` back down
    to k — which is exact by the standard list-Viterbi argument: for a
    fixed separator configuration the j-th best completion uses at most
    the j-th entry of each child's list, so pruning to k per merge never
    discards a top-k candidate.  Backpointers are recorded per merge stage
    and per separator projection; traceback unwinds them pre-order,
    vectorized over batch x hypothesis.

    List sizes are exact minima (min(k, candidates)), so no padding
    sentinels are needed; ranked entries are distinct assignments by
    construction (distinct (rest, rank-combination) tuples, recursively).

    Generalizes scan_executor.chain_kbest_program beyond uniform chains —
    completing the decoding quartet (MAP / k-best on chains AND trees) the
    way MMAP completed the query quartet.  The reference never shipped even
    max-product (/root/reference/junctiontree/sum_product.py:7-8).

    Returns ``fn(log_pots, masks) -> (assign [B, K, num_vars] int32,
    scores [B, K] descending)`` with K = min(k, total assignments); masks
    as in ``tree_map_program`` (log space, aligned with ``observed``)."""
    tree = plan.tree
    cvars = plan.clique_vars
    svars = plan.sep_vars
    observed = list(observed)
    mask_slot = {v: i for i, v in enumerate(observed)}
    k = int(k)
    if k < 1:
        raise ValueError("k must be >= 1")

    clique_mask_vars: List[List[int]] = [[] for _ in range(tree.num_cliques)]
    for v in observed:
        clique_mask_vars[plan.var_to_clique[v]].append(v)

    def _strides(shape):
        st = [1] * len(shape)
        for i in range(len(shape) - 2, -1, -1):
            st[i] = st[i + 1] * shape[i + 1]
        return st

    # host-side static layout, as in tree_map_program
    layout = {}
    for c in tree.topo_order[1:]:
        sep = svars[tree.parent_sep[c]]
        rest = [v for v in cvars[c] if v not in sep]
        perm = [cvars[c].index(v) for v in list(sep) + rest]
        sep_shape = tuple(plan.sizes[v] for v in sep)
        rest_shape = tuple(plan.sizes[v] for v in rest)
        layout[c] = (list(sep), rest, perm, sep_shape, rest_shape)

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

        # ---- collect: k-best lists + backpointers ----
        msgs: Dict[int, Tuple[jnp.ndarray, int]] = {}  # child -> (msg, Kch)
        stage_bps: Dict[int, list] = {}  # clique -> [(child, Kch, bp|None)]
        proj_bps: Dict[int, Tuple[jnp.ndarray, int]] = {}  # c -> (bp, Kc)
        root_top = None
        for c in reversed(tree.topo_order):
            shape = tuple(plan.sizes[v] for v in cvars[c])
            cliqueN = int(np.prod(shape)) if shape else 1
            cur = clique_belief(c).reshape(B, cliqueN, 1)
            Kc = 1
            stages = []
            for child, s in tree.children[c]:
                m, Kch = msgs.pop(child)  # [B, *sep_shape_child, Kch]
                sep = svars[s]
                order = sorted(range(len(sep)),
                               key=lambda i: cvars[c].index(sep[i]))
                src = jnp.transpose(
                    m, [0] + [1 + i for i in order] + [m.ndim - 1]
                )
                expand = [B] + [1] * len(shape) + [Kch]
                for v in (sep[i] for i in order):
                    expand[1 + cvars[c].index(v)] = plan.sizes[v]
                mexp = jnp.broadcast_to(
                    src.reshape(expand), (B,) + shape + (Kch,)
                ).reshape(B, cliqueN, Kch)
                cand = (cur[:, :, :, None] + mexp[:, :, None, :]).reshape(
                    B, cliqueN, Kc * Kch
                )
                if Kc * Kch > k:
                    cand, idx = jax.lax.top_k(cand, k)
                    stages.append((child, Kch, idx.astype(jnp.int32)))
                    Kc = k
                else:
                    # full cross product kept: rank r decodes as
                    # (r // Kch, r % Kch) with no stored pointer
                    stages.append((child, Kch, None))
                    Kc = Kc * Kch
                cur = cand
            stage_bps[c] = stages
            if c == tree.root:
                Kroot = min(k, cliqueN * Kc)
                flat = cur.reshape(B, cliqueN * Kc)
                scores, top_idx = jax.lax.top_k(flat, Kroot)
                root_top = (scores, top_idx.astype(jnp.int32), Kc, Kroot)
                continue
            sep, rest, perm, sep_shape, rest_shape = layout[c]
            sepN = int(np.prod(sep_shape)) if sep_shape else 1
            restN = int(np.prod(rest_shape)) if rest_shape else 1
            p = jnp.transpose(
                cur.reshape((B,) + shape + (Kc,)),
                [0] + [1 + a for a in perm] + [1 + len(shape)],
            ).reshape(B, sepN, restN * Kc)
            Km = min(k, restN * Kc)
            vals, idx = jax.lax.top_k(p, Km)
            msgs[c] = (vals.reshape((B,) + sep_shape + (Km,)), Km)
            proj_bps[c] = (idx.astype(jnp.int32), Kc)

        scores, top_idx, Kc_root, Kroot = root_top

        # ---- traceback, vectorized over [B, Kroot] hypotheses ----
        assign = jnp.zeros((B, Kroot, plan.num_vars), dtype=jnp.int32)
        # per-clique rank within its message list, filled pre-order
        ranks: Dict[int, jnp.ndarray] = {}

        def unwind(c, config_flat, rank):
            """Decode merge stages of clique c in reverse: distribute the
            hypothesis rank back into per-child ranks."""
            for child, Kch, bp in reversed(stage_bps[c]):
                if bp is not None:
                    # bp: [B, cliqueN, k]; gather at (config, rank)
                    flatbp = bp.reshape(B, -1)
                    kdim = bp.shape[-1]
                    r = jnp.take_along_axis(
                        flatbp, config_flat * kdim + rank, axis=1
                    )
                else:
                    r = rank
                ranks[child] = r % Kch
                rank = r // Kch
            return rank

        # root: flat index = config * Kc_root + rank
        shape_r = tuple(plan.sizes[v] for v in cvars[tree.root])
        config = top_idx // Kc_root                        # [B, Kroot]
        rank = top_idx % Kc_root
        rstr = _strides(shape_r)
        for i, v in enumerate(cvars[tree.root]):
            assign = assign.at[:, :, v].set(
                (config // rstr[i]) % shape_r[i]
            )
        unwind(tree.root, config, rank)

        for c in tree.topo_order[1:]:
            sep, rest, perm, sep_shape, rest_shape = layout[c]
            restN = int(np.prod(rest_shape)) if rest_shape else 1
            bp, Kc = proj_bps[c]                           # [B, sepN, Km]
            sst = _strides(sep_shape) if sep_shape else []
            sep_flat = jnp.zeros((B, Kroot), dtype=jnp.int32)
            for i, v in enumerate(sep):
                sep_flat = sep_flat + assign[:, :, v] * sst[i]
            Km = bp.shape[-1]
            val = jnp.take_along_axis(
                bp.reshape(B, -1), sep_flat * Km + ranks[c], axis=1
            )                                              # [B, Kroot]
            rest_flat = val // Kc
            rank = val % Kc
            rst = _strides(rest_shape) if rest_shape else []
            for i, v in enumerate(rest):
                assign = assign.at[:, :, v].set(
                    (rest_flat // rst[i]) % rest_shape[i]
                )
            # clique config in cvars[c] axis order for stage gathers
            shape_c = tuple(plan.sizes[v] for v in cvars[c])
            cstr = _strides(shape_c)
            config = jnp.zeros((B, Kroot), dtype=jnp.int32)
            for i, v in enumerate(cvars[c]):
                config = config + assign[:, :, v] * cstr[i]
            unwind(c, config, rank)

        return assign, scores

    return fn
