"""Level-fused executor: grouped static schedule (pipeline component).

The unrolled programs emit O(num_cliques) XLA ops; on regular graphs most
cliques at a tree level share an identical contraction signature (shape,
separator axes, children layout).  This executor groups them: each group's
potentials are prestacked into one [G, *shape] tensor and the whole group's
messages are computed by single batched ops — the XLA program is
O(levels x groups), collapsing both compile time and launch overhead on
UAI-scale regular models, and making the level structure (the pipeline
stages of SURVEY.md §2.3 PP) explicit.

Evidence masks are scattered into per-(group, axis) multiplier tensors
(O(observed) ops, like the chain executor); cross-level message routing uses
per-shape concatenation + static gathers.  Rescaled linear sum-product only
(the production posterior path); outputs are a lazy per-variable marginal
view + logZ.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import Plan

_TINY = 1e-38


@dataclass
class Group:
    """Cliques sharing one contraction signature at one level."""

    cliques: List[int]
    shape: Tuple[int, ...]
    # axes (positions into shape) of the separator to the parent; None at root
    parent_axes: Optional[Tuple[int, ...]]
    # per child position: axes of that child's separator in this clique
    child_axes: List[Tuple[int, ...]]

    @property
    def G(self) -> int:
        return len(self.cliques)

    def sep_shape(self) -> Tuple[int, ...]:
        return tuple(self.shape[a] for a in self.parent_axes)

    def child_sep_shape(self, k: int) -> Tuple[int, ...]:
        return tuple(self.shape[a] for a in self.child_axes[k])


@dataclass
class FusedSchedule:
    plan: Plan
    levels: List[List[Group]]                 # levels[0] = [root group(s)]
    clique_pos: Dict[int, Tuple[int, int, int]]  # clique -> (level, group ix, slot)
    # var id -> (level, group ix, slot, axis) where its mask lands
    mask_site: Dict[int, Tuple[int, int, int, int]]


def build_fused_schedule(plan: Plan) -> FusedSchedule:
    tree = plan.tree
    cvars = plan.clique_vars
    svars = plan.sep_vars

    depth = {tree.root: 0}
    for c in tree.topo_order[1:]:
        depth[c] = depth[tree.parent[c]] + 1
    max_d = max(depth.values())

    # canonical per-clique signature
    def child_axes_of(c: int) -> List[Tuple[int, ...]]:
        axes = []
        for k, s in tree.children[c]:
            axes.append(tuple(cvars[c].index(v) for v in svars[s]))
        axes.sort()
        return axes

    # children must be traversed in the sorted-axes order used above
    sorted_children: Dict[int, List[Tuple[int, int]]] = {}
    for c in range(tree.num_cliques):
        kids = list(tree.children[c])
        kids.sort(
            key=lambda ks: tuple(cvars[c].index(v) for v in svars[ks[1]])
        )
        sorted_children[c] = kids

    levels: List[List[Group]] = []
    clique_pos: Dict[int, Tuple[int, int, int]] = {}
    for d in range(max_d + 1):
        sig_map: Dict[tuple, Group] = {}
        order: List[tuple] = []
        for c in tree.topo_order:
            if depth[c] != d:
                continue
            shape = tuple(plan.sizes[v] for v in cvars[c])
            paxes = (
                None
                if c == tree.root
                else tuple(
                    cvars[c].index(v)
                    for v in svars[tree.parent_sep[c]]
                )
            )
            caxes = child_axes_of(c)
            sig = (shape, paxes, tuple(caxes))
            g = sig_map.get(sig)
            if g is None:
                g = Group(
                    cliques=[], shape=shape, parent_axes=paxes,
                    child_axes=caxes,
                )
                sig_map[sig] = g
                order.append(sig)
            g.cliques.append(c)
        groups = [sig_map[s] for s in order]
        for gi, g in enumerate(groups):
            for slot, c in enumerate(g.cliques):
                clique_pos[c] = (d, gi, slot)
        levels.append(groups)

    mask_site: Dict[int, Tuple[int, int, int, int]] = {}
    for v in range(plan.num_vars):
        c = plan.var_to_clique[v]
        d, gi, slot = clique_pos[c]
        axis = cvars[c].index(v)
        mask_site[v] = (d, gi, slot, axis)

    return FusedSchedule(
        plan=plan, levels=levels, clique_pos=clique_pos, mask_site=mask_site
    ), sorted_children


def stack_group_potentials(
    sched: FusedSchedule, pots_np: Sequence[np.ndarray]
) -> List[List[np.ndarray]]:
    """Host-side prestack: per level, per group, [G, *shape] float arrays."""
    out: List[List[np.ndarray]] = []
    for groups in sched.levels:
        out.append(
            [np.stack([pots_np[c] for c in g.cliques]) for g in groups]
        )
    return out


def _bcast_into(msg, msg_axes, shape):
    """[B, G, *sep] -> [B, G, *shape] broadcastable view (expand non-sep
    axes as 1)."""
    B, G = msg.shape[0], msg.shape[1]
    new = [B, G] + [1] * len(shape)
    perm_src = 2
    # place sep axes into their positions
    # msg axes are ordered as msg_axes; build via moveaxis-equivalent reshape
    # (sep axes are in increasing target position order already iff msg_axes
    # sorted; enforce by sorting at build time)
    for a in msg_axes:
        new[2 + a] = msg.shape[perm_src]
        perm_src += 1
    return msg.reshape(new)


def fused_posterior_program(
    sched: FusedSchedule,
    sorted_children: Dict[int, List[Tuple[int, int]]],
    observed: Sequence[int],
):
    """Build ``fn(stacked_pots, masks) -> (marginal tensors, logZ [B])``.

    stacked_pots: nested lists matching sched.levels ([G, *shape] each).
    masks: list of [B, size_v] linear-space arrays aligned with ``observed``.
    Returns per-(level, group, axis) marginal tensors [B, G, size] in a dict
    plus logZ; wrap with FusedPosteriors for per-var access."""
    plan = sched.plan
    tree = plan.tree
    levels = sched.levels
    observed = list(observed)
    mask_slot = {v: i for i, v in enumerate(observed)}

    # host-side routing tables ------------------------------------------------
    # per (level d, group gi): list over child positions k of
    #   [(src_level_d+1 group, slot), ...] aligned with this group's slots
    up_sources: Dict[Tuple[int, int, int], List[Tuple[int, int]]] = {}
    for d, groups in enumerate(levels):
        for gi, g in enumerate(groups):
            for k in range(len(g.child_axes)):
                src = []
                for c in g.cliques:
                    child_c, _ = sorted_children[c][k]
                    _, cgi, cslot = sched.clique_pos[child_c]
                    src.append((cgi, cslot))
                up_sources[(d, gi, k)] = src

    # masks per (level, group, axis): list of (slot, observed var)
    mask_sites: Dict[Tuple[int, int, int], List[Tuple[int, int]]] = {}
    for v in observed:
        d, gi, slot, axis = sched.mask_site[v]
        mask_sites.setdefault((d, gi, axis), []).append((slot, v))

    def fn(stacked_pots, masks):
        B = masks[0].shape[0] if masks else 1
        dtype = stacked_pots[0][0].dtype
        logoff = jnp.zeros((B,), dtype=dtype)

        def masked_pot(d, gi):
            g = levels[d][gi]
            acc = stacked_pots[d][gi][None]  # [1, G, *shape]
            for axis in range(len(g.shape)):
                sites = mask_sites.get((d, gi, axis))
                if not sites:
                    continue
                M = jnp.ones((g.G, B, g.shape[axis]), dtype=dtype)
                for slot, v in sites:
                    M = M.at[slot].set(
                        jnp.asarray(masks[mask_slot[v]], dtype=dtype)
                    )
                M = jnp.transpose(M, (1, 0, 2))  # [B, G, size]
                acc = acc * _bcast_into(M, (axis,), g.shape)
            # keep every tensor batched so cross-group stacks are uniform
            if acc.shape[0] != B:
                acc = jnp.broadcast_to(acc, (B,) + acc.shape[1:])
            return acc  # [B, G, *shape]

        # ---- collect (deepest level first) ----
        # up[(d, gi)] = [B, G, *sep_shape]
        up: Dict[Tuple[int, int], jnp.ndarray] = {}
        nonlocal_off = [logoff]
        for d in range(len(levels) - 1, 0, -1):
            for gi, g in enumerate(levels[d]):
                acc = masked_pot(d, gi)
                for k, caxes in enumerate(g.child_axes):
                    src = up_sources[(d, gi, k)]
                    parts = [up[(d + 1, cgi)][:, cslot] for cgi, cslot in src]
                    msg = jnp.stack(parts, axis=1)  # [B, G, *child_sep]
                    acc = acc * _bcast_into(msg, caxes, g.shape)
                red = tuple(
                    2 + a
                    for a in range(len(g.shape))
                    if a not in g.parent_axes
                )
                m = jnp.sum(acc, axis=red) if red else acc
                # axes now [B, G, *parent axes in increasing order]; reorder
                # to parent_axes order
                kept = sorted(g.parent_axes)
                perm = [0, 1] + [2 + kept.index(a) for a in g.parent_axes]
                m = jnp.transpose(m, perm)
                # rescale
                s = jnp.max(
                    m.reshape(m.shape[0], m.shape[1], -1), axis=-1
                )
                s = jnp.maximum(s, _TINY)
                m = m / s.reshape(s.shape + (1,) * len(g.parent_axes))
                nonlocal_off[0] = nonlocal_off[0] + jnp.sum(
                    jnp.log(s), axis=1
                )
                up[(d, gi)] = m

        # ---- distribute ----
        # down[(d, gi)] = [B, G, *sep shape] incoming from parents
        down: Dict[Tuple[int, int], jnp.ndarray] = {}
        # staging: outputs per (parent d, gi, k) -> [B, G, child_sep]
        for d in range(0, len(levels) - 1):
            # compute children messages from every group at level d
            staged: Dict[Tuple[int, int], List[jnp.ndarray]] = {}
            for gi, g in enumerate(levels[d]):
                K = len(g.child_axes)
                if K == 0:
                    continue
                base = masked_pot(d, gi)
                if g.parent_axes is not None:
                    base = base * _bcast_into(
                        down[(d, gi)], g.parent_axes, g.shape
                    )
                bcasts = []
                for k, caxes in enumerate(g.child_axes):
                    src = up_sources[(d, gi, k)]
                    parts = [up[(d + 1, cgi)][:, cslot] for cgi, cslot in src]
                    msg = jnp.stack(parts, axis=1)
                    bcasts.append(_bcast_into(msg, caxes, g.shape))
                prefix = [None] * K
                suffix = [None] * K
                run = None
                for i in range(K):
                    prefix[i] = run
                    run = bcasts[i] if run is None else run * bcasts[i]
                run = None
                for i in range(K - 1, -1, -1):
                    suffix[i] = run
                    run = bcasts[i] if run is None else run * bcasts[i]
                for k, caxes in enumerate(g.child_axes):
                    loo = base
                    if prefix[k] is not None:
                        loo = loo * prefix[k]
                    if suffix[k] is not None:
                        loo = loo * suffix[k]
                    red = tuple(
                        2 + a for a in range(len(g.shape)) if a not in caxes
                    )
                    m = jnp.sum(loo, axis=red) if red else loo
                    kept = sorted(caxes)
                    perm = [0, 1] + [2 + kept.index(a) for a in caxes]
                    m = jnp.transpose(m, perm)
                    s = jnp.max(
                        m.reshape(m.shape[0], m.shape[1], -1), axis=-1
                    )
                    s = jnp.maximum(s, _TINY)
                    m = m / s.reshape(s.shape + (1,) * len(caxes))
                    staged[(gi, k)] = m
            # route staged messages to child groups at level d+1
            for cgi, cg in enumerate(levels[d + 1]):
                parts = []
                for slot, c in enumerate(cg.cliques):
                    p = tree.parent[c]
                    pd, pgi, pslot = sched.clique_pos[p]
                    k = next(
                        i
                        for i, (kc, _) in enumerate(sorted_children[p])
                        if kc == c
                    )
                    parts.append(staged[(pgi, k)][:, pslot])
                down[(d + 1, cgi)] = jnp.stack(parts, axis=1)

        # ---- beliefs + per-(group, axis) marginals + logZ ----
        marg: Dict[Tuple[int, int, int], jnp.ndarray] = {}
        logz = None
        for d, groups in enumerate(levels):
            for gi, g in enumerate(groups):
                acc = masked_pot(d, gi)
                if g.parent_axes is not None:
                    acc = acc * _bcast_into(
                        down[(d, gi)], g.parent_axes, g.shape
                    )
                for k, caxes in enumerate(g.child_axes):
                    src = up_sources[(d, gi, k)]
                    parts = [up[(d + 1, cgi)][:, cslot] for cgi, cslot in src]
                    msg = jnp.stack(parts, axis=1)
                    acc = acc * _bcast_into(msg, caxes, g.shape)
                if acc.shape[0] == 1:
                    acc = jnp.broadcast_to(acc, (B,) + acc.shape[1:])
                flat = acc.reshape(B, g.G, -1)
                tot = jnp.sum(flat, axis=-1)  # [B, G]
                for axis in range(len(g.shape)):
                    red = tuple(
                        2 + a for a in range(len(g.shape)) if a != axis
                    )
                    marg[(d, gi, axis)] = (
                        jnp.sum(acc, axis=red) if red else acc
                    )
                if tree.root in g.cliques:
                    slot = g.cliques.index(tree.root)
                    z = tot[:, slot]
                    logz = (
                        jnp.where(
                            z > 0, jnp.log(jnp.maximum(z, _TINY)), -jnp.inf
                        )
                        + nonlocal_off[0]
                    )
        return marg, logz

    return fn


class FusedPosteriors:
    """Lazy per-var-id view over per-(level, group, axis) marginal tensors,
    normalized on access."""

    def __init__(self, sched: FusedSchedule, marg: dict):
        self._sched = sched
        self._marg = marg

    def __len__(self) -> int:
        return self._sched.plan.num_vars

    def __getitem__(self, v: int) -> jnp.ndarray:
        plan = self._sched.plan
        c = plan.var_to_clique[v]
        d, gi, slot = self._sched.clique_pos[c]
        axis = plan.clique_vars[c].index(v)
        m = self._marg[(d, gi, axis)][:, slot]
        return m / jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), _TINY)

    def __iter__(self):
        for v in range(len(self)):
            yield self[v]
