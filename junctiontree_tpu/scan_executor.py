"""lax.scan chain executor: O(1)-size XLA programs for chain-structured trees.

The unrolled static schedule (executor.py) compiles one contraction per
clique — ~33ms of XLA compile per clique measured, which is fine for
hundreds of cliques but not for UAI-scale chains (SURVEY.md §5 long-context
row: the reference recurses in Python per clique, computation.py:59-66, and
would hit the recursion limit past ~1000 cliques).

A chain junction tree with uniform cardinality K is exactly a batched HMM:
collect = forward scan of masked matvecs, distribute = backward scan, with
HMM-style per-step rescaling so everything stays in float32 linear space
(MXU matmuls [B,K]x[K,K]).  jit cost is constant in chain length.

  F_0 = 1;  F_{k+1}[b,q] = sum_p F_k[b,p] * M_k[b,p] * pot_k[p,q]
  G_m = 1;  G_k[b,p]     = sum_q pot_k[p,q] * M_{k+1}[b,q] * G_{k+1}[b,q]
  posterior(v_k) ∝ F_k ⊙ M_k ⊙ G_k;   logZ = log Σ_p F_m M_m + offsets
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import Plan

_TINY = 1e-38


@dataclass(frozen=True)
class ChainLayout:
    """A junction tree recognized as a uniform chain.

    var_order: v_0..v_m (chain order, interned ids)
    clique_order: c_0..c_{m-1}; clique k covers (v_k, v_{k+1})
    transpose: per clique, True if its potential (axes in sorted-var order)
               must be transposed to get (v_k, v_{k+1}) layout
    card: the common cardinality K
    """

    var_order: List[int]
    clique_order: List[int]
    transpose: List[bool]
    card: int

    @staticmethod
    def detect(plan: Plan) -> Optional["ChainLayout"]:
        tree = plan.tree
        n = tree.num_cliques
        if n < 2:
            return None
        # every clique exactly 2 vars, every separator exactly 1 var
        if any(len(c) != 2 for c in plan.clique_vars):
            return None
        if any(len(s) != 1 for s in tree.separators):
            return None
        # path topology: degree <= 2, exactly two endpoints
        deg = [0] * n
        adj: List[List[int]] = [[] for _ in range(n)]
        for a, b, _ in tree.edges:
            deg[a] += 1
            deg[b] += 1
            adj[a].append(b)
            adj[b].append(a)
        ends = [i for i in range(n) if deg[i] == 1]
        if len(ends) != 2 or any(d > 2 for d in deg):
            return None
        # uniform cardinality
        cards = {plan.sizes[v] for c in plan.clique_vars for v in c}
        if len(cards) != 1:
            return None
        card = cards.pop()
        # walk the path
        order = [ends[0]]
        prev = -1
        while len(order) < n:
            cur = order[-1]
            nxt = [x for x in adj[cur] if x != prev]
            if len(nxt) != 1:
                return None
            prev = cur
            order.append(nxt[0])
        # recover the var chain: v_0 is the var of c_0 not shared with c_1
        var_order: List[int] = []
        transpose: List[bool] = []
        first = set(plan.clique_vars[order[0]])
        shared01 = first & set(plan.clique_vars[order[1]])
        if len(shared01) != 1:
            return None
        v0 = (first - shared01).pop()
        var_order.append(v0)
        cur_var = v0
        for k, c in enumerate(order):
            cv = plan.clique_vars[c]
            if cur_var not in cv:
                return None
            nxt_var = cv[1] if cv[0] == cur_var else cv[0]
            transpose.append(cv[0] != cur_var)
            var_order.append(nxt_var)
            cur_var = nxt_var
        # chain must cover every variable exactly once
        if sorted(var_order) != list(range(plan.num_vars)):
            return None
        return ChainLayout(var_order, order, transpose, card)


def stack_chain_potentials(
    layout: ChainLayout, pots_np: Sequence[np.ndarray]
) -> np.ndarray:
    """Host-side prestack of clique potentials into the [m, K, K] transition
    tensor (done once per model; keeps the jitted program free of a
    chain-length concatenate)."""
    return np.stack(
        [
            np.transpose(pots_np[c]) if layout.transpose[k] else pots_np[c]
            for k, c in enumerate(layout.clique_order)
        ]
    )


def chain_posterior_program(plan: Plan, layout: ChainLayout):
    """Build ``fn(A, masks) -> (posteriors per var id [B,K], logZ [B])``.

    ``A``: prestacked [m, K, K] transitions (``stack_chain_potentials``),
    linear space.  ``masks``: dict var_id -> [B, K] linear-space mask
    (observed vars only), or a prestacked [m+1, B, K] mask tensor in chain
    order (dense evidence, e.g. training data — avoids O(chain) scatters)."""
    m = len(layout.clique_order)
    K = layout.card

    def fn(A: jnp.ndarray, masks):
        dtype = A.dtype
        if isinstance(masks, dict):
            B = next(iter(masks.values())).shape[0] if masks else 1
            # stacked masks [m+1, B, K]: ones everywhere, scatter the (few)
            # observed variables — O(observed) traced ops, not O(chain length)
            chain_pos = {v: k for k, v in enumerate(layout.var_order)}
            M = jnp.ones((m + 1, B, K), dtype=dtype)
            for v, mk in masks.items():
                M = M.at[chain_pos[v]].set(jnp.asarray(mk, dtype=dtype))
        else:
            M = jnp.asarray(masks, dtype=dtype)
            B = M.shape[1]

        def fwd_step(carry, inp):
            F, off = carry
            a, mk = inp
            Fn = jnp.einsum(
                "bp,pq->bq", F * mk, a, precision="highest"
            )
            s = jnp.maximum(jnp.max(Fn, axis=-1, keepdims=True), _TINY)
            return (Fn / s, off + jnp.log(s[:, 0])), F

        (F_last, off_last), F_stack = jax.lax.scan(
            fwd_step,
            (jnp.ones((B, K), dtype=dtype), jnp.zeros((B,), dtype=dtype)),
            (A, M[:-1]),
        )

        def bwd_step(carry, inp):
            G = carry
            a, mk1 = inp
            Gp = jnp.einsum(
                "pq,bq->bp", a, mk1 * G, precision="highest"
            )
            s = jnp.maximum(jnp.max(Gp, axis=-1, keepdims=True), _TINY)
            return Gp / s, G

        G_last, G_stack_rev = jax.lax.scan(
            bwd_step,
            jnp.ones((B, K), dtype=dtype),
            (A, M[1:]),
            reverse=True,
        )
        # G_stack_rev[k] = G_{k+1}; prepend G_0 = G_last
        G_all = jnp.concatenate([G_last[None], G_stack_rev], axis=0)
        F_all = jnp.concatenate([F_stack, F_last[None]], axis=0)

        # posteriors per chain position, normalized (scales cancel)
        post = F_all * M * G_all  # [m+1, B, K]
        post = post / jnp.maximum(
            jnp.sum(post, axis=-1, keepdims=True), _TINY
        )

        # logZ from the forward pass
        zfin = jnp.sum(F_last * M[-1], axis=-1)
        logz = (
            jnp.where(zfin > 0, jnp.log(jnp.maximum(zfin, _TINY)), -jnp.inf)
            + off_last
        )

        # [m+1, B, K] stacked in chain order; caller maps var id -> position
        return post, logz

    return fn


def chain_posterior_parallel_program(plan: Plan, layout: ChainLayout):
    """Sequence-parallel chain inference: log-depth associative scans.

    The sequential forward recurrence F_{k+1} = F_k (M_k ⊙ pot_k) is a
    product of per-step [K, K] matrices; ``jax.lax.associative_scan``
    computes all prefixes in O(log m) depth, so with the step axis sharded
    over the mesh the work parallelizes across chips (the SP/ring analog of
    SURVEY.md §2.3 — XLA inserts the inter-device collectives).  Each
    partial product is max-normalized inside the (still associative)
    combine, with log-offsets accumulated, so arbitrarily long chains stay
    in float32.

    Returns ``fn(A, masks) -> (posteriors stacked [m+1, B, K], logZ [B])``
    — same contract as ``chain_posterior_program`` (use for very long
    chains on multi-device meshes; the sequential scan does K^2 work per
    step vs K^3 here, so single-chip prefers the sequential program)."""
    m = len(layout.clique_order)
    K = layout.card

    def fn(A: jnp.ndarray, masks: Dict[int, jnp.ndarray]):
        B = next(iter(masks.values())).shape[0] if masks else 1
        dtype = A.dtype
        chain_pos = {v: k for k, v in enumerate(layout.var_order)}
        M = jnp.ones((m + 1, B, K), dtype=dtype)
        for v, mk in masks.items():
            M = M.at[chain_pos[v]].set(jnp.asarray(mk, dtype=dtype))

        # per-step transition matrices T_k[b, p, q] = M_k[b, p] * A_k[p, q]
        T = M[:-1, :, :, None] * A[:, None, :, :]  # [m, B, K, K]

        def combine(x, y):
            ax, sx = x
            ay, sy = y
            prod = jnp.einsum(
                "...pq,...qr->...pr", ax, ay, precision="highest"
            )
            c = jnp.maximum(
                jnp.max(prod, axis=(-2, -1), keepdims=True), _TINY
            )
            return prod / c, sx + sy + jnp.log(c[..., 0, 0])

        zeros = jnp.zeros(T.shape[:2], dtype=dtype)
        # forward prefixes: P_k = T_0 ... T_{k-1}; F_k = 1^T P_k
        Pf, Sf = jax.lax.associative_scan(combine, (T, zeros), axis=0)
        ones_row = jnp.ones((B, K), dtype=dtype)
        F_tail = jnp.einsum(
            "p,mbpq->mbq", jnp.ones((K,), dtype=dtype), Pf,
            precision="highest",
        )  # F_{k+1} for k=0..m-1
        F = jnp.concatenate([ones_row[None], F_tail], axis=0)  # [m+1, B, K]
        Foff = jnp.concatenate([jnp.zeros((1, B), dtype=dtype), Sf], axis=0)

        # backward suffixes: Q_k = T'_k ... T'_{m-1} with
        # T'_k[b,p,q] = A_k[p,q] * M_{k+1}[b,q].  NOTE: reverse=True
        # associative_scan combines operands in REVERSED order
        # (a[n-1] ⊕ ... ⊕ a[k]); swapping the combine restores the forward
        # matrix-product order (verified empirically — see tests).
        Tb = A[:, None, :, :] * M[1:, :, None, :]
        Qb, Sb = jax.lax.associative_scan(
            lambda x, y: combine(y, x), (Tb, zeros), axis=0, reverse=True
        )
        G_head = jnp.einsum(
            "mbpq,q->mbp", Qb, jnp.ones((K,), dtype=dtype),
            precision="highest",
        )  # G_k for k=0..m-1
        G = jnp.concatenate([G_head, ones_row[None]], axis=0)
        Goff = jnp.concatenate([Sb, jnp.zeros((1, B), dtype=dtype)], axis=0)

        post = F * M * G
        post = post / jnp.maximum(
            jnp.sum(post, axis=-1, keepdims=True), _TINY
        )

        zfin = jnp.sum(F[-1] * M[-1], axis=-1)
        logz = (
            jnp.where(zfin > 0, jnp.log(jnp.maximum(zfin, _TINY)), -jnp.inf)
            + Foff[-1]
        )
        return post, logz

    return fn


def chain_viterbi_program(plan: Plan, layout: ChainLayout):
    """Exact MAP decoding on a uniform chain: log-space max forward scan
    with argmax bookkeeping + traceback scan (classic Viterbi), O(1)-size
    XLA program in chain length.

    Returns ``fn(logA, logmasks) -> (assignment [B, m+1] int32, score [B])``
    where ``logA`` is the [m, K, K] log-transition stack
    (log of ``stack_chain_potentials``) and ``logmasks`` a dict
    var_id -> [B, K] log-space mask."""
    m = len(layout.clique_order)
    K = layout.card

    def fn(logA: jnp.ndarray, logmasks: Dict[int, jnp.ndarray]):
        B = next(iter(logmasks.values())).shape[0] if logmasks else 1
        dtype = logA.dtype
        chain_pos = {v: k for k, v in enumerate(layout.var_order)}
        LM = jnp.zeros((m + 1, B, K), dtype=dtype)
        for v, mk in logmasks.items():
            LM = LM.at[chain_pos[v]].set(jnp.asarray(mk, dtype=dtype))

        def fwd(V, inp):
            a, lm = inp
            # scores[b, p, q] = V[b,p] + lm[b,p] + a[p,q]
            scores = (V + lm)[:, :, None] + a[None]
            Vn = jnp.max(scores, axis=1)
            ptr = jnp.argmax(scores, axis=1).astype(jnp.int32)
            return Vn, ptr

        V_last, ptrs = jax.lax.scan(
            fwd, jnp.zeros((B, K), dtype=dtype), (logA, LM[:-1])
        )
        final = V_last + LM[-1]
        score = jnp.max(final, axis=-1)
        x_last = jnp.argmax(final, axis=-1).astype(jnp.int32)

        def back(x_next, ptr_k):
            x_k = jnp.take_along_axis(
                ptr_k, x_next[:, None], axis=1
            )[:, 0]
            return x_k, x_next

        x0, xs_rev = jax.lax.scan(back, x_last, ptrs, reverse=True)
        # xs_rev[k] = x_{k+1}; prepend x0
        assign = jnp.concatenate([x0[None], xs_rev], axis=0)  # [m+1, B]
        # reorder chain positions -> var-id columns
        order = np.argsort(np.asarray(layout.var_order))
        assign = jnp.transpose(assign, (1, 0))[:, order]
        return assign, score

    return fn


def chain_kbest_program(plan: Plan, layout: ChainLayout, k: int):
    """Exact k-best decoding on a uniform chain (list-Viterbi): the forward
    scan carries the top-k path scores per state ([B, K, k]); each step
    ranks the K*k candidate extensions per successor state with
    ``lax.top_k``; traceback follows (state, rank) pointers.  O(1)-size XLA
    program in chain length, like chain_viterbi_program.

    Distinct ranks are distinct PATHS by construction (each candidate is a
    distinct (predecessor state, predecessor rank) pair).  When fewer than
    k paths exist (k > K at early steps), padding entries score ~-2e30 —
    callers should drop scores below ``_KBEST_PAD_FLOOR``.

    Returns ``fn(logA, logmasks) -> (assign [B, k, m+1] int32 in var-id
    column order, scores [B, k] descending)``."""
    m = len(layout.clique_order)
    K = layout.card

    def fn(logA: jnp.ndarray, logmasks: Dict[int, jnp.ndarray]):
        B = next(iter(logmasks.values())).shape[0] if logmasks else 1
        dtype = logA.dtype
        chain_pos = {v: kk for kk, v in enumerate(layout.var_order)}
        LM = jnp.zeros((m + 1, B, K), dtype=dtype)
        for v, mk in logmasks.items():
            LM = LM.at[chain_pos[v]].set(jnp.asarray(mk, dtype=dtype))

        pad = jnp.asarray(_KBEST_PAD, dtype=dtype)
        V0 = jnp.full((B, K, k), pad, dtype=dtype).at[:, :, 0].set(0.0)

        def fwd(V, inp):
            a, lm = inp
            # cand[b, p, r, q] = V[b,p,r] + lm[b,p] + a[p,q]
            cand = (V + lm[:, :, None])[:, :, :, None] + a[None, :, None, :]
            # rank the K*k extensions per successor state q
            cand = jnp.transpose(cand, (0, 3, 1, 2)).reshape(B, K, K * k)
            top, idx = jax.lax.top_k(cand, k)          # [B, K, k]
            return top, idx.astype(jnp.int32)

        V_last, ptrs = jax.lax.scan(fwd, V0, (logA, LM[:-1]))
        final = (V_last + LM[-1][:, :, None]).reshape(B, K * k)
        scores, flat = jax.lax.top_k(final, k)          # [B, k]
        x_last = (flat // k).astype(jnp.int32)          # state q
        r_last = (flat % k).astype(jnp.int32)           # rank within q

        def back(carry, ptr_t):
            x, r = carry                                # each [B, k]
            # flat predecessor pointer for every kept path
            f = jnp.take_along_axis(
                ptr_t.reshape(B, K * k), (x * k + r), axis=1
            )
            return (f // k, f % k), x

        (_x0, _r0), xs_rev = jax.lax.scan(
            back, (x_last, r_last), ptrs, reverse=True
        )
        assign = jnp.concatenate([_x0[None], xs_rev], axis=0)  # [m+1, B, k]
        order = np.argsort(np.asarray(layout.var_order))
        assign = jnp.transpose(assign, (1, 2, 0))[:, :, order]
        return assign, scores

    return fn


_KBEST_PAD = -2e30
_KBEST_PAD_FLOOR = -1e29  # scores below this are padding, not real paths


class StackedPosteriors:
    """Lazy per-variable-id view over the chain program's stacked [m+1, B, K]
    posterior tensor.  Behaves like the list-of-arrays the general program
    returns (``post[var_id]`` -> [B, K]) without materializing one device
    slice per variable inside the compiled program."""

    def __init__(self, stacked: jnp.ndarray, var_order: Sequence[int]):
        self._stacked = stacked
        self._pos = {v: k for k, v in enumerate(var_order)}

    @property
    def stacked(self) -> jnp.ndarray:
        return self._stacked

    def __len__(self) -> int:
        return len(self._pos)

    def __getitem__(self, var_id: int) -> jnp.ndarray:
        return self._stacked[self._pos[var_id]]

    def __iter__(self):
        for v in range(len(self._pos)):
            yield self[v]
