"""Pallas TPU kernel: factored-mask big-clique contraction.

The hot op for huge cliques under batched evidence (SURVEY.md build plan #4):
a clique potential with S = R1*R2*C states, evidence masks factored into two
batched weight groups W1 [B, R1], W2 [B, R2], contracted to the separator:

    out[b, c] = sum_{r1, r2} pot[r1, r2, c] * W1[b, r1] * W2[b, r2]

No einsum path computes this without materializing a [B, R1*R2]- or
[B, R?, C]-sized intermediate (8.6 GB at B=8192, S=2^18): opt_einsum must
contract two of the three operands first, and every pairing has a huge
result.  The kernel instead streams potential tiles HBM->VMEM once and keeps
a [TB, C] accumulator in VMEM: per (batch-tile, r1-tile) grid step it runs
TR1 MXU matmuls [TB, R2] x [R2, C] scaled by W1 columns.  HBM traffic is
S + B*(R1 + R2 + C) floats — speed-of-light for this contraction.

Weight groups come from the factorization of per-variable evidence masks:
W1 = outer product of masks over the group-1 rest variables (computed by a
tiny XLA einsum), likewise W2 — see ``build_weight_groups``.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Kernel routing mode for the executor integration:
#   "auto"      — use the Pallas kernel on TPU backends, XLA fallback elsewhere
#   "interpret" — run the kernel in interpreter mode (CPU tests)
#   "off"       — always use the XLA fallback
_PALLAS_MODE = "auto"


def set_pallas_mode(mode: str) -> None:
    global _PALLAS_MODE
    assert mode in ("auto", "interpret", "off")
    _PALLAS_MODE = mode


def get_pallas_mode() -> str:
    return _PALLAS_MODE


def _kernel_flags() -> Tuple[bool, bool]:
    """(use_pallas, interpret) per the current mode and backend."""
    mode = _PALLAS_MODE
    if mode == "off":
        return False, False
    if mode == "interpret":
        return True, True
    # Mosaic kernels lower only on TPU backends ("tpu", or this
    # environment's tunnelled "axon" platform) — NOT on GPU
    return jax.default_backend() in ("tpu", "axon"), False


def reference_factored_contract(
    pot: jnp.ndarray, w1: jnp.ndarray, w2: jnp.ndarray
) -> jnp.ndarray:
    """Oracle implementation (materializes [B, R2, C]; test-sized only).
    Also the routed XLA fallback — accumulates f32 even for bf16 storage."""
    return jnp.einsum("rsc,br,bs->bc", pot, w1, w2, precision="highest",
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Tile planning.  The kernel's VMEM working set must fit the per-core scoped
# VMEM budget or XLA refuses to compile ("Ran out of memory in memory space
# vmem" — the round-2 Hailfinder failure, BENCH_r02.json: a [4096, 46656]
# output block at C=46656).  plan_tiles() picks (TB, TR1, TC) explicitly and
# reports the resulting VMEM bytes; callers use it BOTH to configure the
# kernel and as the routing feasibility gate (None => use the XLA path).
# ---------------------------------------------------------------------------

# per-core scoped VMEM the kernel may use.  v5e/v4 expose 16 MiB to Mosaic
# kernels; Mosaic's real stack allocation runs ~1.5x this planner's block
# accounting (measured on v5e: 16.59M actual vs 10.6M estimated — extra
# copies for the revisited accumulator and dot operands), so budget well
# under the hard limit
VMEM_BUDGET = 8 * 1024 * 1024


def plan_tiles(
    R1: int,
    R2: int,
    C: int,
    B: int,
    *,
    block_b: int = 256,
    block_r1: int = 8,
    vmem_budget: int = VMEM_BUDGET,
    itemsize: int = 4,
) -> Optional[dict]:
    """Choose kernel tiles for the [R1,R2,C] x [B,R1] x [B,R2] contraction.

    Returns {TB, TR1, TC, R1p, Bp, Cp, vmem_bytes} or None when no tiling
    fits ``vmem_budget`` (the caller then uses the XLA fallback).  Accounting
    (inputs at ``itemsize`` bytes — 4 for f32, 2 for bf16 storage — the
    accumulator always f32; pipelined inputs double-buffered):
      w1t block  (R1p, TB)       x2
      w2  block  (TB,  R2)       x2
      pot block  (TR1, TC, R2)   x2
      out block  (TB,  TC)       x1  (revisited f32 accumulator)
    """

    def bytes_for(TB, TR1, TC, R1p):
        # w1t stays f32 even under bf16 storage (its rows are loaded at a
        # dynamic index, which Mosaic only supports for 32-bit types; it is
        # the smallest operand, so the traffic win lives in pot/w2)
        return 4 * 2 * R1p * TB + itemsize * (
            2 * TB * R2 + 2 * TR1 * TC * R2
        ) + 4 * TB * TC

    # Mosaic sublane granularity doubles for 2-byte types: second-to-last
    # block dims must be multiples of 8 (f32) / 16 (bf16) — or full
    sub = 8 if itemsize >= 4 else 16
    # C tile: full C when small (separators are usually tiny — keeps the
    # round-1/2 behavior and grid); otherwise a multiple of 128, which is
    # lane-aligned for the out block and sublane-aligned for the pot block.
    # Among feasible (TB, TC) combinations prefer the largest batch tile
    # (MXU utilization), then the largest C tile (fewer grid steps).
    c_full = _round_up(C, sub)
    tc_candidates = [c_full] + [t for t in (512, 256, 128) if t < c_full]
    # Mosaic lowering requires each block's LAST dim to be a multiple of
    # 128 or equal to the array dim (and the second-to-last a multiple of
    # 8/16 or full).  TB is the last dim of the w1t block, so legal batch
    # tiles are multiples of 128 — or one full-batch block.
    bp_full = _round_up(B, sub)
    tb_candidates = []
    t = (min(block_b, bp_full) // 128) * 128
    while t >= 128:
        tb_candidates.append(t)
        t //= 2
    if bp_full not in tb_candidates:
        # full-batch block as a last resort (always lowering-legal; large
        # blocks pipeline worse, so capped 128-multiples are tried first)
        tb_candidates.append(bp_full)
    best = None
    for TC in tc_candidates:
        for tb in tb_candidates:
            # pot-block budget after the fixed-per-TB blocks (w1t full-R1
            # height is the worst case: TR1=R1 -> R1p=R1)
            other = 4 * 2 * R1 * tb + itemsize * 2 * tb * R2 + 4 * tb * TC
            rem = vmem_budget - other
            tr1_fit = rem // (itemsize * 2 * TC * R2) if rem > 0 else 0
            if tr1_fit < 1:
                continue
            TR1 = max(1, min(block_r1, int(tr1_fit), R1))
            R1p = _round_up(R1, TR1)
            total = bytes_for(tb, TR1, TC, R1p)
            if total <= vmem_budget:
                if best is None or (tb, TC) > (best["TB"], best["TC"]):
                    best = dict(
                        TB=tb, TR1=TR1, TC=TC, R1p=R1p,
                        Bp=_round_up(B, tb),
                        Cp=_round_up(C, TC),
                        vmem_bytes=int(total),
                    )
                break
    return best


def contraction_flops(R1: int, R2: int, C: int, B: int) -> int:
    """MXU FLOPs of the factored contraction (the per-r1 matmuls)."""
    return 2 * B * R1 * R2 * C


def contraction_hbm_bytes(R1: int, R2: int, C: int, B: int) -> int:
    """Minimal HBM traffic (read pot + weights once, write out once)."""
    return 4 * (R1 * R2 * C + B * (R1 + R2 + C))


def factored_masked_contract(
    pot: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    *,
    block_b: int = 256,
    block_r1: int = 8,
    interpret: bool = False,
    precision: str = "highest",
    vmem_budget: int = VMEM_BUDGET,
) -> jnp.ndarray:
    """out[b, c] = sum_{r1, r2} pot[r1, r2, c] * w1[b, r1] * w2[b, r2].

    pot: [R1, R2, C] float32, w1: [B, R1], w2: [B, R2].  Shapes are padded
    to TPU tile multiples internally (zero padding contributes nothing).
    precision: "highest" = float32-accumulated MXU passes (exact-inference
    default), "default" = bf16 passes (~2x faster, ~1e-3 relative error).

    Tiles are planned by :func:`plan_tiles` against the scoped-VMEM budget;
    large separators are streamed in TC-sized column tiles (the round-2
    Hailfinder VMEM OOM was exactly the untiled-C case).  Raises ValueError
    when no tiling fits — callers gate on ``plan_tiles(...) is not None``
    and take the XLA path instead."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R1, R2, C = pot.shape
    B = w1.shape[0]
    assert w1.shape == (B, R1) and w2.shape == (B, R2)

    # bf16 storage rides through the kernel at 2 bytes/element (doubled
    # streaming bandwidth); the accumulator and output stay f32
    in_dtype = (
        jnp.bfloat16
        if any(
            jnp.result_type(x) == jnp.bfloat16 for x in (pot, w1, w2)
        )
        else jnp.float32
    )
    tiles = plan_tiles(
        R1, R2, C, B,
        block_b=block_b, block_r1=block_r1, vmem_budget=vmem_budget,
        itemsize=jnp.dtype(in_dtype).itemsize,
    )
    if tiles is None:
        raise ValueError(
            f"no VMEM-feasible tiling for factored contraction "
            f"R1={R1} R2={R2} C={C} B={B}; use the XLA fallback"
        )
    TB, TR1, TC = tiles["TB"], tiles["TR1"], tiles["TC"]
    R1p, Bp, Cp = tiles["R1p"], tiles["Bp"], tiles["Cp"]

    dtype = jnp.float32  # accumulator/output dtype
    pot = pot.astype(in_dtype)
    w1 = w1.astype(jnp.float32)  # dynamic row loads need a 32-bit type
    w2 = w2.astype(in_dtype)
    if in_dtype == jnp.bfloat16:
        # one native bf16 MXU pass, f32 accumulation (pet in the kernel);
        # "highest" would force f32 upcast passes and defeat the storage win
        precision = "default"

    # Layout: the streamed potential goes in as [R1, C, R2] so the large R2
    # axis lands on the 128-lane dimension and the (often tiny) separator
    # axis C on sublanes — a trailing tiny dim would be lane-padded to 128
    # in VMEM (64x blowup at C=2).  The matmul contracts last-against-last:
    #   partial[TB, TC] = w2[TB, R2] . pot_i[TC, R2]^T
    pot = jnp.transpose(pot, (0, 2, 1))  # [R1, C, R2]
    if R1p != R1 or Cp != C:
        pot = jnp.pad(pot, ((0, R1p - R1), (0, Cp - C), (0, 0)))
        w1 = jnp.pad(w1, ((0, 0), (0, R1p - R1)))
    if Bp != B:
        w1 = jnp.pad(w1, ((0, Bp - B), (0, 0)))
        w2 = jnp.pad(w2, ((0, Bp - B), (0, 0)))

    n_b = Bp // TB
    n_c = Cp // TC
    n_r1 = R1p // TR1
    # W1 goes in transposed ([R1p, B]) with full-R1p blocks — trailing block
    # dims must be (8,128)-aligned or equal to the array dims
    w1t = jnp.transpose(w1)

    # grid order (b, c, r1): r1 innermost so the (b, c) output block stays
    # resident as the revisited accumulator while r1 tiles stream through
    def kernel(w1t_ref, w2_ref, pot_ref, out_ref):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        acc = out_ref[:]
        w2b = w2_ref[:]
        for i in range(TR1):
            partial = jax.lax.dot_general(
                w2b,
                pot_ref[i],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            w1col = w1t_ref[j * TR1 + i, :][:, None]  # f32 (see above)
            acc = acc + w1col * partial
        out_ref[:] = acc

    grid = (n_b, n_c, n_r1)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (R1p, TB), lambda b, c, j: (0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TB, R2), lambda b, c, j: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TR1, TC, R2), lambda b, c, j: (j, c, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (TB, TC), lambda b, c, j: (b, c), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Cp), dtype),
        interpret=interpret,
    )(w1t, w2, pot)
    return out[:B, :C]


def build_weight_groups(
    masks: Sequence[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split per-variable mask vectors [B, K_v] into two balanced groups and
    outer-product each group into W1 [B, prod(K of group1)], W2 [B, ...].

    The group split balances log-state-space so both W tensors stay small
    (each ~ B * sqrt(R))."""
    assert masks, "need at least one mask"
    sizes = [int(m.shape[-1]) for m in masks]
    order = np.argsort(sizes)[::-1]
    g1: List[int] = []
    g2: List[int] = []
    s1 = s2 = 0.0
    for ix in order:
        if s1 <= s2:
            g1.append(int(ix))
            s1 += np.log(sizes[ix])
        else:
            g2.append(int(ix))
            s2 += np.log(sizes[ix])

    def outer(ixs: List[int]) -> jnp.ndarray:
        if not ixs:
            B = masks[0].shape[0]
            return jnp.ones((B, 1), dtype=masks[0].dtype)
        acc = masks[ixs[0]]
        for ix in ixs[1:]:
            acc = (acc[:, :, None] * masks[ix][:, None, :]).reshape(
                acc.shape[0], -1
            )
        return acc

    return outer(g1), outer(g2), g1, g2


_BATCH = -1  # local batch pseudo-label for einsum subscripts


def _contract_items(items, out_vars, B, sizes):
    """Product of batched items ([B, *shape] over vars) broadcast onto
    [B, *out_vars] — a small einsum (item scopes are separators/masks)."""
    from .semirings import SUM_PRODUCT

    ops = [t for _, t in items]
    ovs = [[_BATCH] + list(vs) for vs, _ in items]
    covered = {v for vs, _ in items for v in vs}
    missing = [v for v in out_vars if v not in covered]
    if missing:
        ops.append(
            jnp.ones(tuple(sizes[v] for v in missing), dtype=ops[0].dtype)
        )
        ovs.append(list(missing))
    out = SUM_PRODUCT.contract(ops, ovs, [_BATCH] + list(out_vars))
    return out.reshape(B, -1)


def _group_items(items, sizes):
    """Partition batched items into two weight groups.

    Items sharing variables are merged into components (their product cannot
    be split across the two kernel operands); components are then balanced
    greedily by log-state-space so both group weights stay ~sqrt(R)-sized.
    Returns (g1_items, g1_vars, g2_items, g2_vars)."""
    # union-find over items sharing variables
    parent = list(range(len(items)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    var_owner: dict = {}
    for i, (vs, _) in enumerate(items):
        for v in vs:
            if v in var_owner:
                parent[find(i)] = find(var_owner[v])
            else:
                var_owner[v] = i
    roots: List[int] = []
    comps: List[List[int]] = []
    comp_vars: List[List[int]] = []
    root_ix: dict = {}
    for i, (vs, _) in enumerate(items):
        r = find(i)
        if r not in root_ix:
            root_ix[r] = len(comps)
            roots.append(r)
            comps.append([])
            comp_vars.append([])
        ci = root_ix[r]
        comps[ci].append(i)
        for v in vs:
            if v not in comp_vars[ci]:
                comp_vars[ci].append(v)
    weights = [
        sum(np.log(sizes[v]) for v in cv) for cv in comp_vars
    ]
    order = np.argsort(weights)[::-1]
    g1: List[int] = []
    g2: List[int] = []
    s1 = s2 = 0.0
    for ci in order:
        if s1 <= s2:
            g1.append(int(ci))
            s1 += weights[ci]
        else:
            g2.append(int(ci))
            s2 += weights[ci]
    g1_items = [items[i] for ci in g1 for i in comps[ci]]
    g1_vars = [v for ci in g1 for v in comp_vars[ci]]
    g2_items = [items[i] for ci in g2 for i in comps[ci]]
    g2_vars = [v for ci in g2 for v in comp_vars[ci]]
    return g1_items, g1_vars, g2_items, g2_vars


def big_clique_sep_message(
    pot: jnp.ndarray,
    clique_vars: Sequence[int],
    masks: dict,
    sep_vars: Sequence[int],
    *,
    msgs: Sequence[Tuple[Sequence[int], jnp.ndarray]] = (),
    interpret: bool = False,
    use_pallas: bool = True,
    contract_fn=None,
    autotune: Optional[bool] = None,
) -> jnp.ndarray:
    """Collect/distribute message from a (large) clique to its separator
    under batched evidence masks and batched child messages.

    pot: unbatched clique potential, axes = clique_vars order.
    masks: {var id: [B, size_v]} for observed vars (subset of clique_vars).
    msgs: batched multi-variable operands (child separator messages), each
    (vars, tensor [B, *shape]); every message's vars must lie entirely inside
    sep_vars or entirely outside (messages crossing the separator boundary
    can't be factored — callers fall back to XLA einsum).
    Masks/messages scoped inside sep_vars are applied post-contraction.
    ``contract_fn(p3 [R1,R2,C], w1 [B,R1], w2 [B,R2]) -> [B,C]`` overrides
    the kernel/XLA choice — the TP path injects a shard_map+psum contraction
    here (parallel/tp.py) so oversized cliques run sharded over the model
    mesh axis.  Returns [B, *sep_shape]."""
    cset = list(clique_vars)
    sset = list(sep_vars)
    rest = [v for v in cset if v not in sset]
    rest_set = set(rest)
    sep_set = set(sset)
    # permute pot to (rest..., sep...)
    perm = [cset.index(v) for v in rest + sset]
    p = jnp.transpose(pot, perm)
    R = int(np.prod([p.shape[i] for i in range(len(rest))])) if rest else 1
    C = int(np.prod(p.shape[len(rest):])) if sset else 1
    sep_shape = p.shape[len(rest):]
    sizes = {v: pot.shape[cset.index(v)] for v in cset}

    # split batched operands into rest-scoped items (folded into the kernel
    # weight groups) and sep-scoped items (applied to the output)
    items: List[Tuple[Tuple[int, ...], jnp.ndarray]] = []
    sep_items: List[Tuple[Tuple[int, ...], jnp.ndarray]] = []
    for v in cset:
        if v in masks:
            t = ((v,), masks[v])
            (items if v in rest_set else sep_items).append(t)
    for vs, t in msgs:
        vs = tuple(vs)
        if all(v in rest_set for v in vs):
            items.append((vs, t))
        elif all(v in sep_set for v in vs):
            sep_items.append((vs, t))
        else:
            raise ValueError(
                f"message scope {vs} crosses the separator boundary"
            )

    B = None
    for _, t in items + sep_items:
        B = t.shape[0]
        break
    if B is None:
        raise ValueError("need at least one batched operand")

    if items:
        g1_items, g1_vars, g2_items, g2_vars = _group_items(items, sizes)
        un_vars = [v for v in rest if v not in set(g1_vars) | set(g2_vars)]
        new_rest = g1_vars + g2_vars + un_vars
        perm2 = [rest.index(v) for v in new_rest] + list(
            range(len(rest), p.ndim)
        )
        p = jnp.transpose(p, perm2)
        R1 = int(np.prod([sizes[v] for v in g1_vars])) or 1
        R2 = int(np.prod([sizes[v] for v in g2_vars + un_vars])) or 1
        w1 = (
            _contract_items(g1_items, g1_vars, B, sizes)
            if g1_items
            else jnp.ones((B, 1), dtype=pot.dtype)
        )
        w2 = (
            _contract_items(g2_items, g2_vars, B, sizes)
            if g2_items
            else jnp.ones((B, 1), dtype=pot.dtype)
        )
        # w2 broadcast over uncovered rest axes
        n_un = int(np.prod([sizes[v] for v in un_vars])) or 1
        if n_un > 1:
            w2 = jnp.repeat(w2[:, :, None], n_un, axis=2).reshape(B, -1)
        p3 = p.reshape(R1, R2, C)
    else:
        R1, R2 = 1, R
        w1 = jnp.ones((B, 1), dtype=pot.dtype)
        w2 = jnp.ones((B, R), dtype=pot.dtype)
        p3 = p.reshape(R1, R2, C)

    kdtype = jnp.result_type(p3)
    if kdtype not in (jnp.float32, jnp.bfloat16) and contract_fn is None:
        # the kernel handles f32 and bf16 storage; anything else (f64 test
        # configs, f16) takes the XLA form, which accumulates f32 via
        # preferred_element_type
        use_pallas = False
    if contract_fn is not None:
        out = contract_fn(p3, w1, w2)
    elif use_pallas and interpret:
        # CPU test mode: exercise the kernel path deterministically
        out = factored_masked_contract(p3, w1, w2, interpret=True)
    elif use_pallas:
        r1, r2, c = (int(d) for d in p3.shape)
        itemsize = jnp.dtype(kdtype).itemsize
        if plan_tiles(r1, r2, c, int(B), itemsize=itemsize) is None:
            # no VMEM-feasible tiling (huge separator and/or rest widths):
            # the XLA einsum path is safe — this is the round-2 Hailfinder
            # compile-OOM case, now a routed fallback instead of a crash
            out = reference_factored_contract(p3, w1, w2)
        else:
            if autotune is None:
                from ..config import DEFAULT as _CFG

                autotune = getattr(_CFG, "autotune", True)
            if autotune:
                from .autotune import decide

                route = decide(
                    r1, r2, c, int(B),
                    dtype="bf16" if kdtype == jnp.bfloat16 else "f32",
                )
            else:
                route = "pallas"
            if route == "pallas":
                out = factored_masked_contract(p3, w1, w2)
            else:
                out = reference_factored_contract(p3, w1, w2)
    else:
        out = reference_factored_contract(p3, w1, w2)
    out = out.reshape((B,) + tuple(sep_shape))

    # apply separator-scoped masks/messages elementwise on the output
    for vs, t in sep_items:
        shape = [B] + [1] * len(sset)
        for i, v in enumerate(vs):
            shape[1 + sset.index(v)] = t.shape[1 + i]
        # order t's axes to separator order
        axes_order = [0] + [
            1 + list(vs).index(v) for v in sset if v in vs
        ]
        out = out * jnp.transpose(t, axes_order).reshape(shape)
    return out
