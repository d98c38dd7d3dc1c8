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
    """Oracle implementation (materializes [B, R2, C]; test-sized only)."""
    return jnp.einsum("rsc,br,bs->bc", pot, w1, w2, precision="highest")


def factored_masked_contract(
    pot: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    *,
    block_b: int = 256,
    block_r1: int = 8,
    interpret: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """out[b, c] = sum_{r1, r2} pot[r1, r2, c] * w1[b, r1] * w2[b, r2].

    pot: [R1, R2, C] float32, w1: [B, R1], w2: [B, R2].  Shapes are padded
    to TPU tile multiples internally (zero padding contributes nothing).
    precision: "highest" = float32-accumulated MXU passes (exact-inference
    default), "default" = bf16 passes (~2x faster, ~1e-3 relative error)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R1, R2, C = pot.shape
    B = w1.shape[0]
    assert w1.shape == (B, R1) and w2.shape == (B, R2)

    dtype = jnp.float32
    pot = pot.astype(dtype)
    w1 = w1.astype(dtype)
    w2 = w2.astype(dtype)

    # Layout: the streamed potential goes in as [R1, C, R2] so the large R2
    # axis lands on the 128-lane dimension and the (often tiny) separator
    # axis C on sublanes — a trailing tiny dim would be lane-padded to 128
    # in VMEM (64x blowup at C=2).  The matmul contracts last-against-last:
    #   partial[TB, C] = w2[TB, R2] . pot_i[C, R2]^T
    # Tiling: TB batch tile; TR1 r1 tile auto-sized to a VMEM budget using
    # the padded sublane extent of C.
    # cap the batch tile so the double-buffered w2 block fits VMEM even for
    # very wide R2 (w2 block is TB x R2)
    tb_fit = max(128, (3 * 1024 * 1024) // max(R2 * 4, 1) // 128 * 128)
    TB = min(block_b, tb_fit, _round_up(B, 8))
    Bp = _round_up(B, TB)
    vmem_budget = 2 * 1024 * 1024  # bytes for the potential block
    c_pad = _round_up(C, 8)
    tr1_fit = max(1, vmem_budget // max(c_pad * R2 * 4, 1))
    TR1 = max(1, min(block_r1, tr1_fit, R1))
    R1p = _round_up(R1, TR1)
    pot = jnp.transpose(pot, (0, 2, 1))  # [R1, C, R2]
    if R1p != R1:
        pot = jnp.pad(pot, ((0, R1p - R1), (0, 0), (0, 0)))
        w1 = jnp.pad(w1, ((0, 0), (0, R1p - R1)))
    if Bp != B:
        w1 = jnp.pad(w1, ((0, Bp - B), (0, 0)))
        w2 = jnp.pad(w2, ((0, Bp - B), (0, 0)))

    n_b = Bp // TB
    n_r1 = R1p // TR1
    # W1 goes in transposed ([R1p, B]) with full-R1p blocks — trailing block
    # dims must be (8,128)-aligned or equal to the array dims
    w1t = jnp.transpose(w1)

    def kernel(w1t_ref, w2_ref, pot_ref, out_ref):
        j = pl.program_id(1)

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
            acc = acc + w1t_ref[j * TR1 + i, :][:, None] * partial
        out_ref[:] = acc

    grid = (n_b, n_r1)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (R1p, TB), lambda b, j: (0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TB, R2), lambda b, j: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TR1, C, R2), lambda b, j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (TB, C), lambda b, j: (b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, C), dtype),
        interpret=interpret,
    )(w1t, w2, pot)
    return out[:B]


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


def big_clique_sep_message(
    pot: jnp.ndarray,
    clique_vars: Sequence[int],
    masks: dict,
    sep_vars: Sequence[int],
    *,
    interpret: bool = False,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Collect message from a (large) clique to its separator under batched
    per-variable evidence masks.

    pot: unbatched clique potential, axes = clique_vars order.
    masks: {var id: [B, size_v]} for observed vars (must be a subset of
    clique_vars; vars in sep_vars are applied post-contraction).
    Returns [B, *sep_shape]."""
    cset = list(clique_vars)
    sset = list(sep_vars)
    rest = [v for v in cset if v not in sset]
    # permute pot to (rest..., sep...)
    perm = [cset.index(v) for v in rest + sset]
    p = jnp.transpose(pot, perm)
    R = int(np.prod([p.shape[i] for i in range(len(rest))])) if rest else 1
    C = int(np.prod(p.shape[len(rest):])) if sset else 1
    sep_shape = p.shape[len(rest):]

    rest_masks = [masks[v] for v in rest if v in masks]
    rest_mask_vars = [v for v in rest if v in masks]
    sep_masks = {v: masks[v] for v in sset if v in masks}

    B = None
    for m in masks.values():
        B = m.shape[0]
        break
    if B is None:
        raise ValueError("need at least one mask to define the batch")

    # factor rest-axis weights: observed rest vars contribute their masks,
    # unobserved rest vars broadcast (handled by axis expansion below)
    if rest_mask_vars:
        w1, w2, g1, g2 = build_weight_groups(rest_masks)
        # build full [B, R] group weights by broadcasting over unobserved
        # rest axes — done *per group* so each stays ~sqrt(R)-sized:
        # reorder rest axes as (group1 observed, group2 observed, unobserved)
        g1_vars = [rest_mask_vars[i] for i in g1]
        g2_vars = [rest_mask_vars[i] for i in g2]
        un_vars = [v for v in rest if v not in masks]
        new_rest = g1_vars + g2_vars + un_vars
        perm2 = [rest.index(v) for v in new_rest] + list(
            range(len(rest), p.ndim)
        )
        p = jnp.transpose(p, perm2)
        R1 = int(np.prod([pot.shape[cset.index(v)] for v in g1_vars])) or 1
        R2 = int(
            np.prod([pot.shape[cset.index(v)] for v in g2_vars + un_vars])
        ) or 1
        # w2 broadcast over unobserved axes
        n_un = int(np.prod([pot.shape[cset.index(v)] for v in un_vars])) or 1
        if n_un > 1:
            w2 = jnp.repeat(w2[:, :, None], n_un, axis=2).reshape(B, -1)
        p3 = p.reshape(R1, R2, C)
    else:
        R1, R2 = 1, R
        w1 = jnp.ones((B, 1), dtype=pot.dtype)
        w2 = jnp.ones((B, R), dtype=pot.dtype)
        p3 = p.reshape(R1, R2, C)

    if use_pallas:
        out = factored_masked_contract(p3, w1, w2, interpret=interpret)
    else:
        out = reference_factored_contract(p3, w1, w2)
    out = out.reshape((B,) + tuple(sep_shape))

    # apply separator-variable masks elementwise on the output
    for i, v in enumerate(sset):
        if v in sep_masks:
            m = sep_masks[v]
            shape = [B] + [1] * len(sset)
            shape[1 + i] = m.shape[1]
            out = out * m.reshape(shape)
    return out
