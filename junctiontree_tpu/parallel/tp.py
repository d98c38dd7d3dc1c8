"""Tensor parallelism: clique-axis sharding for oversized cliques.

When one clique's state space exceeds a chip's HBM/VMEM budget (SURVEY.md
§2.3 TP row), its potential is sharded over the ``model`` mesh axis along the
factored rest axis R1 and each device contracts its local shard — the same
factored-mask contraction as the single-chip Pallas kernel — followed by a
``psum`` over the model axis.  Collectives ride ICI; the batch axis can be
sharded simultaneously over the ``batch`` axis (2D mesh)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pallas_contract import (
    factored_masked_contract,
    reference_factored_contract,
    _kernel_flags,
)
from .mesh import BATCH_AXIS, MODEL_AXIS


def sharded_factored_contract(
    mesh: Mesh,
    pot: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    *,
    shard_batch: bool = True,
):
    """out[b, c] = sum_{r1, r2} pot[r1, r2, c] * w1[b, r1] * w2[b, r2],
    with the r1 axis sharded over the ``model`` mesh axis (and optionally the
    batch axis over ``batch``).

    pot: [R1, R2, C] with R1 divisible by the model-axis size.
    w1: [B, R1], w2: [B, R2].  Returns [B, C] (replicated over model)."""
    n_model = mesh.shape[MODEL_AXIS]
    R1 = pot.shape[0]
    B = w1.shape[0]
    assert R1 % n_model == 0, (R1, n_model)
    bspec = P(BATCH_AXIS) if shard_batch else P()

    def local(pot_l, w1_l, w2_l):
        from ..ops.pallas_contract import plan_tiles

        use, interp = _kernel_flags()
        if use and plan_tiles(*(int(d) for d in pot_l.shape),
                              int(w1_l.shape[0])) is not None:
            out = factored_masked_contract(pot_l, w1_l, w2_l, interpret=interp)
        else:
            out = reference_factored_contract(pot_l, w1_l, w2_l)
        return jax.lax.psum(out, MODEL_AXIS)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS, None, None),          # pot sharded on R1
            (P(BATCH_AXIS, MODEL_AXIS) if shard_batch else P(None, MODEL_AXIS)),
            bspec,                               # w2 replicated over model
        ),
        out_specs=bspec,
    )
    return fn(pot, w1, w2)


def tp_contract_fn(mesh: Mesh, *, shard_batch: bool = False):
    """``contract_fn`` for ``big_clique_sep_message``: the factored
    big-clique contraction sharded over the model mesh axis (pads R1 up to a
    multiple of the model-axis size with zero rows — padding contributes
    nothing to the psum).  This is how ``Engine.shard_model`` routes
    oversized cliques instead of raising in ``check_feasible``."""
    n_model = mesh.shape[MODEL_AXIS]

    def contract(p3, w1, w2):
        R1 = p3.shape[0]
        pad = (-R1) % n_model
        if pad:
            p3 = jnp.pad(p3, ((0, pad), (0, 0), (0, 0)))
            w1 = jnp.pad(w1, ((0, 0), (0, pad)))
        return sharded_factored_contract(
            mesh, p3, w1, w2, shard_batch=shard_batch
        )

    return contract
