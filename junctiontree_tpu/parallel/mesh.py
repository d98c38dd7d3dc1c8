"""Device-mesh helpers.

The reference is single-threaded NumPy with no distribution (SURVEY.md §2.3);
here parallelism is first-class: an evidence ``batch`` axis (data parallelism)
and a ``model`` axis reserved for clique-axis sharding (tensor parallelism of
oversized cliques).  Multi-host bring-up goes through
``jax.distributed.initialize`` on real pods; tests and dry runs use virtual
CPU devices (``--xla_force_host_platform_device_count``)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


BATCH_AXIS = "batch"
MODEL_AXIS = "model"


def make_mesh(
    n_batch: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Mesh over (batch, model) axes.  Defaults to all local devices on the
    batch axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_batch is None:
        n_batch = len(devices) // n_model
    use = np.array(devices[: n_batch * n_model]).reshape(n_batch, n_model)
    return Mesh(use, (BATCH_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for [B, ...] arrays."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
