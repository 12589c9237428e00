"""Device mesh construction + canonical shardings.

One logical axis ``data`` (the model is ~25-60M params — far below the
point where tensor/pipeline sharding pays; SURVEY.md §2 parallelism
inventory). Multi-host: call ``jax.distributed.initialize`` first and the
same Mesh spans all hosts; XLA routes the gradient all-reduce over
ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data_axis_size: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if data_axis_size is not None:
        devices = devices[:data_axis_size]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split across the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_host_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put a dict of host arrays with the batch dim sharded."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
