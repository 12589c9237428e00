"""Device mesh construction + canonical shardings.

Primary logical axis ``data`` (the model is ~25-60M params — far below
the point where tensor/pipeline sharding pays; SURVEY.md §2 parallelism
inventory). An optional second ``spatial`` axis shards the IMAGE-ROW
dimension of each sample across chips (GSPMD inserts the conv halo
exchanges) — the CNN analog of sequence parallelism: it scales a single
sample's compute/memory where data parallelism can only scale batch
count. Multi-host: call ``jax.distributed.initialize`` first and the
same Mesh spans all hosts; XLA routes the gradient all-reduce over
ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data_axis_size: Optional[int] = None,
    axis_name: str = "data",
    spatial_axis_size: int = 1,
    spatial_axis_name: str = "spatial",
) -> Mesh:
    """1-axis ``(data,)`` mesh, or ``(data, spatial)`` when
    ``spatial_axis_size > 1``. ``data_axis_size=None`` uses every visible
    device (divided by the spatial size). Spatial is the MINOR axis so
    each sample's row-shards sit on ICI-adjacent devices and the halo
    exchanges never cross the data axis."""
    devices = jax.devices()
    if spatial_axis_size <= 1:
        if data_axis_size is not None:
            devices = devices[:data_axis_size]
        return Mesh(np.asarray(devices), (axis_name,))
    if data_axis_size is None:
        # With no explicit data size, every device must be used: silently
        # dropping the remainder (or worse, a 0-row grid when spatial >
        # device count) surfaces only as a cryptic downstream error.
        if len(devices) % spatial_axis_size:
            raise ValueError(
                f"spatial_axis_size={spatial_axis_size} does not divide the "
                f"{len(devices)} visible devices; pass data_axis_size to use "
                "a subset"
            )
        data_axis_size = len(devices) // spatial_axis_size
    n = data_axis_size * spatial_axis_size
    if not 0 < n <= len(devices):
        raise ValueError(
            f"mesh {data_axis_size} x {spatial_axis_size} needs {n} devices; "
            f"{len(devices)} visible"
        )
    grid = np.asarray(devices[:n]).reshape(data_axis_size, spatial_axis_size)
    return Mesh(grid, (axis_name, spatial_axis_name))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split across the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) images: batch over ``data``, rows over ``spatial``
    when the mesh has one (1-axis meshes get plain batch sharding)."""
    if len(mesh.axis_names) == 1:
        return batch_sharding(mesh)
    return NamedSharding(mesh, P(mesh.axis_names[0], mesh.axis_names[1]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_host_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put a dict of host arrays with the batch dim sharded."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
