"""Spatial sharding: split large images over a ``model`` mesh axis.

The reference has no sequence/context parallelism (vision CNNs —
SURVEY.md §5); the analogous TPU scaling axis is sharding the image height
across chips. Convolutions over an H-sharded NHWC tensor are handled by
XLA's SPMD partitioner, which inserts the halo exchanges over ICI
automatically — no hand-written collectives. Combine with batch DP on a 2-D
``('data', 'model')`` mesh for images too large for one chip's HBM (or to
cut latency at small batch).

Verified numerically on the 8-device CPU mesh
(tests/test_parallel.py::test_spatial_sharded_generator_matches).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_2d_mesh(data: int, model: int,
                 devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def spatial_sharding(mesh: Mesh, batch_axis: str = "data",
                     spatial_axis: str = "model") -> NamedSharding:
    """NHWC sharding: batch over ``data``, H over ``model``."""
    axes = dict(mesh.shape)
    b = batch_axis if batch_axis in axes else None
    s = spatial_axis if spatial_axis in axes else None
    return NamedSharding(mesh, P(b, s))


def shard_spatial(mesh: Mesh, x, batch_axis: str = "data",
                  spatial_axis: str = "model"):
    sh = spatial_sharding(mesh, batch_axis, spatial_axis)
    return jax.device_put(x, sh)
