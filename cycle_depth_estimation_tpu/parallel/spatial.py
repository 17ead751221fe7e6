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
    from .mesh import make_mesh  # single mesh constructor (review dedupe)

    return Mesh(make_mesh([data, model], devices=devices).devices,
                ("data", "model"))


def spatial_sharding(mesh: Mesh, batch_axis: str = "data",
                     spatial_axis: str = "model") -> NamedSharding:
    """NHWC sharding: batch over ``data``, H over ``model``."""
    axes = dict(mesh.shape)
    if spatial_axis not in axes:
        # silently skipping the requested H split would leave the oversized
        # activation whole on every chip (review fix)
        raise ValueError(
            f"mesh {tuple(axes)} has no '{spatial_axis}' axis to shard H "
            f"over — build it with make_2d_mesh(data, model)")
    b = batch_axis if batch_axis in axes else None
    return NamedSharding(mesh, P(b, spatial_axis))


def shard_spatial(mesh: Mesh, x, batch_axis: str = "data",
                  spatial_axis: str = "model"):
    sh = spatial_sharding(mesh, batch_axis, spatial_axis)
    return jax.device_put(x, sh)
