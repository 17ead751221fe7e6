"""Mesh construction and sharding helpers.

The TPU-native replacement for the reference's ``nn.DataParallel``
(reference models/seg_network.py:90-93, new_multi/model5.py:212-221; SURVEY.md
§2.3): a `jax.sharding.Mesh` with a ``data`` axis (optionally a ``model``
axis for spatial/tensor sharding). Train steps are plain jit programs; the
batch carries a NamedSharding over ``data``, params are replicated, and XLA
emits the gradient all-reduce over ICI — no hand-written collectives.

Multi-host (the reference has none — SURVEY.md §2.3) comes for free: call
`jax.distributed.initialize()` before `make_mesh` and the same program spans
slices over DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Optional[Sequence[str]] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a device mesh. Default: all devices on one ``data`` axis; a
    2-element shape gets ``('data', 'model')`` so `--mesh_shape D M` works
    from the CLI (review fix: the documented model axis crashed)."""
    explicit_devices = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names or ("data",)) - 1)
    if axis_names is None:
        axis_names = ("data", "model", "stage")[:len(shape)]
    if len(shape) != len(axis_names):
        raise ValueError(f"mesh shape {tuple(shape)} needs "
                         f"{len(shape)} axis names, got {tuple(axis_names)}")
    need = int(np.prod(shape))
    if need > len(devices):
        raise ValueError(
            f"mesh shape {tuple(shape)} needs {need} devices, "
            f"have {len(devices)}")
    if need < len(devices) and not explicit_devices:
        # a smaller-than-host mesh leaves chips idle; make it visible
        # (review fix: a benchmark silently ran on half the machine).
        # Callers that intend a subset pass `devices=` explicitly.
        import warnings

        warnings.warn(f"mesh shape {tuple(shape)} uses {need} of "
                      f"{len(devices)} available devices", stacklevel=2)
    arr = np.array(devices[:need]).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for an NHWC batch: leading dim split over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Constrain every array in a batch pytree to batch-axis sharding."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, sh), batch)


def host_shard_batch(mesh: Mesh, batch, axis: str = "data",
                     spatial_axis: Optional[str] = None):
    """device_put a host batch pytree with the batch dim split over ``axis``.

    This is the host→HBM boundary (the reference's ``.cuda()`` in
    ``set_input``, e.g. models/cycle_gan_model.py:76-77) — one transfer per
    step, sliced across devices.

    With ``spatial_axis`` (the ``--parallel sp`` CLI mode), every leaf with
    rank ≥ 3 — NHWC images, NHW label maps, NHWx depth bands — additionally
    has its H dimension split over that mesh axis; XLA's SPMD partitioner
    inserts the conv halo exchanges over ICI (parallel/spatial.py).

    Multi-process (multi-host) meshes: each process passes its PROCESS-LOCAL
    slice of the global batch (global_batch/process_count leading rows, in
    process-index order) and the global array is assembled with
    `jax.make_array_from_process_local_data` — the DCN-spanning analogue of
    the same boundary.
    """
    def sh(x):
        if spatial_axis is not None and getattr(x, "ndim", 0) >= 3:
            return NamedSharding(mesh, P(axis, spatial_axis))
        return batch_sharding(mesh, axis)

    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh(x), np.asarray(x)),
            batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh(x)), batch)
