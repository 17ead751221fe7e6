"""ZeRO-style optimizer-state (and optional parameter) sharding.

The TPU-native answer to the S2D single-chip memory wall: the flagship
model's 6 Adam optimizers hold two fp32 moments per parameter (77M params →
~0.6 GiB) and plain data parallelism replicates them on every chip — the
reference could not do better (its DataParallel replicates the whole module,
/root/reference/new_multi/model5.py:212-223). Under SPMD the fix is pure
*layout*: give every optimizer-moment leaf a `NamedSharding` that splits its
largest divisible dimension over the ``data`` axis (ZeRO-1), optionally the
parameters too (ZeRO-3 / FSDP). The train step stays the SAME jit program —
GSPMD propagates the shardings and inserts the reduce-scatter / all-gather
collectives over ICI; no optimizer or model code changes.

Scalar leaves (Adam ``count``, injected learning rates) and leaves with no
dimension divisible by the axis size stay replicated — sharding them would
save nothing and force pathological layouts.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import replicated


def leaf_zero_sharding(mesh: Mesh, leaf: Any, axis: str = "data") -> NamedSharding:
    """Sharding that splits ``leaf``'s largest axis-divisible dim over ``axis``.

    Falls back to replicated for scalars and shapes with no dimension
    divisible by the mesh axis size (e.g. a (3, 3, 3, 7) conv kernel on an
    8-way axis).
    """
    n = mesh.shape[axis]
    shape = getattr(leaf, "shape", ())
    spec = [None] * len(shape)
    # prefer the largest dimension: best per-device memory saving and the
    # cheapest relative collective padding
    for i in sorted(range(len(shape)), key=lambda j: -shape[j]):
        if shape[i] >= n and shape[i] % n == 0:
            spec[i] = axis
            break
    if not any(spec):
        return NamedSharding(mesh, P())  # fully replicated, canonical form
    return NamedSharding(mesh, P(*spec))


def shard_tree_zero(mesh: Mesh, tree: Any, axis: str = "data") -> Any:
    """device_put every leaf of ``tree`` with its ZeRO sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, leaf_zero_sharding(mesh, x, axis)), tree)


def zero_state(mesh: Mesh, state, axis: str = "data",
               shard_params: bool = False):
    """Lay a ModelState out for ZeRO training on ``mesh``.

    - ``opt_states``: every moment leaf sharded over ``axis`` (ZeRO-1).
    - ``params`` / ``batch_stats``: replicated by default; with
      ``shard_params=True`` the params are sharded too (ZeRO-3/FSDP — GSPMD
      all-gathers each weight at its use site and reduce-scatters its grad).
    - everything else (pools, step) replicated.

    Drop-in: ``state = zero_state(mesh, model.init_state_on_host(rng))`` in
    place of ``jax.device_put(state, replicated(mesh))``; ``train_step`` is
    unchanged.
    """
    repl = replicated(mesh)
    params = (shard_tree_zero(mesh, state.params, axis) if shard_params
              else jax.device_put(state.params, repl))
    return state.replace(
        params=params,
        batch_stats=jax.device_put(state.batch_stats, repl),
        opt_states=shard_tree_zero(mesh, state.opt_states, axis),
        pools=jax.device_put(state.pools, repl),
        step=jax.device_put(state.step, repl),
    )


def _tree_bytes(tree: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
               if hasattr(x, "size"))


def _tree_bytes_per_device(tree: Any, mesh: Mesh, axis: str, sharded: bool) -> int:
    if not sharded:
        return _tree_bytes(tree)
    n = mesh.shape[axis]
    total = 0
    for x in jax.tree.leaves(tree):
        if not hasattr(x, "size"):
            continue
        sh = leaf_zero_sharding(mesh, x, axis)
        frac = n if sh.spec != P() else 1
        total += x.size * x.dtype.itemsize // frac
    return total


def memory_report(state, mesh: Mesh, axis: str = "data",
                  shard_params: bool = False) -> dict:
    """Per-device persistent-state bytes: replicated DP vs ZeRO layout.

    Activations are excluded (shape-dependent); this is the resident
    params + moments + batch_stats footprint the layout controls.
    """
    rep = {
        "params": _tree_bytes(state.params),
        "opt_states": _tree_bytes(state.opt_states),
        "batch_stats": _tree_bytes(state.batch_stats),
    }
    zero = {
        "params": _tree_bytes_per_device(state.params, mesh, axis, shard_params),
        "opt_states": _tree_bytes_per_device(state.opt_states, mesh, axis, True),
        "batch_stats": rep["batch_stats"],
    }
    return {
        "mesh_axis": f"{axis}={mesh.shape[axis]}",
        "replicated_per_device_bytes": rep,
        "zero_per_device_bytes": zero,
        "replicated_total_mib": round(sum(rep.values()) / 2**20, 1),
        "zero_total_mib": round(sum(zero.values()) / 2**20, 1),
    }
