"""Tensor (channel) parallelism for the conv generators.

The reference's only scale-out story is single-process ``nn.DataParallel``
(SURVEY.md §2.3); on TPU we add the orthogonal mesh axes. This module shards
the *channel* dimension of the residual trunk over a ``model`` axis,
Megatron-style, with XLA GSPMD inserting the collectives:

- ``block*/conv1`` is a **column** shard: kernel HWIO split on O, bias split
  with it. Its output activations are channel-sharded; the InstanceNorm and
  ReLU between the pair are per-channel ops and stay shard-local.
- ``block*/conv2`` is a **row** shard: kernel split on I, bias replicated.
  Each shard produces a partial sum over its input channels; XLA emits ONE
  all-reduce (psum over ICI) per block — the Megatron col→row pairing, cf.
  the scaling-book recipe: annotate shardings, let the partitioner place the
  collectives.
- ``conv_in`` / ``down*`` / ``up*`` / ``conv_out`` stay replicated: at 256²
  the 9 blocks carry ~77% of the FLOPs, and the stem/upsample layers would
  force activation reshards for little gain.

Composes with batch DP (``('data', 'model')`` mesh: batch on ``data``,
channels on ``model``) and with the spatial sharding in
``parallel/spatial.py``. Requires block width (4·ngf) divisible by the
``model`` axis size. Numerically verified against the unsharded forward and
gradients in tests/test_parallel.py.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_names(path) -> list:
    return [str(getattr(p, "key", p)) for p in path]


def tp_spec(path, leaf, axis: str = "model") -> P:
    """PartitionSpec for one ResnetGenerator param leaf (Megatron pairing)."""
    names = _path_names(path)
    if any(n.startswith("block") for n in names):
        if "conv1" in names:  # column shard
            return P(None, None, None, axis) if leaf.ndim == 4 else P(axis)
        if "conv2" in names and leaf.ndim == 4:  # row shard; bias replicated
            return P(None, None, axis, None)
    return P()


def tp_shardings(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """NamedSharding pytree for a ResnetGenerator variables dict."""
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: NamedSharding(mesh, tp_spec(p, leaf, axis)), params)


def shard_params_tp(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """device_put the params with trunk channels split over ``axis``."""
    return jax.device_put(params, tp_shardings(params, mesh, axis))


def shard_state_tp(state, mesh: Mesh, g_names=("G_A", "G_B"),
                   opt_names=("G",), axis: str = "model"):
    """Lay a ModelState out for tensor-parallel training (``--parallel tp``).

    Shards the named generator param subtrees Megatron-style and gives their
    Adam moments the SAME layout (the optax state mirrors the param tree, so
    `tp_spec`'s block*/conv1|conv2 path matching applies verbatim — moments
    of a sharded weight living replicated would force a reshard every step).
    Everything else keeps its current (replicated) placement.
    """
    params = dict(state.params)
    for n in g_names:
        if n in params:
            params[n] = shard_params_tp(params[n], mesh, axis)
    opt_states = dict(state.opt_states)
    for n in opt_names:
        if n in opt_states:
            opt_states[n] = shard_params_tp(opt_states[n], mesh, axis)
    return state.replace(params=params, opt_states=opt_states)
