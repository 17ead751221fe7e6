"""Pipeline parallelism: GPipe schedule for the residual trunk.

The third mesh axis after data (mesh.py) / spatial+tensor (spatial.py,
tensor.py): stage the generator's residual blocks across a ``stage`` axis.
All trunk blocks share one shape (N×H/4×W/4×4ngf — networks.py ResnetBlock),
which makes the classic TPU pipeline pattern exact here: stack per-stage
params, `shard_map` over the axis, `lax.ppermute` activations to the next
stage each tick, `lax.scan` over the M+S−1 tick schedule (M microbatches,
S stages, S−1 bubble ticks). Collectives ride ICI; no hand-rolled sends.

This is a deliberate manual schedule — GSPMD shards tensors, it does not
pipeline — mirroring the shard_map pipelining recipe from the public JAX
scaling playbook. Verified equal to the sequential trunk in
tests/test_parallel.py::test_gpipe_trunk_matches_sequential.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(block_params: list, n_stages: int):
    """[p_0 … p_{L-1}] per-block param pytrees → one pytree with leading
    [S, L/S] axes (stage s holds blocks s·k … s·k+k−1)."""
    L = len(block_params)
    assert L % n_stages == 0, (L, n_stages)
    k = L // n_stages
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *block_params)
    return jax.tree.map(
        lambda l: l.reshape((n_stages, k) + l.shape[1:]), stacked)


def gpipe_apply(block_apply, stage_params, x: jax.Array, mesh: Mesh,
                n_microbatches: int, axis: str = "stage",
                data_axis: str | None = None) -> jax.Array:
    """Run the stacked-block trunk as an S-stage GPipe over ``axis``.

    ``block_apply(params, h) -> h`` applies ONE block; ``stage_params`` comes
    from `stack_stage_params`. The batch is split into ``n_microbatches``
    equal microbatches; activations flow stage→stage via ppermute. Bubble
    ticks recompute the last microbatch and are discarded on selection —
    harmless because ticks are independent.

    ``data_axis`` composes DP with the pipeline on a 2-D
    (``data_axis`` × ``axis``) mesh: each data slice shards the microbatch
    batch dimension and runs its own pipeline replica (params replicated
    over data, activations never cross the data axis — the dp×pp layout).
    """
    S = mesh.shape[axis]
    M = n_microbatches
    B = x.shape[0]
    assert B % M == 0, (B, M)
    xs = x.reshape((M, B // M) + x.shape[1:])
    T = M + S - 1
    if data_axis:
        assert (B // M) % mesh.shape[data_axis] == 0, (B, M,
                                                       mesh.shape[data_axis])
    batch_spec = P(None, data_axis) if data_axis else P()

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(axis), batch_spec),
        out_specs=batch_spec, check_vma=False)
    def run(params, xs):
        params = jax.tree.map(lambda l: l[0], params)  # [1,k,…] → [k,…]
        idx = jax.lax.axis_index(axis)

        def stage_fn(h):
            return jax.lax.scan(
                lambda a, p: (block_apply(p, a), None), h, params)[0]

        # blocks may compute in a different dtype than the input (bf16
        # modules over f32 activations) — carry/buffers must match the
        # block OUTPUT dtype or lax.scan rejects the carry at trace time
        out_dtype = jax.eval_shape(
            stage_fn, jax.ShapeDtypeStruct(xs[0].shape, xs.dtype)).dtype
        xs = xs.astype(out_dtype)

        def tick(carry, t):
            act, ys = carry
            my_in = jnp.where(idx == 0, xs[jnp.minimum(t, M - 1)], act)
            out = stage_fn(my_in)
            # only the LAST stage's post-fill ticks are results; write them
            # into a fixed M-slot buffer instead of stacking all S·(M+S−1)
            # tick outputs (review fix: 5.5× activation memory at S=4, M=8)
            j = jnp.clip(t - (S - 1), 0, M - 1)
            emit = (idx == S - 1) & (t >= S - 1)
            ys = ys.at[j].set(jnp.where(emit, out, ys[j]))
            nxt = jax.lax.ppermute(
                out, axis, [(i, (i + 1) % S) for i in range(S)])
            return (nxt, ys), None

        ys0 = jnp.zeros((M,) + xs.shape[1:], xs.dtype)
        (_, ys), _ = jax.lax.scan(tick, (jnp.zeros_like(xs[0]), ys0),
                                  jnp.arange(T))
        # non-last stages hold zeros — one psum delivers the result to all
        return jax.lax.psum(ys, axis)

    y = run(stage_params, xs)
    return y.reshape((B,) + y.shape[2:])
