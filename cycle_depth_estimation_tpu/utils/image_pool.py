"""Device-resident ImagePool: 50-image replay buffer, fully inside jit.

Functional re-design of the reference's host-side Python pool
(reference util/image_pool.py:5-32): same per-image semantics —

- while the pool is under-full: append the image, return the image;
- else with p>0.5: return a random buffered image and replace it with the
  new one; otherwise return the image unchanged —

but as a `lax.scan` over the batch on device, with explicit `jax.random`
keys instead of Python's global ``random``. The buffer lives in HBM across
steps as part of the train state, so D-step replay adds no host↔device
traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PoolState:
    images: jax.Array   # (pool_size, H, W, C)
    count: jax.Array    # int32 — number of filled slots


def init_pool(pool_size: int, image_shape, dtype=jnp.float32) -> PoolState:
    return PoolState(
        images=jnp.zeros((max(pool_size, 1),) + tuple(image_shape), dtype),
        count=jnp.zeros((), jnp.int32),
    )


def pool_query(state: PoolState, batch: jax.Array, rng: jax.Array,
               pool_size: int):
    """Query the pool with a batch of images.

    Returns (new_state, mixed_batch). With ``pool_size == 0`` this is the
    identity (reference util/image_pool.py:13-14).
    """
    if pool_size == 0:
        return state, batch

    def step(carry, inp):
        images, count = carry
        img, key = inp
        kp, ki = jax.random.split(key)
        p = jax.random.uniform(kp)
        rid = jax.random.randint(ki, (), 0, pool_size)
        not_full = count < pool_size
        swap = jnp.logical_and(jnp.logical_not(not_full), p > 0.5)
        write_idx = jnp.where(not_full, count, rid)
        do_write = jnp.logical_or(not_full, swap)
        out = jnp.where(swap, images[write_idx], img)
        slot_val = jnp.where(do_write, img, images[write_idx])
        images = jax.lax.dynamic_update_index_in_dim(images, slot_val, write_idx, 0)
        count = count + not_full.astype(count.dtype)
        return (images, count), out

    keys = jax.random.split(rng, batch.shape[0])
    (images, count), out = jax.lax.scan(
        step, (state.images, state.count.astype(jnp.int32)),
        (jax.lax.stop_gradient(batch), keys),
    )
    return PoolState(images=images, count=count), out
