"""Fused InstanceNorm (affine=False) as a Pallas TPU kernel.

InstanceNorm dominates the non-MXU time of the CycleGAN generators (the
reference applies it after every conv, models/networks.py:16-17). XLA
executes it as separate reduce + normalize passes over HBM; this kernel
keeps one sample's (H, W, C) slab resident in VMEM and does
stats + normalize in a single read — the grid pipelines samples, so HBM
traffic is 1 read + 1 write of the activation.

Autodiff: `instance_norm` carries a custom VJP. The backward pass is plain
XLA (conv gradients dominate training time; the kernel win is the forward
inference path):

    dx = rσ · (dy − mean(dy) − x̂ · mean(dy·x̂))

Fallbacks: CPU backend (or slabs too large for VMEM) use the fused-by-XLA
one-pass formulation; interpret mode covers the kernel in CPU tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

# A (1, H, W, C) block is double-buffered for both input and output, so the
# per-sample slab must fit VMEM/4. The CycleGAN generators' residual trunk
# (64×64×256 bf16 = 2 MB/sample) qualifies; the two outermost scales fall
# back to the XLA one-pass form.
_SLAB_BUDGET_BYTES = 3 * 1024 * 1024


def _xla_instance_norm(x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=(1, 2), keepdims=True)
    var = mean2 - mean * mean
    return ((xf - mean) * lax.rsqrt(var + eps)).astype(x.dtype)


def _kernel(x_ref, o_ref, *, eps: float):
    x = x_ref[...]  # (1, H, W, C)
    xf = x.astype(jnp.float32)
    hw = x.shape[1] * x.shape[2]
    s1 = jnp.sum(xf, axis=(0, 1, 2), keepdims=True)
    s2 = jnp.sum(xf * xf, axis=(0, 1, 2), keepdims=True)
    mean = s1 / hw
    var = s2 / hw - mean * mean
    o_ref[...] = ((xf - mean) * lax.rsqrt(var + eps)).astype(x.dtype)


def _pallas_instance_norm(x: jax.Array, eps: float, interpret: bool) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)


def _should_use_pallas(x: jax.Array, use_pallas: Optional[bool]) -> bool:
    if use_pallas is None:
        # Measured on v5e (64×64×64×256 bf16): standalone pallas 1.70 ms vs
        # XLA one-pass 1.44 ms — XLA's fusion with neighboring elementwise
        # ops wins, so the kernel is opt-in, kept as the building block for
        # a future conv-epilogue fusion.
        return False
    if use_pallas and jax.default_backend() == "tpu":
        n, h, w, c = x.shape
        if h * w * c * x.dtype.itemsize > _SLAB_BUDGET_BYTES:
            return False
    return use_pallas


@functools.lru_cache(maxsize=None)
def _make_fn(eps: float, pallas_on: bool, interpret: bool):
    def core(x):
        if pallas_on:
            return _pallas_instance_norm(x, eps, interpret)
        return _xla_instance_norm(x, eps)

    @jax.custom_vjp
    def f(x):
        return core(x)

    def fwd(x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(xf * xf, axis=(1, 2), keepdims=True) - mean * mean
        rsigma = lax.rsqrt(var + eps)
        y = core(x)
        return y, (x, mean, rsigma)

    def bwd(res, dy):
        x, mean, rsigma = res
        dyf = dy.astype(jnp.float32)
        xhat = (x.astype(jnp.float32) - mean) * rsigma
        m_dy = jnp.mean(dyf, axis=(1, 2), keepdims=True)
        m_dyx = jnp.mean(dyf * xhat, axis=(1, 2), keepdims=True)
        dx = rsigma * (dyf - m_dy - xhat * m_dyx)
        return (dx.astype(dy.dtype),)

    f.defvjp(fwd, bwd)
    return f


def instance_norm(x: jax.Array, eps: float = 1e-5,
                  use_pallas: Optional[bool] = None,
                  interpret: Optional[bool] = None) -> jax.Array:
    """InstanceNorm2d(affine=False) over NHWC with fused TPU path."""
    if x.ndim != 4:
        return _xla_instance_norm(x, eps)
    pallas_on = _should_use_pallas(x, use_pallas)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _make_fn(float(eps), bool(pallas_on), bool(interpret))(x)
