"""Pallas kernel tests (interpret mode on the CPU test platform)."""

import numpy as np

import jax
import jax.numpy as jnp

from cycle_depth_estimation_tpu.ops.pallas.instance_norm import (
    _xla_instance_norm,
    instance_norm,
)


def test_pallas_instance_norm_interpret_matches_xla():
    x = jax.random.normal(jax.random.key(0), (3, 16, 16, 8), jnp.float32) * 3 + 1
    y_k = instance_norm(x, use_pallas=True, interpret=True)
    y_x = _xla_instance_norm(x, 1e-5)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x), atol=1e-5,
                               rtol=1e-5)


def test_instance_norm_custom_vjp_matches_autodiff():
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 4), jnp.float32)

    def ref(x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
        return jnp.sum(jnp.sin((x - mean) / jnp.sqrt(var + 1e-5)))

    def ours(x):
        return jnp.sum(jnp.sin(instance_norm(x)))

    g_ref = jax.grad(ref)(x)
    g_ours = jax.grad(ours)(x)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_instance_norm_module_uses_fused_path():
    from cycle_depth_estimation_tpu.ops import InstanceNorm

    x = jax.random.normal(jax.random.key(2), (2, 10, 12, 6), jnp.float32)
    y = InstanceNorm().apply({}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_xla_instance_norm(x, 1e-5)),
                               atol=1e-6)
