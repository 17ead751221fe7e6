"""Weight-initializer registry with torch-equivalent statistics.

Mirrors the init registry of the reference (models/networks.py:40-61:
normal/xavier/kaiming/orthogonal, default ``normal`` with gain 0.02, biases
zeroed). Fan computation for HWIO conv kernels matches torch's
``_calculate_fan_in_and_fan_out`` (receptive field × channels), so freshly
initialized nets have the same weight statistics as the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import nn as jnn


def make_initializer(init_type: str = "normal", gain: float = 0.02):
    """Return a flax kernel initializer matching the torch init registry.

    - ``normal``:   N(0, gain²)                       (torch init.normal_)
    - ``xavier``:   N(0, gain²·2/(fan_in+fan_out))    (torch xavier_normal_)
    - ``kaiming``:  N(0, 2/fan_in)                    (torch kaiming_normal_, a=0, fan_in)
    - ``orthogonal``: orthogonal with scale=gain
    """
    if init_type == "normal":
        return jnn.initializers.normal(stddev=gain)
    if init_type == "xavier":
        # std = gain * sqrt(2/(fan_in+fan_out)) == variance_scaling(gain², fan_avg)
        return jnn.initializers.variance_scaling(
            scale=gain * gain, mode="fan_avg", distribution="normal"
        )
    if init_type == "kaiming":
        return jnn.initializers.variance_scaling(
            scale=2.0, mode="fan_in", distribution="normal"
        )
    if init_type == "orthogonal":
        return jnn.initializers.orthogonal(scale=gain)
    raise NotImplementedError(f"initialization method [{init_type}] is not implemented")


zeros = jnn.initializers.zeros
ones = jnn.initializers.ones


def bn_scale_init(gain: float = 0.02):
    """BatchNorm scale init N(1, gain²) (reference models/networks.py:56-58)."""

    def init(key, shape, dtype=jnp.float32):
        return 1.0 + jnn.initializers.normal(stddev=gain)(key, shape, dtype)

    return init
