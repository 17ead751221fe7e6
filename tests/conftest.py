"""Test config: force an 8-device virtual CPU platform.

This is the TPU-world substitute for multi-device testing without a pod slice
(SURVEY.md §4): every sharded code path runs on 8 virtual CPU devices.

Note: the axon TPU plugin's sitecustomize sets jax_platforms at interpreter
start, so the env var alone is not enough — we must override via jax.config
before any backend initialization.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
