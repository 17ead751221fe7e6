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
# Persistent compilation cache (verified working on XLA:CPU): the suite's
# cost is dominated by recompiles of the big train-step programs (the S2D
# 4-phase step at 192² compiles ~10 min); cache entries make re-runs and
# the dryrun/test overlap nearly free. 5 s floor keeps tiny entries out.
# Lives INSIDE the repo (.jax_cache/, gitignored), NOT /tmp: /tmp is wiped
# on VM restart, which left round 4's driver dryrun cold (VERDICT r3 #1).
_repo_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("CDE_JAX_CACHE", _repo_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
