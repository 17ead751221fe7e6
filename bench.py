"""Headline benchmark: ResnetGenerator-9 inference throughput, 256×256/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 5000 (BASELINE.md north-star: ≥5k 256² images/sec/chip
on TPU v5e — note that for the 9-block generator this corresponds to
~565 TFLOPs sustained, above v5e bf16 peak; FLOP math: ~113 GFLOP/image).

FLOP math: ~113 GFLOP/image → 1.16k img/s ≈ 131 TFLOPs ≈ 67% of v5e bf16
peak — the residual gap is InstanceNorm's extra activation pass and the
reflection pads (see ops/layers.py perf notes for the measured alternatives).

Measurement methodology (required on the axon-relay TPU backend):
- each step's input is the previous step's output (data-dependency chain), so
  no layer of the stack can dedupe/cache repeated identical executions;
- several chained warmup steps before timing (the first executions after
  compile run slow over the relay);
- a scalar reduction of the final output is fetched to close the chain.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def run_chain(fwd, params, x, n):
    y = x
    for _ in range(n):
        y = fwd(params, y)
    return float(jnp.sum(y.astype(jnp.float32)))  # forces full execution


def main():
    from cycle_depth_estimation_tpu.models.networks import ResnetGenerator

    batch = 128  # throughput saturates at batch ≥128 (~1.16k img/s on v5e)
    g = ResnetGenerator(output_nc=3, ngf=64, n_blocks=9, dtype=jnp.bfloat16)
    x = jax.random.uniform(jax.random.key(1), (batch, 256, 256, 3),
                           jnp.bfloat16, -1.0, 1.0)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          g.init(jax.random.key(0), x))

    @jax.jit
    def fwd(params, x):
        return g.apply(params, x)

    # compile + relay warmup; one retry — the relay occasionally drops a
    # first dispatch
    try:
        run_chain(fwd, params, x, 3)
    except Exception:
        run_chain(fwd, params, x, 3)

    best = float("inf")
    iters = 8
    for _ in range(3):
        t0 = time.perf_counter()
        run_chain(fwd, params, x, iters)
        best = min(best, time.perf_counter() - t0)
    ips = batch * iters / best

    print(json.dumps({
        "metric": "resnet9_generator_inference_256px_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / 5000.0, 4),
    }))


if __name__ == "__main__":
    main()
