"""Headline benchmark: ResnetGenerator-9 inference throughput, 256×256/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 5000 (BASELINE.md north-star: ≥5k 256² images/sec/chip
on TPU v5e — for this net that would be ~565 TFLOP/s, above v5e bf16 peak;
FLOP math: ~113 GFLOP/image).

Measured serving configuration: **fused calibrated int8**
(models/quantization.py fused_int8_apply: per-channel int8 weights, static
per-tensor activation scales, dequant/bias absorbed into InstanceNorm by
affine invariance, IN+ReLU/residual+requant+pad fused into the conv
epilogues, bf16 ConvTranspose up stages).
v5e progression: bf16 1129 img/s (≈131 TFLOPs, 67% of bf16 peak) → int8 v1
1278 → int8 v2 fused 1407 img/s (≈122 effective TOPs, ~94% of XLA's
measured int8 conv rate — the chip's achievable int8 ceiling measured at
184 TOPs on 8k³ matmuls, 1.48× bf16). Falls back to bf16 if the int8 path
fails.

Measurement methodology (required on the axon-relay TPU backend):
- each step's input is the previous step's output (data-dependency chain), so
  no layer of the stack can dedupe/cache repeated identical executions;
- chained warmup before timing (first post-compile executions are slow over
  the relay; one retry for dropped dispatches);
- a scalar reduction of the final output closes the chain.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def run_chain(fwd, v, x, n):
    y = x
    for _ in range(n):
        y = fwd(v, y)
    return float(jnp.sum(y.astype(jnp.float32)))  # forces full execution


def measure(fwd, v, x, iters=8, trials=3):
    try:
        run_chain(fwd, v, x, 3)
    except Exception:
        run_chain(fwd, v, x, 3)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        run_chain(fwd, v, x, iters)
        best = min(best, time.perf_counter() - t0)
    return x.shape[0] * iters / best


def main():
    from cycle_depth_estimation_tpu.models.networks import ResnetGenerator

    batch = 128  # throughput saturates at batch >= 128
    g = ResnetGenerator(output_nc=3, ngf=64, n_blocks=9, dtype=jnp.bfloat16)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vs = g.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    x = jax.random.uniform(jax.random.key(1), (batch, 256, 256, 3),
                           jnp.bfloat16, -1.0, 1.0)

    mode = "int8_fused_calibrated"
    try:
        from cycle_depth_estimation_tpu.models.quantization import (
            Int8ResnetGenerator,
            calibrate,
            fused_int8_apply,
            fused_int8_variables,
            int8_generator_variables,
            synthetic_calibration_batch,
        )

        gq = Int8ResnetGenerator(output_nc=3, ngf=64, n_blocks=9)
        # calibration runs on the chip (dynamic-scale pass; host init only)
        with jax.default_device(cpu):
            dyn = int8_generator_variables(vs["params"])
        dyn = jax.device_put(dyn, jax.devices()[0])
        calib = jnp.asarray(synthetic_calibration_batch(2, 4, 256))
        static = calibrate(gq, dyn, jax.device_put(calib, jax.devices()[0]))
        v = jax.device_put(fused_int8_variables(jax.device_get(static)),
                           jax.devices()[0])
        ips = measure(jax.jit(lambda v, x: fused_int8_apply(v, x)), v, x)
    except Exception:
        mode = "bf16"
        v = jax.device_put(
            jax.tree.map(lambda a: a.astype(jnp.bfloat16), vs),
            jax.devices()[0])
        ips = measure(jax.jit(lambda v, x: g.apply(v, x)), v, x)

    print(json.dumps({
        "metric": ("resnet9_generator_inference_256px_images_per_sec_per_chip"
                   f"_{mode}"),
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / 5000.0, 4),
    }))


if __name__ == "__main__":
    main()
