"""Headline benchmark: ResnetGenerator-9 inference throughput, 256×256/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 5000 (BASELINE.md north-star: ≥5k 256² images/sec/chip
on TPU v5e — for this net that would be ~500+ TFLOP/s, above v5e bf16 peak;
HLO-counted cost: 99.4 GFLOP/image, tools/mfu_report.py).

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

import argparse
import json
import time

import jax
import jax.numpy as jnp


def run_chain(fwd, v, x, n):
    y = x
    for _ in range(n):
        y = fwd(v, y)
    return float(jnp.sum(y.astype(jnp.float32)))  # forces full execution


def rate_stats(rates):
    """Median-of-trials rate + spread annotation (VERDICT r3 item 5: the
    driver-recorded headline must be robust to relay noise — best-of hides a
    lucky block, mean is polluted by one hiccup; median + printed spread is
    the standard the repo applies to A/B rows in tools/bench_runs.jsonl)."""
    r = sorted(rates)
    n = len(r)
    med = r[n // 2] if n % 2 else 0.5 * (r[n // 2 - 1] + r[n // 2])
    spread_pct = 100.0 * (r[-1] - r[0]) / med if med else float("inf")
    return med, {"trial_rates": [round(x, 3) for x in rates],
                 "spread_pct": round(spread_pct, 2)}


def measure(fwd, v, x, iters=8, trials=3):
    try:
        run_chain(fwd, v, x, 3)
    except Exception:
        run_chain(fwd, v, x, 3)
    rates = []
    for _ in range(trials):
        t0 = time.perf_counter()
        run_chain(fwd, v, x, iters)
        rates.append(x.shape[0] * iters / (time.perf_counter() - t0))
    return rate_stats(rates)


def main(arch_up_mode: str = "convtranspose"):
    from cycle_depth_estimation_tpu.models.networks import ResnetGenerator

    batch = 128  # throughput saturates at batch >= 128
    g = ResnetGenerator(output_nc=3, ngf=64, n_blocks=9, dtype=jnp.bfloat16,
                        up_mode=arch_up_mode)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vs = g.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    x = jax.random.uniform(jax.random.key(1), (batch, 256, 256, 3),
                           jnp.bfloat16, -1.0, 1.0)

    # the fast-serving architecture serves its up stages int8 (non-parity
    # variant, README serving table); the reference topology serves bf16 ups
    fused_up = ("resize_conv_int8" if arch_up_mode == "resize_conv"
                else "bf16")
    mode = "int8_fused_calibrated" + (
        "_resize_conv" if arch_up_mode == "resize_conv" else "")
    try:
        from cycle_depth_estimation_tpu.models.quantization import (
            Int8ResnetGenerator,
            calibrate,
            fused_int8_apply,
            fused_int8_variables,
            int8_generator_variables,
            synthetic_calibration_batch,
        )

        gq = Int8ResnetGenerator(output_nc=3, ngf=64, n_blocks=9,
                                 up_mode=arch_up_mode)
        # calibration runs on the chip (dynamic-scale pass; host init only)
        with jax.default_device(cpu):
            dyn = int8_generator_variables(vs["params"])
        dyn = jax.device_put(dyn, jax.devices()[0])
        calib = jnp.asarray(synthetic_calibration_batch(2, 4, 256))
        static = calibrate(gq, dyn, jax.device_put(calib, jax.devices()[0]))
        v = jax.device_put(fused_int8_variables(jax.device_get(static)),
                           jax.devices()[0])
        ips, spread = measure(jax.jit(
            lambda v, x: fused_int8_apply(v, x, up_mode=fused_up)), v, x)
    except Exception:
        mode = "bf16"
        v = jax.device_put(
            jax.tree.map(lambda a: a.astype(jnp.bfloat16), vs),
            jax.devices()[0])
        ips, spread = measure(jax.jit(lambda v, x: g.apply(v, x)), v, x)

    print(json.dumps({
        "metric": ("resnet9_generator_inference_256px_images_per_sec_per_chip"
                   f"_{mode}"),
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / 5000.0, 4),
        **spread,
    }))


def main_s2d(batch: int = 1, remat: bool = False, dtype: str = "float32",
             model_name: str = "S2D"):
    """Full train-step throughput at 576×192 for the vKITTI→KITTI ('try')
    model families sharing the same batch layout: S2D (DenseNet-169, 77M
    params, the reference's working point — try_data.py:166,436),
    semantic_trans, rf_lw / rf_lw7 (RefineNet-LW).

    Not the driver default: init-on-host + compile of the multi-phase
    program costs ~12 min over the axon relay. Perf table in README; run
    with ``python bench.py --model S2D [--batch N] [--remat] [--dtype ...]``.
    """
    import numpy as np

    from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
    from cycle_depth_estimation_tpu.models import create_model
    from cycle_depth_estimation_tpu.models.quantization import (
        synthetic_calibration_batch,
    )

    cfg = apply_model_defaults(Config(model=model_name, batch_size=batch,
                                      remat=remat, dtype=dtype))
    model = create_model(cfg)
    model.donate_state = True
    state = model.init_state_on_host(jax.random.key(0))
    h, w = 192, 576
    rng = np.random.RandomState(0)

    def simg(seed):
        a = synthetic_calibration_batch(seed, batch, h).repeat(3, axis=2)
        return jnp.asarray(a[:, :, :w, :])

    # training on the SAME batch every step blows up after ~10 steps
    # (adversarial + BN pathology) — rotate batches like real training
    def make_batch(j):
        b = {
            "img_syn": simg(1 + 10 * j),
            "img_real": simg(2 + 10 * j),
            "seg_l_syn": jnp.asarray(rng.randint(0, 28, (batch, h, w)),
                                     jnp.int32),
            "seg_l_real": jnp.asarray(rng.randint(0, 28, (batch, h, w)),
                                      jnp.int32),
            "dep_l_syn": jnp.asarray(rng.rand(batch, h, w, 1) * 2 - 1,
                                     jnp.float32),
            "depth_l_s": jnp.asarray(np.sign(rng.randn(batch, h, w, 4)),
                                     jnp.float32),
        }
        if model_name == "semantic_trans_full":  # edge-BCE supervision maps
            b["seg_e_syn"] = jnp.asarray(
                (rng.rand(batch, h, w, 1) > 0.9).astype(np.float32))
            b["seg_e_real"] = jnp.asarray(
                (rng.rand(batch, h, w, 1) > 0.9).astype(np.float32))
        return jax.device_put(b, jax.devices()[0])

    batches = [make_batch(j) for j in range(3)]
    s = state
    for i in range(2):
        s, m = model.train_step(s, batches[i % 3], jax.random.key(2 + i))
    float(jax.device_get(next(iter(m.values()))))
    rates = []
    for t in range(3):
        t0 = time.perf_counter()
        for i in range(4):
            s, m = model.train_step(s, batches[(2 + 4 * t + i) % 3],
                                    jax.random.key(6 + i))
        float(jax.device_get(next(iter(m.values()))))
        rates.append(4 * batch / (time.perf_counter() - t0))
    med, spread = rate_stats(rates)
    mhost = {k: float(v) for k, v in jax.device_get(m).items()}
    import math
    bad = sorted(k for k, v in mhost.items() if not math.isfinite(v))
    print(json.dumps({
        "metric": (f"{model_name.lower()}_train_step_576x192_images_per_sec_per_chip"
                   + ("_remat" if remat else "")
                   + ("_bf16" if dtype == "bfloat16" else "")),
        "value": round(med, 3),
        "unit": "images/sec/chip",
        "vs_baseline": None,  # the reference publishes no training throughput
        "all_metrics_finite": not bad,
        "nonfinite_metrics": bad,
        **spread,
    }))


def main_cycle_gan(batch: int = 16, dtype: str = "float32"):
    """CycleGAN full train step (G joint update + 4× D steps + pool replay
    in one program) at 256², reference working shapes. Rotated batches;
    reports finiteness like the S2D mode."""
    import math

    import numpy as np

    from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
    from cycle_depth_estimation_tpu.models import create_model
    from cycle_depth_estimation_tpu.models.quantization import (
        synthetic_calibration_batch,
    )

    cfg = apply_model_defaults(Config(model="cycle_gan", batch_size=batch,
                                      no_dropout=True, dtype=dtype))
    model = create_model(cfg)
    model.donate_state = True
    state = model.init_state_on_host(jax.random.key(0))

    def mk(j):
        return jax.device_put({
            "img_source": jnp.asarray(
                synthetic_calibration_batch(1 + 9 * j, batch, 256)),
            "img_target": jnp.asarray(
                synthetic_calibration_batch(2 + 9 * j, batch, 256)),
        }, jax.devices()[0])

    batches = [mk(j) for j in range(3)]
    s = state
    for i in range(2):
        s, m = model.train_step(s, batches[i % 3], jax.random.key(2 + i))
    float(jax.device_get(m["G_A"]))
    rates = []
    for t in range(3):
        t0 = time.perf_counter()
        for i in range(4):
            s, m = model.train_step(s, batches[(2 + 4 * t + i) % 3],
                                    jax.random.key(6 + i))
        float(jax.device_get(m["G_A"]))
        rates.append(4 * batch / (time.perf_counter() - t0))
    med, spread = rate_stats(rates)
    mhost = {k: float(v) for k, v in jax.device_get(m).items()}
    bad = sorted(k for k, v in mhost.items() if not math.isfinite(v))
    print(json.dumps({
        "metric": ("cycle_gan_train_step_256px_images_per_sec_per_chip"
                   + ("_bf16" if dtype == "bfloat16" else "")),
        "value": round(med, 3),
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "all_metrics_finite": not bad,
        "nonfinite_metrics": bad,
        **spread,
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="generator",
                    choices=["generator", "S2D", "S2D_base", "S2D_alt",
                             "S2D_df", "S2D_nd",
                             "semantic_trans", "semantic_trans_full", "rf_lw",
                             "rf_lw7", "cycle_gan"])
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 1 for the S2D family, 16 for cycle_gan")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--up_mode", default="convtranspose",
                    choices=["convtranspose", "resize_conv"],
                    help="generator mode only: up-stage architecture "
                         "(resize_conv = the non-parity fast-serving "
                         "variant with all-int8 ups)")
    args = ap.parse_args()
    if args.model in ("S2D", "S2D_base", "S2D_alt", "S2D_df", "S2D_nd",
                      "semantic_trans", "semantic_trans_full", "rf_lw",
                      "rf_lw7"):
        main_s2d(args.batch or 1, args.remat, args.dtype, args.model)
    elif args.model == "cycle_gan":
        # explicit --batch is honored verbatim (review fix: 1 was silently
        # coerced to the 16 default)
        main_cycle_gan(args.batch or 16, args.dtype)
    else:
        main(args.up_mode)
