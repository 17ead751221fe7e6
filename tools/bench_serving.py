"""Serving-throughput benchmark for the generic int8 PTQ path (models/ptq.py)
on the non-headline model families: pix2pix U-Net generator and RefineNet-LW
depth inference.

Methodology (CLAUDE.md axon-relay rules): chained inputs so no dispatch can
be deduped, warmup, scalar fetch at the end. Calibration runs eagerly on the
host CPU; serving runs jitted on the TPU.

CLI:
  python -m tools.bench_serving --net unet   [--batch 64] [--mode int8|bf16]
  python -m tools.bench_serving --net rf_lw  [--batch 8]  [--mode int8|bf16]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _calib_imgs(n, h, w):
    from cycle_depth_estimation_tpu.models.quantization import (
        synthetic_calibration_batch,
    )

    a = synthetic_calibration_batch(3, n, max(h, w))
    return jnp.asarray(a[:, :h, :w, :])


def _measure(step, x, iters=8, trials=3):
    y = x
    for _ in range(3):
        y = step(y)
    float(jnp.sum(y.astype(jnp.float32)))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        y2 = y
        for _ in range(iters):
            y2 = step(y2)
        float(jnp.sum(y2.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return x.shape[0] * iters / best


def bench_unet(batch: int, mode: str, quantize_transpose: bool = False):
    from cycle_depth_estimation_tpu.models.networks import UnetGenerator
    from cycle_depth_estimation_tpu.models.ptq import (
        default_predicate,
        quantize_for_serving,
    )
    from cycle_depth_estimation_tpu.ops import Conv, ConvTranspose

    h = w = 256
    g = UnetGenerator(output_nc=3, num_downs=8, ngf=64, norm="batch",
                      dtype=jnp.bfloat16)
    pred = ((lambda k, m: isinstance(m, (Conv, ConvTranspose)))
            if quantize_transpose else default_predicate)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vs = g.init(jax.random.key(0), jnp.zeros((1, h, w, 3), jnp.float32))
        calib = _calib_imgs(2, h, w)
        sites, serve = quantize_for_serving(g, vs, (calib,), predicate=pred)
    dev = jax.devices()[0]
    vs = jax.device_put(vs, dev)
    x = jax.device_put(_calib_imgs(batch, h, w).astype(jnp.bfloat16), dev)
    if mode == "int8":
        sites = jax.device_put(sites, dev)
        fast = jax.jit(lambda v, s, a: serve(v, s, a))
        step = lambda a: fast(vs, sites, a)  # noqa: E731
    else:
        fast = jax.jit(lambda v, a: g.apply(v, a))
        step = lambda a: fast(vs, a)  # noqa: E731
    ips = _measure(step, x)
    tag = mode + ("_qtranspose" if quantize_transpose else "")
    print(json.dumps({"metric": f"unet256_generator_inference_{tag}",
                      "value": round(ips, 2), "unit": "images/sec/chip"}))


def bench_rf_lw(batch: int, mode: str):
    from cycle_depth_estimation_tpu.models.ptq import quantize_for_serving
    from cycle_depth_estimation_tpu.models.refinenet import ResNetLW

    h, w = 192, 576
    net = ResNetLW(layers=(3, 4, 23, 3), dtype=jnp.bfloat16)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vs = net.init(jax.random.key(0), jnp.zeros((1, h, w, 3), jnp.float32),
                      "real")
        calib = _calib_imgs(1, h, w)
        sites, serve = quantize_for_serving(net, vs, (calib, "real"))
    dev = jax.devices()[0]
    vs = jax.device_put(vs, dev)
    x0 = jax.device_put(_calib_imgs(batch, h, w).astype(jnp.bfloat16), dev)

    if mode == "int8":
        sites = jax.device_put(sites, dev)
        fast = jax.jit(lambda v, s, a: serve(v, s, a, "real")[1])
    else:
        fast = jax.jit(lambda v, s, a: net.apply(v, a, "real")[1])

    # output (depth map at 1/2) has a different shape than the input —
    # chain via a scalar perturbation to keep the data dependency
    def step(a):
        pred = fast(vs, sites, a) if mode == "int8" else fast(vs, None, a)
        return x0 * (1.0 + 1e-6 * jnp.tanh(jnp.mean(
            pred.astype(jnp.float32)))).astype(jnp.bfloat16)

    ips = _measure(step, x0)
    print(json.dumps({"metric": f"rf_lw101_depth_inference_576x192_{mode}",
                      "value": round(ips, 2), "unit": "images/sec/chip"}))


def bench_s2d(batch: int, mode: str, min_width: int = 0):
    """The new_multi S2D real-image depth-serving chain G_2('R')→R_D at
    576×192 (model5.py:376-413 eval path; G_1 only feeds the synthetic
    branch, so production depth inference on camera images is G_2+R_D).

    ``min_width``: quantize only conv sites whose in AND out channels are
    ≥ this (measurement knob — DenseNet's narrow growth-32 convs underfill
    the int8 MXU and can cancel the win)."""
    from cycle_depth_estimation_tpu.models.ptq import (
        calibrate_model,
        default_predicate,
        int8_apply,
    )
    from cycle_depth_estimation_tpu.models.s2d_networks import GeneralNet, RDep

    h, w = 192, 576
    g2 = GeneralNet(dtype=jnp.bfloat16)
    rd = RDep(dtype=jnp.bfloat16)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x0 = jnp.zeros((1, h, w, 3), jnp.float32)
        vg2 = g2.init(jax.random.key(0), x0, "R")
        calib = _calib_imgs(1, h, w)
        psp, feats = g2.apply(vg2, calib, "R")
        vrd = rd.init(jax.random.key(1), feats, psp)
        def pred(key, m):
            if not default_predicate(key, m):
                return False
            if min_width:
                k = m.variables["params"]["kernel"]
                return k.shape[2] >= min_width and k.shape[3] >= min_width
            return True

        if mode == "int8":
            s_g2 = calibrate_model(lambda a: g2.apply(vg2, a, "R"), calib,
                                   predicate=pred)
            s_rd = calibrate_model(lambda f, p: rd.apply(vrd, f, p),
                                   feats, psp, predicate=pred)
    dev = jax.devices()[0]
    vg2, vrd = jax.device_put(vg2, dev), jax.device_put(vrd, dev)
    x0 = jax.device_put(_calib_imgs(batch, h, w).astype(jnp.bfloat16), dev)

    if mode == "int8":
        s_g2, s_rd = jax.device_put(s_g2, dev), jax.device_put(s_rd, dev)

        def infer(a):
            psp_, feats_ = int8_apply(
                lambda b: g2.apply(vg2, b, "R"), s_g2, a)
            _, _, (_, dep) = int8_apply(
                lambda f, p: rd.apply(vrd, f, p), s_rd, feats_, psp_)
            return dep

        fast = jax.jit(infer)
    else:
        def infer(a):
            psp_, feats_ = g2.apply(vg2, a, "R")
            _, _, (_, dep) = rd.apply(vrd, feats_, psp_)
            return dep

        fast = jax.jit(infer)

    def step(a):
        dep = fast(a)
        return x0 * (1.0 + 1e-6 * jnp.tanh(jnp.mean(
            dep.astype(jnp.float32)))).astype(jnp.bfloat16)

    ips = _measure(step, x0)
    tag = mode + (f"_minw{min_width}" if min_width else "")
    print(json.dumps({"metric": f"s2d_depth_inference_576x192_{tag}",
                      "value": round(ips, 2), "unit": "images/sec/chip"}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", choices=["unet", "rf_lw", "s2d"], required=True)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--mode", choices=["int8", "bf16"], default="int8")
    ap.add_argument("--quantize-transpose", action="store_true",
                    help="also quantize ConvTranspose sites (measurement)")
    ap.add_argument("--min-width", type=int, default=0,
                    help="s2d: quantize only convs with in/out chans >= N")
    args = ap.parse_args()
    if args.net == "unet":
        bench_unet(args.batch or 64, args.mode, args.quantize_transpose)
    elif args.net == "s2d":
        bench_s2d(args.batch or 8, args.mode, args.min_width)
    else:
        bench_rf_lw(args.batch or 8, args.mode)


if __name__ == "__main__":
    main()
