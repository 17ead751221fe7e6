"""Int8 generator path: weight quantization, dynamic + calibrated static
activation scales, fp32 tracking."""

import numpy as np

import jax
import jax.numpy as jnp

from cycle_depth_estimation_tpu.models.networks import ResnetGenerator
from cycle_depth_estimation_tpu.models.quantization import (
    Int8ResnetGenerator,
    calibrate,
    int8_generator_variables,
    quantize_conv_params,
)


def _setup(n_blocks=2, ngf=8):
    g = ResnetGenerator(output_nc=3, ngf=ngf, n_blocks=n_blocks)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3) * 2 - 1,
                    jnp.float32)
    vs = g.init(jax.random.key(0), x)
    gq = Int8ResnetGenerator(output_nc=3, ngf=ngf, n_blocks=n_blocks)
    return g, gq, vs, x


def _cos(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_weight_quantization_roundtrip():
    w = np.random.RandomState(1).randn(3, 3, 4, 8).astype(np.float32)
    q = quantize_conv_params({"kernel": w, "bias": np.zeros(8, np.float32)})
    assert q["kernel_q"].dtype == np.int8
    deq = q["kernel_q"].astype(np.float32) * q["scale"]
    # per-channel symmetric quantization: ≤ half-step error
    assert np.max(np.abs(deq - w)) <= np.max(q["scale"]) * 0.5 + 1e-7


def test_int8_dynamic_tracks_fp32():
    g, gq, vs, x = _setup()
    y_fp = g.apply(vs, x)
    y_q = gq.apply(int8_generator_variables(vs["params"]), x)
    assert _cos(y_q, y_fp) > 0.999


def test_int8_calibrated_static_tracks_fp32():
    g, gq, vs, x = _setup()
    y_fp = g.apply(vs, x)
    dyn_vars = int8_generator_variables(vs["params"])
    static_vars = calibrate(gq, dyn_vars, x)
    # every site now carries a static scale → no runtime reductions
    q = static_vars["qparams"]
    assert "act_scale" in q["conv_in"] and "act_scale" in q["block0"]["conv1"]
    y_q = gq.apply(static_vars, x)
    assert _cos(y_q, y_fp) > 0.999
    # and on a fresh (non-calibration) input
    x2 = jnp.asarray(np.random.RandomState(2).rand(1, 32, 32, 3) * 2 - 1,
                     jnp.float32)
    assert _cos(gq.apply(static_vars, x2), g.apply(vs, x2)) > 0.995
