"""Int8 generator path: weight quantization, dynamic + calibrated static
activation scales, fp32 tracking."""

import numpy as np

import jax
import jax.numpy as jnp

from cycle_depth_estimation_tpu.models.networks import ResnetGenerator
from cycle_depth_estimation_tpu.models.quantization import (
    Int8ResnetGenerator,
    calibrate,
    fused_int8_apply,
    fused_int8_variables,
    int8_generator_variables,
    quantize_conv_params,
    synthetic_calibration_batch,
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


def test_int8_fused_tracks_fp32_all_up_modes():
    """The fused serving path (IN-invariance dequant elision + fused
    epilogues; models/quantization.py fused_int8_apply) matches fp32 at the
    same fidelity as v1, for every up-stage mode."""
    g, gq, vs, x = _setup()
    y_fp = g.apply(vs, x)
    static = calibrate(gq, int8_generator_variables(vs["params"]), x)
    fused = fused_int8_variables(static)
    for mode in ("bf16", "int8_dilated", "int8_phases"):
        y = fused_int8_apply(fused, x, n_blocks=2, up_mode=mode)
        assert _cos(y, y_fp) > 0.999, mode
    # exact phase decomposition: dilated and phase int8 ups agree bit-exactly
    y_d = fused_int8_apply(fused, x, n_blocks=2, up_mode="int8_dilated")
    y_p = fused_int8_apply(fused, x, n_blocks=2, up_mode="int8_phases")
    np.testing.assert_array_equal(np.asarray(y_d, np.float32),
                                  np.asarray(y_p, np.float32))


def test_fused_epilogue_pallas_matches_xla():
    """Pallas (interpret on CPU) vs XLA epilogue: bit-identical int8."""
    from cycle_depth_estimation_tpu.ops.pallas.int8_epilogue import (
        fused_in_epilogue,
    )

    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randint(-30000, 30000, (2, 16, 16, 8)), jnp.int32)
    h = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.bfloat16)
    inv_s = jnp.float32(25.0)
    for kw in (dict(relu=True, pad=1), dict(relu=True, keep_float=True),
               dict(residual=h, pad=1), dict(residual=h)):
        qp, zp = fused_in_epilogue(y, inv_s, use_pallas=True, interpret=True,
                                   **kw)
        qx, zx = fused_in_epilogue(y, inv_s, use_pallas=False, **kw)
        np.testing.assert_array_equal(np.asarray(qp), np.asarray(qx))
        if zp is not None:
            np.testing.assert_array_equal(
                np.asarray(zp, np.float32), np.asarray(zx, np.float32))
    # float-only epilogue (bf16 up-stage mode)
    qn, zn = fused_in_epilogue(y, None, relu=True)
    assert qn is None and zn.shape == y.shape


def test_int8_fused_on_imported_torch_weights():
    """Int8 fidelity with the reference's real weight distribution: a torch
    generator with reference init (normal(0, 0.02), models/networks.py:40-61)
    imported through the .pth path, calibrated on structured images, fused
    int8 vs fp32 cosine (VERDICT round-1 weak #6)."""
    import torch

    from tools.convergence_compare import build_torch_resnet_g
    from cycle_depth_estimation_tpu.utils.torch_import import (
        import_resnet_generator,
    )

    torch.manual_seed(0)
    tg = build_torch_resnet_g(3, 3, ngf=8, n_blocks=2)
    for m in tg.modules():
        if isinstance(m, (torch.nn.Conv2d, torch.nn.ConvTranspose2d)):
            torch.nn.init.normal_(m.weight, 0.0, 0.02)
            if m.bias is not None:
                torch.nn.init.constant_(m.bias, 0.0)
    params = jax.tree.map(jnp.asarray, import_resnet_generator(
        {k: v.detach().numpy() for k, v in tg.state_dict().items()},
        n_blocks=2))

    g = ResnetGenerator(output_nc=3, ngf=8, n_blocks=2)
    gq = Int8ResnetGenerator(output_nc=3, ngf=8, n_blocks=2)
    calib = jnp.asarray(synthetic_calibration_batch(1, 2, 32))
    static = calibrate(gq, int8_generator_variables(params), calib)
    fused = fused_int8_variables(static)
    # on the calibration inputs: tight tracking (the reference init's
    # all-conv normal(0.02) drives slightly hotter activations than flax
    # init — measured 0.9987 here vs 0.9993 on flax-init nets)
    y_fp = g.apply({"params": params}, calib)
    y_q = fused_int8_apply(fused, calib, n_blocks=2)
    assert _cos(y_q, y_fp) > 0.998
    # on fresh structured inputs: generalization band (same bar as the
    # random-weight fresh-input test above)
    x = jnp.asarray(synthetic_calibration_batch(9, 2, 32))
    y_fp = g.apply({"params": params}, x)
    y_q = fused_int8_apply(fused, x, n_blocks=2)
    assert _cos(y_q, y_fp) > 0.995


def test_synthetic_calibration_batch():
    imgs = synthetic_calibration_batch(0, 2, 32)
    assert imgs.shape == (2, 32, 32, 3)
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0
    # structured, not white noise: strong spatial autocorrelation (white
    # noise gives ~0; at tiny 32² the fixed-cycle sinusoids alias to ~0.67)
    a = imgs[0, :, :-1, 0].ravel()
    b = imgs[0, :, 1:, 0].ravel()
    r = np.corrcoef(a, b)[0, 1]
    assert r > 0.5, r


def test_resize_conv_fast_serving_chain():
    """The TPU-first fast-serving architecture: ResnetGenerator(up_mode=
    'resize_conv') — nearest ×2 + dense 3×3 conv up stages — through the
    full int8 chain (calibrate → fuse → fused_int8_apply(up_mode=
    'resize_conv_int8')) tracks its fp32 forward. NON-parity with the
    reference's ConvTranspose topology by design (train with the variant);
    the int8 path is what gets served."""
    g = ResnetGenerator(output_nc=3, ngf=8, n_blocks=2,
                        up_mode="resize_conv")
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3) * 2 - 1,
                    jnp.float32)
    vs = g.init(jax.random.key(0), x)
    # up kernels are plain HWIO 3x3 convs now
    assert vs["params"]["up0_conv"]["kernel"].shape[:2] == (3, 3)
    y_fp = g.apply(vs, x)
    assert y_fp.shape == x.shape

    gq = Int8ResnetGenerator(output_nc=3, ngf=8, n_blocks=2,
                             up_mode="resize_conv")
    static = calibrate(gq, int8_generator_variables(vs["params"]), x)
    # v1 (bf16 resize+conv ups) tracks fp32
    assert _cos(gq.apply(static, x), y_fp) > 0.999
    fused = fused_int8_variables(static)
    y_q = fused_int8_apply(fused, x, n_blocks=2, up_mode="resize_conv_int8")
    assert _cos(y_q, y_fp) > 0.995
    # fresh input
    x2 = jnp.asarray(np.random.RandomState(5).rand(1, 32, 32, 3) * 2 - 1,
                     jnp.float32)
    assert _cos(fused_int8_apply(fused, x2, n_blocks=2,
                                 up_mode="resize_conv_int8"),
                g.apply(vs, x2)) > 0.99
