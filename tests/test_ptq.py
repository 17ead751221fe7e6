"""Generic PTQ (models/ptq.py): int8 serving for U-Net, RefineNet-LW and the
S2D inference chain via flax method interception — fp32 tracking + the
int8-site bookkeeping contracts."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from cycle_depth_estimation_tpu.models.networks import (
    ResnetGenerator,
    UnetGenerator,
)
from cycle_depth_estimation_tpu.models.ptq import (
    calibrate_model,
    default_predicate,
    int8_apply,
    quantize_for_serving,
)
from cycle_depth_estimation_tpu.ops import Conv, ConvTranspose


def _cos(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def _img(seed, n, h, w, c=3):
    return jnp.asarray(
        np.random.RandomState(seed).rand(n, h, w, c) * 2 - 1, jnp.float32)


# ---------------------------------------------------------------------------
# U-Net generator (pix2pix serving surface, reference networks.py:243-316)
# ---------------------------------------------------------------------------


def test_unet_int8_tracks_fp32():
    g = UnetGenerator(output_nc=3, num_downs=5, ngf=8, norm="batch")
    x = _img(0, 2, 32, 32)
    vs = g.init(jax.random.key(0), x)
    y_fp = g.apply(vs, x)
    sites, serve = quantize_for_serving(g, vs, (x,))
    # every down conv is quantized, every up ConvTranspose stays float
    assert len(sites) == 5
    assert all("down" in k for k in sites)
    y_q = jax.jit(serve)(vs, sites, x)
    assert y_q.shape == y_fp.shape
    assert _cos(y_q, y_fp) > 0.99


def test_unet_int8_transpose_opt_in():
    g = UnetGenerator(output_nc=3, num_downs=4, ngf=8, norm="batch")
    x = _img(1, 1, 32, 32)
    vs = g.init(jax.random.key(0), x)
    y_fp = g.apply(vs, x)
    pred = lambda key, m: isinstance(m, (Conv, ConvTranspose))  # noqa: E731
    sites, serve = quantize_for_serving(g, vs, (x,), predicate=pred)
    assert len(sites) == 8  # 4 downs + 4 ups
    y_q = serve(vs, sites, x)
    assert _cos(y_q, y_fp) > 0.99


# ---------------------------------------------------------------------------
# ResnetGenerator through the generic path (reflect-pad conv sites)
# ---------------------------------------------------------------------------


def test_resnet_generator_generic_int8_tracks_fp32():
    g = ResnetGenerator(output_nc=3, ngf=8, n_blocks=2)
    x = _img(2, 1, 32, 32)
    vs = g.init(jax.random.key(0), x)
    y_fp = g.apply(vs, x)
    sites, serve = quantize_for_serving(g, vs, (x,))
    # conv_in + 2 downs + 2 blocks×2 + conv_out; ups are ConvTranspose
    assert len(sites) == 8
    y_q = serve(vs, sites, x)
    assert _cos(y_q, y_fp) > 0.999


# ---------------------------------------------------------------------------
# RefineNet-LW inference (new_model/my_rf_lw.py serving surface)
# ---------------------------------------------------------------------------


def test_refinenet_int8_tracks_fp32():
    from cycle_depth_estimation_tpu.models.refinenet import ResNetLW

    net = ResNetLW(layers=(1, 1, 1, 1))
    x = _img(3, 1, 64, 96)
    vs = net.init(jax.random.key(0), x, "real")
    dep_fp, pred_fp, _ = net.apply(vs, x, "real")
    sites, serve = quantize_for_serving(net, vs, (x, "real"))
    assert len(sites) > 10
    dep_q, pred_q, _ = serve(vs, sites, x, "real")
    assert pred_q.shape == pred_fp.shape
    assert _cos(pred_q, pred_fp) > 0.99
    # domain-adapter parity: the 'syn' branch serves through the same sites
    _, pred_fp_s, _ = net.apply(vs, x, "syn")
    _, pred_q_s, _ = serve(vs, sites, x, "syn")
    assert _cos(pred_q_s, pred_fp_s) > 0.99


# ---------------------------------------------------------------------------
# Full S2D inference chain (new_multi eval path, model5.py:376-413)
# ---------------------------------------------------------------------------


def test_s2d_chain_int8_tracks_fp32():
    from cycle_depth_estimation_tpu.models.s2d_networks import (
        G1,
        GeneralNet,
        RDep,
    )

    h, w = 48, 96
    g1 = G1(n_blocks=1)
    g2 = GeneralNet(block_config=(2, 2, 2, 2))
    rd = RDep()
    x = _img(4, 1, h, w)
    vg1 = g1.init(jax.random.key(0), x)
    y = g1.apply(vg1, x)
    vg2 = g2.init(jax.random.key(1), y, "S")
    psp, feats = g2.apply(vg2, y, "S")
    vrd = rd.init(jax.random.key(2), feats, psp)
    _, seg_fp, (_, dep_fp) = rd.apply(vrd, feats, psp)

    s1 = calibrate_model(lambda a: g1.apply(vg1, a), x)
    s2 = calibrate_model(lambda a: g2.apply(vg2, a, "S"), y)
    s3 = calibrate_model(lambda f, p: rd.apply(vrd, f, p), feats, psp)

    y_q = int8_apply(lambda a: g1.apply(vg1, a), s1, x)
    psp_q, feats_q = int8_apply(lambda a: g2.apply(vg2, a, "S"), s2, y_q)
    _, seg_q, (_, dep_q) = int8_apply(
        lambda f, p: rd.apply(vrd, f, p), s3, feats_q, psp_q)
    assert _cos(dep_q, dep_fp) > 0.98
    assert _cos(seg_q, seg_fp) > 0.98
    # the quantization error must not flip the argmax segmentation for the
    # overwhelming majority of pixels
    agree = np.mean(np.argmax(np.asarray(seg_q), -1)
                    == np.argmax(np.asarray(seg_fp), -1))
    assert agree > 0.9


# ---------------------------------------------------------------------------
# Mechanism contracts
# ---------------------------------------------------------------------------


def test_shared_module_widens_scale():
    # the same bound conv applied twice with different input magnitudes must
    # calibrate to the wider of the two observed ranges
    from flax import linen as nn

    class Body(nn.Module):
        @nn.compact
        def __call__(self, x):
            c = Conv(4, 3, padding=1, name="c")
            return c(x) + c(10.0 * x)

    m = Body()
    x = _img(5, 1, 8, 8, 3)
    vs = m.init(jax.random.key(0), x)
    sites = calibrate_model(lambda a: m.apply(vs, a), x)
    assert len(sites) == 1
    (entry,) = sites.values()
    amax_one = float(jnp.max(jnp.abs(x)))
    assert float(entry["act_scale"]) >= 10.0 * amax_one / 127.0 * 0.999


def test_predicate_filters_sites():
    g = UnetGenerator(output_nc=3, num_downs=3, ngf=4, norm="batch")
    x = _img(6, 1, 16, 16)
    vs = g.init(jax.random.key(0), x)
    pred = lambda key, m: default_predicate(key, m) and "down0" not in key  # noqa: E731
    sites, serve = quantize_for_serving(g, vs, (x,), predicate=pred)
    assert all("down0" not in k for k in sites)
    y = serve(vs, sites, x)
    assert y.shape == (1, 16, 16, 3)


def test_sites_are_jit_arguments_not_constants():
    """Serving must work when sites arrive as jit arguments (donated /
    device-put), proving no tracer leaks through the interceptor closure."""
    g = UnetGenerator(output_nc=3, num_downs=3, ngf=4, norm="batch")
    x = _img(7, 1, 16, 16)
    vs = g.init(jax.random.key(0), x)
    sites, serve = quantize_for_serving(g, vs, (x,))
    fast = jax.jit(serve)
    y1 = fast(vs, sites, x)
    # perturb a quantized kernel through the ARGUMENT path; output must move
    sites2 = jax.tree.map(lambda a: a, sites)
    k = next(iter(sites2))
    sites2[k] = dict(sites2[k],
                     kernel_q=jnp.clip(sites2[k]["kernel_q"] + 3, -127, 127))
    y2 = fast(vs, sites2, x)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_ptq_on_real_reference_checkpoint():
    """Generic PTQ fidelity with REAL trained weights: the checked-in
    new_multi iter_4000_net_G_1.pth imported and served int8."""
    import os

    pth = "/root/reference/new_multi/checkpoints/iter_4000_net_G_1.pth"
    if not os.path.exists(pth):
        pytest.skip("reference checkpoint absent")
    from cycle_depth_estimation_tpu.models.quantization import (
        synthetic_calibration_batch,
    )
    from cycle_depth_estimation_tpu.models.s2d_networks import G1
    from cycle_depth_estimation_tpu.utils.torch_import import (
        import_g1,
        load_pth,
    )

    vs = jax.tree.map(jnp.asarray, import_g1(load_pth(pth)))
    g = G1()
    calib = jnp.asarray(synthetic_calibration_batch(5, 2, 96))
    x = jnp.asarray(synthetic_calibration_batch(6, 1, 96))
    y_fp = g.apply(vs, x, train=False)
    sites, serve = quantize_for_serving(g, vs, (calib,),
                                        calib_kwargs={"train": False})
    y_q = serve(vs, sites, x, train=False)
    assert _cos(y_q, y_fp) > 0.99
