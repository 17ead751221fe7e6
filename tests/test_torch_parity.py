"""Layer-level numerical parity vs torch (CPU).

Each framework primitive must match its torch counterpart to ~1e-5 so that
imported reference ``.pth`` checkpoints (SURVEY.md §5 checkpoint/resume) are
numerically equivalent end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from cycle_depth_estimation_tpu.ops import (
    Conv,
    ConvTranspose,
    InstanceNorm,
    avg_pool,
    max_pool,
    pixel_shuffle,
    reflect_pad,
    resize_bilinear,
    resize_nearest,
)
from cycle_depth_estimation_tpu.utils.torch_import import (
    convert_conv_weight,
    convert_convT_weight,
)

RNG = np.random.RandomState(0)


def nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def rand(*shape):
    return RNG.randn(*shape).astype(np.float32)


@pytest.mark.parametrize("k,s,p", [(7, 1, 0), (3, 2, 1), (4, 2, 1), (4, 1, 1), (1, 1, 0)])
def test_conv_matches_torch(k, s, p):
    x = rand(2, 16, 12, 5)
    w = rand(7, 5, k, k)  # torch OIHW
    b = rand(7)
    ref = F.conv2d(nchw(x), torch.from_numpy(w), torch.from_numpy(b), stride=s, padding=p)
    mod = Conv(7, k, stride=s, padding=p, use_bias=True)
    params = {"params": {"kernel": convert_conv_weight(w), "bias": b}}
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k,s,p,op", [(3, 2, 1, 1), (4, 2, 1, 0)])
def test_conv_transpose_matches_torch(k, s, p, op):
    x = rand(2, 9, 7, 6)
    w = rand(6, 4, k, k)  # torch ConvTranspose2d layout (I, O, kH, kW)
    b = rand(4)
    ref = F.conv_transpose2d(
        nchw(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=s, padding=p, output_padding=op,
    )
    mod = ConvTranspose(4, k, stride=s, padding=p, output_padding=op)
    params = {"params": {"kernel": convert_convT_weight(w), "bias": b}}
    out = mod.apply(params, jnp.asarray(x))
    assert out.shape == to_nhwc(ref).shape
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-5, rtol=1e-5)


def test_instance_norm_matches_torch():
    x = rand(3, 10, 11, 4) * 5 + 2
    ref = torch.nn.InstanceNorm2d(4, affine=False, track_running_stats=False)(nchw(x))
    out = InstanceNorm().apply({}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-5, rtol=1e-4)


def test_reflect_pad_matches_torch():
    x = rand(1, 6, 5, 2)
    ref = torch.nn.ReflectionPad2d(3)(nchw(x))
    out = reflect_pad(jnp.asarray(x), 3)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=0, rtol=0)


def test_avg_max_pool_match_torch():
    x = rand(2, 8, 8, 3)
    ref_a = torch.nn.AvgPool2d(2, 2)(nchw(x))
    ref_m = torch.nn.MaxPool2d(3, 2, padding=1)(nchw(x))
    np.testing.assert_allclose(
        np.asarray(avg_pool(jnp.asarray(x), 2, 2)), to_nhwc(ref_a), atol=1e-6, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(max_pool(jnp.asarray(x), 3, 2, padding=1)), to_nhwc(ref_m), atol=0, rtol=0
    )


def test_pixel_shuffle_matches_torch():
    x = rand(2, 3, 4, 8)
    ref = torch.nn.PixelShuffle(2)(nchw(x))
    out = pixel_shuffle(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=0, rtol=0)


@pytest.mark.parametrize("align", [False, True])
def test_resize_bilinear_matches_torch(align):
    x = rand(2, 7, 9, 3)
    ref = F.interpolate(nchw(x), size=(14, 18), mode="bilinear", align_corners=align)
    out = resize_bilinear(jnp.asarray(x), (14, 18), align_corners=align)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-5, rtol=1e-5)


def test_resize_nearest_matches_torch():
    x = rand(2, 5, 6, 3)
    ref = F.interpolate(nchw(x), size=(10, 12), mode="nearest")
    out = resize_nearest(jnp.asarray(x), (10, 12))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=0, rtol=0)


@pytest.mark.parametrize("k,s,p,op", [(3, 2, 1, 1), (4, 2, 1, 0), (4, 2, 1, 1),
                                      (3, 2, 1, 0)])
def test_conv_transpose_phase_impl_matches_torch(k, s, p, op):
    """The opt-in phase (subpixel) decomposition is exact too."""
    x = rand(2, 9, 7, 6)
    w = rand(6, 4, k, k)
    b = rand(4)
    ref = F.conv_transpose2d(nchw(x), torch.from_numpy(w), torch.from_numpy(b),
                             stride=s, padding=p, output_padding=op)
    mod = ConvTranspose(4, k, stride=s, padding=p, output_padding=op,
                        impl="phases")
    params = {"params": {"kernel": convert_convT_weight(w), "bias": b}}
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-5, rtol=1e-5)


def test_conv3x3_reflect_fused_matches_pad_conv():
    from cycle_depth_estimation_tpu.ops.layers import conv3x3_reflect

    x = rand(2, 9, 13, 5)
    w = rand(4, 5, 3, 3)
    ref = F.conv2d(torch.nn.ReflectionPad2d(1)(nchw(x)), torch.from_numpy(w))
    out = conv3x3_reflect(jnp.asarray(x), jnp.asarray(convert_conv_weight(w)))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-5,
                               rtol=1e-5)


def test_bce_backward_matches_torch_and_is_finite_at_saturation():
    """torch BCELoss clamps its backward denominator (ATen
    binary_cross_entropy_backward: (p-t)/clamp_min(p(1-p), 1e-12)); the
    naive autodiff of the clamped-log forward NaNs at p∈{0,1} instead —
    exactly where masked-out sites and bf16-saturated tanh outputs live.
    models/s2d_networks._bce carries a custom VJP with the torch backward."""
    import jax
    import jax.numpy as jnp

    from cycle_depth_estimation_tpu.models.s2d_networks import _bce

    p = np.array([0.0, 1.0, 0.3, 0.9, 1e-30], np.float32)
    t = np.array([0.0, 1.0, 1.0, 0.2, 1.0], np.float32)
    tp = torch.tensor(p, requires_grad=True)
    loss = torch.nn.BCELoss()(tp, torch.tensor(t))
    loss.backward()
    ours_v = float(_bce(jnp.asarray(p), jnp.asarray(t)))
    ours_g = np.asarray(jax.grad(_bce)(jnp.asarray(p), jnp.asarray(t)))
    assert np.isclose(ours_v, float(loss.detach()), atol=1e-6)
    assert np.isfinite(ours_g).all()
    np.testing.assert_allclose(ours_g, tp.grad.numpy(), rtol=1e-5, atol=1e-6)


def test_reflect_pad_explicit_tuple():
    """Conv's documented explicit ((top,bottom),(left,right)) padding works
    with padding_mode='reflect' too (review fix: reflect branch crashed)."""
    from cycle_depth_estimation_tpu.ops.layers import reflect_pad

    x = jnp.asarray(rand(1, 5, 6, 2))
    got = reflect_pad(x, ((1, 2), (0, 3)))
    ref = np.pad(np.asarray(x), ((0, 0), (1, 2), (0, 3), (0, 0)),
                 mode="reflect")
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_resize_bilinear_downscale_matches_torch():
    """align_corners=False downscale: torch does NOT antialias (review fix —
    jax.image.resize defaults antialias=True)."""
    from cycle_depth_estimation_tpu.ops.layers import resize_bilinear

    x = rand(1, 8, 8, 3)
    ref = F.interpolate(nchw(x), size=(3, 5), mode="bilinear",
                        align_corners=False)
    out = resize_bilinear(jnp.asarray(x), (3, 5), align_corners=False)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-5,
                               rtol=1e-5)


def test_resize_bilinear_mm_matches_gather_and_torch():
    """The MXU-matmul resize (ops/layers.resize_bilinear_mm, used when
    CDE_RESIZE_MM=1) carries exactly the endpoint-aligned two-tap weights:
    parity vs the gather form AND vs torch F.interpolate(align_corners=True),
    up/down-scale, odd sizes."""
    import torch
    import torch.nn.functional as tF

    from cycle_depth_estimation_tpu.ops.layers import resize_bilinear_mm

    rng = np.random.RandomState(3)
    for (h, w), (oh, ow) in (((7, 9), (14, 18)), ((24, 36), (5, 7)),
                             ((1, 9), (4, 18)), ((6, 6), (6, 6))):
        x = rng.randn(2, h, w, 5).astype(np.float32)
        mm = np.asarray(resize_bilinear_mm(jnp.asarray(x), (oh, ow)))
        ga = np.asarray(resize_bilinear(jnp.asarray(x), (oh, ow),
                                        align_corners=True))
        np.testing.assert_allclose(mm, ga, atol=1e-5, rtol=1e-5)
        ref = tF.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                             (oh, ow), mode="bilinear", align_corners=True)
        np.testing.assert_allclose(mm, ref.permute(0, 2, 3, 1).numpy(),
                                   atol=1e-5, rtol=1e-5)
        # half-pixel mode (rf_lw ×2 head, PSP priors) vs torch
        mm0 = np.asarray(resize_bilinear_mm(jnp.asarray(x), (oh, ow),
                                            align_corners=False))
        ref0 = tF.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                              (oh, ow), mode="bilinear", align_corners=False)
        np.testing.assert_allclose(mm0, ref0.permute(0, 2, 3, 1).numpy(),
                                   atol=1e-5, rtol=1e-5)
