"""Network-level tests: output shapes + end-to-end checkpoint-import parity.

The torch builders below construct nets with the same architecture and the
same ``state_dict`` naming as reference models/networks.py (Sequential
indices), so `utils.torch_import` is exercised against the exact key layout
real reference ``.pth`` files have.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from cycle_depth_estimation_tpu.models.networks import (
    NLayerDiscriminator,
    PixelDiscriminator,
    ResnetGenerator,
    UnetGenerator,
    define_D,
    define_G,
    gan_loss,
)
from cycle_depth_estimation_tpu.utils.torch_import import (
    import_nlayer_discriminator,
    import_resnet_generator,
    import_unet_generator,
)

RNG = np.random.RandomState(1)


def rand_img(n, h, w, c=3):
    return RNG.randn(n, h, w, c).astype(np.float32)


def nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# torch builders with reference state-dict naming
# ---------------------------------------------------------------------------

def build_torch_resnet_g(in_c, out_c, ngf, n_blocks):
    """Reference-shaped ResnetGenerator (instance norm, reflect pad)."""

    def IN(c):
        return tnn.InstanceNorm2d(c, affine=False, track_running_stats=False)

    class Block(tnn.Module):
        def __init__(self, d):
            super().__init__()
            self.conv_block = tnn.Sequential(
                tnn.ReflectionPad2d(1), tnn.Conv2d(d, d, 3), IN(d), tnn.ReLU(True),
                tnn.ReflectionPad2d(1), tnn.Conv2d(d, d, 3), IN(d),
            )

        def forward(self, x):
            return x + self.conv_block(x)

    layers = [tnn.ReflectionPad2d(3), tnn.Conv2d(in_c, ngf, 7), IN(ngf), tnn.ReLU(True)]
    for i in range(2):
        m = 2 ** i
        layers += [tnn.Conv2d(ngf * m, ngf * m * 2, 3, 2, 1), IN(ngf * m * 2), tnn.ReLU(True)]
    layers += [Block(ngf * 4) for _ in range(n_blocks)]
    for i in range(2):
        m = 2 ** (2 - i)
        layers += [tnn.ConvTranspose2d(ngf * m, ngf * m // 2, 3, 2, 1, output_padding=1),
                   IN(ngf * m // 2), tnn.ReLU(True)]
    layers += [tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, out_c, 7), tnn.Tanh()]
    net = tnn.Module()
    net.model = tnn.Sequential(*layers)
    net.forward = lambda x: net.model(x)
    return net


def build_torch_nlayer_d(in_c, ndf, n_layers=3):
    def IN(c):
        return tnn.InstanceNorm2d(c, affine=False, track_running_stats=False)

    layers = [tnn.Conv2d(in_c, ndf, 4, 2, 1), tnn.LeakyReLU(0.2, True)]
    m = 1
    for n in range(1, n_layers):
        mp, m = m, min(2 ** n, 8)
        layers += [tnn.Conv2d(ndf * mp, ndf * m, 4, 2, 1), IN(ndf * m), tnn.LeakyReLU(0.2, True)]
    mp, m = m, min(2 ** n_layers, 8)
    layers += [tnn.Conv2d(ndf * mp, ndf * m, 4, 1, 1), IN(ndf * m), tnn.LeakyReLU(0.2, True),
               tnn.Conv2d(ndf * m, 1, 4, 1, 1)]
    net = tnn.Module()
    net.model = tnn.Sequential(*layers)
    net.forward = lambda x: net.model(x)
    return net


def build_torch_unet_g(in_c, out_c, num_downs, ngf, norm="batch"):
    """Reference-shaped recursive U-Net (models/networks.py:243-316)."""
    use_bias = norm == "instance"

    def N(c):
        if norm == "batch":
            return tnn.BatchNorm2d(c)
        return tnn.InstanceNorm2d(c, affine=False, track_running_stats=False)

    class SkipBlock(tnn.Module):
        def __init__(self, outer, inner, input_nc=None, sub=None, outermost=False,
                     innermost=False):
            super().__init__()
            self.outermost = outermost
            input_nc = input_nc if input_nc is not None else outer
            down_conv = tnn.Conv2d(input_nc, inner, 4, 2, 1, bias=use_bias)
            if outermost:
                up = tnn.ConvTranspose2d(inner * 2, outer, 4, 2, 1)
                seq = [down_conv, sub, tnn.ReLU(True), up, tnn.Tanh()]
            elif innermost:
                up = tnn.ConvTranspose2d(inner, outer, 4, 2, 1, bias=use_bias)
                seq = [tnn.LeakyReLU(0.2, True), down_conv, tnn.ReLU(True), up, N(outer)]
            else:
                up = tnn.ConvTranspose2d(inner * 2, outer, 4, 2, 1, bias=use_bias)
                seq = [tnn.LeakyReLU(0.2, True), down_conv, N(inner), sub,
                       tnn.ReLU(True), up, N(outer)]
            self.model = tnn.Sequential(*seq)

        def forward(self, x):
            if self.outermost:
                return self.model(x)
            return torch.cat([x, self.model(x)], 1)

    blk = SkipBlock(ngf * 8, ngf * 8, innermost=True)
    for _ in range(num_downs - 5):
        blk = SkipBlock(ngf * 8, ngf * 8, sub=blk)
    blk = SkipBlock(ngf * 4, ngf * 8, sub=blk)
    blk = SkipBlock(ngf * 2, ngf * 4, sub=blk)
    blk = SkipBlock(ngf, ngf * 2, sub=blk)
    blk = SkipBlock(out_c, ngf, input_nc=in_c, sub=blk, outermost=True)
    net = tnn.Module()
    net.model = blk
    net.forward = lambda x: net.model(x)
    return net


# ---------------------------------------------------------------------------
# shape tests
# ---------------------------------------------------------------------------

def test_resnet_generator_shape():
    g = ResnetGenerator(output_nc=3, ngf=8, n_blocks=2)
    x = jnp.zeros((2, 64, 64, 3))
    params = g.init(jax.random.key(0), x)
    y = g.apply(params, x)
    assert y.shape == (2, 64, 64, 3)


@pytest.mark.parametrize("num_downs,size", [(7, 128), (8, 256)])
def test_unet_generator_shape(num_downs, size):
    g = UnetGenerator(output_nc=3, num_downs=num_downs, ngf=4, norm="instance")
    x = jnp.zeros((1, size, size, 3))
    params = g.init(jax.random.key(0), x)
    y = g.apply(params, x)
    assert y.shape == (1, size, size, 3)


def test_nlayer_discriminator_shape():
    d = NLayerDiscriminator(ndf=8)
    x = jnp.zeros((2, 256, 256, 3))
    params = d.init(jax.random.key(0), x)
    y = d.apply(params, x)
    # 70x70 PatchGAN on 256 input → 30x30 patch map
    assert y.shape == (2, 30, 30, 1)


def test_pixel_discriminator_shape():
    d = PixelDiscriminator(ndf=8)
    x = jnp.zeros((2, 32, 32, 3))
    params = d.init(jax.random.key(0), x)
    assert d.apply(params, x).shape == (2, 32, 32, 1)


def test_define_factories():
    assert isinstance(define_G(3, 8, "resnet_9blocks"), ResnetGenerator)
    assert isinstance(define_G(3, 8, "unet_256"), UnetGenerator)
    assert isinstance(define_D(8, "basic"), NLayerDiscriminator)
    assert isinstance(define_D(8, "pixel"), PixelDiscriminator)


# ---------------------------------------------------------------------------
# end-to-end import parity
# ---------------------------------------------------------------------------

def test_resnet_generator_parity_vs_torch():
    torch.manual_seed(0)
    tg = build_torch_resnet_g(3, 3, ngf=8, n_blocks=2).eval()
    x = rand_img(2, 32, 48)
    with torch.no_grad():
        ref = tg(nchw(x))
    params = import_resnet_generator(tg.state_dict(), n_blocks=2)
    g = ResnetGenerator(output_nc=3, ngf=8, n_blocks=2)
    out = g.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=2e-5, rtol=1e-4)


def test_nlayer_discriminator_parity_vs_torch():
    torch.manual_seed(1)
    td = build_torch_nlayer_d(3, ndf=8).eval()
    x = rand_img(2, 64, 64)
    with torch.no_grad():
        ref = td(nchw(x))
    params = import_nlayer_discriminator(td.state_dict())
    d = NLayerDiscriminator(ndf=8)
    out = d.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("norm", ["instance", "batch"])
def test_unet_generator_parity_vs_torch(norm):
    torch.manual_seed(2)
    num_downs = 6
    tg = build_torch_unet_g(3, 3, num_downs, ngf=4, norm=norm).eval()
    x = rand_img(2, 64, 64)
    with torch.no_grad():
        ref = tg(nchw(x))
    variables = import_unet_generator(tg.state_dict(), num_downs=num_downs, norm=norm)
    g = UnetGenerator(output_nc=3, num_downs=num_downs, ngf=4, norm=norm)
    out = g.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=2e-5, rtol=1e-4)


def test_gan_loss_matches_torch():
    x = RNG.randn(2, 5, 5, 1).astype(np.float32)
    t = torch.from_numpy(x)
    mse = tnn.MSELoss()(t, torch.ones_like(t)).item()
    assert np.isclose(float(gan_loss(jnp.asarray(x), True, "lsgan")), mse, atol=1e-6)
    bce = tnn.BCEWithLogitsLoss()(t, torch.zeros_like(t)).item()
    assert np.isclose(float(gan_loss(jnp.asarray(x), False, "vanilla")), bce, atol=1e-6)
