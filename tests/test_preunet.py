"""_PreUNet16 parity: a torch oracle with the reference's exact structure and
state-dict naming (reference models/seg_network.py:353-439) drives both the
importer mapping and the flax PreUNet16 forward semantics. The VGG16 encoder
channel plan is fixed by torchvision, so the oracle runs at full width on a
small spatial input."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn as tnn

from cycle_depth_estimation_tpu.models.seg_network import PreUNet16
from cycle_depth_estimation_tpu.utils.torch_import import import_preunet16

RNG = np.random.RandomState(7)


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            n = mod.num_features
            mod.running_mean.copy_(torch.from_numpy(
                RNG.randn(n).astype(np.float32) * 0.1))
            mod.running_var.copy_(torch.from_numpy(
                RNG.rand(n).astype(np.float32) * 0.5 + 0.5))
            mod.weight.data.copy_(torch.from_numpy(
                RNG.randn(n).astype(np.float32) * 0.1 + 1.0))
            mod.bias.data.copy_(torch.from_numpy(
                RNG.randn(n).astype(np.float32) * 0.1))


class TInception(tnn.Module):
    """reference _InceptionBlock (models/seg_network.py:155-189)."""

    def __init__(self, nc, nonlinearity, width, use_bias):
        super().__init__()
        self.width = width
        for i in range(width):
            setattr(self, f"layer{i}", tnn.Sequential(
                tnn.ReflectionPad2d(i * 2 + 1),
                tnn.Conv2d(nc, nc, 3, dilation=i * 2 + 1, bias=use_bias)))
        self.norm1 = tnn.BatchNorm2d(nc * width)
        self.norm2 = tnn.BatchNorm2d(nc)
        self.nonlinearity = nonlinearity
        self.branch1x1 = tnn.Sequential(
            tnn.ReflectionPad2d(1),
            tnn.Conv2d(nc * width, nc, 3, bias=use_bias))

    def forward(self, x):
        out = torch.cat([getattr(self, f"layer{i}")(x)
                         for i in range(self.width)], 1)
        out = self.nonlinearity(self.norm1(out))
        out = self.norm2(self.branch1x1(out))
        return self.nonlinearity(out + x)


class TDecUp(tnn.Module):
    """reference _DecoderUpBlock (models/seg_network.py:247-264)."""

    def __init__(self, i, m, o, nonlinearity, use_bias):
        super().__init__()
        self.model = tnn.Sequential(
            tnn.ReflectionPad2d(1), tnn.Conv2d(i, m, 3, bias=use_bias),
            tnn.BatchNorm2d(m), nonlinearity,
            tnn.ConvTranspose2d(m, o, 3, 2, 1, 1), tnn.BatchNorm2d(o),
            nonlinearity)

    def forward(self, x):
        return self.model(x)


class TOut(tnn.Module):
    """reference _OutputBlock (models/seg_network.py:267-280)."""

    def __init__(self, i, o, k, use_bias):
        super().__init__()
        self.model = tnn.Sequential(
            tnn.ReflectionPad2d(k // 2), tnn.Conv2d(i, o, k, bias=use_bias),
            tnn.Tanh())

    def forward(self, x):
        return self.model(x)


class TPreUNet16(tnn.Module):
    """reference _PreUNet16 at layers=4 with an untrained VGG16-features
    encoder (the reference's ``models.vgg16().features`` layout)."""

    def __init__(self, output_nc, ngf=64):
        super().__init__()
        use_bias = False  # norm='batch'
        prelu = tnn.PReLU()
        relu = tnn.ReLU(inplace=True)
        self.pool = tnn.MaxPool2d(2, 2)
        self.conv1 = tnn.Sequential(tnn.Conv2d(3, 64, 3, padding=1), relu,
                                    tnn.Conv2d(64, 64, 3, padding=1), relu)
        self.conv2 = tnn.Sequential(tnn.Conv2d(64, 128, 3, padding=1), relu,
                                    tnn.Conv2d(128, 128, 3, padding=1), relu)
        self.conv3 = tnn.Sequential(
            tnn.Conv2d(128, 256, 3, padding=1), relu,
            tnn.Conv2d(256, 256, 3, padding=1), relu,
            tnn.Conv2d(256, 256, 3, padding=1), relu)
        self.conv4 = tnn.Sequential(
            tnn.Conv2d(256, 512, 3, padding=1), relu,
            tnn.Conv2d(512, 512, 3, padding=1), relu,
            tnn.Conv2d(512, 512, 3, padding=1), relu)
        center = [TInception(ngf * 8, prelu, 3, use_bias) for _ in range(3)]
        center += [TDecUp(ngf * 8, ngf * 8, ngf * 4, prelu, use_bias)]
        self.center = tnn.Sequential(*center)
        self.deconv4 = TDecUp(ngf * 8, ngf * 8, ngf * 2, prelu, use_bias)
        self.deconv3 = TDecUp(ngf * 4 + output_nc, ngf * 4, ngf, prelu,
                              use_bias)
        self.deconv2 = TDecUp(ngf * 2 + output_nc, ngf * 2, ngf // 2, prelu,
                              use_bias)
        self.deconv1 = TOut(ngf // 2 + output_nc, output_nc, 7, use_bias)
        self.output4 = TOut(ngf * 8, output_nc, 3, use_bias)
        self.output3 = TOut(ngf * 4 + output_nc, output_nc, 3, use_bias)
        self.output2 = TOut(ngf * 2 + output_nc, output_nc, 3, use_bias)
        self.upsample = tnn.Upsample(scale_factor=2, mode="bilinear",
                                     align_corners=True)

    def forward(self, x):
        conv1 = self.pool(self.conv1(x))
        conv2 = self.pool(self.conv2(conv1))
        conv3 = self.pool(self.conv3(conv2))
        center_in = self.pool(self.conv4(conv3))
        result = [center_in]
        center_out = self.center(center_in)
        cat4 = torch.cat([center_out, conv3 * 0.1], 1)
        deconv4 = self.deconv4(cat4)
        output4 = self.output4(cat4)
        result.append(output4)
        cat3 = torch.cat([deconv4, conv2 * 0.05, self.upsample(output4)], 1)
        deconv3 = self.deconv3(cat3)
        output3 = self.output3(cat3)
        result.append(output3)
        cat2 = torch.cat([deconv3, conv1 * 0.01, self.upsample(output3)], 1)
        deconv2 = self.deconv2(cat2)
        output2 = self.output2(cat2)
        result.append(output2)
        result.append(self.deconv1(
            torch.cat([deconv2, self.upsample(output2)], 1)))
        return result


def test_preunet16_import_parity():
    nc = 5
    tnet = TPreUNet16(nc)
    with torch.no_grad():
        _randomize_bn(tnet)
        tnet.eval()
        # /16 feature map must exceed the width-3 inception's dilation-5
        # reflect pad -> spatial >= 96
        x = RNG.rand(1, 3, 96, 128).astype(np.float32) * 2 - 1
        touts = tnet(torch.from_numpy(x))

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    variables = import_preunet16(sd)
    net = PreUNet16(output_nc=nc)
    outs = net.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    assert len(outs) == 5
    for mine, ref in zip(outs, touts):
        ref = ref.numpy().transpose(0, 2, 3, 1)
        assert mine.shape == ref.shape
        np.testing.assert_allclose(np.asarray(mine, np.float32), ref,
                                   atol=2e-4, rtol=1e-3)


def test_preunet16_factory_and_shapes():
    from cycle_depth_estimation_tpu.models.seg_network import define_task_G

    net = define_task_G(model_type="PreUNet16", output_nc=4)
    assert isinstance(net, PreUNet16)
    with pytest.raises(NotImplementedError):
        PreUNet16(output_nc=4, layers=5).init(
            __import__("jax").random.key(0), jnp.zeros((1, 32, 32, 3)))
