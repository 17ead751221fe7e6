"""ResNetLW `.pth` import parity: a condensed torch oracle with the
reference's state-dict naming (new_model/my_rf_lw.py) drives both the
importer mapping and the ResNetLW forward semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from cycle_depth_estimation_tpu.models.refinenet import ResNetLW, Segd
from cycle_depth_estimation_tpu.utils.torch_import import import_resnetlw, import_segd

RNG = np.random.RandomState(21)


def conv1x1(i, o, bias=False):
    return tnn.Conv2d(i, o, 1, bias=bias)


def cbr(i, o, k):
    return tnn.Sequential(tnn.Conv2d(i, o, k, padding=k // 2, bias=False),
                          tnn.BatchNorm2d(o), tnn.ReLU6())


class TBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        h = tF.relu(self.bn1(self.conv1(x)))
        h = tF.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return tF.relu(h + r)


class TPSP(tnn.Module):
    def __init__(self, nin, nout):
        super().__init__()
        for i in range(4):
            d = 2 * i + 1
            setattr(self, f"{i + 1}_pspconv", tnn.Sequential(
                tnn.Conv2d(nin, nout // 4, 3, dilation=d, padding=d, bias=False),
                tnn.BatchNorm2d(nout // 4), tnn.ReLU6()))
        self.conv = tnn.Sequential(tnn.Conv2d(nin, nout, 1), tnn.BatchNorm2d(nout),
                                   tnn.ReLU6())

    def forward(self, x):
        s = [getattr(self, f"{i + 1}_pspconv")(x) for i in range(4)]
        return torch.cat(s, 1) + self.conv(x)


class TAT(tnn.Module):
    def __init__(self, c, out_c):
        super().__init__()
        self.attention_bs2 = tnn.Sequential(
            tnn.Conv2d(2 * c, 2 * c, 3, 2, padding=1), tnn.BatchNorm2d(2 * c),
            tnn.LeakyReLU(0.02), tnn.AdaptiveAvgPool2d(1))
        self.conv = conv1x1(2 * c, out_c)

    def forward(self, s, d):
        x = torch.cat([s, d], 1)
        return self.conv(torch.sigmoid(self.attention_bs2(x)) * x)


class TDep(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.upconv = tnn.ModuleList()
        self.depth_out = tnn.ModuleList()
        self.attention_bs = tnn.ModuleList()
        for _ in range(4):
            self.upconv.append(tnn.Sequential(
                tnn.ConvTranspose2d(c, c // 2, 4, 2, padding=1),
                tnn.LeakyReLU(0.02), tnn.BatchNorm2d(c // 2),
                tnn.Conv2d(c // 2, c // 2, 1), tnn.ReLU6(),
                tnn.BatchNorm2d(c // 2)))
            self.depth_out.append(tnn.Sequential(
                tnn.Conv2d(c // 2, 1, 3, padding=1), tnn.Tanh()))
            self.attention_bs.append(tnn.Sequential(
                tnn.Conv2d(c, c // 2, 3, 2, padding=1), tnn.ReLU6(),
                tnn.BatchNorm2d(c // 2), tnn.AdaptiveAvgPool2d(1)))
        self.conv = tnn.Sequential(tnn.Conv2d(2 * c, c // 2, 3, padding=1),
                                   tnn.LeakyReLU(0.02), tnn.BatchNorm2d(c // 2))
        self.depconv = tnn.Sequential(tnn.Conv2d(c // 2, 1, 3, padding=1),
                                      tnn.Tanh())

    def forward(self, x):
        deps, outs = [], []
        for i in range(4):
            f = self.upconv[i](x)
            deps.append(self.depth_out[i](f))
            a = torch.sigmoid(self.attention_bs[i](x))
            outs.append(a * f + f)
        fused = self.conv(torch.cat(outs, 1))
        return deps, self.depconv(fused)


class TResNetLW(tnn.Module):
    def __init__(self, layers):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, padding=1)
        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        for li in range(4):
            setattr(self, f"layer{li + 1}",
                    self._make_layer(planes[li], layers[li], strides[li]))
            for sfx in ("s", "r"):
                setattr(self, f"ins_layer{li + 1}_{sfx}", tnn.Sequential(
                    conv1x1(planes[li] * 4, planes[li] * 4),
                    tnn.InstanceNorm2d(planes[li] * 4)))
        self.p_ims1d2_outl1_dimred_ = cbr(2048, 1024, 1)
        self.psp4 = tnn.Sequential(TPSP(1024, 1024))
        self.mflow_conv_g1_b3_joint_varout_dimred = conv1x1(1024, 512)
        self.p_ims1d2_outl2_dimred_ = cbr(1024, 512, 1)
        self.adapt_stage2_b2_joint_varout_dimred = conv1x1(512, 512)
        self.CAT3 = TAT(512, 512)
        self.psp3 = tnn.Sequential(TPSP(512, 512))
        self.mflow_conv_g2_b3_joint_varout_dimred = conv1x1(512, 256)
        self.p_ims1d2_outl3_dimred_ = cbr(512, 256, 1)
        self.adapt_stage3_b2_joint_varout_dimred = conv1x1(256, 256)
        self.CAT2 = TAT(256, 256)
        self.psp2 = tnn.Sequential(TPSP(256, 256))
        self.mflow_conv_g3_b3_joint_varout_dimred = conv1x1(256, 256)
        self.p_ims1d2_outl4_dimred_ = cbr(256, 256, 1)
        self.adapt_stage4_b2_joint_varout_dimred = conv1x1(256, 256)
        self.CAT1 = TAT(256, 256)
        self.psp1 = tnn.Sequential(TPSP(256, 256))
        self.dep = TDep(256)

    def _make_layer(self, planes, blocks, stride):
        down = None
        if stride != 1 or self.inplanes != planes * 4:
            down = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))
        seq = [TBottleneck(self.inplanes, planes, stride, down)]
        self.inplanes = planes * 4
        seq += [TBottleneck(self.inplanes, planes) for _ in range(1, blocks)]
        return tnn.Sequential(*seq)

    def forward(self, x, domain="real"):
        sfx = "r" if domain == "real" else "s"
        h = self.maxpool(tF.relu(self.bn1(self.conv1(x))))
        ls = []
        for li in range(4):
            h = getattr(self, f"layer{li + 1}")(h)
            h = getattr(self, f"ins_layer{li + 1}_{sfx}")(h)
            ls.append(h)
        l1, l2, l3, l4 = ls

        def up(t, ref):
            return tnn.Upsample(size=ref.size()[2:], mode="bilinear",
                                align_corners=True)(t)

        x4 = tF.relu(self.p_ims1d2_outl1_dimred_(l4))
        x4 = up(self.mflow_conv_g1_b3_joint_varout_dimred(self.psp4(x4)), l3)
        x3 = self.adapt_stage2_b2_joint_varout_dimred(
            self.p_ims1d2_outl2_dimred_(l3))
        x3 = self.psp3(self.CAT3(x3, x4))
        x3 = up(self.mflow_conv_g2_b3_joint_varout_dimred(x3), l2)
        x2 = self.adapt_stage3_b2_joint_varout_dimred(
            self.p_ims1d2_outl3_dimred_(l2))
        x2 = self.psp2(self.CAT2(x2, x3))
        x2 = up(self.mflow_conv_g3_b3_joint_varout_dimred(x2), l1)
        x1 = self.adapt_stage4_b2_joint_varout_dimred(
            self.p_ims1d2_outl4_dimred_(l1))
        x1 = self.psp1(self.CAT1(x1, x2))
        outs, pred_d = self.dep(x1)
        return outs, pred_d, (x4, x3, x2, x1)


def test_resnetlw_import_parity():
    torch.manual_seed(7)
    layers = (1, 1, 1, 1)
    tg = TResNetLW(layers)
    tg.eval()
    x = RNG.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        outs_ref, pred_ref, feats_ref = tg(torch.from_numpy(x), "real")
    variables = import_resnetlw(tg.state_dict(), layers=layers)
    net = ResNetLW(layers=layers)
    variables = jax.tree.map(jnp.asarray, variables)
    outs, pred, feats = net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                  "real", train=False)
    np.testing.assert_allclose(np.asarray(pred),
                               pred_ref.numpy().transpose(0, 2, 3, 1),
                               atol=2e-3, rtol=1e-2)
    for mine, ref in zip(feats, feats_ref):
        np.testing.assert_allclose(np.asarray(mine),
                                   ref.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-3, rtol=1e-2)


def test_segd_import_parity():
    class TDeconvBlock(tnn.Module):
        def __init__(self, i, o):
            super().__init__()
            self.deconv = tnn.ConvTranspose2d(i, o, 4, 2, 1)
            self.bn = tnn.BatchNorm2d(o)
            self.relu = tnn.LeakyReLU(0.02)

        def forward(self, x):
            return self.deconv(self.relu(x))

    torch.manual_seed(8)
    th = tnn.Module()
    th.Up = tnn.ModuleList([TDeconvBlock(256, 128), TDeconvBlock(128, 64),
                            tnn.Conv2d(64, 29, 1)])
    x = RNG.randn(1, 256, 8, 12).astype(np.float32)
    h = torch.from_numpy(x)
    with torch.no_grad():
        for m in th.Up:
            h = m(h)
    variables = import_segd(th.state_dict(), up_scale=2)
    head = Segd(n_cls=28, up_scale=2)
    out = head.apply(jax.tree.map(jnp.asarray, variables),
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out),
                               h.numpy().transpose(0, 2, 3, 1), atol=1e-4,
                               rtol=1e-4)
