"""Reference-shaped torch builders for the base my_seg_depth generation.

Used by the S2D_base convergence harness (tools/convergence_compare_s2d.py)
and the import-parity tests. Every builder produces state-dict names matching
the reference classes so `utils.torch_import` importers apply directly:

- G_1                 my_seg_depth/networks2.py:285-329 (ResnetBlock :355-393)
- General_net         my_seg_depth/networks2.py:395-481 (standard transitions)
- SEG / DEP           my_seg_depth/networks2.py:489-566 (DeconvBlock :29-44)
- Discriminator       my_seg_depth/networks2.py:331-353 (define_D :589-601)

The decoders' 1×1 adapters make the channel schedule independent of the
trunk width, so reduced ``block_config``s work for CPU-speed runs (the
reference hardcodes the DenseNet-169 widths; the builders infer them).
"""

from __future__ import annotations

from collections import OrderedDict


def _dense_layer_cls():
    import torch
    import torch.nn as tnn

    class DenseLayer(tnn.Sequential):
        def __init__(self, nin, growth, bn_size):
            super().__init__()
            self.add_module("norm1", tnn.BatchNorm2d(nin))
            self.add_module("relu1", tnn.ReLU(inplace=True))
            self.add_module("conv1", tnn.Conv2d(nin, bn_size * growth, 1,
                                                bias=False))
            self.add_module("norm2", tnn.BatchNorm2d(bn_size * growth))
            self.add_module("relu2", tnn.ReLU(inplace=True))
            self.add_module("conv2", tnn.Conv2d(bn_size * growth, growth, 3,
                                                padding=1, bias=False))

        def forward(self, x):
            return torch.cat([x, super().forward(x)], 1)

    return DenseLayer


def _dense_block(nf, n_layers, growth=32, bn_size=4):
    import torch.nn as tnn

    DenseLayer = _dense_layer_cls()
    db = tnn.Sequential()
    for j in range(n_layers):
        db.add_module(f"denselayer{j + 1}", DenseLayer(nf, growth, bn_size))
        nf += growth
    return db, nf


def build_torch_g1_base(ngf=64, n_blocks=3, block_config=6):
    """Base-generation G_1: stem + dense block + entry conv + standard
    two-conv ResnetBlocks with BatchNorm (networks2.py:285-329)."""
    import torch.nn as tnn

    class Block(tnn.Module):
        def __init__(self, d):
            super().__init__()
            self.conv_block = tnn.Sequential(
                tnn.ReflectionPad2d(1), tnn.Conv2d(d, d, 3, bias=False),
                tnn.BatchNorm2d(d), tnn.ReLU(True),
                tnn.ReflectionPad2d(1), tnn.Conv2d(d, d, 3, bias=False),
                tnn.BatchNorm2d(d))

        def forward(self, x):
            return x + self.conv_block(x)

    net = tnn.Module()
    feats = tnn.Sequential(OrderedDict([
        ("conv0", tnn.Conv2d(3, 64, 7, 2, 3, bias=False)),
        ("norm0", tnn.BatchNorm2d(64)),
        ("relu0", tnn.ReLU(inplace=False))]))
    db, nf = _dense_block(64, block_config)
    feats.add_module("denseblock1", db)
    net.features = feats
    layers = [tnn.ReflectionPad2d(1), tnn.Conv2d(nf, ngf, 3, bias=False),
              tnn.BatchNorm2d(ngf), tnn.ReLU(False)]
    layers += [Block(ngf) for _ in range(n_blocks)]
    net.model = tnn.Sequential(*layers)
    net.fwd = lambda x: net.model(net.features(x))
    return net


def build_torch_general_net2(block_config=(6, 12, 32, 32), mid_nc=1024):
    """Base-generation General_net with STANDARD transitions and the
    i%2 feature-collection quirk of its dual-mode forward
    (networks2.py:395-481)."""
    import torch
    import torch.nn as tnn

    net = tnn.Module()
    feats = tnn.Sequential(OrderedDict([
        ("conv0", tnn.Conv2d(3, 64, 7, 2, 3, bias=False)),
        ("norm0", tnn.BatchNorm2d(64)),
        # inplace like the reference (networks2.py:403): the forward below
        # appends the norm0 tensor and relu0 then mutates it, so the stored
        # stem skip is post-ReLU — inplace-ness is load-bearing here
        ("relu0", tnn.ReLU(inplace=True))]))
    nf = 64
    for i, n_layers in enumerate(block_config):
        db, nf = _dense_block(nf, n_layers)
        feats.add_module(f"denseblock{i + 1}", db)
        if i != len(block_config) - 1:
            trans = tnn.Sequential(OrderedDict([
                ("norm", tnn.BatchNorm2d(nf)),
                ("relu", tnn.ReLU(inplace=False)),
                ("conv", tnn.Conv2d(nf, nf // 2, 1, bias=False)),
                ("pool", tnn.AvgPool2d(2, 2))]))
            # name the whole Sequential 'transitionN' like _Transition
            feats.add_module(f"transition{i + 1}", trans)
            nf //= 2
    net.features = feats
    q = mid_nc // 4
    net.psp = tnn.ModuleList([
        tnn.BatchNorm2d(nf), tnn.ReLU(inplace=False),
        tnn.Conv2d(nf, q, 1, bias=False),
        tnn.Conv2d(nf, q, 1, dilation=1, bias=False),
        tnn.Conv2d(nf, q, 2, padding=1, dilation=2, bias=False),
        tnn.Conv2d(nf, q, 3, padding=2, dilation=2, bias=False),
        tnn.BatchNorm2d(mid_nc)])

    def forward(x, mode):
        h = x
        features = []
        mods = list(net.features)
        if mode == "S":
            # reference applies features[1:] and collects after i%2==0
            for i in range(len(mods)):
                if i != len(mods) - 1:
                    h = mods[i + 1](h)
                    if i % 2 == 0:
                        features.append(h)
        else:
            for i, fe in enumerate(mods):
                h = fe(h)
                if i % 2 == 1:
                    features.append(h)
        h = net.psp[1](net.psp[0](h))
        h = torch.cat([net.psp[2](h), net.psp[3](h), net.psp[4](h),
                       net.psp[5](h)], 1)
        return features, net.psp[6](h)

    net.fwd = forward
    return net, nf


def _build_torch_skip_decoder(net, skip_chans):
    """Shared SEG/DEP body (networks2.py:489-566): adapters + Up chain.
    ``skip_chans`` are the 5 trunk skip-feature widths (stem, db1..db4)."""
    import torch
    import torch.nn as tnn

    class DeconvBlock(tnn.Module):
        # networks2.py:29-44 copy: ReLU (not LeakyReLU), batch_norm=False
        def __init__(self, nin, nout):
            super().__init__()
            self.deconv = tnn.ConvTranspose2d(nin, nout, 4, 2, 1)
            self.bn = tnn.BatchNorm2d(nout)  # constructed but unused
            self.relu = tnn.ReLU(True)

        def forward(self, x):
            return self.deconv(self.relu(x))

    net.trans_0 = tnn.ConvTranspose2d(skip_chans[0], 64, 2, 2)
    net.trans_1 = tnn.Conv2d(skip_chans[1], 128, 1, 1)
    net.trans_2 = tnn.Conv2d(skip_chans[2], 256, 1, 1)
    net.trans_3 = tnn.Conv2d(skip_chans[3], 512, 1, 1)
    net.trans_4 = tnn.Conv2d(skip_chans[4], 1024, 1, 1)
    net.Up = tnn.ModuleList()
    net.Up.append(DeconvBlock(1024 + 1024, 512))
    net.Up.append(DeconvBlock(512 + 512, 256))
    net.Up.append(DeconvBlock(256 + 256, 256))
    net.Up.append(DeconvBlock(256 + 128, 256))

    def body(features, x):
        f = [net.trans_0(features[0]), net.trans_1(features[1]),
             net.trans_2(features[2]), net.trans_3(features[3]),
             net.trans_4(features[4])]
        s = x
        for i in range(4):
            s = net.Up[i](torch.cat([s, f[4 - i]], 1))
        return torch.cat([s, f[0]], 1)

    return body


def build_torch_seg2(skip_chans, n_cls=28, mid_nc=1024):
    import torch.nn as tnn

    net = tnn.Module()
    body = _build_torch_skip_decoder(net, skip_chans)
    net.Up.append(tnn.Conv2d(256 + 64, n_cls, 1, 1))
    net.activation_seg = tnn.Sequential(tnn.BatchNorm2d(n_cls),
                                        tnn.LeakyReLU())
    net.fwd = lambda features, x: net.activation_seg(net.Up[4](body(features, x)))
    return net


def build_torch_dep2(skip_chans, mid_nc=1024):
    import torch
    import torch.nn as tnn

    net = tnn.Module()
    body = _build_torch_skip_decoder(net, skip_chans)
    net.Up.append(tnn.Conv2d(256 + 64, 1, 1, 1))
    net.fwd = lambda features, x: torch.tanh(net.Up[4](body(features, x)))
    return net


def build_torch_drop_discriminator(conv_dim=64, repeat_num=4):
    """Base-generation feature Discriminator (networks2.py:331-353)."""
    import torch.nn as tnn

    layers = []
    curr = conv_dim
    for _ in range(1, repeat_num):
        layers += [tnn.Conv2d(curr, curr * 2, 4, 2, 1), tnn.LeakyReLU(0.01),
                   tnn.Dropout2d(0.2)]
        curr *= 2
    net = tnn.Module()
    net.main = tnn.Sequential(*layers)
    net.conv1 = tnn.Conv2d(curr, 1, 1, 1, bias=False)
    net.fwd = lambda x: net.conv1(net.main(x)).squeeze(1)
    return net
