"""T2Net-style task networks (seg/depth heads over a shared U-Net trunk).

TPU-native re-design of reference models/seg_network.py:
- blocks: _InceptionBlock (parallel dilated convs, seg_network.py:155-189),
  _EncoderBlock (192-208), _DownBlock (211-225), _ShuffleUpBlock
  (PixelShuffle, 228-244), _DecoderUpBlock (247-264), _OutputBlock (267-280),
  GaussianNoiseLayer (144-152);
- nets: _ResGenerator (287-350), _UNetGenerator with domain-split decoders
  (syn 22-ch vs real 28-ch heads over a shared encoder, 441-558),
  _MultiscaleDiscriminator/_Discriminator (561-626), _FeatureDiscriminator
  (MLP over flattened 512×H/16×W/16 features, 629-663);
- factories define_G / define_D / define_featureD (112-138).

Parity notes: the reference constructs ONE PReLU module per network and
passes that instance into every block — a single learned α shared
network-wide. We reproduce that with one ``prelu_alpha`` parameter at network
scope. The seg heads end in Tanh (reference _OutputBlock) — logits squashed
to [-1, 1] before cross-entropy — reproduced as-is.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    Conv,
    ConvTranspose,
    Norm,
    avg_pool,
    max_pool,
    pixel_shuffle,
    reflect_pad,
    resize_nearest,
)
from ..ops.init import make_initializer
from ..ops.layers import norm_uses_bias

Dtype = Any


def prelu_apply(alpha: jax.Array, x: jax.Array) -> jax.Array:
    """torch ``nn.PReLU()`` math — single source (review dedupe)."""
    return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


def prelu(module: nn.Module, name: str, x: jax.Array) -> jax.Array:
    """Declare-and-apply a PReLU α (init 0.25, shape (1,)) as ``name`` on
    ``module``. Use once per name — for an α shared across several
    applications, declare it once and call `prelu_apply`."""
    return prelu_apply(module.param(name, nn.initializers.constant(0.25),
                                    (1,), jnp.float32), x)


def make_activation(kind: str, module: nn.Module) -> Callable[[jax.Array], jax.Array]:
    """Activation factory (reference get_nonlinearity_layer,
    seg_network.py:25-36). 'PReLU' creates one shared α on ``module``."""
    if kind == "ReLU":
        return nn.relu
    if kind == "SELU":
        return jax.nn.selu
    if kind == "LeakyReLU":
        return lambda x: nn.leaky_relu(x, 0.1)
    if kind == "PReLU":
        alpha = module.param("prelu_alpha", nn.initializers.constant(0.25),
                             (1,), jnp.float32)
        return lambda x: prelu_apply(alpha, x)
    raise NotImplementedError(f"activation layer [{kind}] is not found")


class GaussianNoise(nn.Module):
    """(randn − 0.5)/10 additive noise in train mode (seg_network.py:144-152)."""

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if not train:
            return x
        rng = self.make_rng("noise")
        noise = (jax.random.normal(rng, x.shape, jnp.float32) - 0.5) / 10.0
        return x + noise.astype(x.dtype)


class InceptionBlock(nn.Module):
    """Parallel dilated 3×3 branches + 1×1 fuse, residual."""

    output_nc: int
    norm: str = "batch"
    width: int = 1
    drop_rate: float = 0.0
    use_bias: bool = False
    kernel_init: Callable = make_initializer("xavier")
    act: Optional[Callable] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, act: Callable = nn.relu):
        act = self.act or act
        branches = []
        for i in range(self.width):
            d = i * 2 + 1
            h = reflect_pad(x, d)
            h = Conv(self.output_nc, 3, dilation=d, use_bias=self.use_bias,
                     kernel_init=self.kernel_init, dtype=self.dtype,
                     name=f"branch{i}")(h)
            branches.append(h)
        out = jnp.concatenate(branches, axis=-1)
        out = act(Norm(self.norm, dtype=self.dtype, name="norm1")(out, train=train))
        out = reflect_pad(out, 1)
        out = Conv(self.output_nc, 3, use_bias=self.use_bias,
                   kernel_init=self.kernel_init, dtype=self.dtype,
                   name="fuse1x1")(out)
        out = Norm(self.norm, dtype=self.dtype, name="norm2")(out, train=train)
        if self.drop_rate > 0:
            out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        return act(out + x)


class EncoderBlock(nn.Module):
    middle_nc: int
    output_nc: int
    norm: str = "batch"
    use_bias: bool = False
    kernel_init: Callable = make_initializer("xavier")
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, act: Callable = nn.relu):
        h = Conv(self.middle_nc, 3, padding=1, use_bias=self.use_bias,
                 kernel_init=self.kernel_init, dtype=self.dtype, name="conv1")(x)
        h = act(Norm(self.norm, dtype=self.dtype, name="norm1")(h, train=train))
        h = Conv(self.output_nc, 3, padding=1, use_bias=self.use_bias,
                 kernel_init=self.kernel_init, dtype=self.dtype, name="conv2")(h)
        return act(Norm(self.norm, dtype=self.dtype, name="norm2")(h, train=train))


class DownBlock(nn.Module):
    output_nc: int
    norm: str = "batch"
    use_bias: bool = False
    kernel_init: Callable = make_initializer("xavier")
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, act: Callable = nn.relu):
        h = Conv(self.output_nc, 3, padding=1, use_bias=self.use_bias,
                 kernel_init=self.kernel_init, dtype=self.dtype, name="conv")(x)
        h = act(Norm(self.norm, dtype=self.dtype, name="norm")(h, train=train))
        return max_pool(h, 2, 2)


class ShuffleUpBlock(nn.Module):
    output_nc: int
    up_scale: int = 2
    norm: str = "batch"
    use_bias: bool = False
    kernel_init: Callable = make_initializer("xavier")
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, act: Callable = nn.relu):
        in_ch = x.shape[-1]
        h = Conv(in_ch * self.up_scale ** 2, 3, padding=1, use_bias=self.use_bias,
                 kernel_init=self.kernel_init, dtype=self.dtype, name="expand")(x)
        h = act(pixel_shuffle(h, self.up_scale))
        h = Conv(self.output_nc, 3, padding=1, use_bias=self.use_bias,
                 kernel_init=self.kernel_init, dtype=self.dtype, name="conv")(h)
        return act(Norm(self.norm, dtype=self.dtype, name="norm")(h, train=train))


class DecoderUpBlock(nn.Module):
    middle_nc: int
    output_nc: int
    norm: str = "batch"
    use_bias: bool = False
    kernel_init: Callable = make_initializer("xavier")
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, act: Callable = nn.relu):
        h = reflect_pad(x, 1)
        h = Conv(self.middle_nc, 3, use_bias=self.use_bias,
                 kernel_init=self.kernel_init, dtype=self.dtype, name="conv")(h)
        h = act(Norm(self.norm, dtype=self.dtype, name="norm1")(h, train=train))
        h = ConvTranspose(self.output_nc, 3, stride=2, padding=1,
                          output_padding=1, use_bias=True,
                          kernel_init=self.kernel_init, dtype=self.dtype,
                          name="up")(h)
        return act(Norm(self.norm, dtype=self.dtype, name="norm2")(h, train=train))


class OutputBlock(nn.Module):
    output_nc: int
    kernel_size: int = 3
    use_bias: bool = False
    kernel_init: Callable = make_initializer("xavier")
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = reflect_pad(x, self.kernel_size // 2)
        h = Conv(self.output_nc, self.kernel_size, use_bias=self.use_bias,
                 kernel_init=self.kernel_init, dtype=self.dtype, name="conv")(h)
        return jnp.tanh(h)


class ResGenerator(nn.Module):
    """_ResGenerator (seg_network.py:287-350): returns [feature, output]."""

    output_nc: int
    ngf: int = 64
    n_blocks: int = 6
    norm: str = "batch"
    activation: str = "PReLU"
    drop_rate: float = 0.0
    add_noise: bool = False
    init_type: str = "xavier"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        act = make_activation(self.activation, self)
        use_bias = norm_uses_bias(self.norm)
        kinit = make_initializer(self.init_type)
        kw = dict(norm=self.norm, use_bias=use_bias, kernel_init=kinit,
                  dtype=self.dtype)

        h = reflect_pad(x, 3)
        h = Conv(self.ngf, 7, use_bias=use_bias, kernel_init=kinit,
                 dtype=self.dtype, name="conv_in")(h)
        h = act(Norm(self.norm, dtype=self.dtype, name="norm_in")(h, train=train))
        mult = 1
        for i in range(2):
            mult = min(2 ** (i + 1), 2)
            h = EncoderBlock(self.ngf * mult, self.ngf * mult,
                             name=f"enc{i}", **kw)(h, train=train, act=act)
            h = avg_pool(h, 2, 2)
        for i in range(self.n_blocks - 2):
            h = InceptionBlock(self.ngf * mult, width=1, drop_rate=self.drop_rate,
                               name=f"block{i}", **kw)(h, train=train, act=act)
        feature = h
        if self.add_noise:
            h = GaussianNoise(name="noise")(h, train=train)
        for i in range(2):
            mult_prev, mult = mult, min(2 ** (2 - i - 1), 2)
            h = DecoderUpBlock(self.ngf * mult_prev, self.ngf * mult,
                               name=f"dec{i}", **kw)(h, train=train, act=act)
        h = reflect_pad(h, 3)
        h = Conv(self.output_nc, 7, use_bias=True, kernel_init=kinit,
                 dtype=self.dtype, name="conv_out")(h)
        return [feature, jnp.tanh(h)]


class UNetTrunk(nn.Module):
    """Shared encoder + inception center of _UNetGenerator
    (seg_network.py:455-482)."""

    ngf: int = 64
    layers: int = 4
    norm: str = "batch"
    drop_rate: float = 0.0
    add_noise: bool = False
    use_bias: bool = False
    kernel_init: Callable = make_initializer("xavier")
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, act: Callable = nn.relu):
        kw = dict(norm=self.norm, use_bias=self.use_bias,
                  kernel_init=self.kernel_init, dtype=self.dtype)
        h = reflect_pad(x, 3)
        h = Conv(self.ngf, 7, use_bias=self.use_bias, kernel_init=self.kernel_init,
                 dtype=self.dtype, name="conv1")(h)
        conv1 = avg_pool(act(Norm(self.norm, dtype=self.dtype, name="norm1")(h, train=train)), 2, 2)
        conv2 = avg_pool(EncoderBlock(self.ngf * 2, self.ngf * 2, name="conv2",
                                      **kw)(conv1, train=train, act=act), 2, 2)
        conv3 = avg_pool(EncoderBlock(self.ngf * 4, self.ngf * 4, name="conv3",
                                      **kw)(conv2, train=train, act=act), 2, 2)
        center_in = avg_pool(EncoderBlock(self.ngf * 8, self.ngf * 8, name="conv4",
                                          **kw)(conv3, train=train, act=act), 2, 2)
        h = center_in
        for i in range(7 - self.layers):
            h = InceptionBlock(self.ngf * 8, width=7 - self.layers,
                               drop_rate=self.drop_rate, name=f"center{i}",
                               **kw)(h, train=train, act=act)
        center_out = DecoderUpBlock(self.ngf * 8, self.ngf * 4, name="center_up",
                                    **kw)(h, train=train, act=act)
        if self.add_noise:
            center_out = GaussianNoise(name="noise")(center_out, train=train)
        return conv1, conv2, conv3, center_in, center_out


class UNetHead(nn.Module):
    """One domain head of _UNetGenerator (deconv4..2 + output4..1,
    seg_network.py:491-508, forward 530-557)."""

    output_nc: int
    ngf: int = 64
    weight: float = 0.1
    norm: str = "batch"
    use_bias: bool = False
    kernel_init: Callable = make_initializer("xavier")
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats, *, train: bool = False, act: Callable = nn.relu):
        conv1, conv2, conv3, center_in, center_out = feats
        ngf, w = self.ngf, self.weight
        kw = dict(norm=self.norm, use_bias=self.use_bias,
                  kernel_init=self.kernel_init, dtype=self.dtype)
        okw = dict(use_bias=self.use_bias, kernel_init=self.kernel_init,
                   dtype=self.dtype)

        def up2(t):
            n, hh, ww, c = t.shape
            return resize_nearest(t, (hh * 2, ww * 2))

        cat4 = jnp.concatenate([center_out, conv3 * w], axis=-1)
        deconv4 = DecoderUpBlock(ngf * 8, ngf * 2, name="deconv4", **kw)(
            cat4, train=train, act=act)
        output4 = OutputBlock(self.output_nc, 3, name="output4", **okw)(cat4)
        cat3 = jnp.concatenate([deconv4, conv2 * w * 0.5, up2(output4)], axis=-1)
        deconv3 = DecoderUpBlock(ngf * 4, ngf, name="deconv3", **kw)(
            cat3, train=train, act=act)
        output3 = OutputBlock(self.output_nc, 3, name="output3", **okw)(cat3)
        cat2 = jnp.concatenate([deconv3, conv1 * w * 0.1, up2(output3)], axis=-1)
        deconv2 = DecoderUpBlock(ngf * 2, ngf // 2, name="deconv2", **kw)(
            cat2, train=train, act=act)
        output2 = OutputBlock(self.output_nc, 3, name="output2", **okw)(cat2)
        cat1 = jnp.concatenate([deconv2, up2(output2)], axis=-1)
        output1 = OutputBlock(self.output_nc, 7, name="output1", **okw)(cat1)
        return output1


class UNetGenerator(nn.Module):
    """_UNetGenerator with domain-split decoders (seg_network.py:441-558).

    ``__call__(x, domain)`` → [center_in (features), output1 (head output)];
    domain ∈ {'syn' (22 classes), 'real' (28 classes)}.
    """

    ngf: int = 64
    layers: int = 4
    norm: str = "batch"
    activation: str = "PReLU"
    drop_rate: float = 0.0
    add_noise: bool = False
    weight: float = 0.1
    nc_syn: int = 22
    nc_real: int = 28
    init_type: str = "xavier"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, domain: str = "syn", *, train: bool = False):
        act = make_activation(self.activation, self)
        use_bias = norm_uses_bias(self.norm)
        kinit = make_initializer(self.init_type)
        trunk = UNetTrunk(ngf=self.ngf, layers=self.layers, norm=self.norm,
                          drop_rate=self.drop_rate, add_noise=self.add_noise,
                          use_bias=use_bias, kernel_init=kinit, dtype=self.dtype,
                          name="trunk")
        feats = trunk(x, train=train, act=act)
        # both heads are constructed (both sets of params exist, as in the
        # reference); the domain argument selects which executes.
        head_kw = dict(ngf=self.ngf, weight=self.weight, norm=self.norm,
                       use_bias=use_bias, kernel_init=kinit, dtype=self.dtype)
        if domain == "syn":
            out = UNetHead(self.nc_syn, name="head_syn", **head_kw)(
                feats, train=train, act=act)
            if self.is_initializing():
                UNetHead(self.nc_real, name="head_real", **head_kw)(
                    feats, train=train, act=act)
        else:
            if self.is_initializing():
                UNetHead(self.nc_syn, name="head_syn", **head_kw)(
                    feats, train=train, act=act)
            out = UNetHead(self.nc_real, name="head_real", **head_kw)(
                feats, train=train, act=act)
        return [feats[3], out]


class VGG16Features(nn.Module):
    """The torchvision ``vgg16().features`` conv stacks used by _PreUNet16
    (reference models/seg_network.py:367-376): plain 3×3 convs + ReLU, no
    norm. Module names mirror the torch Sequential renumbering in the
    reference's ``conv1..conv4`` attributes (conv1 = [features.0, relu,
    features.2, relu] → ``conv1_0``/``conv1_2``) so the importer maps 1:1.

    Returns the four post-pool stages (64/2×, 128/4×, 256/8×, 512/16×).
    """

    kernel_init: Callable = make_initializer("xavier")
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        cfg = [("conv1", (64, 64)), ("conv2", (128, 128)),
               ("conv3", (256, 256, 256)), ("conv4", (512, 512, 512))]
        outs = []
        h = x
        for stage, chans in cfg:
            for j, c in enumerate(chans):
                h = Conv(c, 3, padding=1, use_bias=True,
                         kernel_init=self.kernel_init, dtype=self.dtype,
                         name=f"{stage}_{2 * j}")(h)
                h = nn.relu(h)
            h = max_pool(h, 2, 2)  # reference pools AFTER each conv stack
            outs.append(h)
        return outs


class PreUNet16(nn.Module):
    """_PreUNet16 (reference models/seg_network.py:353-439): VGG16-encoder
    U-Net task net with multi-scale side outputs.

    Returns [center_in (512-ch /16 features), output4 (/8), output3 (/4),
    output2 (/2), output1 (full res)] — same contract as the reference's
    ``result`` list.

    Latent reference bug (documented, not copied): for ``layers > 4`` the
    reference's up loop concatenates ``center_out`` (spatially upsampled by
    the center's _DecoderUpBlock) with the *deepest* ``middle`` entry —
    mismatched spatial sizes, so torch raises at runtime too. Only the
    factory default ``layers=4`` (no extra down/up pairs) is functional, and
    that is what this module implements faithfully.
    """

    output_nc: int
    ngf: int = 64
    layers: int = 4
    norm: str = "batch"
    activation: str = "PReLU"
    drop_rate: float = 0.0
    init_type: str = "xavier"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.layers != 4:
            raise NotImplementedError(
                "reference _PreUNet16 is only shape-consistent at layers=4 "
                "(see class docstring)")
        from ..ops import resize_bilinear

        act = make_activation(self.activation, self)
        use_bias = norm_uses_bias(self.norm)
        kinit = make_initializer(self.init_type)
        kw = dict(norm=self.norm, use_bias=use_bias, kernel_init=kinit,
                  dtype=self.dtype)
        up2 = lambda t: resize_bilinear(  # noqa: E731
            t, (t.shape[1] * 2, t.shape[2] * 2), align_corners=True)

        c1, c2, c3, center_in = VGG16Features(
            kernel_init=kinit, dtype=self.dtype, name="vgg")(x)
        result = [center_in]

        # center: (7-layers) InceptionBlocks of width (7-layers), then an
        # upsampling DecoderUpBlock (reference :381-388)
        h = center_in
        for i in range(7 - self.layers):
            h = InceptionBlock(self.ngf * 8, width=7 - self.layers,
                               drop_rate=self.drop_rate,
                               name=f"center{i}", **kw)(h, train=train,
                                                        act=act)
        h = DecoderUpBlock(self.ngf * 8, self.ngf * 4,
                           name="center_up", **kw)(h, train=train, act=act)

        cat4 = jnp.concatenate([h, c3 * 0.1], axis=-1)
        deconv4 = DecoderUpBlock(self.ngf * 8, self.ngf * 2,
                                 name="deconv4", **kw)(cat4, train=train,
                                                       act=act)
        output4 = OutputBlock(self.output_nc, 3, use_bias=use_bias,
                              kernel_init=kinit, dtype=self.dtype,
                              name="output4")(cat4)
        result.append(output4)

        cat3 = jnp.concatenate([deconv4, c2 * 0.05, up2(output4)], axis=-1)
        deconv3 = DecoderUpBlock(self.ngf * 4, self.ngf,
                                 name="deconv3", **kw)(cat3, train=train,
                                                       act=act)
        output3 = OutputBlock(self.output_nc, 3, use_bias=use_bias,
                              kernel_init=kinit, dtype=self.dtype,
                              name="output3")(cat3)
        result.append(output3)

        cat2 = jnp.concatenate([deconv3, c1 * 0.01, up2(output3)], axis=-1)
        deconv2 = DecoderUpBlock(self.ngf * 2, self.ngf // 2,
                                 name="deconv2", **kw)(cat2, train=train,
                                                       act=act)
        output2 = OutputBlock(self.output_nc, 3, use_bias=use_bias,
                              kernel_init=kinit, dtype=self.dtype,
                              name="output2")(cat2)
        result.append(output2)

        output1 = OutputBlock(self.output_nc, 7, use_bias=use_bias,
                              kernel_init=kinit, dtype=self.dtype,
                              name="deconv1")(
            jnp.concatenate([deconv2, up2(output2)], axis=-1))
        result.append(output1)
        return result


class Discriminator(nn.Module):
    """_Discriminator (seg_network.py:585-626) — PatchGAN with PReLU."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"
    activation: str = "PReLU"
    init_type: str = "xavier"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        act = make_activation(self.activation, self)
        use_bias = norm_uses_bias(self.norm)
        kinit = make_initializer(self.init_type)
        h = Conv(self.ndf, 4, stride=2, padding=1, use_bias=use_bias,
                 kernel_init=kinit, dtype=self.dtype, name="conv0")(x)
        h = act(h)
        nf = 1
        for i in range(1, self.n_layers):
            nf = min(2 ** i, 8)
            h = Conv(self.ndf * nf, 4, stride=2, padding=1, use_bias=use_bias,
                     kernel_init=kinit, dtype=self.dtype, name=f"conv{i}")(h)
            h = act(Norm(self.norm, dtype=self.dtype, name=f"norm{i}")(h, train=train))
        nf = min(2 ** self.n_layers, 8)
        h = Conv(self.ndf * nf, 4, stride=1, padding=1, use_bias=use_bias,
                 kernel_init=kinit, dtype=self.dtype,
                 name=f"conv{self.n_layers}")(h)
        h = act(Norm(self.norm, dtype=self.dtype, name=f"norm{self.n_layers}")(h, train=train))
        return Conv(1, 4, stride=1, padding=1, use_bias=True, kernel_init=kinit,
                    dtype=self.dtype, name="conv_out")(h)


class MultiscaleDiscriminator(nn.Module):
    """_MultiscaleDiscriminator (seg_network.py:561-582): num_D scales, each
    on a 2× avg-pooled input; returns a list of patch maps."""

    ndf: int = 64
    n_layers: int = 3
    num_d: int = 1
    norm: str = "batch"
    activation: str = "PReLU"
    init_type: str = "xavier"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        outs = []
        for i in range(self.num_d):
            outs.append(Discriminator(
                ndf=self.ndf, n_layers=self.n_layers, norm=self.norm,
                activation=self.activation, init_type=self.init_type,
                dtype=self.dtype, name=f"scale{i}")(x, train=train))
            if i != self.num_d - 1:
                x = avg_pool(x, 3, 2, padding=1, count_include_pad=False)
        return outs


class FeatureDiscriminator(nn.Module):
    """_FeatureDiscriminator (seg_network.py:629-663): MLP over flattened
    NCHW features (torch flatten order preserved for .pth parity)."""

    input_nc: int = 512
    n_layers: int = 2
    feature_hw: Tuple[int, int] = (12, 40)  # (H/16, W/16) at 640×192
    activation: str = "PReLU"
    init_type: str = "xavier"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        act = make_activation(self.activation, self)
        kinit = make_initializer(self.init_type)
        n = x.shape[0]
        # NHWC → NCHW flatten to match torch's view(-1, C·H·W)
        h = x.transpose(0, 3, 1, 2).reshape(n, -1)
        h = act(nn.Dense(self.input_nc, kernel_init=kinit, name="fc0")(h))
        for i in range(1, self.n_layers):
            h = act(nn.Dense(self.input_nc, kernel_init=kinit, name=f"fc{i}")(h))
        return [nn.Dense(1, kernel_init=kinit, name="fc_out")(h)]


# ---------------------------------------------------------------------------
# factories (reference seg_network.py:112-138)
# ---------------------------------------------------------------------------


def define_task_G(ngf: int = 64, layers: int = 4, norm: str = "batch",
                  activation: str = "PReLU", model_type: str = "UNet",
                  init_type: str = "xavier", drop_rate: float = 0.0,
                  add_noise: bool = False, weight: float = 0.1,
                  output_nc: int = 3, dtype=None) -> nn.Module:
    if model_type == "ResNet":
        return ResGenerator(output_nc=output_nc, ngf=ngf, n_blocks=layers,
                            norm=norm, activation=activation,
                            drop_rate=drop_rate, add_noise=add_noise,
                            init_type=init_type, dtype=dtype)
    if model_type == "UNet":
        return UNetGenerator(ngf=ngf, layers=layers, norm=norm,
                             activation=activation, drop_rate=drop_rate,
                             add_noise=add_noise, weight=weight,
                             init_type=init_type, dtype=dtype)
    if model_type == "PreUNet16":
        # the VGG16-encoder variant the reference keeps one line away from
        # the UNet in define_G (models/seg_network.py:118-120)
        return PreUNet16(output_nc=output_nc, ngf=ngf, layers=layers,
                         norm=norm, activation=activation,
                         drop_rate=drop_rate, init_type=init_type,
                         dtype=dtype)
    raise NotImplementedError(f"model type [{model_type}] is not implemented")


def define_task_D(ndf: int = 64, n_layers: int = 3, num_d: int = 1,
                  norm: str = "batch", activation: str = "PReLU",
                  init_type: str = "xavier", dtype=None) -> nn.Module:
    return MultiscaleDiscriminator(ndf=ndf, n_layers=n_layers, num_d=num_d,
                                   norm=norm, activation=activation,
                                   init_type=init_type, dtype=dtype)


def define_feature_D(input_nc: int = 512, n_layers: int = 2,
                     norm: str = "batch", activation: str = "PReLU",
                     init_type: str = "xavier", dtype=None) -> nn.Module:
    return FeatureDiscriminator(input_nc=input_nc, n_layers=n_layers,
                                activation=activation, init_type=init_type,
                                dtype=dtype)


# ---------------------------------------------------------------------------
# losses shared by the task models
# ---------------------------------------------------------------------------


def cross_entropy_loss(logits: jax.Array, labels: jax.Array,
                       ignore_index: int = 255,
                       weights=None) -> jax.Array:
    """Mean CE over valid pixels (torch CrossEntropyLoss(ignore_index=…)).

    logits NHWC (C = classes), labels NHW int. Labels outside [0, C) are
    treated as ignored (torch raises a device assert there; masking keeps the
    jit program total while matching torch on all valid inputs).

    ``weights``: optional per-class weight vector — torch semantics: the
    per-pixel losses are scaled by w[y] and the mean normalizes by Σ w[y]
    over valid pixels (the base my_seg_depth class-weight table,
    model2.py:175-204).
    """
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = ((labels != ignore_index) & (labels >= 0) & (labels < num_classes))
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    # Select logp[..., y] with a one-hot multiply-reduce over the class
    # (lane) axis instead of take_along_axis: bit-identical (one term is
    # multiplied by exactly 1.0, the rest by 0.0), but the per-pixel gather
    # lowers to a serialized TPU gather fusion behind a bad-layout copy of
    # the full logits — profiled at ~3 ms/step per CE site on the S2D step
    # (tools/profile_S2D_bfloat16.json) — while the one-hot form stays a
    # vectorized elementwise+reduce in NHWC layout.
    onehot = jax.nn.one_hot(safe, num_classes, dtype=logp.dtype)
    ll = (logp * onehot).sum(-1)
    if weights is None:
        return -(ll * valid).sum() / jnp.maximum(valid.sum(), 1)
    w = (onehot @ jnp.asarray(weights, jnp.float32)) * valid
    return -(ll * w).sum() / jnp.maximum(w.sum(), 1e-8)


def seg_accuracy(logits: jax.Array, labels: jax.Array,
                 ignore_index: int = 255) -> jax.Array:
    """Valid-pixel accuracy (reference models/seg_model.py:73-77)."""
    valid = labels != ignore_index
    pred = jnp.argmax(logits, axis=-1)
    return ((pred == labels) * valid).sum() / jnp.maximum(valid.sum(), 1)
