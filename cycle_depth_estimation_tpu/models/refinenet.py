"""RefineNet-LightWeight-101 track (`new_model`).

TPU-native re-design of reference new_model/my_rf_lw.py +
new_model/utils/layer_factory.py:
- ResNet ``Bottleneck`` trunk ([3, 4, 23, 3] → ResNet-101,
  my_rf_lw.py:94-130, 519-521) with **per-domain instance-norm adapter
  layers** ``ins_layer{1-4}_{s,r}`` selected by ``domain`` ('real' | 'syn')
  (my_rf_lw.py:238-251, 312-321);
- RefineNet-style top-down fusion where CRP blocks are replaced by
  ``PSPBlock`` (4 dilated 3×3 branches + 1×1 residual, layer_factory.py:54-80)
  and ``ATBlock`` (concat-attention fusion, layer_factory.py:83-113), with
  endpoint-aligned bilinear upsampling to each skip's size;
- ``depth_block`` (ReLU6 variant, my_rf_lw.py:169-224) on the finest fused
  feature → (4 tanh band depths @1/2, fused tanh depth @1/2);
- ``segd`` deconv heads used both as decoders and as domain discriminators
  via ``seg_gan_loss`` (CE to true labels when "real", CE to the extra class
  ``n_cls`` when "fake") (my_rf_lw.py:493-537);
- ``CRPBlock`` (chained-residual-pooling, layer_factory.py:31-51) and
  ``DCGAN_D`` (SELU discriminator, my_rf_lw.py:134-167) for completeness.

Note (reference bug, not reproduced): mdoel6 builds ``segd`` heads with the
default ``init_channel=256`` but feeds 512-channel x4 features into seg8
(mdoel6.py:199-207 vs my_rf_lw.py:549) — a shape error in torch. Our ``Segd``
infers its input width, so the head family is well-formed at every scale.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import Conv, InstanceNorm, Norm, max_pool, resize_bilinear
from ..ops.init import make_initializer
from .s2d_networks import DeconvBlock
from .seg_network import cross_entropy_loss

Dtype = Any
kaiming = make_initializer("kaiming")


class ConvBnRelu6(nn.Module):
    """convbnrelu (layer_factory.py:21-29): conv(pad=k//2, no bias) + BN
    [+ ReLU6]."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    act: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = Conv(self.features, self.kernel_size, stride=self.stride,
                 padding=self.kernel_size // 2, use_bias=False,
                 kernel_init=kaiming, dtype=self.dtype, name="conv")(x)
        h = Norm("batch", dtype=self.dtype, name="bn")(h, train=train)
        return jnp.minimum(nn.relu(h), 6.0) if self.act else h


class Bottleneck(nn.Module):
    """ResNet bottleneck (my_rf_lw.py:94-130)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        residual = x
        h = Conv(self.planes, 1, use_bias=False, kernel_init=kaiming,
                 dtype=self.dtype, name="conv1")(x)
        h = nn.relu(Norm("batch", dtype=self.dtype, name="bn1")(h, train=train))
        h = Conv(self.planes, 3, stride=self.stride, padding=1, use_bias=False,
                 kernel_init=kaiming, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(Norm("batch", dtype=self.dtype, name="bn2")(h, train=train))
        h = Conv(self.planes * 4, 1, use_bias=False, kernel_init=kaiming,
                 dtype=self.dtype, name="conv3")(h)
        h = Norm("batch", dtype=self.dtype, name="bn3")(h, train=train)
        if self.downsample:
            residual = Conv(self.planes * 4, 1, stride=self.stride,
                            use_bias=False, kernel_init=kaiming,
                            dtype=self.dtype, name="down_conv")(x)
            residual = Norm("batch", dtype=self.dtype, name="down_bn")(residual, train=train)
        return nn.relu(h + residual)


class ResLayer(nn.Module):
    planes: int
    blocks: int
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        need_down = self.stride != 1 or x.shape[-1] != self.planes * 4
        x = Bottleneck(self.planes, self.stride, need_down, self.dtype,
                       name="block0")(x, train=train)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, 1, False, self.dtype,
                           name=f"block{i}")(x, train=train)
        return x


class InsAdapter(nn.Module):
    """Per-domain adapter: 1×1 conv (no bias) + InstanceNorm
    (my_rf_lw.py:312-321)."""

    planes: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = Conv(self.planes, 1, use_bias=False, kernel_init=kaiming,
                 dtype=self.dtype, name="conv")(x)
        return InstanceNorm(name="ins")(h)


class PSPBlock(nn.Module):
    """4 dilated 3×3 conv-bn-relu6 branches (d = 1,3,5,7) concat + 1×1
    residual (layer_factory.py:54-80)."""

    out_planes: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        branches = []
        for i in range(4):
            d = 2 * i + 1
            h = Conv(self.out_planes // 4, 3, padding=d, dilation=d,
                     use_bias=False, kernel_init=kaiming, dtype=self.dtype,
                     name=f"psp{i}_conv")(x)
            h = Norm("batch", dtype=self.dtype, name=f"psp{i}_bn")(h, train=train)
            branches.append(jnp.minimum(nn.relu(h), 6.0))
        # residual 1×1 path: plain Conv2d (bias=True, unlike convbnrelu) + BN
        # + ReLU6 (layer_factory.py:66)
        res = Conv(self.out_planes, 1, use_bias=True, kernel_init=kaiming,
                   dtype=self.dtype, name="res_conv")(x)
        res = Norm("batch", dtype=self.dtype, name="res_bn")(res, train=train)
        res = jnp.minimum(nn.relu(res), 6.0)
        return jnp.concatenate(branches, axis=-1) + res


class CRPBlock(nn.Module):
    """Chained residual pooling (layer_factory.py:31-51)."""

    out_planes: int
    n_stages: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        top = x
        for i in range(self.n_stages):
            top = max_pool(top, 3, 1, padding=1)
            top = Conv(self.out_planes, 1, use_bias=False, kernel_init=kaiming,
                       dtype=self.dtype, name=f"stage{i}")(top)
            x = top + x
        return x


class ATBlock(nn.Module):
    """Concat-attention fusion (layer_factory.py:83-113): channel gate from
    the concatenated pair scales the pair; 1×1 projects to out_c."""

    out_c: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, s_feature, d_feature, *, train: bool = False):
        x = jnp.concatenate([s_feature, d_feature], axis=-1)
        a = Conv(x.shape[-1], 3, stride=2, padding=1, use_bias=True,
                 kernel_init=kaiming, dtype=self.dtype, name="at_conv")(x)
        a = nn.leaky_relu(Norm("batch", dtype=self.dtype, name="at_bn")(a, train=train), 0.02)
        a = nn.sigmoid(jnp.mean(a, axis=(1, 2), keepdims=True))
        out = a * x
        return Conv(self.out_c, 1, use_bias=False, kernel_init=kaiming,
                    dtype=self.dtype, name="proj")(out)


class DepthBlockR6(nn.Module):
    """depth_block, ReLU6 variant (my_rf_lw.py:169-224)."""

    in_c: int = 256
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from .s2d_networks import normal02
        from ..ops import ConvTranspose

        c = self.in_c
        dep_o, out_f = [], []
        for i in range(4):
            f = ConvTranspose(c // 2, 4, stride=2, padding=1, output_padding=0,
                              use_bias=True, kernel_init=normal02,
                              dtype=self.dtype, name=f"up{i}_deconv")(x)
            f = Norm("batch", dtype=self.dtype, name=f"up{i}_norm0")(nn.leaky_relu(f, 0.02),
                                                   train=train)
            f = Conv(c // 2, 1, use_bias=True, kernel_init=normal02,
                     dtype=self.dtype, name=f"up{i}_conv")(f)
            f = Norm("batch", dtype=self.dtype, name=f"up{i}_norm1")(jnp.minimum(nn.relu(f), 6.0),
                                                   train=train)
            d = Conv(1, 3, padding=1, use_bias=True, kernel_init=normal02,
                     dtype=self.dtype, name=f"depth_out{i}")(f)
            dep_o.append(jnp.tanh(d))
            a = Conv(c // 2, 3, stride=2, padding=1, use_bias=True,
                     kernel_init=normal02, dtype=self.dtype,
                     name=f"at{i}_conv")(x)
            a = Norm("batch", dtype=self.dtype, name=f"at{i}_norm")(jnp.minimum(nn.relu(a), 6.0),
                                                  train=train)
            a = jnp.mean(a, axis=(1, 2), keepdims=True)
            out_f.append(nn.sigmoid(a) * f + f)
        h = jnp.concatenate(out_f, axis=-1)
        h = Conv(c // 2, 3, padding=1, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="fuse_conv")(h)
        h = Norm("batch", dtype=self.dtype, name="fuse_norm")(nn.leaky_relu(h, 0.02), train=train)
        d1 = Conv(1, 3, padding=1, use_bias=True, kernel_init=normal02,
                  dtype=self.dtype, name="dep_conv")(h)
        return dep_o, jnp.tanh(d1)


class ResNetLW(nn.Module):
    """ResNetLW (my_rf_lw.py:226-457): trunk + per-domain adapters +
    PSP/AT top-down fusion + depth block.

    ``__call__(x, domain)`` → (dep_outs, pred_d, (x4, x3, x2, x1)).
    """

    layers: Sequence[int] = (3, 4, 23, 3)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, domain: str = "real", *, train: bool = False):
        dt = self.dtype
        h = Conv(64, 7, stride=2, padding=3, use_bias=False, kernel_init=kaiming,
                 dtype=dt, name="conv1")(x)
        h = nn.relu(Norm("batch", dtype=self.dtype, name="bn1")(h, train=train))
        h = max_pool(h, 3, 2, padding=1)

        suffix = "r" if domain == "real" else "s"
        other = "s" if domain == "real" else "r"
        ls = []
        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        for i in range(4):
            h = ResLayer(planes[i], self.layers[i], strides[i], dtype=dt,
                         name=f"layer{i + 1}")(h, train=train)
            h = InsAdapter(planes[i] * 4, dtype=dt,
                           name=f"ins_layer{i + 1}_{suffix}")(h)
            if self.is_initializing():
                InsAdapter(planes[i] * 4, dtype=dt,
                           name=f"ins_layer{i + 1}_{other}")(h)
            ls.append(h)
        l1, l2, l3, l4 = ls

        def up_to(t, ref):
            return resize_bilinear(t, ref.shape[1:3], align_corners=True)

        x4 = ConvBnRelu6(1024, 1, dtype=dt, name="outl1_dimred")(l4, train=train)
        x4 = nn.relu(x4)
        x4 = PSPBlock(1024, dtype=dt, name="psp4")(x4, train=train)
        x4 = Conv(512, 1, use_bias=False, kernel_init=kaiming, dtype=dt,
                  name="g1_dimred")(x4)
        x4 = up_to(x4, l3)

        x3 = ConvBnRelu6(512, 1, dtype=dt, name="outl2_dimred")(l3, train=train)
        x3 = Conv(512, 1, use_bias=False, kernel_init=kaiming, dtype=dt,
                  name="adapt2")(x3)
        x3 = ATBlock(512, dtype=dt, name="cat3")(x3, x4, train=train)
        x3 = PSPBlock(512, dtype=dt, name="psp3")(x3, train=train)
        x3 = Conv(256, 1, use_bias=False, kernel_init=kaiming, dtype=dt,
                  name="g2_dimred")(x3)
        x3 = up_to(x3, l2)

        x2 = ConvBnRelu6(256, 1, dtype=dt, name="outl3_dimred")(l2, train=train)
        x2 = Conv(256, 1, use_bias=False, kernel_init=kaiming, dtype=dt,
                  name="adapt3")(x2)
        x2 = ATBlock(256, dtype=dt, name="cat2")(x2, x3, train=train)
        x2 = PSPBlock(256, dtype=dt, name="psp2")(x2, train=train)
        x2 = Conv(256, 1, use_bias=False, kernel_init=kaiming, dtype=dt,
                  name="g3_dimred")(x2)
        x2 = up_to(x2, l1)

        x1 = ConvBnRelu6(256, 1, dtype=dt, name="outl4_dimred")(l1, train=train)
        x1 = Conv(256, 1, use_bias=False, kernel_init=kaiming, dtype=dt,
                  name="adapt4")(x1)
        x1 = ATBlock(256, dtype=dt, name="cat1")(x1, x2, train=train)
        x1 = PSPBlock(256, dtype=dt, name="psp1")(x1, train=train)

        dep_outs, pred_d = DepthBlockR6(256, dtype=dt, name="dep")(x1, train=train)
        return dep_outs, pred_d, (x4, x3, x2, x1)


def rf_lw101(dtype=None) -> ResNetLW:
    """ResNet-101 working point (my_rf_lw.py:519-521)."""
    return ResNetLW(layers=(3, 4, 23, 3), dtype=dtype)


class Segd(nn.Module):
    """segd head (my_rf_lw.py:493-516): up_scale DeconvBlocks (halving
    inferred channels) + 1×1 → n_cls+1 logits (extra 'fake' class)."""

    n_cls: int = 28
    up_scale: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = x.shape[-1]
        for i in range(self.up_scale):
            c //= 2
            x = DeconvBlock(c, dtype=self.dtype, name=f"up{i}")(x, train=train)
        from .s2d_networks import normal02

        return Conv(self.n_cls + 1, 1, use_bias=True, kernel_init=normal02,
                    dtype=self.dtype, name="head")(x)


class DCGANDiscriminator(nn.Module):
    """DCGAN_D with SELU (my_rf_lw.py:134-167)."""

    d_h_size: int = 64
    n_middle: int = 5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = Conv(self.d_h_size, 4, stride=2, padding=1, use_bias=False,
                 kernel_init=kaiming, dtype=self.dtype, name="start")(x)
        h = jax.nn.selu(h)
        mult = 1
        for i in range(self.n_middle):
            h = Conv(self.d_h_size * 2 * mult, 4, stride=2, padding=1,
                     use_bias=False, kernel_init=kaiming, dtype=self.dtype,
                     name=f"mid{i}")(h)
            h = jax.nn.selu(h)
            mult *= 2
        h = Conv(1, 4, stride=1, padding=0, use_bias=False, kernel_init=kaiming,
                 dtype=self.dtype, name="end")(h)
        return nn.sigmoid(h).reshape(-1)


def seg_gan_loss(logits: jax.Array, labels: jax.Array, target_is_real: bool,
                 n_cls: int = 28) -> jax.Array:
    """seg heads as discriminators (my_rf_lw.py:523-537): CE to the true
    labels when 'real', CE to the constant extra class when 'fake'."""
    if target_is_real:
        return cross_entropy_loss(logits, labels, 255)
    fake = jnp.full_like(labels, n_cls)
    return cross_entropy_loss(logits, fake, 255)
