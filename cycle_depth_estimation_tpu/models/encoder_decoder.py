"""U-Net encoder/decoder pair for SegCycle.

Re-design of reference models/encoder_decoder.py:120-209: `UNetEncoder`
(7×7 entry + 3 encoder blocks, avg-pooled, + inception center) returns the
5-tuple of skip features; `UNetDecoder` (center up-block + 3 decoder
up-blocks) emits multi-scale side outputs ``[center_in, output4..output1]``
with weighted skip concats (0.1 / 0.05 / 0.01 relative weights via
weight·{1, 0.5, 0.1}).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import Conv, Norm, avg_pool, reflect_pad, resize_nearest
from ..ops.init import make_initializer
from ..ops.layers import norm_uses_bias
from .seg_network import (
    DecoderUpBlock,
    EncoderBlock,
    InceptionBlock,
    OutputBlock,
    make_activation,
)

Dtype = Any


class UNetEncoder(nn.Module):
    """reference encoder_decoder.py:120-161."""

    ngf: int = 64
    layers: int = 4
    norm: str = "batch"
    activation: str = "PReLU"
    drop_rate: float = 0.0
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
        return [conv1, conv2, conv3, center_in, h]


class UNetDecoder(nn.Module):
    """reference encoder_decoder.py:163-209 — multi-scale side outputs."""

    output_nc: int
    ngf: int = 64
    weight: float = 0.1
    norm: str = "batch"
    activation: str = "PReLU"
    init_type: str = "xavier"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats: List[jax.Array], *, train: bool = False):
        act = make_activation(self.activation, self)
        use_bias = norm_uses_bias(self.norm)
        kinit = make_initializer(self.init_type)
        conv1, conv2, conv3, center_in, center_out = feats
        ngf, w = self.ngf, self.weight
        kw = dict(norm=self.norm, use_bias=use_bias, kernel_init=kinit,
                  dtype=self.dtype)
        okw = dict(use_bias=use_bias, kernel_init=kinit, dtype=self.dtype)

        def up2(t):
            n, hh, ww, c = t.shape
            return resize_nearest(t, (hh * 2, ww * 2))

        result = [center_in]
        center_out = DecoderUpBlock(ngf * 8, ngf * 4, name="deconv_center",
                                    **kw)(center_out, train=train, act=act)
        cat4 = jnp.concatenate([center_out, conv3 * w], axis=-1)
        deconv4 = DecoderUpBlock(ngf * 8, ngf * 2, name="deconv4", **kw)(
            cat4, train=train, act=act)
        output4 = OutputBlock(self.output_nc, 3, name="output4", **okw)(cat4)
        result.append(output4)
        cat3 = jnp.concatenate([deconv4, conv2 * w * 0.5, up2(output4)], axis=-1)
        deconv3 = DecoderUpBlock(ngf * 4, ngf, name="deconv3", **kw)(
            cat3, train=train, act=act)
        output3 = OutputBlock(self.output_nc, 3, name="output3", **okw)(cat3)
        result.append(output3)
        cat2 = jnp.concatenate([deconv3, conv1 * w * 0.1, up2(output3)], axis=-1)
        deconv2 = DecoderUpBlock(ngf * 2, ngf // 2, name="deconv2", **kw)(
            cat2, train=train, act=act)
        output2 = OutputBlock(self.output_nc, 3, name="output2", **okw)(cat2)
        result.append(output2)
        cat1 = jnp.concatenate([deconv2, up2(output2)], axis=-1)
        result.append(OutputBlock(self.output_nc, 7, name="output1", **okw)(cat1))
        return result
