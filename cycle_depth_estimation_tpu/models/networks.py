"""CycleGAN / pix2pix network family, TPU-native.

Re-designs the nets of reference models/networks.py for JAX/XLA:

- ``ResnetGenerator``  (reference models/networks.py:145-236)
- ``UnetGenerator``    (reference models/networks.py:243-316) — written as an
  explicit loop over an encoder/decoder stack instead of the reference's
  recursive ``UnetSkipConnectionBlock`` objects; identical dataflow.
- ``NLayerDiscriminator`` 70×70 PatchGAN (reference models/networks.py:320-364)
- ``PixelDiscriminator``  (reference models/networks.py:367-389)
- ``gan_loss``         (reference models/networks.py:119-138)
- ``define_G`` / ``define_D`` factory strings (reference models/networks.py:73-107)
- LR schedules          (reference models/networks.py:24-38)

All modules are NHWC, accept a compute ``dtype`` (bf16 on TPU), keep params in
fp32, and contain no Python control flow on traced values — each compiles to a
single XLA program.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import Conv, ConvTranspose, Norm, reflect_pad, replicate_pad
from ..ops.layers import norm_uses_bias
from ..ops.init import make_initializer

Dtype = Any


class ResnetBlock(nn.Module):
    """Residual block: pad→conv3×3→norm→relu→[dropout]→pad→conv3×3→norm, +x."""

    dim: int
    padding_type: str = "reflect"
    norm: str = "instance"
    use_dropout: bool = False
    use_bias: bool = True
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        kinit = make_initializer(self.init_type, self.init_gain)

        if self.padding_type == "reflect":
            # NOTE: the fused border-correction variant
            # (ops.layers.conv3x3_reflect, padding_mode='reflect') measured
            # neutral-to-slower end-to-end on v5e (841 vs 853 img/s — the
            # scatter-add border fixes cost what the pad copy saved), so the
            # plain pad+conv stays.
            conv_kw = dict(padding=0)
            pad1 = lambda h: reflect_pad(h, 1)  # noqa: E731
        elif self.padding_type == "replicate":
            conv_kw = dict(padding=0)
            pad1 = lambda h: replicate_pad(h, 1)  # noqa: E731
        elif self.padding_type == "zero":
            conv_kw = dict(padding=1)
            pad1 = lambda h: h  # noqa: E731
        else:
            raise NotImplementedError(f"padding [{self.padding_type}] is not implemented")

        h = Conv(self.dim, 3, use_bias=self.use_bias, kernel_init=kinit,
                 dtype=self.dtype, name="conv1", **conv_kw)(pad1(x))
        h = Norm(self.norm, dtype=self.dtype, name="norm1")(h, train=train)
        h = nn.relu(h)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h = Conv(self.dim, 3, use_bias=self.use_bias, kernel_init=kinit,
                 dtype=self.dtype, name="conv2", **conv_kw)(pad1(h))
        h = Norm(self.norm, dtype=self.dtype, name="norm2")(h, train=train)
        return x + h


class ResnetGenerator(nn.Module):
    """Johnson-style generator: 7×7 entry, 2× stride-2 down, N residual
    blocks, 2× transposed-conv up, 7×7 exit, tanh."""

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    norm: str = "instance"
    use_dropout: bool = False
    padding_type: str = "reflect"
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Optional[Dtype] = None
    #: up-stage architecture. 'convtranspose' is the reference topology
    #: (models/networks.py:129-136 ConvTranspose2d k3 s2). 'resize_conv' is
    #: the TPU-first fast-serving variant: nearest ×2 + dense 3×3 conv —
    #: same FLOPs, but the conv is a plain dense MXU op (quantizable to
    #: int8; the dilated/phase-decomposed int8 ConvTranspose measured
    #: slower, models/quantization.py). NON-parity: train with it.
    up_mode: str = "convtranspose"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        use_bias = norm_uses_bias(self.norm)
        kinit = make_initializer(self.init_type, self.init_gain)
        dt = self.dtype

        h = reflect_pad(x, 3)
        h = Conv(self.ngf, 7, use_bias=use_bias, kernel_init=kinit, dtype=dt,
                 name="conv_in")(h)
        h = Norm(self.norm, dtype=self.dtype, name="norm_in")(h, train=train)
        h = nn.relu(h)

        n_down = 2
        for i in range(n_down):
            mult = 2 ** i
            h = Conv(self.ngf * mult * 2, 3, stride=2, padding=1, use_bias=use_bias,
                     kernel_init=kinit, dtype=dt, name=f"down{i}_conv")(h)
            h = Norm(self.norm, dtype=self.dtype, name=f"down{i}_norm")(h, train=train)
            h = nn.relu(h)

        mult = 2 ** n_down
        for i in range(self.n_blocks):
            h = ResnetBlock(self.ngf * mult, padding_type=self.padding_type,
                            norm=self.norm, use_dropout=self.use_dropout,
                            use_bias=use_bias, init_type=self.init_type,
                            init_gain=self.init_gain, dtype=dt,
                            name=f"block{i}")(h, train=train)

        for i in range(n_down):
            mult = 2 ** (n_down - i)
            if self.up_mode == "resize_conv":
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = Conv(self.ngf * mult // 2, 3, padding=1, use_bias=use_bias,
                         kernel_init=kinit, dtype=dt, name=f"up{i}_conv")(h)
            else:
                h = ConvTranspose(self.ngf * mult // 2, 3, stride=2, padding=1,
                                  output_padding=1, use_bias=use_bias,
                                  kernel_init=kinit, dtype=dt,
                                  name=f"up{i}_conv")(h)
            h = Norm(self.norm, dtype=self.dtype, name=f"up{i}_norm")(h, train=train)
            h = nn.relu(h)

        h = reflect_pad(h, 3)
        h = Conv(self.output_nc, 7, use_bias=True, kernel_init=kinit, dtype=dt,
                 name="conv_out")(h)
        return jnp.tanh(h)


class UnetGenerator(nn.Module):
    """U-Net generator with ``num_downs`` halvings (unet_128 → 7, unet_256 → 8).

    Encoder level channels: ngf, 2ngf, 4ngf, 8ngf, 8ngf, … (cap 8ngf).
    Skip connections concatenate encoder features on channels, matching the
    reference's recursive construction: the concat order is
    ``[skip, upsampled]`` (torch dim-1 == NHWC channel axis).
    Dropout (0.5) is applied on the three innermost non-bottleneck decoder
    levels when ``use_dropout`` (reference models/networks.py:250-251,305-306).
    """

    output_nc: int = 3
    num_downs: int = 8
    ngf: int = 64
    norm: str = "batch"
    use_dropout: bool = False
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        use_bias = norm_uses_bias(self.norm)
        kinit = make_initializer(self.init_type, self.init_gain)
        dt = self.dtype
        nd = self.num_downs

        def enc_ch(level):  # channels after downconv at this level (0=outermost)
            return self.ngf * min(2 ** level, 8)

        # ---- encoder ----
        skips = []
        h = x
        for lvl in range(nd):
            inner = enc_ch(lvl)
            if lvl > 0:
                h = nn.leaky_relu(h, 0.2)
            # every downconv (incl. outermost) follows the norm-derived bias
            # convention (reference models/networks.py:277-278).
            h = Conv(inner, 4, stride=2, padding=1, use_bias=use_bias,
                     kernel_init=kinit, dtype=dt, name=f"down{lvl}_conv")(h)
            if 0 < lvl < nd - 1:  # innermost has no downnorm
                h = Norm(self.norm, dtype=self.dtype, name=f"down{lvl}_norm")(h, train=train)
            skips.append(h)

        # ---- decoder ----
        for lvl in reversed(range(nd)):
            outer = self.output_nc if lvl == 0 else enc_ch(lvl - 1)
            h = nn.relu(h)
            h = ConvTranspose(outer, 4, stride=2, padding=1, output_padding=0,
                              use_bias=(use_bias if lvl > 0 else True),
                              kernel_init=kinit, dtype=dt, name=f"up{lvl}_conv")(h)
            if lvl == 0:
                return jnp.tanh(h)
            h = Norm(self.norm, dtype=self.dtype, name=f"up{lvl}_norm")(h, train=train)
            # dropout on inner (8ngf→8ngf) decoder levels, reference order:
            # the non-innermost 8ngf blocks apply dropout after the skip-concat
            # of their submodule — equivalently here, right after upnorm.
            if self.use_dropout and 4 <= lvl < nd - 1:
                h = nn.Dropout(0.5, deterministic=not train)(h)
            h = jnp.concatenate([skips[lvl - 1], h], axis=-1)


class NLayerDiscriminator(nn.Module):
    """70×70 PatchGAN discriminator."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    use_sigmoid: bool = False
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        use_bias = norm_uses_bias(self.norm)
        kinit = make_initializer(self.init_type, self.init_gain)
        dt = self.dtype

        h = Conv(self.ndf, 4, stride=2, padding=1, use_bias=True,
                 kernel_init=kinit, dtype=dt, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = Conv(self.ndf * nf_mult, 4, stride=2, padding=1, use_bias=use_bias,
                     kernel_init=kinit, dtype=dt, name=f"conv{n}")(h)
            h = Norm(self.norm, dtype=self.dtype, name=f"norm{n}")(h, train=train)
            h = nn.leaky_relu(h, 0.2)

        nf_mult = min(2 ** self.n_layers, 8)
        h = Conv(self.ndf * nf_mult, 4, stride=1, padding=1, use_bias=use_bias,
                 kernel_init=kinit, dtype=dt, name=f"conv{self.n_layers}")(h)
        h = Norm(self.norm, dtype=self.dtype, name=f"norm{self.n_layers}")(h, train=train)
        h = nn.leaky_relu(h, 0.2)

        h = Conv(1, 4, stride=1, padding=1, use_bias=True, kernel_init=kinit,
                 dtype=dt, name="conv_out")(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        return h


class PixelDiscriminator(nn.Module):
    """1×1 per-pixel discriminator."""

    ndf: int = 64
    norm: str = "instance"
    use_sigmoid: bool = False
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        use_bias = norm_uses_bias(self.norm)
        kinit = make_initializer(self.init_type, self.init_gain)
        dt = self.dtype
        h = Conv(self.ndf, 1, use_bias=True, kernel_init=kinit, dtype=dt,
                 name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        h = Conv(self.ndf * 2, 1, use_bias=use_bias, kernel_init=kinit, dtype=dt,
                 name="conv1")(h)
        h = Norm(self.norm, dtype=self.dtype, name="norm1")(h, train=train)
        h = nn.leaky_relu(h, 0.2)
        h = Conv(1, 1, use_bias=use_bias, kernel_init=kinit, dtype=dt,
                 name="conv2")(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        return h


# ---------------------------------------------------------------------------
# factories (string keys identical to the reference CLI)
# ---------------------------------------------------------------------------


# norm defaults to "batch" like the reference define_G (networks.py:63)
def define_G(output_nc: int, ngf: int, net_g: str, norm: str = "batch",
             use_dropout: bool = False, init_type: str = "normal",
             init_gain: float = 0.02, dtype: Optional[Dtype] = None) -> nn.Module:
    common = dict(norm=norm, use_dropout=use_dropout, init_type=init_type,
                  init_gain=init_gain, dtype=dtype)
    if net_g == "resnet_9blocks":
        return ResnetGenerator(output_nc=output_nc, ngf=ngf, n_blocks=9, **common)
    if net_g == "resnet_6blocks":
        return ResnetGenerator(output_nc=output_nc, ngf=ngf, n_blocks=6, **common)
    if net_g == "resnet_3blocks" or net_g == "3blocks":
        # the reference's base_options default netG string is '3blocks'
        return ResnetGenerator(output_nc=output_nc, ngf=ngf, n_blocks=3, **common)
    if net_g == "unet_128":
        return UnetGenerator(output_nc=output_nc, num_downs=7, ngf=ngf, **common)
    if net_g == "unet_256":
        return UnetGenerator(output_nc=output_nc, num_downs=8, ngf=ngf, **common)
    raise NotImplementedError(f"Generator model name [{net_g}] is not recognized")


# norm defaults to "batch" like the reference define_D (networks.py:88)
def define_D(ndf: int, net_d: str, n_layers_d: int = 3, norm: str = "batch",
             use_sigmoid: bool = False, init_type: str = "normal",
             init_gain: float = 0.02, dtype: Optional[Dtype] = None) -> nn.Module:
    common = dict(norm=norm, use_sigmoid=use_sigmoid, init_type=init_type,
                  init_gain=init_gain, dtype=dtype)
    if net_d == "basic":
        return NLayerDiscriminator(ndf=ndf, n_layers=3, **common)
    if net_d == "n_layers":
        return NLayerDiscriminator(ndf=ndf, n_layers=n_layers_d, **common)
    if net_d == "pixel":
        return PixelDiscriminator(ndf=ndf, **common)
    raise NotImplementedError(f"Discriminator model name [{net_d}] is not recognized")


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def gan_loss(pred: jax.Array, target_is_real: bool, mode: str = "lsgan") -> jax.Array:
    """GAN criterion over prediction maps.

    ``lsgan``: MSE against 1/0 (over raw D outputs).
    ``vanilla``: BCE — numerically computed with logits
    (sigmoid∘BCE ≡ BCEWithLogits); build D with use_sigmoid=False for this
    path.
    """
    pred = pred.astype(jnp.float32)
    target = 1.0 if target_is_real else 0.0
    if mode == "lsgan":
        return jnp.mean(jnp.square(pred - target))
    if mode == "vanilla":
        # mean BCE-with-logits
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
    raise NotImplementedError(f"gan mode [{mode}] not implemented")


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def mse_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


# ---------------------------------------------------------------------------
# LR schedules (host-side; epoch-stepped like reference get_scheduler)
# ---------------------------------------------------------------------------


def lr_schedule(policy: str, base_lr: float, *, epoch: int, niter: int = 5,
                niter_decay: int = 5, lr_decay_iters: int = 15) -> float:
    """Compute the LR for an epoch under the reference's policies.

    ``lambda`` reproduces the hardcoded rule lr·(1 − max(0, epoch−10)/30)
    (reference models/networks.py:26-28 ignores niter/niter_decay).
    """
    if policy == "lambda":
        return base_lr * (1.0 - max(0, epoch - 10) / 30.0)
    if policy == "step":
        return base_lr * (0.1 ** (epoch // lr_decay_iters))
    if policy == "cosine":
        import math

        return base_lr * 0.5 * (1.0 + math.cos(math.pi * epoch / max(1, niter)))
    if policy == "plateau":
        # stateful — handled by BaseModel.update_learning_rate (torch
        # ReduceLROnPlateau(mode='min', factor=0.2, threshold=0.01,
        # patience=5), reference models/networks.py:32-33); the schedule
        # keeps base_lr until the monitored metric plateaus
        return base_lr
    raise NotImplementedError(f"learning rate policy [{policy}] is not implemented")
