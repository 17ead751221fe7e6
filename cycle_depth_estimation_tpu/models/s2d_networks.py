"""Networks of the final `new_multi` S2D generation (DenseNet seg+depth).

TPU-native re-design of reference new_multi/networks5_ds.py:
- DenseNet building blocks (_DenseLayer/_DenseBlock/_Transition,
  networks5_ds.py:122-155) and the DenseNet-169 backbone (157-227);
- ``G1``: stem + one 6-layer dense block + 3 dual-branch residual blocks
  (networks5_ds.py:26-66, 290-338);
- ``GeneralNet`` (G_2): DenseNet-169 trunk whose transitions are
  ``PspTrans`` side-compressions, a 4-branch dilated PSP head, and dual-mode
  forward ``'S'`` (skip stem — input is G1 features) / ``'R'`` (full image)
  returning (psp output, 4 DETACHED skip features) (networks5_ds.py:344-477);
- ``RDep`` refiner: 3 ``GSide`` attention fusions → ``SegBlock`` (28-class)
  + ``DepthBlock`` (4 band heads + channel-attention gates + fused depth)
  (networks5_ds.py:602-821);
- discriminators: ``SDiscriminator`` (PatchGAN w/ PReLU, 527-566),
  ``FeatureDiscriminatorS`` (MLP, 569-599), ``StarDiscriminator`` (264-288),
  ``Discriminator2Seg`` (842-864);
- legacy decoders ``SEG``/``DEP`` with ``ordimat`` coordinate maps
  (866-921) and ``DeconvBlock`` (68-87);
- losses ``bce_dep_loss`` / ``get_masks`` (947-982) with the reference's
  broadcast semantics.

All NHWC; BatchNorm via `ops.Norm('batch')` with torch momentum/eps.
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
    reflect_pad,
    resize_bilinear,
    resize_nearest,
)
from ..ops.init import make_initializer
from .seg_network import make_activation, prelu

Dtype = Any

kaiming = make_initializer("kaiming")
normal02 = make_initializer("normal", 0.02)


def leaky(x, slope=0.02):
    return nn.leaky_relu(x, slope)


# ---------------------------------------------------------------------------
# DenseNet
# ---------------------------------------------------------------------------

# --- chunked dense blocks (CDE_DENSE_CHUNKED=1) ----------------------------
# The straight translation of torch DenseNet re-concatenates the growing
# feature prefix at EVERY layer: an L-layer block moves O(L²·C) bytes of
# pure copy traffic, and the per-layer norm1 re-reduces the whole prefix for
# batch statistics. The S2D chip trace (tools/profile_diff_S2D_attack.txt)
# puts copy+concatenate at ~61 ms/step = 28% of the train step — all of it
# these chains. The chunked path re-expresses the SAME math (identical
# parameter/stat trees, so checkpoints and importers are untouched):
#
#   * features accumulate in a binary-counter ("Fenwick") chunk list —
#     adjacent equal-width chunks merge, so each feature is copied
#     O(log L) times instead of O(L), and a layer sees ≤ ~6 chunks;
#   * norm1 is BatchNorm: per-channel, so it splits over chunks — in train
#     mode each feature is normalized ONCE when it is born (batch μ/σ² of a
#     channel are the same in every later layer), and each layer applies
#     only its own per-chunk affine (running stats update with the stored
#     per-chunk μ/σ², exactly flax's momentum rule);
#   * conv1 is 1×1: conv(concat(xs), W) == Σ conv(x_i, W_i) over kernel
#     row slices — the concat input is never materialized;
#   * the raw block output is concatenated ONCE (it is needed anyway as the
#     skip feature / PspTrans input).
#
# Numerics: same reductions, re-associated — parity with the unchunked path
# is within bf16 rounding (tests/test_s2d.py::test_dense_chunked_parity).


def dense_chunked() -> bool:
    """CDE_DENSE_CHUNKED=1 selects the chunked dense-block path (read at
    trace time — flip per process to A/B).

    REJECTED BY MEASUREMENT (default stays off): same-day v5e A/Bs
    2026-08-21 measured S2D bf16 bs1 8.93 vs 9.14 control (−2.3%) and
    S2D_base 11.06 vs 11.96 (−7.5%) — the narrow-K per-chunk 1×1 convs
    underfill the MXU and the extra x̂ materialization costs more than the
    concat/copy traffic it removes; XLA's conv-input fusion already
    digests the concat chains well (tools/bench_runs.jsonl). Kept as a
    correct, parity-tested alternative expression of the same math."""
    import os

    return os.environ.get("CDE_DENSE_CHUNKED", "") not in ("", "0")


class _BNVars(nn.Module):
    """Declares exactly the param/stat tree of ``Norm('batch')``'s inner
    flax BatchNorm (scale/bias params, mean/var batch_stats) WITHOUT
    applying it, for the chunked path's sliced application."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, ra_mean, ra_var


class _NormVars(nn.Module):
    """Adds the ``norm`` scope level so the tree matches ``Norm('batch')``."""

    features: int

    @nn.compact
    def __call__(self):
        return _BNVars(self.features, name="norm")()


class _ConvKernel(nn.Module):
    """Declares exactly ``Conv(..., use_bias=False)``'s kernel param."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", kaiming, self.shape, jnp.float32)


_BN_EPS = 1e-5
_BN_MOMENTUM = 0.9  # flax convention: ra = m·ra + (1-m)·batch


def _chunk_stats(x):
    """Batch μ/σ² per channel, flax `_compute_stats` fast-variance form
    (fp32, clipped)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=(0, 1, 2))
    mu2 = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
    var = jnp.maximum(0.0, mu2 - jnp.square(mu))
    return mu, var


def _make_train_chunk(x, cd):
    """(x̂, μ, σ²): normalize once, store x̂ in the compute dtype."""
    mu, var = _chunk_stats(x)
    xhat = ((x.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + _BN_EPS))
    return xhat.astype(cd), mu, var


def _fenwick_push(chunks, new):
    """Append ``new`` then merge trailing equal-channel-width chunks.

    ``chunks`` is a list of tuples of arrays (last axis = channels); merging
    concatenates component-wise. Keeps each feature's total copy count at
    O(log L) while bounding the list length a layer must consume."""
    chunks = list(chunks) + [new]
    def width(c):
        return c[0].shape[-1]
    while len(chunks) >= 2 and width(chunks[-1]) == width(chunks[-2]):
        a, b = chunks[-2], chunks[-1]
        merged = tuple(
            jnp.concatenate([pa, pb], axis=-1 if pa.ndim > 1 else 0)
            for pa, pb in zip(a, b))
        chunks = chunks[:-2] + [merged]
    return chunks


class DenseLayer(nn.Module):
    """BN→ReLU→1×1(bn_size·k)→BN→ReLU→3×3(k), concat onto the input.

    Accepts either a plain tensor (reference-shaped path) or a chunk list
    (chunked path, see module comment above) — in the latter case it
    returns ONLY the new ``growth_rate``-wide feature; the caller
    (``DenseBlock``) owns the chunk bookkeeping."""

    growth_rate: int = 32
    bn_size: int = 4
    drop_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if isinstance(x, (list, tuple)):
            return self._tail(self._chunked_head(x, train), train)
        h = nn.relu(Norm("batch", dtype=self.dtype, name="norm1")(x, train=train))
        h = Conv(self.bn_size * self.growth_rate, 1, use_bias=False,
                 kernel_init=kaiming, dtype=self.dtype, name="conv1")(h)
        return jnp.concatenate([x, self._tail(h, train)], axis=-1)

    def _tail(self, h, train):
        h = nn.relu(Norm("batch", dtype=self.dtype, name="norm2")(h, train=train))
        h = Conv(self.growth_rate, 3, padding=1, use_bias=False,
                 kernel_init=kaiming, dtype=self.dtype, name="conv2")(h)
        if self.drop_rate > 0:
            h = nn.Dropout(self.drop_rate, deterministic=not train)(h)
        return h

    def _chunked_head(self, chunks, train):
        """norm1→relu→conv1 consuming the chunk list without a concat."""
        from jax import lax

        from ..ops.layers import DIMENSION_NUMBERS

        c_in = sum(c[0].shape[-1] for c in chunks)
        feat = self.bn_size * self.growth_rate
        scale, bias, ra_mean, ra_var = _NormVars(c_in, name="norm1")()
        kernel = _ConvKernel((1, 1, c_in, feat), name="conv1")()
        cd = self.dtype or chunks[0][0].dtype
        out = None
        off = 0
        for c in chunks:
            if train:
                xhat, _mu, _var = c
                y = xhat.astype(cd) * scale[off:off + xhat.shape[-1]].astype(cd)
                y = y + bias[off:off + xhat.shape[-1]].astype(cd)
            else:
                (raw,) = c
                w = raw.shape[-1]
                mul = (jax.lax.rsqrt(ra_var.value[off:off + w] + _BN_EPS)
                       * scale[off:off + w])
                y = ((raw.astype(jnp.float32) - ra_mean.value[off:off + w])
                     * mul + bias[off:off + w]).astype(cd)
            y = nn.relu(y)
            w = y.shape[-1]
            o = lax.conv_general_dilated(
                y, kernel[:, :, off:off + w, :].astype(cd), (1, 1),
                ((0, 0), (0, 0)), dimension_numbers=DIMENSION_NUMBERS)
            out = o if out is None else out + o
            off += w
        if train and not self.is_initializing():
            batch_mean = jnp.concatenate([c[1] for c in chunks])
            batch_var = jnp.concatenate([c[2] for c in chunks])
            ra_mean.value = (_BN_MOMENTUM * ra_mean.value
                             + (1 - _BN_MOMENTUM) * batch_mean)
            ra_var.value = (_BN_MOMENTUM * ra_var.value
                            + (1 - _BN_MOMENTUM) * batch_var)
        return out


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int = 32
    bn_size: int = 4
    drop_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if dense_chunked():
            return self._chunked(x, train)
        for i in range(self.num_layers):
            x = DenseLayer(self.growth_rate, self.bn_size, self.drop_rate,
                           self.dtype, name=f"denselayer{i + 1}")(x, train=train)
        return x

    def _chunked(self, x, train):
        cd = self.dtype or x.dtype
        raws = [x]
        chunks = [(_make_train_chunk(x, cd) if train else (x,))]
        for i in range(self.num_layers):
            h = DenseLayer(self.growth_rate, self.bn_size, self.drop_rate,
                           self.dtype, name=f"denselayer{i + 1}")(
                               chunks, train=train)
            raws.append(h)
            chunks = _fenwick_push(
                chunks, _make_train_chunk(h, cd) if train else (h,))
        return jnp.concatenate(raws, axis=-1)


class Transition(nn.Module):
    """BN→ReLU→1×1 halve→avgpool2 (networks5_ds.py:148-155)."""

    num_output_features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.relu(Norm("batch", dtype=self.dtype, name="norm")(x, train=train))
        h = Conv(self.num_output_features, 1, use_bias=False, kernel_init=kaiming,
                 dtype=self.dtype, name="conv")(h)
        return avg_pool(h, 2, 2)


class DenseNetBackbone(nn.Module):
    """DenseNet-169-style feature extractor (networks5_ds.py:157-227):
    stem (no maxpool) + 4 dense blocks with transitions + extra avgpools;
    returns the 3 deepest block outputs.

    NOTE: the reference class is UNRUNNABLE as checked in — its forward
    calls ``self.features.block0`` (networks5_ds.py:209) but ``block0`` is
    never registered (the Sequential grouping at :81 is commented out), so
    no reference run ever constructs it. Kept here as the repaired,
    runnable form (stem = conv0+norm0+relu0 exactly as registered, so the
    first scale is 1/2 — the reference's ``# 1/4`` comment assumed the
    commented-out pool0); covered by a shape-contract test."""

    num_init_features: int = 64
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 32, 32)
    bn_size: int = 4
    drop_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = Conv(self.num_init_features, 7, stride=2, padding=3, use_bias=False,
                 kernel_init=kaiming, dtype=self.dtype, name="conv0")(x)
        h = nn.relu(Norm("batch", dtype=self.dtype, name="norm0")(h, train=train))
        outputs = []
        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            h = DenseBlock(num_layers, self.growth_rate, self.bn_size,
                           self.drop_rate, self.dtype,
                           name=f"denseblock{i + 1}")(h, train=train)
            num_features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                num_features //= 2
                h = Transition(num_features, self.dtype,
                               name=f"transition{i + 1}")(h, train=train)
                if i >= 1:
                    outputs.append(h)
                h = avg_pool(h, 2, 2)
            else:
                outputs.append(h)
        return outputs


class DualResnetBlock(nn.Module):
    """x + conv0(x) + conv1(x): 1×1(dilation 2) branch + reflect-pad 3×3
    branch (reference ResnetBlock, networks5_ds.py:290-338)."""

    dim: int
    norm: str = "batch"
    use_dropout: bool = False
    use_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c0 = Conv(self.dim, 1, dilation=2, use_bias=self.use_bias,
                  kernel_init=kaiming, dtype=self.dtype, name="conv0")(x)
        c0 = Norm(self.norm, dtype=self.dtype, name="norm0")(c0, train=train)
        if self.use_dropout:
            c0 = nn.Dropout(0.5, deterministic=not train)(c0)
        c1 = Conv(self.dim, 3, use_bias=self.use_bias, kernel_init=kaiming,
                  dtype=self.dtype, name="conv1")(reflect_pad(x, 1))
        c1 = nn.relu(Norm(self.norm, dtype=self.dtype, name="norm1")(c1, train=train))
        if self.use_dropout:
            # the reference drops BOTH branches (build_conv1_block appends
            # Dropout(0.5) after the ReLU, networks5_ds.py:329-330)
            c1 = nn.Dropout(0.5, deterministic=not train)(c1)
        return x + c0 + c1


class G1(nn.Module):
    """G_1 entry net (networks5_ds.py:26-66): stem + 6-layer dense block +
    3×3 entry conv + n residual blocks → ngf-ch @1/2.

    ``block_type`` selects the residual-block generation: 'dual' is the
    new_multi/dilated dual-branch block (networks5_ds.py:33-66); 'resnet'
    is the base generation's standard two-conv ResnetBlock
    (my_seg_depth/networks2.py:285-329 with :355-393 blocks).
    """

    growth_rate: int = 32
    block_config: int = 6
    num_init_features: int = 64
    bn_size: int = 4
    ngf: int = 64
    n_blocks: int = 3
    norm: str = "batch"
    use_dropout: bool = False
    block_type: str = "dual"  # 'dual' | 'resnet'
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        use_bias = self.norm == "instance"
        h = Conv(self.num_init_features, 7, stride=2, padding=3, use_bias=False,
                 kernel_init=kaiming, dtype=self.dtype, name="conv0")(x)
        h = nn.relu(Norm("batch", dtype=self.dtype, name="norm0")(h, train=train))
        h = DenseBlock(self.block_config, self.growth_rate, self.bn_size,
                       dtype=self.dtype, name="denseblock1")(h, train=train)
        h = Conv(self.ngf, 3, use_bias=use_bias, kernel_init=kaiming,
                 dtype=self.dtype, name="entry_conv")(reflect_pad(h, 1))
        h = nn.relu(Norm(self.norm, dtype=self.dtype, name="entry_norm")(h, train=train))
        for i in range(self.n_blocks):
            if self.block_type == "dual":
                h = DualResnetBlock(self.ngf, norm=self.norm,
                                    use_dropout=self.use_dropout,
                                    use_bias=use_bias,
                                    dtype=self.dtype, name=f"block{i}")(
                    h, train=train)
            else:
                from .networks import ResnetBlock

                h = ResnetBlock(self.ngf, padding_type="reflect",
                                norm=self.norm,
                                use_dropout=self.use_dropout,
                                use_bias=use_bias, dtype=self.dtype,
                                name=f"block{i}")(h, train=train)
        return h


class PspTrans(nn.Module):
    """_pspTrans (networks5_ds.py:344-361): BN→ReLU→cat(1×1, 3×3) each /4
    → half channels, then avgpool2."""

    num_input_features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        nout = self.num_input_features // 4
        h = nn.relu(Norm("batch", dtype=self.dtype, name="norm")(x, train=train))
        a = Conv(nout, 1, use_bias=False, kernel_init=kaiming, dtype=self.dtype,
                 name="conv1x1")(h)
        b = Conv(nout, 3, padding=1, use_bias=False, kernel_init=kaiming,
                 dtype=self.dtype, name="conv3x3")(h)
        return avg_pool(jnp.concatenate([a, b], axis=-1), 2, 2)


def psp_head(h, mid_nc, dtype, train):
    """4-branch dilated PSP head shared by GeneralNet / GeneralNet2 /
    FeatureNet (networks5_ds.py:394-409, forward 435-443; networks.py:
    252-266 — including the quirky psp_b2 kernel-2/pad-1/dilation-2 branch).
    Plain function called inside the owner's ``@nn.compact`` scope so the
    parameter names stay flat (``psp_b0``…), keeping every importer path
    unchanged."""
    q = mid_nc // 4
    h = nn.relu(Norm("batch", dtype=dtype, name="psp_norm_in")(h, train=train))
    b0 = Conv(q, 1, use_bias=False, kernel_init=kaiming, dtype=dtype,
              name="psp_b0")(h)
    b1 = Conv(q, 1, dilation=1, use_bias=False, kernel_init=kaiming,
              dtype=dtype, name="psp_b1")(h)
    b2 = Conv(q, 2, padding=1, dilation=2, use_bias=False,
              kernel_init=kaiming, dtype=dtype, name="psp_b2")(h)
    b3 = Conv(q, 3, padding=2, dilation=2, use_bias=False,
              kernel_init=kaiming, dtype=dtype, name="psp_b3")(h)
    out = jnp.concatenate([b0, b1, b2, b3], axis=-1)
    return Norm("batch", dtype=dtype, name="psp_norm_out")(out, train=train)


class GeneralNet(nn.Module):
    """General_net (G_2, networks5_ds.py:366-477).

    ``mode='R'`` runs stem + 4 dense blocks; ``mode='S'`` expects G1 features
    (64-ch @1/2) and skips the stem. Between blocks, ``PspTrans`` compresses
    channels and halves resolution. A 4-branch dilated PSP head produces the
    ``mid_nc`` output. Skip features (each dense block's raw output) are
    returned **detached** — gradients reach the trunk only through the PSP
    head, exactly as in the reference (networks5_ds.py:427,459).
    """

    mid_nc: int = 1024
    num_init_features: int = 64
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 32, 32)
    bn_size: int = 4
    drop_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, mode: str = "R", *, train: bool = False):
        if mode == "R":
            h = Conv(self.num_init_features, 7, stride=2, padding=3,
                     use_bias=False, kernel_init=kaiming, dtype=self.dtype,
                     name="conv0")(x)
            h = nn.relu(Norm("batch", dtype=self.dtype, name="norm0")(h, train=train))
        else:
            if self.is_initializing():
                # trace the stem once so its params exist for 'S'-first inits
                s = Conv(self.num_init_features, 7, stride=2, padding=3,
                         use_bias=False, kernel_init=kaiming, dtype=self.dtype,
                         name="conv0")(jnp.zeros_like(x[..., :3]))
                nn.relu(Norm("batch", dtype=self.dtype, name="norm0")(s, train=train))
            h = x
        features = []
        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            h = DenseBlock(num_layers, self.growth_rate, self.bn_size,
                           self.drop_rate, self.dtype,
                           name=f"denseblock{i + 1}")(h, train=train)
            num_features += num_layers * self.growth_rate
            features.append(jax.lax.stop_gradient(h))
            if i != len(self.block_config) - 1:
                h = PspTrans(num_features, self.dtype,
                             name=f"psptrans{i}")(h, train=train)
                num_features //= 2
        # PSP head (networks5_ds.py:394-409, forward 435-443)
        out = psp_head(h, self.mid_nc, self.dtype, train)
        return out, features


# ---------------------------------------------------------------------------
# R_dep refiner
# ---------------------------------------------------------------------------


class GSide(nn.Module):
    """G_side (networks5_ds.py:623-651): channel-attention (from the deep
    feature) gates the projected skip feature; sum, compress /2, up ×2."""

    df_c: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, s_feature, d_feature, *, train: bool = False):
        c = self.df_c
        # attention: conv s2 → BN → lrelu → global avg pool → sigmoid
        a = Conv(c, 3, stride=2, padding=1, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="at_conv")(d_feature)
        a = leaky(Norm("batch", dtype=self.dtype, name="at_norm")(a, train=train))
        a = jnp.mean(a, axis=(1, 2), keepdims=True)
        a = nn.sigmoid(a)
        # side path: 3×3 → lrelu → BN → 1×1 → lrelu → BN
        s = Conv(c, 3, padding=1, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="side_conv0")(s_feature)
        s = Norm("batch", dtype=self.dtype, name="side_norm0")(leaky(s), train=train)
        s = Conv(c, 1, use_bias=True, kernel_init=normal02, dtype=self.dtype,
                 name="side_conv1")(s)
        s = Norm("batch", dtype=self.dtype, name="side_norm1")(leaky(s), train=train)
        out = d_feature + a * s
        # compress: 3×3 /2ch → lrelu → BN → 1×1 → lrelu → BN → bilinear ×2
        h = Conv(c // 2, 3, padding=1, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="out_conv0")(out)
        h = Norm("batch", dtype=self.dtype, name="out_norm0")(leaky(h), train=train)
        h = Conv(c // 2, 1, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="out_conv1")(h)
        h = Norm("batch", dtype=self.dtype, name="out_norm1")(leaky(h), train=train)
        n, hh, ww, cc = h.shape
        # MXU-matmul resize by default here: two same-day chip pairs
        # measured +2.4%/+4.9% on the S2D train step (bench_runs.jsonl
        # 2026-08-21 decision row); CDE_RESIZE_MM=0 forces gather back
        return resize_bilinear(h, (hh * 2, ww * 2), align_corners=True,
                               prefer_mm=True)


class DepthBlock(nn.Module):
    """depth_block (networks5_ds.py:655-706): 4 deconv branches with tanh
    depth heads and channel-attention gates; fusion conv → fused depth."""

    in_c: int = 128
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = self.in_c
        dep_o, out_f = [], []
        for i in range(4):
            f = ConvTranspose(c // 2, 4, stride=2, padding=1, output_padding=0,
                              use_bias=True, kernel_init=normal02,
                              dtype=self.dtype, name=f"up{i}_deconv")(x)
            f = Norm("batch", dtype=self.dtype, name=f"up{i}_norm0")(leaky(f), train=train)
            f = Conv(c // 2, 3, padding=1, use_bias=True, kernel_init=normal02,
                     dtype=self.dtype, name=f"up{i}_conv")(f)
            f = Norm("batch", dtype=self.dtype, name=f"up{i}_norm1")(leaky(f), train=train)
            d = Conv(1, 3, padding=1, use_bias=True, kernel_init=normal02,
                     dtype=self.dtype, name=f"depth_out{i}")(f)
            dep_o.append(jnp.tanh(d))
            a = Conv(c // 2, 3, stride=2, padding=1, use_bias=True,
                     kernel_init=normal02, dtype=self.dtype,
                     name=f"at{i}_conv0")(x)
            a = Norm("batch", dtype=self.dtype, name=f"at{i}_norm")(leaky(a), train=train)
            a = Conv(c // 2, 3, stride=2, padding=1, use_bias=True,
                     kernel_init=normal02, dtype=self.dtype,
                     name=f"at{i}_conv1")(a)
            a = jnp.mean(leaky(a), axis=(1, 2), keepdims=True)
            out_f.append(nn.sigmoid(a) * f + f)
        h = jnp.concatenate(out_f, axis=-1)
        h = Conv(c, 3, padding=1, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="fuse_conv0")(h)
        h = Norm("batch", dtype=self.dtype, name="fuse_norm0")(leaky(h), train=train)
        h = Conv(c // 2, 3, padding=1, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="fuse_conv1")(h)
        h = Norm("batch", dtype=self.dtype, name="fuse_norm1")(leaky(h), train=train)
        d1 = Conv(1, 3, padding=1, use_bias=True, kernel_init=normal02,
                  dtype=self.dtype, name="dep_conv")(h)
        d1 = Norm("batch", dtype=self.dtype, name="dep_norm")(d1, train=train)
        return dep_o, d1


class SegBlock(nn.Module):
    """seg_block (networks5_ds.py:708-728): conv→lrelu→BN→1×1→bilinear ×2,
    then BN + lrelu."""

    in_c: int = 128
    out_c: int = 28
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = Conv(self.in_c, 3, padding=1, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="conv0")(x)
        h = Norm("batch", dtype=self.dtype, name="norm0")(leaky(h), train=train)
        h = Conv(self.out_c, 1, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="conv1")(h)
        n, hh, ww, c = h.shape
        # prefer_mm: see GSide — the S2D refiner resizes run on the MXU
        h = resize_bilinear(h, (hh * 2, ww * 2), align_corners=True,
                            prefer_mm=True)
        return leaky(Norm("batch", dtype=self.dtype, name="norm1")(h, train=train))


class RDep(nn.Module):
    """R_dep (networks5_ds.py:733-821): 3 G_side fusions over the detached
    trunk features, then seg + depth heads on the 1/2-scale feature.

    Returns ((out0, out1, out2), seg, (dep_4, dep_o)).

    ``base_c`` must equal the trunk's ``mid_nc`` (the reference hardcodes
    1024, networks5_ds.py:741-759); each G_side halves it. Non-default
    values are used by reduced test/dryrun configs (cfg.s2d_mid_nc).
    """

    dtype: Optional[Dtype] = None
    base_c: int = 1024

    @nn.compact
    def __call__(self, s_features, d_feature, *, train: bool = False):
        c = self.base_c
        out0 = GSide(c, dtype=self.dtype, name="gs0")(
            s_features[3], d_feature, train=train)
        out1 = GSide(c // 2, dtype=self.dtype, name="gs1")(
            s_features[2], out0, train=train)
        out2 = GSide(c // 4, dtype=self.dtype, name="gs2")(
            s_features[1], out1, train=train)
        seg = SegBlock(c // 8, 28, dtype=self.dtype, name="seg_d")(out2,
                                                                   train=train)
        dep_4, dep_o = DepthBlock(c // 8, dtype=self.dtype, name="dep")(
            out2, train=train)
        return (out0, out1, out2), seg, (dep_4, dep_o)


# ---------------------------------------------------------------------------
# semantic_trans-generation refiner heads (the snapshot between trymulti and
# new_multi keeps its own G_side/depth_block/seg_block/R_dep variants —
# reference my_seg_depth/trymulti/semantic_trans/networks5_ds.py:496-695)
# ---------------------------------------------------------------------------


class GSideST(nn.Module):
    """semantic_trans G_side (semantic_trans/networks5_ds.py:496-521):
    channel attention from the deep feature gates the projected skip
    feature; CONCAT with the deep feature, compress back to df_c. Unlike
    the new_multi `GSide` it does not halve channels or upsample — the
    output stays at the deep feature's resolution/width."""

    df_c: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, s_feature, d_feature, *, train: bool = False):
        c = self.df_c
        # attention_bs: conv s2 → BN → lrelu → global avg pool; then sigmoid
        a = Conv(c, 3, stride=2, padding=1, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="at_conv")(d_feature)
        a = leaky(Norm("batch", dtype=self.dtype, name="at_norm")(a, train=train))
        a = nn.sigmoid(jnp.mean(a, axis=(1, 2), keepdims=True))
        # side_conv: conv → lrelu → BN (single conv in this generation)
        s = Conv(c, 3, padding=1, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="side_conv")(s_feature)
        s = Norm("batch", dtype=self.dtype, name="side_norm")(leaky(s), train=train)
        h = jnp.concatenate([d_feature, a * s], axis=-1)
        h = Conv(c, 3, padding=1, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="out_conv")(h)
        return Norm("batch", dtype=self.dtype, name="out_norm")(leaky(h), train=train)


class DepthBlockST(nn.Module):
    """semantic_trans depth_block (semantic_trans/networks5_ds.py:523-577):
    4 single-deconv branches with tanh heads + attention gates; fusion conv
    to in_c/2; extra ``s_econv`` (sigmoid seg-edge map) and ``depconv``
    (BN depth map) heads. Returns (F, [4 band depths], sed) where
    ``sed = concat(edge_map, depth_map)`` — channel 0 edge, channel 1 depth."""

    in_c: int = 128
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = self.in_c
        dep_o, out_f = [], []
        for i in range(4):
            f = ConvTranspose(c // 2, 4, stride=2, padding=1, output_padding=0,
                              use_bias=True, kernel_init=normal02,
                              dtype=self.dtype, name=f"up{i}_deconv")(x)
            f = Norm("batch", dtype=self.dtype, name=f"up{i}_norm")(leaky(f), train=train)
            d = Conv(1, 3, padding=1, use_bias=True, kernel_init=normal02,
                     dtype=self.dtype, name=f"depth_out{i}")(f)
            dep_o.append(jnp.tanh(d))
            a = Conv(c // 2, 3, stride=2, padding=1, use_bias=True,
                     kernel_init=normal02, dtype=self.dtype,
                     name=f"at{i}_conv")(x)
            a = Norm("batch", dtype=self.dtype, name=f"at{i}_norm")(leaky(a), train=train)
            a = jnp.mean(a, axis=(1, 2), keepdims=True)
            out_f.append(nn.sigmoid(a) * f + f)
        h = jnp.concatenate(out_f, axis=-1)
        h = Conv(c // 2, 3, padding=1, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="fuse_conv")(h)
        F = Norm("batch", dtype=self.dtype, name="fuse_norm")(leaky(h), train=train)
        e = Conv(1, 3, padding=1, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="se_conv")(F)
        e = nn.sigmoid(Norm("batch", dtype=self.dtype, name="se_norm")(e, train=train))
        d1 = Conv(1, 3, padding=1, use_bias=True, kernel_init=normal02,
                  dtype=self.dtype, name="dep_conv")(F)
        d1 = Norm("batch", dtype=self.dtype, name="dep_norm")(d1, train=train)
        return F, dep_o, jnp.concatenate([e, d1], axis=-1)


class SegBlockST(nn.Module):
    """semantic_trans seg_block (semantic_trans/networks5_ds.py:579-598):
    lrelu → ConvT ×2 → BN, and a 1×1 28-class head + lrelu on the side.
    Returns (features, logits)."""

    out_c: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = ConvTranspose(self.out_c, 4, stride=2, padding=1, output_padding=0,
                          use_bias=True, kernel_init=normal02, dtype=self.dtype,
                          name="deconv")(leaky(x))
        h = Norm("batch", dtype=self.dtype, name="bn")(h, train=train)
        res = leaky(Conv(28, 1, use_bias=True, kernel_init=normal02,
                         dtype=self.dtype, name="result")(h))
        return h, res


class RDepST(nn.Module):
    """semantic_trans R_dep (semantic_trans/networks5_ds.py:601-695):
    4-level top-down refiner. Each level: GSideST fuses the trunk skip into
    the running deep feature, DepthBlockST upsamples it (×2) emitting 4 band
    depths + a (edge, depth) ``sed`` pair, and SegBlockST chains seg
    features. Per-scale outputs are upsampled to full resolution (bilinear
    for depths/seds = torch UpsamplingBilinear2d align_corners=True, nearest
    for seg logits).

    Returns (seds, segs, deps): three (edge,depth) maps, three 28-class
    logits, three 4-band depth stacks — the [160, 320, 640]-scale pyramid.
    The reference also computes Dep_80/Seg_80/S_e80 upsamples and a
    ``dep_f4`` feature that no return value or loss consumes, and declares
    unused ``up0``/``dep_out``/``norm`` layers — dead code, omitted here.
    """

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, s_features, d_feature, *, train: bool = False):
        dt = self.dtype

        def up(x, k, method="bilinear"):
            n, h, w, _ = x.shape
            if method == "nearest":
                return resize_nearest(x, (h * k, w * k))
            return resize_bilinear(x, (h * k, w * k), align_corners=True)

        out0 = GSideST(1024, dtype=dt, name="gs0")(s_features[3], d_feature,
                                                   train=train)
        seg_f, seg80 = SegBlockST(512, dtype=dt, name="seg0")(out0, train=train)
        dep_f1, dep_80, s_e80 = DepthBlockST(1024, dtype=dt, name="dep0")(
            out0, train=train)
        del seg80, dep_80, s_e80  # dead in the reference forward

        seg_f, seg160 = SegBlockST(256, dtype=dt, name="seg1")(
            jnp.concatenate([seg_f, dep_f1], axis=-1), train=train)
        out1 = GSideST(512, dtype=dt, name="gs1")(s_features[2], dep_f1,
                                                  train=train)
        dep_f2, dep_160, s_e160 = DepthBlockST(512, dtype=dt, name="dep1")(
            out1, train=train)

        seg_f, seg320 = SegBlockST(128, dtype=dt, name="seg2")(
            jnp.concatenate([seg_f, dep_f2], axis=-1), train=train)
        out2 = GSideST(256, dtype=dt, name="gs2")(s_features[1], dep_f2,
                                                  train=train)
        dep_f3, dep_320, s_e320 = DepthBlockST(256, dtype=dt, name="dep2")(
            out2, train=train)

        _, seg640 = SegBlockST(64, dtype=dt, name="seg3")(
            jnp.concatenate([seg_f, dep_f3], axis=-1), train=train)
        out3 = GSideST(128, dtype=dt, name="gs3")(s_features[0], dep_f3,
                                                  train=train)
        _, dep_640, s_e640 = DepthBlockST(128, dtype=dt, name="dep3")(
            out3, train=train)

        seds = (up(s_e160, 4), up(s_e320, 2), s_e640)
        segs = (up(seg160, 4, "nearest"), up(seg320, 2, "nearest"), seg640)
        deps = (jnp.concatenate([up(d, 4) for d in dep_160], axis=-1),
                jnp.concatenate([up(d, 2) for d in dep_320], axis=-1),
                jnp.concatenate(dep_640, axis=-1))
        return seds, segs, deps


# ---------------------------------------------------------------------------
# discriminators
# ---------------------------------------------------------------------------


class SDiscriminator(nn.Module):
    """_Discriminator (networks5_ds.py:527-566): PatchGAN whose first/last
    activations share one PReLU α while each middle layer has its own."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"
    activation: str = "PReLU"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        act = make_activation(self.activation, self)
        use_bias = self.norm == "instance"

        def mid_prelu(i, h):
            return prelu(self, f"prelu_mid{i}", h)

        h = Conv(self.ndf, 4, stride=2, padding=1, use_bias=use_bias,
                 kernel_init=normal02, dtype=self.dtype, name="conv0")(x)
        h = act(h)
        nf = 1
        for i in range(1, self.n_layers):
            nf = min(2 ** i, 8)
            h = Conv(self.ndf * nf, 4, stride=2, padding=1, use_bias=use_bias,
                     kernel_init=normal02, dtype=self.dtype, name=f"conv{i}")(h)
            h = mid_prelu(i, Norm(self.norm, dtype=self.dtype, name=f"norm{i}")(h, train=train))
        nf = min(2 ** self.n_layers, 8)
        h = Conv(self.ndf * nf, 4, stride=1, padding=1, use_bias=use_bias,
                 kernel_init=normal02, dtype=self.dtype,
                 name=f"conv{self.n_layers}")(h)
        h = act(Norm(self.norm, dtype=self.dtype, name=f"norm{self.n_layers}")(h, train=train))
        return Conv(1, 4, stride=1, padding=1, use_bias=True,
                    kernel_init=normal02, dtype=self.dtype, name="conv_out")(h)


class FeatureDiscriminatorS(nn.Module):
    """_FeatureDiscriminator with explicit (H, W) size (networks5_ds.py:569-599)."""

    input_nc: int = 512
    n_layers: int = 2
    size: Tuple[int, int] = (40, 12)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def prelu_i(i, h):
            return prelu(self, f"prelu{i}", h)

        n = x.shape[0]
        h = x.transpose(0, 3, 1, 2).reshape(n, -1)  # torch NCHW flatten order
        h = prelu_i(0, nn.Dense(self.input_nc, kernel_init=normal02,
                              name="fc0")(h))
        for i in range(1, self.n_layers):
            h = prelu_i(i, nn.Dense(self.input_nc, kernel_init=normal02,
                                    name=f"fc{i}")(h))
        return nn.Dense(1, kernel_init=normal02, name="fc_out")(h)


class StarDiscriminator(nn.Module):
    """Discriminator (networks5_ds.py:264-288): k3-s2 entry, LeakyReLU(0.01)
    stack, 1×1 head + extra LeakyReLU, squeezed channel."""

    conv_dim: int = 32
    repeat_num: int = 6
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = Conv(self.conv_dim, 3, stride=2, padding=1, use_bias=True,
                 kernel_init=normal02, dtype=self.dtype, name="conv0")(x)
        h = nn.leaky_relu(h, 0.01)
        dim = self.conv_dim
        for i in range(1, self.repeat_num):
            dim *= 2
            h = Conv(dim, 4, stride=2, padding=1, use_bias=True,
                     kernel_init=normal02, dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.leaky_relu(h, 0.01)
        h = Conv(1, 1, use_bias=False, kernel_init=normal02, dtype=self.dtype,
                 name="head")(h)
        return nn.leaky_relu(h, 0.01)[..., 0]


class DropDiscriminator(nn.Module):
    """Base-generation feature Discriminator (my_seg_depth/networks2.py:
    331-353, built by define_D networks2.py:589-601 as model2's ``Dis_en``):
    input is already ``conv_dim``-channel (the 64-ch G_1/stem features), then
    ``repeat_num - 1`` × [conv4×4 s2 (doubling), LeakyReLU(0.01),
    Dropout2d(0.2)] and a bias-free 1×1 head, channel squeezed.

    Dropout2d drops whole channels per sample → flax Dropout with the
    spatial dims broadcast. The reference keeps the net in train mode for
    every training-phase forward (model2.py never calls eval during
    optimize_parameters), so dropout is active in both the G and D phases.
    """

    conv_dim: int = 64
    repeat_num: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, sege=None, *, train: bool = False):
        if sege is not None:
            # dis_seg generation: the D is conditioned on the (float) seg
            # label map, nearest-downsampled ×0.5 to the feature resolution
            # and concatenated IN FRONT (dis_seg/networks2.py:346-349;
            # G2Blocks keeps the same forward at repeat_num 3)
            n, hh, ww, _ = sege.shape
            x = jnp.concatenate(
                [resize_nearest(sege, (hh // 2, ww // 2)), x], axis=-1)
        h = x
        # the dis_seg copy seeds the doubling from conv_dim+1
        # (dis_seg/networks2.py:335), so the stack widens to 130/260/...
        dim = self.conv_dim + (1 if sege is not None else 0)
        for i in range(1, self.repeat_num):
            dim *= 2
            h = Conv(dim, 4, stride=2, padding=1, use_bias=True,
                     kernel_init=normal02, dtype=self.dtype,
                     name=f"conv{i}")(h)
            h = nn.leaky_relu(h, 0.01)
            h = nn.Dropout(0.2, broadcast_dims=(1, 2),
                           deterministic=not train)(h)
        h = Conv(1, 1, use_bias=False, kernel_init=normal02, dtype=self.dtype,
                 name="head")(h)
        return h[..., 0]


class Discriminator2Seg(nn.Module):
    """Discriminator2_seg (networks5_ds.py:842-864): 1×1 halving stack +
    stride-2 head + sigmoid."""

    conv_dim: int = 1024
    repeat_num: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dim = self.conv_dim
        h = x
        for i in range(self.repeat_num):
            dim //= 2
            h = Conv(dim, 1, use_bias=True, kernel_init=normal02,
                     dtype=self.dtype, name=f"conv{i}")(h)
            h = Norm("batch", dtype=self.dtype, name=f"norm{i}")(nn.leaky_relu(h, 0.01), train=train)
        h = Conv(1, 3, stride=2, padding=1, use_bias=False, kernel_init=normal02,
                 dtype=self.dtype, name="head")(h)
        return nn.sigmoid(h)[..., 0]


# ---------------------------------------------------------------------------
# legacy SEG / DEP decoders (my_seg_depth lineage, networks5_ds.py:866-921)
# ---------------------------------------------------------------------------


class DeconvBlock(nn.Module):
    """DeconvBlock (networks5_ds.py:68-87): LeakyReLU(0.02) → ConvT k4 s2.

    The base generation's own copy (my_seg_depth/networks2.py:29-44) uses a
    plain ReLU instead — select with ``negative_slope=0.0`` (exactly ReLU).
    """

    output_nc: int
    batch_norm: bool = False
    negative_slope: float = 0.02
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = ConvTranspose(self.output_nc, 4, stride=2, padding=1,
                          output_padding=0, use_bias=True, kernel_init=normal02,
                          dtype=self.dtype, name="deconv")(
            nn.leaky_relu(x, self.negative_slope))
        if self.batch_norm:
            h = Norm("batch", dtype=self.dtype, name="bn")(h, train=train)
        return h


def ordimat(shape) -> jax.Array:
    """Coordinate-map channels (networks5_ds.py:824-838): (row idx, col idx)
    as two float channels, NHWC."""
    n, h, w = shape
    rows = jax.lax.broadcasted_iota(jnp.float32, (n, h, w, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (n, h, w, 1), 2)
    return jnp.concatenate([rows, cols], axis=-1)


class SEG(nn.Module):
    """SEG decoder (networks5_ds.py:866-890): 4 DeconvBlocks + 1×1 head +
    BN/LeakyReLU; returns (seg, input features).

    ``negative_slope``: networks5_ds's DeconvBlock uses LeakyReLU(0.02)
    (:74); the new_depseg generation's copy uses plain ReLU
    (new_depseg/networks2.py:30) — pass 0.0 there."""

    n_cls: int = 28
    negative_slope: float = 0.02
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        chans = [512, 256, 128, 64]
        h = x
        for i, c in enumerate(chans):
            h = DeconvBlock(c, negative_slope=self.negative_slope,
                            dtype=self.dtype, name=f"up{i}")(h, train=train)
        h = Conv(self.n_cls, 1, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="head")(h)
        h = nn.leaky_relu(Norm("batch", dtype=self.dtype, name="act_norm")(h, train=train), 0.01)
        return h, x


class DEP(nn.Module):
    """DEP decoder (networks5_ds.py:892-921): DeconvBlocks over features
    concatenated with ordimat coordinate channels.

    ``tanh_head``: the new_depseg generation's copy APPLIES its Tanh head
    (new_depseg/networks2.py:571,590); networks5_ds comments it out — the
    default False keeps the S2D/semantic_trans behavior. ``negative_slope``
    as in SEG (new_depseg's DeconvBlock is plain ReLU)."""

    tanh_head: bool = False
    negative_slope: float = 0.02
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        chans = [512, 256, 128, 64]
        h = x
        for i, c in enumerate(chans):
            n, hh, ww, _ = h.shape
            h = jnp.concatenate([h, ordimat((n, hh, ww)).astype(h.dtype)], -1)
            h = DeconvBlock(c, negative_slope=self.negative_slope,
                            dtype=self.dtype, name=f"up{i}")(h, train=train)
        h = Conv(1, 1, use_bias=True, kernel_init=normal02, dtype=self.dtype,
                 name="head")(h)
        return jnp.tanh(h) if self.tanh_head else h


# ---------------------------------------------------------------------------
# losses (networks5_ds.py:926-982)
# ---------------------------------------------------------------------------


def get_masks(target: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """one-mask (target == 1) and zero-mask (target == −1)
    (networks5_ds.py:973-982)."""
    o_m = (target == 1.0).astype(target.dtype)
    z_m = (target == -1.0).astype(target.dtype)
    return o_m, z_m


@jax.custom_vjp
def _bce(p: jax.Array, t: jax.Array) -> jax.Array:
    """torch BCELoss semantics — BOTH directions.

    Forward: mean, log clamped at −100 (ATen binary_cross_entropy).
    Backward: torch clamps the denominator, grad = (p − t) /
    clamp_min(p·(1−p), 1e−12) / n — finite at p ∈ {0, 1}. The naive jax
    autodiff of the clamped-log forward instead produces 0·∞ = NaN
    cotangents exactly at saturation; masked-out sites (p = 0 by
    construction) and bf16 tanh outputs (saturate to exact ±1 from |x|≈2.8)
    hit that constantly, NaN-poisoning R_D's update in one step on TPU.
    The custom VJP restores the reference's backward semantics.
    """
    return _bce_value(p, t)


def _bce_value(p: jax.Array, t: jax.Array) -> jax.Array:
    p = p.astype(jnp.float32)
    t = t.astype(jnp.float32)
    logp = jnp.maximum(jnp.log(jnp.maximum(p, 0.0)), -100.0)
    log1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - p, 0.0)), -100.0)
    return -jnp.mean(t * logp + (1.0 - t) * log1p)


def _bce_fwd(p, t):
    return _bce_value(p, t), (p, t)


def _bce_bwd(res, g):
    p, t = res
    pf = p.astype(jnp.float32)
    tf = t.astype(jnp.float32)
    n = pf.size
    # ATen binary_cross_entropy_backward: (input - target) /
    # (input * (1 - input)).clamp_min(1e-12), then the mean's 1/n
    gp = g * (pf - tf) / jnp.maximum(pf * (1.0 - pf), 1e-12) / n
    # d/dt of -[t·logp + (1-t)·log1p]/n (clamped logs keep it finite)
    logp = jnp.maximum(jnp.log(jnp.maximum(pf, 0.0)), -100.0)
    log1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - pf, 0.0)), -100.0)
    gt = g * (log1p - logp) / n
    return gp.astype(p.dtype), gt.astype(t.dtype)


_bce.defvjp(_bce_fwd, _bce_bwd)


def bce_dep_loss(pred: jax.Array, target: jax.Array, o_m: jax.Array,
                 z_m: jax.Array) -> jax.Array:
    """BCEDepLoss (networks5_ds.py:947-956): BCE on the ±1 saturation masks
    plus 50×L1. ``pred`` may be 1-channel against a 4-channel target — the
    mask multiplication broadcasts both sides, exactly like the reference's
    accidental-but-load-bearing broadcast.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    bce1 = _bce((pred + 1) / 2 * o_m, (target + 1) / 2 * o_m)
    bce0 = _bce((pred + 1) / 2 * z_m, (target + 1) / 2 * z_m)
    l1 = jnp.mean(jnp.abs(pred - target))
    return bce1 + bce0 + 50.0 * l1


def bce_dep_loss_truncated(pred: jax.Array, target: jax.Array,
                           o_m: jax.Array, z_m: jax.Array) -> jax.Array:
    """The semantic_trans copy of BCEDepLoss (my_seg_depth/trymulti/
    semantic_trans/networks5_ds.py:849-852): ONLY the o_m BCE term — the z_m
    BCE and L1 terms are commented out in that snapshot. This is the variant
    the new_model track actually trains with: mdoel6.py:6-7,243 and
    model7.py:246 import networks5_ds from semantic_trans, not new_multi.
    ``z_m`` is kept for signature parity with `bce_dep_loss`.
    """
    del z_m
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return _bce((pred + 1) / 2 * o_m, (target + 1) / 2 * o_m)


# ---------------------------------------------------------------------------
# base-generation (my_seg_depth) variants — networks2.py
# ---------------------------------------------------------------------------


class GeneralNet2(nn.Module):
    """General_net of the base my_seg_depth generation
    (reference my_seg_depth/networks2.py:395-481): DenseNet-169 trunk with
    STANDARD transitions (pool inside), dual-mode forward collecting FIVE
    skip features (stem-norm 64@1/2, db1 256@1/2, db2 512@1/4, db3 1280@1/8,
    db4 1664@1/16) + the 4-branch dilated PSP head → (features, psp_out)."""

    mid_nc: int = 1024
    num_init_features: int = 64
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 32, 32)
    bn_size: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, mode: str = "R", *, train: bool = False):
        features = []
        if mode == "R":
            h = Conv(self.num_init_features, 7, stride=2, padding=3,
                     use_bias=False, kernel_init=kaiming, dtype=self.dtype,
                     name="conv0")(x)
            h = Norm("batch", dtype=self.dtype, name="norm0")(h, train=train)
            h = nn.relu(h)
            # the reference appends the norm0 tensor and the INPLACE relu0
            # then mutates it (networks2.py:403,467-470), so the stored stem
            # skip is post-ReLU (review fix: was appended pre-ReLU)
            features.append(h)
        else:
            if self.is_initializing():
                Conv(self.num_init_features, 7, stride=2, padding=3,
                     use_bias=False, kernel_init=kaiming, dtype=self.dtype,
                     name="conv0")(jnp.zeros_like(x[..., :3]))
            # 'S' mode: G_1 features pass through norm0 first
            # (networks2.py:444-449 iterates features[1:])
            h = Norm("batch", dtype=self.dtype, name="norm0")(x, train=train)
            h = nn.relu(h)
            features.append(h)  # post-ReLU via the same inplace aliasing
        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            h = DenseBlock(num_layers, self.growth_rate, self.bn_size,
                           dtype=self.dtype,
                           name=f"denseblock{i + 1}")(h, train=train)
            num_features += num_layers * self.growth_rate
            features.append(h)
            if i != len(self.block_config) - 1:
                num_features //= 2
                h = Transition(num_features, self.dtype,
                               name=f"transition{i + 1}")(h, train=train)
        out = psp_head(h, self.mid_nc, self.dtype, train)
        return features, out


class _SkipDecoder(nn.Module):
    """Shared structure of the base-generation SEG/DEP decoders
    (networks2.py:489-566): 1×1/deconv feature adapters + skip-concat
    DeconvBlock chain from the psp output up to full resolution."""

    out_c: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features, x, *, train: bool = False):
        f0 = ConvTranspose(64, 2, stride=2, padding=0, output_padding=0,
                           use_bias=True, kernel_init=normal02,
                           dtype=self.dtype, name="trans_0")(features[0])
        f1 = Conv(128, 1, use_bias=True, kernel_init=normal02,
                  dtype=self.dtype, name="trans_1")(features[1])
        f2 = Conv(256, 1, use_bias=True, kernel_init=normal02,
                  dtype=self.dtype, name="trans_2")(features[2])
        f3 = Conv(512, 1, use_bias=True, kernel_init=normal02,
                  dtype=self.dtype, name="trans_3")(features[3])
        f4 = Conv(1024, 1, use_bias=True, kernel_init=normal02,
                  dtype=self.dtype, name="trans_4")(features[4])
        chans = [512, 256, 256, 256]
        skips = [f4, f3, f2, f1]
        h = x
        for i, (c, s) in enumerate(zip(chans, skips)):
            # networks2.py's DeconvBlock copy uses ReLU, not LeakyReLU(0.02)
            h = DeconvBlock(c, negative_slope=0.0, dtype=self.dtype,
                            name=f"up{i}")(
                jnp.concatenate([h, s], axis=-1), train=train)
        return Conv(self.out_c, 1, use_bias=True, kernel_init=normal02,
                    dtype=self.dtype, name="head")(
            jnp.concatenate([h, f0], axis=-1))


class SEG2(nn.Module):
    """Base-generation SEG decoder (networks2.py:489-531): skip decoder +
    BN + LeakyReLU head."""

    n_cls: int = 28
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features, x, *, train: bool = False):
        h = _SkipDecoder(self.n_cls, dtype=self.dtype, name="dec")(
            features, x, train=train)
        return nn.leaky_relu(Norm("batch", dtype=self.dtype, name="act_norm")(h, train=train), 0.01)


class DEP2(nn.Module):
    """Base-generation DEP decoder (networks2.py:534-566): skip decoder +
    Tanh head."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features, x, *, train: bool = False):
        h = _SkipDecoder(1, dtype=self.dtype, name="dec")(features, x,
                                                          train=train)
        return jnp.tanh(h)


# 28-class CE weight table (reference my_seg_depth/model2.py:175-204)
CLASS_WEIGHTS_28 = (
    1.4, 0.8, 1.2, 1.4, 1.3, 0.8, 1.3, 1.4, 1.4, 1.4, 1.4, 1.4, 1.4, 1.5,
    1.5, 1.2, 1.3, 1.1, 2.0, 2.0, 1.1, 1.8, 1.8, 1.8, 1.8, 1.8, 1.8, 1.8,
)


def calc_gradient_penalty(d_fn, x_real: jax.Array, x_fake: jax.Array,
                          rng: jax.Array, lambda_: float = 10.0) -> jax.Array:
    """WGAN-GP gradient penalty (reference my_seg_depth/trymulti/
    semantic_trans/model5.py:354-382), the reference's only GP objective.

    Reference quirks kept (documented, not "fixed"):
    - only batch element 0 is interpolated; the rest of ``interpolates``
      stays the real data (the reference trains at batch size 1, where the
      two coincide);
    - the gradient norm is taken over the CHANNEL axis only
      (``gradients.norm(2, dim=1)``), i.e. a per-pixel norm, not the
      standard per-sample norm over all non-batch axes.

    ``d_fn`` maps the NHWC input to the discriminator output. A small eps
    stabilizes the second derivative of the norm at exactly-zero gradients
    (torch's ``.norm`` backward has the same 0/0 there).
    """
    alpha = jax.random.uniform(rng, (), jnp.float32)
    interp = x_real.astype(jnp.float32)
    interp = interp.at[0].set(alpha * interp[0]
                              + (1.0 - alpha) * x_fake[0].astype(jnp.float32))

    grads = jax.grad(lambda x: jnp.sum(d_fn(x).astype(jnp.float32)))(interp)
    gnorm = jnp.sqrt(jnp.sum(grads * grads, axis=-1) + 1e-12)
    return lambda_ * jnp.mean((gnorm - 1.0) ** 2)


# ---------------------------------------------------------------------------
# base-generation alternate pipeline (my_seg_depth/networks.py, driven by
# my_seg_depth/train.py:221-409) + new_depseg additions
#
# NOTE on `Seg2Feature` (SURVEY row 34): in EVERY reference snapshot that
# declares it (my_seg_depth/{deeperfeatures,deeperfeatures/dilated,
# new_depseg}/networks2.py, deeperfeatures/dilated/network_s1.py,
# trymulti/semantic_trans/networks5_ds.py — e.g. new_depseg/networks2.py:
# 349-351) the class body is `super().__init__()` and nothing else: no
# layers, no forward, never instantiated. It is an abandoned placeholder in
# the reference, documented here rather than invented.
# ---------------------------------------------------------------------------


def adaptive_avg_pool(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """torch nn.AdaptiveAvgPool2d semantics on NHWC: bin i of an axis covers
    [floor(i·L/s), ceil((i+1)·L/s)) — non-uniform when s ∤ L."""

    def pool_axis(t, out_len, axis):
        in_len = t.shape[axis]
        slabs = []
        for i in range(out_len):
            lo = (i * in_len) // out_len
            hi = -(-((i + 1) * in_len) // out_len)
            sl = jax.lax.slice_in_dim(t, lo, hi, axis=axis)
            slabs.append(jnp.mean(sl, axis=axis, keepdims=True))
        return jnp.concatenate(slabs, axis=axis)

    return pool_axis(pool_axis(x, size[0], 1), size[1], 2)


class PSPModule(nn.Module):
    """PSPModule (my_seg_depth/networks.py:12-30): adaptive-avg-pool pyramid
    (1, 2, 3, 6) → per-scale 1×1 conv (no bias) → bilinear upsample back
    (torch-0.4 ``F.upsample`` default, align_corners=False) → concat with the
    input → 1×1 bottleneck → ReLU."""

    out_features: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        n, h, w, c = x.shape
        priors = []
        for i, s in enumerate(self.sizes):
            p = adaptive_avg_pool(x, (s, s))
            p = Conv(c, 1, use_bias=False, kernel_init=normal02,
                     dtype=self.dtype, name=f"stage{i}_conv")(p)
            priors.append(resize_bilinear(p, (h, w), align_corners=False))
        priors.append(x)
        out = Conv(self.out_features, 1, use_bias=True, kernel_init=normal02,
                   dtype=self.dtype, name="bottleneck")(
            jnp.concatenate(priors, axis=-1))
        return nn.relu(out)


class FeatureNet(nn.Module):
    """Feature_net (my_seg_depth/networks.py:226-288): the base generation's
    alternate feature pipeline — a *stemless* DenseNet (growth 48, blocks
    (6, 8, 8)) over an already-extracted feature map, ending in the same
    4-branch dilated PSP head as General_net.

    Returns ``(features, psp_out)`` where ``features`` are the three dense
    block outputs (the reference collects every even-indexed module of its
    Sequential — exactly the blocks, networks.py:271-276).
    """

    mid_nc: int = 1024
    growth_rate: int = 48
    block_config: Sequence[int] = (6, 8, 8)
    bn_size: int = 4
    drop_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        features: List[jax.Array] = []
        h = x
        num_features = x.shape[-1]
        for i, num_layers in enumerate(self.block_config):
            h = DenseBlock(num_layers, self.growth_rate, self.bn_size,
                           self.drop_rate, self.dtype,
                           name=f"denseblock{i + 1}")(h, train=train)
            num_features += num_layers * self.growth_rate
            features.append(h)
            if i != len(self.block_config) - 1:
                h = Transition(num_features // 2, self.dtype,
                               name=f"transition{i + 1}")(h, train=train)
                num_features //= 2
        # 4-branch dilated PSP head (networks.py:252-266 = the General_net
        # head, forward networks.py:277-287)
        out = psp_head(h, self.mid_nc, self.dtype, train)
        return features, out


class GBase(nn.Module):
    """Base-generation G_1 (my_seg_depth/networks.py:83-127): CycleGAN-style
    encoder with **BatchNorm** — reflect-pad 7×7 stem, two stride-2 downs,
    ``n_blocks`` resnet blocks, reflect-pad 7×7 head to 128 channels + Tanh.
    The decoder half is commented out in the reference, so the output stays
    at 1/4 resolution. BatchNorm ⇒ bias-free convs everywhere except the
    final head (networks.py:90-92,121)."""

    ngf: int = 64
    n_blocks: int = 3
    out_nc: int = 128
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = reflect_pad(x, 3)
        h = Conv(self.ngf, 7, use_bias=False, kernel_init=normal02,
                 dtype=self.dtype, name="stem_conv")(h)
        h = nn.relu(Norm("batch", dtype=self.dtype, name="stem_norm")(h, train=train))
        for i in range(2):
            h = Conv(self.ngf * 2 ** (i + 1), 3, stride=2, padding=1,
                     use_bias=False, kernel_init=normal02, dtype=self.dtype,
                     name=f"down{i}_conv")(h)
            h = nn.relu(Norm("batch", dtype=self.dtype, name=f"down{i}_norm")(h, train=train))
        dim = self.ngf * 4
        for i in range(self.n_blocks):
            r = reflect_pad(h, 1)
            r = Conv(dim, 3, use_bias=False, kernel_init=normal02,
                     dtype=self.dtype, name=f"block{i}_conv0")(r)
            r = nn.relu(Norm("batch", dtype=self.dtype, name=f"block{i}_norm0")(r, train=train))
            r = reflect_pad(r, 1)
            r = Conv(dim, 3, use_bias=False, kernel_init=normal02,
                     dtype=self.dtype, name=f"block{i}_conv1")(r)
            r = Norm("batch", dtype=self.dtype, name=f"block{i}_norm1")(r, train=train)
            h = h + r
        h = reflect_pad(h, 3)
        h = Conv(self.out_nc, 7, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="head")(h)
        return jnp.tanh(h)


class _SkipDecoderAlt(nn.Module):
    """Shared body of the base generation's ALTERNATE SEG/DEP decoders
    (my_seg_depth/networks.py:289-351, the Feature_net pipeline): 1×1
    ``trans`` adapters over the three dense-block features (deepest first)
    + a skip-concat ConvTranspose-k2-s2 chain from the 1024-ch PSP output
    up to full resolution."""

    out_c: int
    dtype: Optional[Dtype] = None

    TRANS = (256, 256, 128)
    UP = (512, 256, 256)

    @nn.compact
    def __call__(self, features, x, *, train: bool = False):
        h = x
        for i in range(3):
            f = Conv(self.TRANS[i], 1, use_bias=True, kernel_init=normal02,
                     dtype=self.dtype, name=f"trans_{i}")(features[2 - i])
            h = ConvTranspose(self.UP[i], 2, stride=2, padding=0,
                              output_padding=0, use_bias=True,
                              kernel_init=normal02, dtype=self.dtype,
                              name=f"up_{i}")(
                jnp.concatenate([h, f], axis=-1))
        return ConvTranspose(self.out_c, 2, stride=2, padding=0,
                             output_padding=0, use_bias=True,
                             kernel_init=normal02, dtype=self.dtype,
                             name="up_3")(h)


class SEGAlt(nn.Module):
    """Alternate SEG decoder (networks.py:289-319): skip decoder + **Tanh**
    over the class logits (the base generation trains CE on tanh outputs —
    a reference quirk, transcribed)."""

    n_cls: int = 28
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features, x, *, train: bool = False):
        h = _SkipDecoderAlt(self.n_cls, dtype=self.dtype, name="dec")(
            features, x, train=train)
        return jnp.tanh(h)


class DEPAlt(nn.Module):
    """Alternate DEP decoder (networks.py:321-351): skip decoder +
    LeakyReLU(0.01) head."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features, x, *, train: bool = False):
        h = _SkipDecoderAlt(1, dtype=self.dtype, name="dec")(
            features, x, train=train)
        return nn.leaky_relu(h, 0.01)


class DiscriminatorSeg(nn.Module):
    """Discriminator_seg (new_depseg/networks2.py:462-494): 1×1 channel-
    halving stack (1024 → 512 → 256 → 128) with LeakyReLU(0.01), then a 1×1
    head to 28 per-pixel class logits (no bias) + LeakyReLU. Driven on the
    1024-ch PSP features with WGAN-GP and an SGD optimizer in
    new_depseg/model2.py:235,291,344-352. The dilated/G2Blocks generations
    instantiate the same shape at conv_dim 256 (SURVEY rows 31, 33)."""

    conv_dim: int = 1024
    repeat_num: int = 3
    n_cls: int = 28
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = x
        dim = self.conv_dim
        for i in range(self.repeat_num):
            dim //= 2
            h = Conv(dim, 1, use_bias=True, kernel_init=normal02,
                     dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.leaky_relu(h, 0.01)
        h = Conv(self.n_cls, 1, use_bias=False, kernel_init=normal02,
                 dtype=self.dtype, name="head")(h)
        return nn.leaky_relu(h, 0.01)


# ---------------------------------------------------------------------------
# deeperfeatures "model3" generation (SURVEY rows 30-31): dual General_net
# encoders + skip-free ladder decoders + a norm-free seg-feature critic
# ---------------------------------------------------------------------------


class SEGDF(nn.Module):
    """deeperfeatures-generation SEG decoder
    (my_seg_depth/deeperfeatures/networks2.py:532-560; identical copy at
    dilated/networks2.py): skip-FREE ladder of ReLU DeconvBlocks
    1024→512→256→128→64 over the General_net psp output, a 1×1 class head,
    and a BatchNorm+LeakyReLU "activation_seg". Returns
    ``(seg activation, first-up 512-ch features)`` — the torch forward's
    ``S[5], S[1]``; the 512-ch features feed both DEPDF and Dis2SegDF."""

    n_cls: int = 28
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = x
        f2 = None
        for i, c in enumerate((512, 256, 128, 64)):
            # this generation's DeconvBlock copy uses plain ReLU
            # (deeperfeatures/networks2.py:24-43)
            h = DeconvBlock(c, negative_slope=0.0, dtype=self.dtype,
                            name=f"up{i}")(h, train=train)
            if i == 0:
                # the torch DeconvBlock's INPLACE ReLU (networks2.py:30,36)
                # mutates the stored S[1] when Up[1] consumes it, so the
                # features the reference returns (and DEP/Dis0_en consume)
                # are post-ReLU
                f2 = nn.relu(h)
        h = Conv(self.n_cls, 1, use_bias=True, kernel_init=normal02,
                 dtype=self.dtype, name="head")(h)
        h = nn.leaky_relu(Norm("batch", dtype=self.dtype, name="act_norm")(h, train=train), 0.01)
        return h, f2


class DEPDF(nn.Module):
    """deeperfeatures-generation DEP decoder
    (my_seg_depth/deeperfeatures/networks2.py:563-610): a growth-36 DenseNet
    prefix over the 512-ch SEG features (DenseBlock(8)→Transition(→400)→
    DenseBlock(18) ⇒ 1048 ch at half the feature resolution), then four ReLU
    DeconvBlocks each fed the two raw ``ordimat`` coordinate channels
    (networks2.py:448-462), a 1×1 head, and tanh."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = DenseBlock(8, 36, 4, dtype=self.dtype, name="block0")(
            x, train=train)
        h = Transition(400, self.dtype, name="trans0")(h, train=train)
        h = DenseBlock(18, 36, 4, dtype=self.dtype, name="block1")(
            h, train=train)
        for i, c in enumerate((512, 256, 128, 64)):
            n, hh, ww, _ = h.shape
            h = jnp.concatenate(
                [h, ordimat((n, hh, ww)).astype(h.dtype)], -1)
            h = DeconvBlock(c, negative_slope=0.0, dtype=self.dtype,
                            name=f"up{i}")(h, train=train)
        h = Conv(1, 1, use_bias=True, kernel_init=normal02, dtype=self.dtype,
                 name="head")(h)
        return jnp.tanh(h)


class Dis2SegDF(nn.Module):
    """deeperfeatures-generation Discriminator2_seg
    (my_seg_depth/deeperfeatures/networks2.py:499-531): a pure 1×1 channel-
    halving ladder with LeakyReLU(0.01), a bias-free 1×1 head, and sigmoid —
    NO norm layers and stride 1 throughout (unlike the networks5_ds
    ``Discriminator2Seg`` above). Criticises the 512-ch SEG features; its
    sigmoid outputs are trained with MSE (this generation's GANLoss is
    hardcoded to MSELoss, networks2.py:645-665).

    The new_depseg generation's copy (new_depseg/networks2.py:496-527,
    ``Dis0_en``/``Dis1_en`` of its model3 "4dis" variant) is the same
    ladder at ``conv_dim=256`` with a 28-channel head (its ``squeeze(1)``
    is a no-op at 28 channels, so the full map is returned) — select with
    ``head_ch=28``."""

    conv_dim: int = 512
    repeat_num: int = 3
    head_ch: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = x
        dim = self.conv_dim
        for i in range(self.repeat_num):
            dim //= 2
            h = Conv(dim, 1, use_bias=True, kernel_init=normal02,
                     dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.leaky_relu(h, 0.01)
        h = Conv(self.head_ch, 1, use_bias=False, kernel_init=normal02,
                 dtype=self.dtype, name="head")(h)
        h = nn.sigmoid(h)
        return h[..., 0] if self.head_ch == 1 else h


def bce_gan_loss(pred: jax.Array, target_is_real: bool) -> jax.Array:
    """The my_seg_depth generations' GANLoss: plain BCELoss against expanded
    0/1 labels — the constructor HARDCODES BCELoss regardless of
    ``use_lsgan`` (new_depseg/networks2.py:626-650) — applied to
    Discriminator_seg's LeakyReLU outputs (networks2.py:489-494). torch
    BCELoss NaNs outside [0,1] (log of a negative) — a latent reference
    hazard at exactly those leaky-negative outputs; we clamp to
    [1e-7, 1-1e-7], exact torch parity inside the valid range (documented
    divergence, PARITY.md)."""
    p = jnp.clip(pred.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
    t = 1.0 if target_is_real else 0.0
    return -jnp.mean(t * jnp.log(p) + (1.0 - t) * jnp.log1p(-p))


def real_dep_loss(seg_p: jax.Array, seg_l: jax.Array, dep_p: jax.Array,
                  dep_l: jax.Array) -> jax.Array:
    """model3's pseudo-label real-branch depth term
    (deeperfeatures/model3.py:472-483; same body in dilated/new_depseg/
    trymulti/semantic_trans model3.py): mask = (argmax of the REAL seg
    prediction == the SYN label map), then L1 between the masked REAL depth
    prediction and the masked SYN depth label — cross-domain exactly as
    written. Every input is detached in the reference, so the term carries
    no gradient (it only reports); callers pass it through stop_gradient
    context accordingly. The reference multiplies NCHW dep (N,1,H,W) with an
    (N,H,W) mask — a cross-batch outer broadcast at batch>1 that its
    batch-1 training never hits; we compute the batch-general per-sample
    masking (documented divergence, PARITY.md)."""
    seg_p = jax.lax.stop_gradient(seg_p).astype(jnp.float32)
    pred = jnp.argmax(seg_p, -1).astype(jnp.float32)
    mask = (pred == seg_l.astype(jnp.float32)).astype(jnp.float32)
    dep_p = jnp.squeeze(dep_p, -1) if dep_p.ndim == 4 else dep_p
    dep_l = jnp.squeeze(dep_l, -1) if dep_l.ndim == 4 else dep_l
    dep_p = jax.lax.stop_gradient(dep_p).astype(jnp.float32)
    dep_l = dep_l.astype(jnp.float32)
    return jnp.mean(jnp.abs(mask * dep_p - mask * dep_l))


# ---------------------------------------------------------------------------
# style objectives (declared, never called live in the reference)
# ---------------------------------------------------------------------------


def gram_matrix(x: jax.Array) -> jax.Array:
    """GramMatrix (networks5_ds.py:794-805; copy networks2.py:616-627):
    flatten NHWC → (N·C, H·W) feature rows, G = F·Fᵀ / (N·C·H·W). Imported
    by model5.py:6 / mdoel6.py:7 but only ever used in commented-out style
    terms (semantic_trans/model3.py:534-551) — provided for completeness."""
    n, h, w, c = x.shape
    f = jnp.transpose(x, (0, 3, 1, 2)).reshape(n * c, h * w)
    f = f.astype(jnp.float32)
    return (f @ f.T) / (n * c * h * w)


def style_loss(x: jax.Array, target: jax.Array) -> jax.Array:
    """StyleLoss (networks5_ds.py:807-817): MSE between Gram matrices."""
    g = gram_matrix(x)
    t = gram_matrix(target)
    return jnp.mean(jnp.square(g - t))
