"""Core NHWC layers with torch-equivalent semantics, built for XLA/TPU.

These are the building blocks for every network in the framework (the
framework-wide analogue of the reference's raw ``torch.nn`` usage in
models/networks.py, models/seg_network.py, new_multi/networks5_ds.py, …).

Semantics parity notes (verified by tests/test_torch_parity.py against torch):

- ``Conv``: integer symmetric zero-padding like ``nn.Conv2d(padding=p)``.
- ``ConvTranspose``: reproduces ``nn.ConvTranspose2d(k, s, padding=p,
  output_padding=op)`` as an input-dilated regular convolution with
  asymmetric padding ``(k-1-p, k-1-p+op)``. The kernel is *stored* in the
  equivalent-regular-conv HWIO layout (spatially flipped / IO-transposed
  relative to torch's ``(in, out, kh, kw)``) so the forward pass is a single
  ``conv_general_dilated`` that XLA maps straight onto the MXU.
- ``InstanceNorm``: per-(sample, channel) mean/var over H,W, biased variance,
  eps 1e-5, affine off by default — matching
  ``nn.InstanceNorm2d(affine=False, track_running_stats=False)``
  (reference models/networks.py:16-17). Statistics always in fp32.
- ``reflect_pad`` / ``replicate_pad``: ``nn.ReflectionPad2d`` /
  ``nn.ReplicationPad2d``.

Compute dtype: pass ``dtype=jnp.bfloat16`` for TPU throughput; params stay
fp32 and are cast at use (mixed-precision policy).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from .init import make_initializer, zeros

Dtype = Any

DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def _pair(v: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


def _pad2(pad) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """int | (ph, pw) | ((top, bottom), (left, right)) → explicit form."""
    if isinstance(pad, int):
        return ((pad, pad), (pad, pad))
    a, b = pad
    if isinstance(a, (tuple, list)):
        return ((int(a[0]), int(a[1])), (int(b[0]), int(b[1])))
    return ((int(a), int(a)), (int(b), int(b)))


def reflect_pad(x: jax.Array, pad: Union[int, Sequence[int]]) -> jax.Array:
    """NHWC reflection padding (= nn.ReflectionPad2d). Accepts the same
    padding forms as Conv, incl. explicit ((top, bottom), (left, right))
    (review fix: the reflect branch crashed on the documented explicit
    form)."""
    (pt, pb), (pl, pr) = _pad2(pad)
    return jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)), mode="reflect")


def replicate_pad(x: jax.Array, pad: Union[int, Sequence[int]]) -> jax.Array:
    """NHWC replication padding (= nn.ReplicationPad2d)."""
    (pt, pb), (pl, pr) = _pad2(pad)
    return jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)), mode="edge")


class Conv(nn.Module):
    """2-D convolution, NHWC, torch Conv2d padding semantics.

    Attributes:
      features: output channels.
      kernel_size: int or (kh, kw).
      stride: int or (sh, sw).
      padding: int or (ph, pw) — symmetric zero padding, torch-style. May also
        be an explicit ((top, bottom), (left, right)) tuple.
      use_bias: include bias term.
      dtype: compute dtype (params remain fp32).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Any = 0
    use_bias: bool = True
    feature_group_count: int = 1
    dilation: Union[int, Tuple[int, int]] = 1
    kernel_init: Callable = make_initializer("normal", 0.02)
    bias_init: Callable = zeros
    padding_mode: str = "zeros"  # 'zeros' | 'reflect'
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        dh, dw = _pair(self.dilation)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (kh, kw, in_ch // self.feature_group_count, self.features),
            jnp.float32,
        )
        if self.padding_mode == "reflect":
            dtype = self.dtype or x.dtype
            if ((kh, kw) == (3, 3) and (sh, sw) == (1, 1)
                    and (dh, dw) == (1, 1) and self.padding == 1
                    and self.feature_group_count == 1):
                y = conv3x3_reflect(x, kernel, dtype=dtype)
            else:
                xp = reflect_pad(x, self.padding)
                y = lax.conv_general_dilated(
                    xp.astype(dtype), kernel.astype(dtype), (sh, sw),
                    ((0, 0), (0, 0)), rhs_dilation=(dh, dw),
                    dimension_numbers=DIMENSION_NUMBERS,
                    feature_group_count=self.feature_group_count).astype(dtype)
            if self.use_bias:
                bias = self.param("bias", self.bias_init, (self.features,),
                                  jnp.float32)
                y = y + bias
            return y.astype(dtype)
        pad = _pad2(self.padding)

        dtype = self.dtype or x.dtype
        y = lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(sh, sw),
            padding=pad,
            rhs_dilation=(dh, dw),
            dimension_numbers=DIMENSION_NUMBERS,
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + bias
        return y.astype(dtype)


class ConvTranspose(nn.Module):
    """Transposed 2-D convolution matching nn.ConvTranspose2d(k, s, p, op).

    Output size: (N-1)*s - 2p + k + op. Implemented as an lhs-dilated regular
    conv; see module docstring. Used for the generator up-sampling stages
    (reference models/networks.py:178-181 k3 s2 p1 op1, and the U-Net's
    k4 s2 p1, models/networks.py:285-301).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 2
    padding: Union[int, Tuple[int, int]] = 1
    output_padding: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    kernel_init: Callable = make_initializer("normal", 0.02)
    bias_init: Callable = zeros
    impl: str = "dilated"  # 'dilated' | 'phases' (see perf note below)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        oph, opw = _pair(self.output_padding)
        in_ch = x.shape[-1]
        # Equivalent-regular-conv layout: HWIO with I=in_ch, O=features.
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, in_ch, self.features), jnp.float32
        )
        dtype = self.dtype or x.dtype
        y = None
        if (self.impl == "phases" and (sh, sw) == (2, 2)
                and _phases_are_uniform(kh, ph) and _phases_are_uniform(kw, pw)
                # the 2×2 interleave emits exactly 2H×2W rows; configs whose
                # true output is LARGER (k + op − 2p > 2, e.g. k4/p1/op1)
                # would be silently truncated — fall back to the dilated path
                # (review fix; smaller outputs slice correctly)
                and kh + oph - 2 * ph <= 2 and kw + opw - 2 * pw <= 2):
            # Phase (subpixel) decomposition — exact math, covered by the
            # torch-parity tests. Perf note (v5e, 9-block generator @256²):
            # an ISOLATED lhs-dilated conv runs at ~14 TFLOPs vs ~90 for the
            # phase convs, but inside a jitted graph XLA rewrites the dilated
            # form well and the end-to-end generator is FASTER with 'dilated'
            # (853 vs 706 img/s) — hence the default.
            y = _conv_transpose_s2_phases(
                x.astype(dtype), kernel.astype(dtype), (kh, kw), (ph, pw),
                (oph, opw))
        if y is None:
            pad = ((kh - 1 - ph, kh - 1 - ph + oph),
                   (kw - 1 - pw, kw - 1 - pw + opw))
            y = lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                window_strides=(1, 1),
                padding=pad,
                lhs_dilation=(sh, sw),
                dimension_numbers=DIMENSION_NUMBERS,
            ).astype(dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + bias
        return y.astype(dtype)


def conv3x3_reflect(x: jax.Array, kernel: jax.Array,
                    dtype=None) -> jax.Array:
    """3×3 conv with 1-px reflection padding, without materializing the
    padded activation.

    ``reflect_pad(x, 1)`` copies the whole activation before every conv —
    ~10% of generator time on v5e. Instead: a zero-padded SAME conv (XLA
    folds the zero padding into the conv) plus four border corrections that
    add the missing reflected-tap contributions:

    - top/bottom rows: 1×3 convs over rows 1 / H−2, themselves reflect-padded
      along W (covers the reflected corners);
    - left/right cols: 3×1 convs over cols 1 / W−2, zero-padded along H so
      the corner taps aren't double-counted.

    Exact vs pad+conv (tests/test_torch_parity.py).
    """
    dtype = dtype or x.dtype
    x = x.astype(dtype)
    k = kernel.astype(dtype)
    main = lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DIMENSION_NUMBERS).astype(dtype)
    h, w = x.shape[1], x.shape[2]

    def run(patch, sub, pad_w=None, pad_h=None):
        if pad_w is not None:
            patch = jnp.pad(patch, ((0, 0), (0, 0), (1, 1), (0, 0)),
                            mode=pad_w)
        if pad_h is not None:
            patch = jnp.pad(patch, ((0, 0), (1, 1), (0, 0), (0, 0)),
                            mode=pad_h)
        return lax.conv_general_dilated(
            patch, sub, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=DIMENSION_NUMBERS).astype(dtype)

    top = run(x[:, 1:2], k[0:1], pad_w="reflect")
    bot = run(x[:, h - 2:h - 1], k[2:3], pad_w="reflect")
    left = run(x[:, :, 1:2], k[:, 0:1], pad_h="constant")
    right = run(x[:, :, w - 2:w - 1], k[:, 2:3], pad_h="constant")
    main = main.at[:, 0:1].add(top).at[:, h - 1:h].add(bot)
    main = main.at[:, :, 0:1].add(left).at[:, :, w - 1:w].add(right)
    return main


def _phase_taps(k: int, pad_lo: int, d: int):
    """Kernel tap indices and conv padding for output phase ``d`` of a
    stride-2 transposed conv expressed as a dense conv over the input.

    out[2i+d] = Σ_{h ∈ taps} K[h] · x[i + (d − pad_lo + h)//2]; taps are the
    h with (d − pad_lo + h) even. Returns (h_start, n_taps, (pad_l, pad_r)).
    """
    taps = [h for h in range(k) if (d - pad_lo + h) % 2 == 0]
    offsets = [(d - pad_lo + h) // 2 for h in taps]
    o_min, o_max = offsets[0], offsets[-1]
    return taps[0], len(taps), (max(0, -o_min), max(0, o_max))


def _phases_are_uniform(k: int, p: int) -> bool:
    """True when every stride-2 output phase maps to a same-length dense conv
    (offset ranges straddle 0) — holds for all paddings used in this
    codebase (k3/p1, k4/p1); exotic paddings fall back to the dilated path."""
    pad_lo = k - 1 - p
    for d in range(2):
        taps = [h for h in range(k) if (d - pad_lo + h) % 2 == 0]
        if not taps:
            return False
        offs = [(d - pad_lo + h) // 2 for h in taps]
        if offs[0] > 0 or offs[-1] < 0:
            return False
    return True


def _conv_transpose_s2_phases(x: jax.Array, kernel: jax.Array,
                              k: Tuple[int, int], p: Tuple[int, int],
                              op: Tuple[int, int],
                              preferred_element_type=None) -> jax.Array:
    """Exact stride-2 ConvTranspose2d via 4 per-phase dense convs + interleave.

    With ``preferred_element_type`` set (e.g. int8 inputs → int32 accumulate,
    the int8 serving path), the phase convs accumulate in that type; otherwise
    the result is cast back to ``x.dtype``.
    """
    kh, kw = k
    pads_h = kh - 1 - p[0]
    pads_w = kw - 1 - p[1]
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    out_h = (h - 1) * 2 - 2 * p[0] + kh + op[0]
    out_w = (w - 1) * 2 - 2 * p[1] + kw + op[1]
    phases = []
    for dh in range(2):
        h0, nth, (plh, prh) = _phase_taps(kh, pads_h, dh)
        row = []
        for dw in range(2):
            w0, ntw, (plw, prw) = _phase_taps(kw, pads_w, dw)
            sub = kernel[h0::2][:nth, w0::2][:, :ntw]
            y = lax.conv_general_dilated(
                x, sub, window_strides=(1, 1),
                padding=((plh, prh), (plw, prw)),
                dimension_numbers=DIMENSION_NUMBERS,
                preferred_element_type=preferred_element_type,
            )
            if preferred_element_type is None:
                y = y.astype(x.dtype)
            row.append(y)
        phases.append(row)
    # interleave: out[2i+dh, 2j+dw] = phases[dh][dw][i, j]
    ph = jnp.stack([jnp.stack(r, axis=3) for r in phases], axis=2)
    # ph: (n, H, 2, W, 2, C) → (n, 2H, 2W, C)
    hh = ph.shape[1]
    ww = ph.shape[3]
    out = ph.reshape(n, hh * 2, ww * 2, cout)
    return out[:, :out_h, :out_w]


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=False, track_running_stats=False) by default."""

    affine: bool = False
    eps: float = 1e-5

    use_pallas: Optional[bool] = None  # None → auto (TPU + no affine)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if not self.affine:
            from .pallas.instance_norm import instance_norm

            return instance_norm(x, eps=self.eps, use_pallas=self.use_pallas)
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        # one-pass statistics (E[x²] − E[x]²): a single fused read of x for
        # both moments — measurably faster on TPU than the two-pass form
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        mean2 = jnp.mean(xf * xf, axis=(1, 2), keepdims=True)
        var = mean2 - mean * mean
        y = (xf - mean) * lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        y = y * scale + bias
        return y.astype(orig_dtype)


class Norm(nn.Module):
    """Norm-layer factory: 'instance' | 'batch' | 'none'.

    The reference selects norms by string (models/networks.py:12-22); the same
    strings select here. 'batch' follows torch BatchNorm2d defaults
    (eps 1e-5, momentum 0.1 — i.e. flax momentum 0.9) with affine params.
    """

    kind: str = "instance"
    affine: Optional[bool] = None  # default: False for instance, True for batch
    # Compute dtype of the 'batch' branch OUTPUT. None keeps the historical
    # fp32 output. Stats/params stay fp32 either way (flax
    # force_float32_reductions). Passing the enclosing module's compute
    # dtype matters on TPU: with fp32 BN outputs, every BN→concat DenseNet
    # chain carries fp32 activations through the bf16 trunk — profiling the
    # S2D train step (tools/profile_S2D_bfloat16.json) showed the fp32
    # concat/copy traffic of exactly those chains, and the value reaching
    # the next conv is bit-identical either way (the conv casts its input
    # to bf16 anyway).
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.kind == "none":
            return x
        if self.kind == "instance":
            affine = False if self.affine is None else self.affine
            return InstanceNorm(affine=affine, name="norm")(x)
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32 if self.dtype is None else self.dtype,
                name="norm",
            )(x)
        raise NotImplementedError(f"normalization layer [{self.kind}] is not found")


def norm_uses_bias(kind: str) -> bool:
    """Conv bias convention of the reference: bias iff norm is InstanceNorm
    (or none) — see models/networks.py:152-155."""
    return kind != "batch"


def avg_pool(x: jax.Array, window: int, stride: Optional[int] = None,
             padding: int = 0, count_include_pad: bool = True) -> jax.Array:
    """nn.AvgPool2d semantics (count_include_pad=True by torch default)."""
    stride = stride or window
    w = _pair(window)
    s = _pair(stride)
    p = _pair(padding)
    pads = ((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0))
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, w[0], w[1], 1), (1, s[0], s[1], 1), pads
    )
    if count_include_pad:
        return summed / (w[0] * w[1])
    ones = jnp.ones_like(x)
    counts = lax.reduce_window(
        ones, 0.0, lax.add, (1, w[0], w[1], 1), (1, s[0], s[1], 1), pads
    )
    return summed / counts


def max_pool(x: jax.Array, window: int, stride: Optional[int] = None,
             padding: int = 0) -> jax.Array:
    """nn.MaxPool2d semantics (zero-padded windows use -inf identity)."""
    stride = stride or window
    w = _pair(window)
    s = _pair(stride)
    p = _pair(padding)
    pads = ((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0))
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, w[0], w[1], 1), (1, s[0], s[1], 1), pads
    )


def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """nn.PixelShuffle on NHWC: (N,H,W,C·r²) → (N,H·r,W·r,C).

    Channel order matches torch (C-major, then r_h, then r_w) so imported
    weights upstream of a shuffle stay consistent
    (used by _ShuffleUpBlock, reference models/seg_network.py:228-244).
    """
    n, h, w, c = x.shape
    r = factor
    oc = c // (r * r)
    x = x.reshape(n, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r_h, w, r_w, oc
    return x.reshape(n, h * r, w * r, oc)


def resize_nearest(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbour resize to (H, W) — torch F.interpolate('nearest')."""
    n, h, w, c = x.shape
    oh, ow = size
    # torch 'nearest' uses floor(i * in/out) source indexing.
    rows = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def resize_bilinear(x: jax.Array, size: Tuple[int, int],
                    align_corners: bool = False,
                    prefer_mm: Optional[bool] = None) -> jax.Array:
    """Bilinear resize matching torch F.interpolate(mode='bilinear').

    align_corners=False → half-pixel centers (same as jax.image.resize).
    align_corners=True  → endpoint-aligned sampling (used throughout the
    reference's upsampling heads, e.g. new_model/my_rf_lw.py decoders).

    ``prefer_mm`` is the call site's default for the MXU-matmul kernel
    (`resize_bilinear_mm`, same two-tap weights): the S2D refiner sites
    pass True — two same-day chip pairs measured MM +2.4%/+4.9% on the
    S2D train step (bench_runs.jsonl 2026-08-20/21) — while rf_lw keeps
    the gather form (MM measured neutral-negative there, 31.18 vs 31.77).
    The CDE_RESIZE_MM env var force-overrides every site when set
    ("1" → MM everywhere, "0" → gather everywhere) for A/Bs.
    """
    n, h, w, c = x.shape
    oh, ow = size
    if not align_corners:
        if _use_mm(prefer_mm):
            return resize_bilinear_mm(x, size, align_corners=False)
        # antialias=False: torch F.interpolate does NOT antialias on
        # downscale, while jax.image.resize defaults to True (review fix —
        # divergence up to ~2.0 on a downscaled ramp; upscales unaffected)
        return jax.image.resize(x, (n, oh, ow, c), method="bilinear",
                                antialias=False)

    def axis_weights(in_len, out_len):
        if out_len == 1 or in_len == 1:
            pos = jnp.zeros((out_len,), jnp.float32)
        else:
            pos = jnp.arange(out_len, dtype=jnp.float32) * ((in_len - 1) / (out_len - 1))
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_len - 1)
        i1 = jnp.clip(i0 + 1, 0, in_len - 1)
        frac = pos - i0.astype(jnp.float32)
        return i0, i1, frac

    if _use_mm(prefer_mm):
        return resize_bilinear_mm(x, size, align_corners=True)
    r0, r1, rf = axis_weights(h, oh)
    xf = x.astype(jnp.float32)
    rows = xf[:, r0] * (1.0 - rf)[None, :, None, None] + xf[:, r1] * rf[None, :, None, None]
    c0, c1, cf = axis_weights(w, ow)
    out = rows[:, :, c0] * (1.0 - cf)[None, None, :, None] + rows[:, :, c1] * cf[None, None, :, None]
    return out.astype(x.dtype)


def _use_mm(prefer_mm: Optional[bool]) -> bool:
    """Resolve gather-vs-matmul for one resize call (read at trace time).

    CDE_RESIZE_MM unset → the call site's ``prefer_mm`` (None/False =
    gather); set → "0" forces gather everywhere, anything else forces the
    matmul form everywhere (per-process A/B without touching model code).
    """
    v = os.environ.get("CDE_RESIZE_MM", "")
    if v == "":
        return bool(prefer_mm)
    return v != "0"


def _interp_matrix(in_len: int, out_len: int,
                   align_corners: bool = True) -> np.ndarray:
    """Dense (out,in) bilinear interpolation matrix — exactly the two-tap
    weights of resize_bilinear: endpoint-aligned (align_corners=True) or
    torch half-pixel centers without antialiasing (False)."""
    m = np.zeros((out_len, in_len), np.float32)
    if out_len == 1 or in_len == 1:
        m[:, 0] = 1.0
        return m
    if align_corners:
        pos = np.arange(out_len, dtype=np.float64) * (
            (in_len - 1) / (out_len - 1))
    else:
        pos = (np.arange(out_len, dtype=np.float64) + 0.5) * (
            in_len / out_len) - 0.5
        pos = np.clip(pos, 0.0, in_len - 1)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, in_len - 1)
    i1 = np.clip(i0 + 1, 0, in_len - 1)
    frac = (pos - i0).astype(np.float32)
    m[np.arange(out_len), i0] += 1.0 - frac
    m[np.arange(out_len), i1] += frac
    return m


def resize_bilinear_mm(x: jax.Array, size: Tuple[int, int],
                       align_corners: bool = True) -> jax.Array:
    """Bilinear resize as two dense matmuls on the MXU.

    TPU-first alternative to the gather form above: the per-axis two-tap
    interpolation is a (out,in) matrix with two nonzeros per row, and
    contracting it densely rides the systolic array instead of issuing
    gathers — the candidate fix for the rf_lw/S2D steps being bound by
    'fusion resizes' (tools/profile_top_ops.py). Shapes are static under
    jit, so the matrices are baked as constants at trace time. Exact same
    two-tap weights as the gather/jax.image forms (parity-tested); fp32
    accumulation. Supports both alignment modes (the reference mixes them:
    refinenet fusions are endpoint-aligned, rf_lw's ×2 head and the PSP
    priors are half-pixel).
    """
    n, h, w, c = x.shape
    oh, ow = size
    # Precision: bf16 inputs contract at default precision (the throughput
    # mode — a bf16 net resizes in bf16 on the MXU; HIGHEST would force the
    # slow multi-pass fp32 emulation and defeat the point). fp32 inputs
    # request HIGHEST so the TPU default (bf16-ish matmul) cannot silently
    # break torch parity — measured 1.9e-2 max error on chip without it.
    dt = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if dt == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    rm = jnp.asarray(_interp_matrix(h, oh, align_corners), dt)
    cm = jnp.asarray(_interp_matrix(w, ow, align_corners), dt)
    rows = jnp.einsum("oh,nhwc->nowc", rm, x.astype(dt), precision=prec)
    out = jnp.einsum("pw,nowc->nopc", cm, rows, precision=prec)
    return out.astype(x.dtype)
