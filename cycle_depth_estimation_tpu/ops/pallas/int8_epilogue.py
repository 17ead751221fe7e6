"""Fused InstanceNorm epilogue for the int8 serving path.

Every quantized conv in the CycleGAN generator is followed by InstanceNorm
(reference models/networks.py:152-236 applies norm after each conv).
InstanceNorm is invariant to any per-channel positive affine transform:

    IN(s·y + b) = IN(y)        for per-channel s > 0, b

so the int8 conv's dequantization multiply (``s_x · s_w[c]``) and the conv
bias are absorbed **exactly** — IN can run directly on the raw int32 MXU
accumulator output. This kernel then fuses the whole inter-conv epilogue:

    int32 conv out ──► IN ──► [+residual | ReLU] ──► ×(1/s_next) ──► round
                   ──► int8 (optionally reflect-padded for the next conv)

into ONE pass: read int32 (4 B/elt), write int8 (1 B/elt). The unfused v1
path (models/quantization.py ``_Int8Site``) spends ~16 B/elt on the same
span (dequant write, IN reads/writes, pad copy, quantize write) — the
generator is HBM-bound here (v5e: 819 GB/s), so this is the headline win.

Stats precision: the int32 accumulators are converted to fp32 inside VMEM;
sums over H·W (≤65k values ≤ 4e7 each) stay well within fp32 range, and the
quantize happens from fp32 — *tighter* than the v1 path which rounded from
bf16-normalized values.

Blocking: grid (N, C/Cb) with full-spatial blocks — IN statistics are
per-(sample, channel) over H×W, so channel blocks are independent. Blocks
are sized for ~16 MB VMEM with double buffering; slabs that don't fit fall
back to the numerically identical XLA form.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Per-block VMEM budget (input + outputs, double-buffered by the pipeline).
_VMEM_BUDGET_BYTES = 6 * 1024 * 1024


def _epilogue_math(xf, hf, inv_s, *, relu: bool, eps: float):
    """Shared fp32 math: IN → (+residual | relu) → quantize. Returns (z, q)."""
    hw = xf.shape[-3] * xf.shape[-2]
    s1 = jnp.sum(xf, axis=(-3, -2), keepdims=True)
    s2 = jnp.sum(xf * xf, axis=(-3, -2), keepdims=True)
    mean = s1 / hw
    var = s2 / hw - mean * mean
    z = (xf - mean) * lax.rsqrt(var + eps)
    if hf is not None:
        z = z + hf
    elif relu:
        z = jnp.maximum(z, 0.0)
    q = jnp.clip(jnp.round(z * inv_s), -127.0, 127.0).astype(jnp.int8)
    return z, q


def _pad_sp(q, pad: int, mode: str):
    if pad == 0:
        return q
    cfg = [(0, 0)] * (q.ndim - 3) + [(pad, pad), (pad, pad), (0, 0)]
    return jnp.pad(q, cfg, mode=mode)


def _pad_sp_kernel(q, pad: int, mode: str):
    """Reflect/edge pad built from 1-wide slice concats (``jnp.pad`` lowers
    to ``rev``, which Mosaic doesn't implement)."""
    if pad == 0:
        return q
    for axis in (-3, -2):
        size = q.shape[axis]
        one = lambda i: lax.slice_in_dim(q, i, i + 1, axis=axis)  # noqa: E731
        if mode == "reflect":
            pre = [one(i) for i in range(pad, 0, -1)]
            post = [one(size - 2 - i) for i in range(pad)]
        else:  # edge
            pre = [one(0)] * pad
            post = [one(size - 1)] * pad
        q = jnp.concatenate(pre + [q] + post, axis=axis)
    return q


def _kernel(y_ref, *refs, relu: bool, keep_float: bool, residual: bool,
            pad: int, pad_mode: str, eps: float):
    i = 0
    h_ref = None
    if residual:
        h_ref = refs[i]
        i += 1
    inv_s_ref = refs[i]
    q_ref = refs[i + 1]
    z_ref = refs[i + 2] if keep_float else None

    xf = y_ref[...].astype(jnp.float32)  # (1, H, W, Cb)
    hf = h_ref[...].astype(jnp.float32) if residual else None
    z, q = _epilogue_math(xf, hf, inv_s_ref[0, 0], relu=relu, eps=eps)
    q_ref[...] = _pad_sp_kernel(q, pad, pad_mode)
    if keep_float:
        z_ref[...] = z.astype(z_ref.dtype)


def _xla_epilogue(y, inv_s, residual, *, relu, keep_float, pad, pad_mode,
                  eps, float_dtype):
    xf = y.astype(jnp.float32)
    hf = residual.astype(jnp.float32) if residual is not None else None
    z, q = _epilogue_math(xf, hf, inv_s, relu=relu, eps=eps)
    q = _pad_sp(q, pad, pad_mode)
    return (q, z.astype(float_dtype)) if keep_float else (q, None)


def _pick_cb(h: int, w: int, c: int, pad: int, keep_float: bool,
             residual: bool) -> Optional[int]:
    """Largest channel block fitting VMEM.

    Mosaic requires the lane (minor) block dim to be a multiple of 128 or the
    full array dim, so candidates are 128-multiples plus ``c`` itself. Sites
    whose full-spatial slab doesn't fit at any legal block (the 256²/128²
    outer stages) fall back to the XLA epilogue.
    """
    per_ch = h * w * 4  # int32 input
    per_ch += (h + 2 * pad) * (w + 2 * pad)  # int8 output
    if residual:
        per_ch += h * w * 2
    if keep_float:
        per_ch += h * w * 2
    cands = sorted({cb for cb in (512, 384, 256, 128, c)
                    if cb <= c and c % cb == 0}, reverse=True)
    for cb in cands:
        if cb * per_ch <= _VMEM_BUDGET_BYTES:
            return cb
    return None


def fused_in_epilogue(
    y: jax.Array,
    inv_scale: Optional[jax.Array],
    residual: Optional[jax.Array] = None,
    *,
    relu: bool = False,
    keep_float: bool = False,
    pad: int = 0,
    pad_mode: str = "reflect",
    eps: float = 1e-5,
    float_dtype=jnp.bfloat16,
    use_pallas: Optional[bool] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """InstanceNorm(+ReLU | +residual) → requantize, fused.

    Args:
      y: raw int32 (or float) conv output, NHWC. Per-channel-scale invariance
        of IN means no dequantization is needed beforehand.
      inv_scale: scalar ``1 / act_scale`` of the *consumer* conv site.
      residual: optional float residual stream to add after IN (ResnetBlock
        tail; mutually exclusive with ``relu``).
      relu: apply ReLU after IN.
      keep_float: also return the float (pre-quantize) activation — needed
        where the value feeds both an int8 conv and the residual stream.
      pad: spatial padding baked into the int8 output (reflect/edge), so the
        consumer conv reads a pre-padded buffer with padding=0.

    Returns:
      (q_int8_padded, z_float_or_None).
    """
    assert not (relu and residual is not None)
    n, h, w, c = y.shape
    if residual is not None:
        keep_float = True
    if inv_scale is None:
        # float-only epilogue (no requantize) — used when the consumer stays
        # bf16 (e.g. the bf16 ConvTranspose up-stage mode)
        xf = y.astype(jnp.float32)
        hf = residual.astype(jnp.float32) if residual is not None else None
        z, _ = _epilogue_math(xf, hf, jnp.float32(1.0), relu=relu, eps=eps)
        return None, z.astype(float_dtype)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cb = _pick_cb(h, w, c, pad, keep_float, residual is not None)
    if use_pallas is None:
        # Measured on v5e (trunk block, 128×64×64×256): XLA fuses this whole
        # epilogue into the convs nearly for free (block 10.07 ms) while the
        # standalone pallas kernel costs an extra memory round trip
        # (12.46 ms) — XLA's conv-epilogue fusion wins, pallas stays opt-in.
        use_pallas = False
    if not use_pallas or cb is None:
        return _xla_epilogue(y, inv_scale, residual, relu=relu,
                             keep_float=keep_float, pad=pad,
                             pad_mode=pad_mode, eps=eps,
                             float_dtype=float_dtype)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    inv_s = jnp.asarray(inv_scale, jnp.float32).reshape(1, 1)
    grid = (n, c // cb)
    blk = lambda hh, ww: pl.BlockSpec(  # noqa: E731
        (1, hh, ww, cb), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM)

    in_specs = [blk(h, w)]
    args = [y]
    if residual is not None:
        in_specs.append(blk(h, w))
        args.append(residual)
    in_specs.append(pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                 memory_space=pltpu.SMEM))
    args.append(inv_s)

    out_shapes = [jax.ShapeDtypeStruct((n, h + 2 * pad, w + 2 * pad, c),
                                       jnp.int8)]
    out_specs = [blk(h + 2 * pad, w + 2 * pad)]
    if keep_float:
        out_shapes.append(jax.ShapeDtypeStruct((n, h, w, c), float_dtype))
        out_specs.append(blk(h, w))

    kernel = functools.partial(
        _kernel, relu=relu, keep_float=keep_float,
        residual=residual is not None, pad=pad, pad_mode=pad_mode, eps=eps)
    out = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret)(*args)
    return (out[0], out[1]) if keep_float else (out[0], None)
