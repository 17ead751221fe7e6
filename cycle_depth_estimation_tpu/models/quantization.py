"""Int8 inference path for the CycleGAN generators.

Measured end-to-end on the 9-block generator @256², bs128, v5e:

- bf16 baseline:                      1129 img/s
- int8, dynamic act scales:           1026 img/s (abs-max reductions
  serialize the pipeline — SLOWER, kept only as the calibration mode)
- int8 v1 (`Int8ResnetGenerator`):    1278 img/s
- int8 v2 fused (`fused_int8_apply`): 1407 img/s  ← the serving path

The fused path exploits InstanceNorm's invariance to per-channel positive
affine transforms — IN(s·y + b) = IN(y) — so the dequantize multiply and
conv bias of every conv→IN site vanish: IN runs on the raw int32 MXU
accumulator, and IN→ReLU/residual→requantize(+pad) is one fused epilogue
(ops/pallas/int8_epilogue.py; XLA's own conv-epilogue fusion measured
faster than the standalone pallas kernel, so XLA is the default engine).

Perf ceiling context (measured on v5e via XLA): int8 conv3×3 c256 runs at
~130 TOPs and the best int8 matmul anywhere (8k³) at 184 TOPs (1.48× bf16,
not the nameplate 2×), so the fused path's 1407 img/s ≈ 122 effective
TOPs is ~94% of the achievable conv rate — the remaining gap is XLA's
int8 conv shape efficiency, not memory traffic. The up stages stay bf16:
the int8 phase decomposition measured ~2× slower (see fused_int8_apply).

Scheme:
- **weights**: per-output-channel symmetric int8 (scale = max|w|/127),
  converted once from any fp checkpoint;
- **activations**: per-tensor symmetric int8 with STATIC scales baked by
  `calibrate` (abs-max over a calibration batch, dynamic mode under the
  hood).

Post-training quantization: int8 output tracks fp32 with cosine > 0.999 on
random nets (tests/test_quantization.py); validate on real eval metrics
before serving.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from ..ops import Norm, reflect_pad
from ..ops.layers import DIMENSION_NUMBERS


def synthetic_calibration_batch(seed: int, n: int, size: int) -> np.ndarray:
    """Structured calibration images in [-1, 1], NHWC.

    Uniform noise has no spatial correlation, so post-conv activation ranges
    it produces are unrepresentative of natural images. This synthesizes
    smooth low-frequency content (random oriented sinusoids + ramps + soft
    blobs) with a little sensor-like noise — much closer to the activation
    statistics real photos drive through the generator.
    """
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    out = np.zeros((n, size, size, 3), np.float32)
    for i in range(n):
        for c in range(3):
            img = rng.uniform(-0.3, 0.3) * np.ones((size, size), np.float32)
            img += rng.uniform(-0.5, 0.5) * xx + rng.uniform(-0.5, 0.5) * yy
            for _ in range(4):  # oriented low-freq sinusoids
                f = rng.uniform(1.0, 8.0)
                th = rng.uniform(0, np.pi)
                ph = rng.uniform(0, 2 * np.pi)
                a = rng.uniform(0.1, 0.4)
                img += a * np.sin(2 * np.pi * f
                                  * (xx * np.cos(th) + yy * np.sin(th)) + ph)
            for _ in range(3):  # soft blobs
                cx, cy = rng.uniform(0, 1, 2)
                s = rng.uniform(0.05, 0.3)
                img += rng.uniform(-0.6, 0.6) * np.exp(
                    -((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
            img += rng.normal(0, 0.02, img.shape)
            out[i, :, :, c] = img
    return np.clip(out, -1.0, 1.0)


def quantize_conv_params(entry: Dict[str, Any]) -> Dict[str, Any]:
    """fp HWIO conv params → int8 kernel + per-out-channel fp32 scales."""
    w = np.asarray(entry["kernel"], np.float32)
    s = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
    s = np.maximum(s, 1e-12)
    wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    out = {"kernel_q": wq, "scale": s.astype(np.float32)}
    if "bias" in entry:
        out["bias"] = np.asarray(entry["bias"], np.float32)
    return out


class _Int8Site(nn.Module):
    """One quantized conv site: static act scale when present, else dynamic
    (sowing the observed abs-max for calibration)."""

    site: str
    stride: int = 1
    padding: Any = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x: jax.Array, q: Dict[str, jax.Array]) -> jax.Array:
        xf = x.astype(jnp.float32)
        if "act_scale" in q:
            s_x = q["act_scale"]
        else:
            amax = jnp.max(jnp.abs(xf))
            self.sow("intermediates", "amax", amax)
            s_x = jnp.maximum(amax / 127.0, 1e-12)
        xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
        y = lax.conv_general_dilated(
            xq, q["kernel_q"], (self.stride, self.stride), self.padding,
            dimension_numbers=DIMENSION_NUMBERS,
            preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * (s_x * q["scale"])
        if "bias" in q:
            out = out + q["bias"]
        return out.astype(jnp.bfloat16)


class Int8ResnetGenerator(nn.Module):
    """ResnetGenerator with int8 entry/down/res-block convs.

    Apply with variables from `int8_generator_variables` (fp params supply
    the bf16 ConvTranspose stages; ``qparams`` carries the int8 sites).
    """

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    norm: str = "instance"
    up_mode: str = "convtranspose"  # 'resize_conv' for the fast-serving
                                    # architecture (ResnetGenerator.up_mode)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops import Conv, ConvTranspose

        q = self.variables["qparams"]
        h = _Int8Site("conv_in", name="site_conv_in")(
            reflect_pad(x.astype(jnp.bfloat16), 3), q["conv_in"])
        h = Norm(self.norm, name="norm_in")(h)
        h = nn.relu(h)
        for i in range(2):
            h = _Int8Site(f"down{i}", stride=2, padding=((1, 1), (1, 1)),
                          name=f"site_down{i}")(h, q[f"down{i}_conv"])
            h = Norm(self.norm, name=f"down{i}_norm")(h)
            h = nn.relu(h)
        for i in range(self.n_blocks):
            b = q[f"block{i}"]
            r = _Int8Site(f"block{i}_conv1", name=f"site_block{i}_conv1")(
                reflect_pad(h, 1), b["conv1"])
            r = nn.relu(Norm(self.norm, name=f"block{i}_norm1")(r))
            r = _Int8Site(f"block{i}_conv2", name=f"site_block{i}_conv2")(
                reflect_pad(r, 1), b["conv2"])
            r = Norm(self.norm, name=f"block{i}_norm2")(r)
            h = h + r
        for i in range(2):
            mult = 2 ** (2 - i)
            # sown for the fused serving path, which quantizes the up stages
            # too (phase-decomposed int8 transposed convs)
            self.sow("intermediates", f"up{i}_amax",
                     jnp.max(jnp.abs(h.astype(jnp.float32))))
            if self.up_mode == "resize_conv":
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = Conv(self.ngf * mult // 2, 3, padding=1, use_bias=True,
                         dtype=jnp.bfloat16, name=f"up{i}_conv")(h)
            else:
                h = ConvTranspose(self.ngf * mult // 2, 3, stride=2, padding=1,
                                  output_padding=1, use_bias=True,
                                  dtype=jnp.bfloat16, name=f"up{i}_conv")(h)
            h = Norm(self.norm, name=f"up{i}_norm")(h)
            h = nn.relu(h)
        h = _Int8Site("conv_out", name="site_conv_out")(
            reflect_pad(h, 3), q["conv_out"])
        return jnp.tanh(h)


def quantize_resnet_generator(fp_params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every non-transposed conv of a ResnetGenerator param tree."""
    q: Dict[str, Any] = {}
    for name, entry in fp_params.items():
        if name.startswith("up"):
            continue  # transposed convs stay bf16
        if name.startswith("block"):
            q[name] = {k: quantize_conv_params(v) for k, v in entry.items()
                       if k.startswith("conv")}
        elif name.endswith("conv") or name in ("conv_in", "conv_out"):
            q[name] = quantize_conv_params(entry)
    return q


def int8_generator_variables(fp_params: Dict[str, Any]) -> Dict[str, Any]:
    """Variables dict for `Int8ResnetGenerator.apply` (dynamic-scale mode)."""
    up_params = {k: v for k, v in fp_params.items() if k.startswith("up")}
    return {"params": jax.tree.map(jnp.asarray, up_params),
            "qparams": jax.tree.map(jnp.asarray,
                                    quantize_resnet_generator(fp_params))}


def calibrate(model: Int8ResnetGenerator, variables: Dict[str, Any],
              calib_x: jax.Array, margin: float = 1.0) -> Dict[str, Any]:
    """Bake static activation scales from a calibration batch.

    Runs the dynamic-scale model once, collects each site's observed
    abs-max, and writes ``act_scale = margin·amax/127`` into qparams.
    Returns a new variables dict (production mode: no runtime reductions).
    """
    _, inter = model.apply(variables, calib_x, mutable=["intermediates"])
    sites = inter["intermediates"]
    if "site_conv_in" not in sites:
        # already-calibrated variables take the static branch and sow
        # nothing — fail intelligibly instead of a bare KeyError
        raise ValueError(
            "variables appear to be already calibrated (static act scales); "
            "re-calibrate from int8_generator_variables(params) output")
    q = jax.tree.map(lambda x: x, dict(variables["qparams"]))

    def site_scale(name):
        amax = float(sites[name]["amax"][0])
        return jnp.float32(max(amax * margin / 127.0, 1e-12))

    q["conv_in"] = dict(q["conv_in"], act_scale=site_scale("site_conv_in"))
    q["conv_out"] = dict(q["conv_out"], act_scale=site_scale("site_conv_out"))
    for i in range(2):
        q[f"down{i}_conv"] = dict(q[f"down{i}_conv"],
                                  act_scale=site_scale(f"site_down{i}"))
        # up-site input scales (consumed only by the fused serving path)
        amax = float(sites[f"up{i}_amax"][0])
        q[f"up{i}_conv"] = {
            "act_scale": jnp.float32(max(amax * margin / 127.0, 1e-12))}
    nb = model.n_blocks
    for i in range(nb):
        b = dict(q[f"block{i}"])
        b["conv1"] = dict(b["conv1"],
                          act_scale=site_scale(f"site_block{i}_conv1"))
        b["conv2"] = dict(b["conv2"],
                          act_scale=site_scale(f"site_block{i}_conv2"))
        q[f"block{i}"] = b
    return {"params": variables["params"], "qparams": q}


# ---------------------------------------------------------------------------
# Fused serving path (v2): IN-invariance + pallas epilogue fusion
# ---------------------------------------------------------------------------
#
# InstanceNorm is invariant to per-channel positive affine transforms, so the
# dequant multiply and conv bias of every conv→IN site are absorbed exactly:
# IN runs directly on the raw int32 conv output, and IN→ReLU/residual→
# requantize(+reflect-pad) is ONE fused pass (ops/pallas/int8_epilogue.py).
# The two ConvTranspose stages are quantized as well, via the exact phase
# decomposition (ops/layers.py _conv_transpose_s2_phases) whose four dense
# convs map straight onto the int8 MXU. Only the final conv_out (tanh
# follows, no IN) keeps a real dequantize.


def fused_int8_variables(static_vars: Dict[str, Any]) -> Dict[str, Any]:
    """Calibrated v1 variables → fused-path variables (all sites int8).

    ``static_vars`` must come from `calibrate` (every site needs a static
    act_scale; the fused path quantizes at the *producer*, so dynamic
    consumer-side scales are impossible by construction).
    """
    q = dict(static_vars["qparams"])
    for i in range(2):
        upq = quantize_conv_params(
            jax.tree.map(np.asarray, static_vars["params"][f"up{i}_conv"]))
        upq["act_scale"] = q[f"up{i}_conv"]["act_scale"]
        q[f"up{i}_conv"] = jax.tree.map(jnp.asarray, upq)
    # only the up-stage fp params are kept (for the bf16 up mode, the
    # production default); the trunk runs purely from qparams
    ups = {k: v for k, v in static_vars["params"].items()
           if k.startswith("up")}
    return {"qparams": q, "params": jax.tree.map(jnp.asarray, ups)}


def _conv_q(x: jax.Array, kernel_q: jax.Array, stride: int = 1,
            padding=((0, 0), (0, 0))) -> jax.Array:
    return lax.conv_general_dilated(
        x, kernel_q, (stride, stride), padding,
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=jnp.int32)


def fused_int8_apply(variables: Dict[str, Any], x: jax.Array, *,
                     n_blocks: int = 9, use_pallas: Optional[bool] = None,
                     up_mode: str = "bf16",
                     float_dtype=jnp.bfloat16) -> jax.Array:
    """Int8 ResnetGenerator forward, fused epilogues.

    Same math as `Int8ResnetGenerator` + `calibrate` up to (a) IN running on
    the undequantized accumulator (exact, by invariance; eps applies in
    normalized units), (b) quantization rounding from fp32 instead of the
    dequantized value (tighter). Output parity is checked against the fp32
    generator in tests/test_quantization.py.

    ``up_mode`` selects the ConvTranspose stages' path:
      - 'bf16' (default): lhs-dilated bf16 convs — measured fastest on v5e
        (int8 phase decomposition ran the two up stages ~2× slower: the four
        small-tap convs have low MXU utilization and the int32 interleave
        adds a full memory pass);
      - 'int8_dilated': int8 lhs-dilated convs, IN-invariant epilogue;
      - 'int8_phases': exact phase decomposition, int8 dense convs;
      - 'resize_conv_int8': nearest ×2 (an int8 repeat — pure layout, no
        flops) + dense int8 3×3 conv. NON-parity with ConvTranspose weights:
        use with a generator trained with `ResnetGenerator(up_mode=
        'resize_conv')`. This is the all-int8 fast-serving architecture —
        the up convs become plain dense MXU ops instead of dilated ones.
    """
    from ..ops.layers import _conv_transpose_s2_phases
    from ..ops.pallas.int8_epilogue import fused_in_epilogue

    if up_mode not in ("bf16", "int8_dilated", "int8_phases",
                       "resize_conv_int8"):
        # a typo would silently serve the measured-slower int8 ups
        raise ValueError(f"unknown up_mode [{up_mode}]; expected 'bf16' | "
                         "'int8_dilated' | 'int8_phases' | 'resize_conv_int8'")
    q = variables["qparams"]

    def inv(site):
        return 1.0 / site["act_scale"]

    def quant_input(xf, site):
        xf = xf.astype(jnp.float32) * inv(site)
        return jnp.clip(jnp.round(xf), -127, 127).astype(jnp.int8)

    def ep(y, s_next, **kw):
        return fused_in_epilogue(y, inv(s_next), use_pallas=use_pallas,
                                 float_dtype=float_dtype, **kw)

    xq = reflect_pad(quant_input(x, q["conv_in"]), 3)
    y = _conv_q(xq, q["conv_in"]["kernel_q"])
    a, _ = ep(y, q["down0_conv"], relu=True)
    y = _conv_q(a, q["down0_conv"]["kernel_q"], 2, ((1, 1), (1, 1)))
    a, _ = ep(y, q["down1_conv"], relu=True)
    y = _conv_q(a, q["down1_conv"]["kernel_q"], 2, ((1, 1), (1, 1)))
    a, h = ep(y, q["block0"]["conv1"], relu=True, keep_float=True, pad=1)
    for i in range(n_blocks):
        b = q[f"block{i}"]
        r = _conv_q(a, b["conv1"]["kernel_q"])
        a2, _ = ep(r, b["conv2"], relu=True, pad=1)
        r = _conv_q(a2, b["conv2"]["kernel_q"])
        last = i == n_blocks - 1
        if not last:
            a, h = ep(r, q[f"block{i + 1}"]["conv1"], residual=h, pad=1)
        elif up_mode == "bf16":
            _, h = fused_in_epilogue(r, None, residual=h,
                                     use_pallas=use_pallas,
                                     float_dtype=float_dtype)
        else:
            a, h = ep(r, q["up0_conv"], residual=h, pad=0)

    if up_mode == "bf16":
        for i in range(2):
            p = variables["params"][f"up{i}_conv"]
            y = lax.conv_general_dilated(
                h, p["kernel"].astype(float_dtype), (1, 1), ((1, 2), (1, 2)),
                lhs_dilation=(2, 2), dimension_numbers=DIMENSION_NUMBERS)
            y = y + p["bias"].astype(float_dtype)
            if i == 0:  # up1 is also bf16 — no requantize between
                _, h = fused_in_epilogue(y, None, relu=True,
                                         use_pallas=use_pallas,
                                         float_dtype=float_dtype)
            else:  # conv_out is int8 — quantize + bake its reflect-pad 3
                a, _ = fused_in_epilogue(y, inv(q["conv_out"]), relu=True,
                                         pad=3, use_pallas=use_pallas,
                                         float_dtype=float_dtype)
    else:
        for i in range(2):
            kq = q[f"up{i}_conv"]["kernel_q"]
            if up_mode == "resize_conv_int8":
                up = jnp.repeat(jnp.repeat(a, 2, axis=1), 2, axis=2)
                y = _conv_q(up, kq, 1, ((1, 1), (1, 1)))
            elif up_mode == "int8_phases":
                y = _conv_transpose_s2_phases(
                    a, kq, (3, 3), (1, 1), (1, 1),
                    preferred_element_type=jnp.int32)
            else:  # int8_dilated
                y = lax.conv_general_dilated(
                    a, kq, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
                    dimension_numbers=DIMENSION_NUMBERS,
                    preferred_element_type=jnp.int32)
            if i == 0:
                a, _ = ep(y, q["up1_conv"], relu=True)
            else:
                a, _ = ep(y, q["conv_out"], relu=True, pad=3)
    y = _conv_q(a, q["conv_out"]["kernel_q"])
    co = q["conv_out"]
    out = (y.astype(jnp.float32) * (co["act_scale"] * co["scale"])
           + co["bias"])
    return jnp.tanh(out).astype(float_dtype)
