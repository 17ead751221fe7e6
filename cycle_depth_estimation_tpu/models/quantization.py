"""Int8 inference path for the CycleGAN generators.

v5e's MXU runs int8 at ~2× bf16 throughput. Measured end-to-end on the
9-block generator @256², bs128 (see CLAUDE.md):

- bf16 baseline:            1129 img/s
- int8, dynamic act scales: 1026 img/s (the per-layer abs-max reductions
  serialize the pipeline — SLOWER, kept only as the calibration mode)
- int8, static act scales:  1270 img/s  ← the production mode (+12%)

Scheme:
- **weights**: per-output-channel symmetric int8 (scale = max|w|/127),
  converted once from any fp checkpoint;
- **activations**: per-tensor symmetric int8 with STATIC scales baked by
  `calibrate` (abs-max over a calibration batch, dynamic mode under the
  hood); InstanceNorm, pads, tanh and the transposed convs stay bf16.

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

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops import ConvTranspose

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
    q = jax.tree.map(lambda x: x, dict(variables["qparams"]))

    def site_scale(name):
        amax = float(sites[name]["amax"][0])
        return jnp.float32(max(amax * margin / 127.0, 1e-12))

    q["conv_in"] = dict(q["conv_in"], act_scale=site_scale("site_conv_in"))
    q["conv_out"] = dict(q["conv_out"], act_scale=site_scale("site_conv_out"))
    for i in range(2):
        q[f"down{i}_conv"] = dict(q[f"down{i}_conv"],
                                  act_scale=site_scale(f"site_down{i}"))
    nb = model.n_blocks
    for i in range(nb):
        b = dict(q[f"block{i}"])
        b["conv1"] = dict(b["conv1"],
                          act_scale=site_scale(f"site_block{i}_conv1"))
        b["conv2"] = dict(b["conv2"],
                          act_scale=site_scale(f"site_block{i}_conv2"))
        q[f"block{i}"] = b
    return {"params": variables["params"], "qparams": q}
