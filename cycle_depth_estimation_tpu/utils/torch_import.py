"""Import reference ``.pth`` state dicts into framework param pytrees.

The reference saves per-net torch ``state_dict``s named
``<epoch>_net_<Name>.pth`` (reference models/base_model.py:102-114). This
module converts those tensors into the NHWC/HWIO param layout of our flax
modules so a reference-trained net runs here with ~1e-5 numerical parity
(layer semantics verified in tests/test_torch_parity.py).

Layout transforms:
- ``Conv2d``          weight (O, I, kH, kW)  → HWIO via transpose (2, 3, 1, 0)
- ``ConvTranspose2d`` weight (I, O, kH, kW)  → our equivalent-regular-conv
  HWIO kernel: spatial flip then transpose (2, 3, 0, 1)
  (see ops.layers.ConvTranspose docstring).
- biases unchanged.

torch is only needed to *load* ``.pth`` files; the converters below work on
numpy arrays so the core framework has no torch dependency.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly on GPU / requiring grad)
    return t.detach().cpu().numpy()


def convert_conv_weight(w: Any) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(_np(w), (2, 3, 1, 0)))


def convert_convT_weight(w: Any) -> np.ndarray:
    w = _np(w)
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """torch.load a ``.pth`` state dict → {name: np.ndarray}."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: _np(v) for k, v in sd.items()}


def _conv_entry(sd: Mapping[str, np.ndarray], prefix: str, transposed: bool = False
                ) -> Dict[str, np.ndarray]:
    conv = convert_convT_weight if transposed else convert_conv_weight
    out = {"kernel": conv(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def import_resnet_generator(sd: Mapping[str, np.ndarray], n_blocks: int = 9,
                            use_dropout: bool = False,
                            norm: str = "instance") -> Dict[str, Any]:
    """Map a reference ResnetGenerator state dict (torch Sequential indices,
    reference models/networks.py:157-188) onto our named modules.

    Only 'instance'/'none' norms carry no params and are supported here (the
    reference always builds these generators with InstanceNorm affine=False).
    """
    if norm not in ("instance", "none"):
        raise NotImplementedError("importer supports instance/none norm generators")
    params: Dict[str, Any] = {}
    params["conv_in"] = _conv_entry(sd, "model.1")
    params["down0_conv"] = _conv_entry(sd, "model.4")
    params["down1_conv"] = _conv_entry(sd, "model.7")
    second_conv_idx = 6 if use_dropout else 5
    for i in range(n_blocks):
        base = f"model.{10 + i}.conv_block"
        params[f"block{i}"] = {
            "conv1": _conv_entry(sd, f"{base}.1"),
            "conv2": _conv_entry(sd, f"{base}.{second_conv_idx}"),
        }
    up0 = 10 + n_blocks
    params["up0_conv"] = _conv_entry(sd, f"model.{up0}", transposed=True)
    params["up1_conv"] = _conv_entry(sd, f"model.{up0 + 3}", transposed=True)
    params["conv_out"] = _conv_entry(sd, f"model.{up0 + 7}")
    return params


def import_nlayer_discriminator(sd: Mapping[str, np.ndarray], n_layers: int = 3,
                                norm: str = "instance") -> Dict[str, Any]:
    """Map a reference NLayerDiscriminator state dict
    (reference models/networks.py:330-356, instance norm → param-free norms)."""
    if norm not in ("instance", "none"):
        raise NotImplementedError("importer supports instance/none norm discriminators")
    params: Dict[str, Any] = {"conv0": _conv_entry(sd, "model.0")}
    idx = 2
    for n in range(1, n_layers):
        params[f"conv{n}"] = _conv_entry(sd, f"model.{idx}")
        idx += 3
    params[f"conv{n_layers}"] = _conv_entry(sd, f"model.{idx}")
    idx += 3
    params["conv_out"] = _conv_entry(sd, f"model.{idx}")
    return params


def import_unet_generator(sd: Mapping[str, np.ndarray], num_downs: int = 8,
                          norm: str = "batch") -> Dict[str, Any]:
    """Map a reference UnetGenerator state dict onto our flat encoder/decoder.

    The reference builds the U-Net recursively (models/networks.py:243-316),
    producing nested ``model.model.…`` torch names. Walking from the outermost
    block inward, each nesting level's Sequential is:
      outermost:  [downconv, submodule, uprelu, upconv, tanh]
      mid:        [downrelu, downconv, downnorm, submodule, uprelu, upconv, upnorm]
      innermost:  [downrelu, downconv, uprelu, upconv, upnorm]
    Dropout (when enabled) appends to mid blocks and shifts no conv indices.
    BatchNorm params map onto our Norm modules' ``norm`` BatchNorm.
    """
    params: Dict[str, Any] = {}
    batch = norm == "batch"

    def bn_entry(prefix: str) -> Dict[str, Any]:
        return {
            "norm": {
                "scale": _np(sd[prefix + ".weight"]),
                "bias": _np(sd[prefix + ".bias"]),
            }
        }

    def bn_stats(prefix: str) -> Dict[str, Any]:
        return {
            "norm": {
                "mean": _np(sd[prefix + ".running_mean"]),
                "var": _np(sd[prefix + ".running_var"]),
            }
        }

    batch_stats: Dict[str, Any] = {}
    prefix = "model.model"  # outermost block attr 'model' holds its Sequential
    for lvl in range(num_downs):
        outermost = lvl == 0
        innermost = lvl == num_downs - 1
        if outermost:
            down_idx, up_idx, down_norm_idx, up_norm_idx = 0, 3, None, None
            sub_idx = 1
        elif innermost:
            down_idx, up_idx, down_norm_idx, up_norm_idx = 1, 3, None, 4
            sub_idx = None
        else:
            down_idx, up_idx, down_norm_idx, up_norm_idx = 1, 5, 2, 6
            sub_idx = 3
        params[f"down{lvl}_conv"] = _conv_entry(sd, f"{prefix}.{down_idx}")
        params[f"up{lvl}_conv"] = _conv_entry(sd, f"{prefix}.{up_idx}", transposed=True)
        if batch and down_norm_idx is not None:
            params[f"down{lvl}_norm"] = bn_entry(f"{prefix}.{down_norm_idx}")
            batch_stats[f"down{lvl}_norm"] = bn_stats(f"{prefix}.{down_norm_idx}")
        if batch and up_norm_idx is not None:
            params[f"up{lvl}_norm"] = bn_entry(f"{prefix}.{up_norm_idx}")
            batch_stats[f"up{lvl}_norm"] = bn_stats(f"{prefix}.{up_norm_idx}")
        if sub_idx is not None:
            prefix = f"{prefix}.{sub_idx}.model"
    out: Dict[str, Any] = {"params": params}
    if batch:
        out["batch_stats"] = batch_stats
    return out
