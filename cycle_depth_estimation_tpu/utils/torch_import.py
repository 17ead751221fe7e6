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

from typing import Any, Dict, Mapping, Tuple

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


def strip_module_prefix(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove the DataParallel ``module.`` prefix (reference saves wrapped
    nets, e.g. new_multi/model5.py:212)."""
    return {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}


def _bn(sd: Mapping[str, np.ndarray], prefix: str):
    p = {"norm": {"scale": _np(sd[prefix + ".weight"]),
                  "bias": _np(sd[prefix + ".bias"])}}
    s = {"norm": {"mean": _np(sd[prefix + ".running_mean"]),
                  "var": _np(sd[prefix + ".running_var"])}}
    return p, s


def _dense_block(sd: Mapping[str, np.ndarray], prefix: str, num_layers: int):
    """Map a torch _DenseBlock onto our DenseBlock params/stats."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(1, num_layers + 1):
        lp: Dict[str, Any] = {}
        ls: Dict[str, Any] = {}
        base = f"{prefix}.denselayer{i}"
        lp["norm1"], ls["norm1"] = _bn(sd, f"{base}.norm1")
        lp["conv1"] = _conv_entry(sd, f"{base}.conv1")
        lp["norm2"], ls["norm2"] = _bn(sd, f"{base}.norm2")
        lp["conv2"] = _conv_entry(sd, f"{base}.conv2")
        params[f"denselayer{i}"] = lp
        stats[f"denselayer{i}"] = ls
    return params, stats


def import_g1(sd: Mapping[str, np.ndarray], n_blocks: int = 3,
              block_config: int = 6) -> Dict[str, Any]:
    """Import a reference G_1 checkpoint (new_multi/networks5_ds.py:26-66;
    e.g. the checked-in new_multi/checkpoints/iter_4000_net_G_1.pth) into our
    `models.s2d_networks.G1` variables ({params, batch_stats})."""
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["conv0"] = _conv_entry(sd, "features.conv0")
    params["norm0"], stats["norm0"] = _bn(sd, "features.norm0")
    params["denseblock1"], stats["denseblock1"] = _dense_block(
        sd, "features.denseblock1", block_config)
    params["entry_conv"] = _conv_entry(sd, "model.1")
    params["entry_norm"], stats["entry_norm"] = _bn(sd, "model.2")
    for i in range(n_blocks):
        base = f"model.{4 + i}"
        bp: Dict[str, Any] = {"conv0": _conv_entry(sd, f"{base}.conv0_block.1"),
                              "conv1": _conv_entry(sd, f"{base}.conv1_block.1")}
        bs: Dict[str, Any] = {}
        bp["norm0"], bs["norm0"] = _bn(sd, f"{base}.conv0_block.2")
        bp["norm1"], bs["norm1"] = _bn(sd, f"{base}.conv1_block.2")
        params[f"block{i}"] = bp
        stats[f"block{i}"] = bs
    return {"params": params, "batch_stats": stats}


def import_g1_base(sd: Mapping[str, np.ndarray], n_blocks: int = 3,
                   block_config: int = 6) -> Dict[str, Any]:
    """Import a base-generation G_1 checkpoint (my_seg_depth/networks2.py:
    285-329, e.g. ``G1_model.pth``) into our `G1(block_type='resnet')`
    variables. The residual blocks are standard two-conv ResnetBlocks:
    torch ``model.N.conv_block.{1,2,5,6}`` → conv1/norm1/conv2/norm2."""
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["conv0"] = _conv_entry(sd, "features.conv0")
    params["norm0"], stats["norm0"] = _bn(sd, "features.norm0")
    params["denseblock1"], stats["denseblock1"] = _dense_block(
        sd, "features.denseblock1", block_config)
    params["entry_conv"] = _conv_entry(sd, "model.1")
    params["entry_norm"], stats["entry_norm"] = _bn(sd, "model.2")
    for i in range(n_blocks):
        base = f"model.{4 + i}"
        bp: Dict[str, Any] = {"conv1": _conv_entry(sd, f"{base}.conv_block.1"),
                              "conv2": _conv_entry(sd, f"{base}.conv_block.5")}
        bs: Dict[str, Any] = {}
        bp["norm1"], bs["norm1"] = _bn(sd, f"{base}.conv_block.2")
        bp["norm2"], bs["norm2"] = _bn(sd, f"{base}.conv_block.6")
        params[f"block{i}"] = bp
        stats[f"block{i}"] = bs
    return {"params": params, "batch_stats": stats}


def import_general_net(sd: Mapping[str, np.ndarray],
                       block_config=(6, 12, 32, 32)) -> Dict[str, Any]:
    """Import a reference General_net (G_2) checkpoint
    (new_multi/networks5_ds.py:366-477) into our
    `models.s2d_networks.GeneralNet` variables.

    torch layout: ``features.{conv0,norm0,denseblock1..4}``, ``PSP.{i}.trans``
    ModuleLists (BN@0, 1×1@2, 3×3@3) and the psp head ModuleList
    (BN@0, convs@2-5, BN@6).
    """
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["conv0"] = _conv_entry(sd, "features.conv0")
    params["norm0"], stats["norm0"] = _bn(sd, "features.norm0")
    for i, n_layers in enumerate(block_config):
        params[f"denseblock{i + 1}"], stats[f"denseblock{i + 1}"] = _dense_block(
            sd, f"features.denseblock{i + 1}", n_layers)
        if i < len(block_config) - 1:
            tp: Dict[str, Any] = {
                "conv1x1": _conv_entry(sd, f"PSP.{i}.trans.2"),
                "conv3x3": _conv_entry(sd, f"PSP.{i}.trans.3"),
            }
            ts: Dict[str, Any] = {}
            tp["norm"], ts["norm"] = _bn(sd, f"PSP.{i}.trans.0")
            params[f"psptrans{i}"] = tp
            stats[f"psptrans{i}"] = ts
    params["psp_norm_in"], stats["psp_norm_in"] = _bn(sd, "psp.0")
    for j, name in enumerate(("psp_b0", "psp_b1", "psp_b2", "psp_b3")):
        params[name] = _conv_entry(sd, f"psp.{j + 2}")
    params["psp_norm_out"], stats["psp_norm_out"] = _bn(sd, "psp.6")
    return {"params": params, "batch_stats": stats}


def import_general_net2(sd: Mapping[str, np.ndarray],
                        block_config=(6, 12, 32, 32)) -> Dict[str, Any]:
    """Import a reference base-generation General_net checkpoint
    (my_seg_depth/networks2.py:395-481, e.g. ``General_model.pth``) into our
    `models.s2d_networks.GeneralNet2` variables.

    torch layout: ``features.{conv0,norm0,denseblockN,transitionN}`` with
    STANDARD transitions (norm/conv inside each transition) and the psp head
    ModuleList (BN@0, convs@2-5, BN@6).
    """
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["conv0"] = _conv_entry(sd, "features.conv0")
    params["norm0"], stats["norm0"] = _bn(sd, "features.norm0")
    for i, n_layers in enumerate(block_config):
        params[f"denseblock{i + 1}"], stats[f"denseblock{i + 1}"] = _dense_block(
            sd, f"features.denseblock{i + 1}", n_layers)
        if i < len(block_config) - 1:
            tp: Dict[str, Any] = {
                "conv": _conv_entry(sd, f"features.transition{i + 1}.conv")}
            ts: Dict[str, Any] = {}
            tp["norm"], ts["norm"] = _bn(sd, f"features.transition{i + 1}.norm")
            params[f"transition{i + 1}"] = tp
            stats[f"transition{i + 1}"] = ts
    params["psp_norm_in"], stats["psp_norm_in"] = _bn(sd, "psp.0")
    for j, name in enumerate(("psp_b0", "psp_b1", "psp_b2", "psp_b3")):
        params[name] = _conv_entry(sd, f"psp.{j + 2}")
    params["psp_norm_out"], stats["psp_norm_out"] = _bn(sd, "psp.6")
    return {"params": params, "batch_stats": stats}


def _import_skip_decoder(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Map a base-generation SEG/DEP decoder body (networks2.py:489-566) onto
    our `_SkipDecoder` params: trans_0 ConvT + trans_1..4 1×1 adapters +
    Up.0-3 DeconvBlocks + the Up.4 1×1 head. (Each torch DeconvBlock also
    instantiates an unused ``bn`` — batch_norm=False — whose state-dict
    entries are skipped, like the reference's own loads.)"""
    params: Dict[str, Any] = {"trans_0": _conv_entry(sd, "trans_0",
                                                     transposed=True)}
    for i in range(1, 5):
        params[f"trans_{i}"] = _conv_entry(sd, f"trans_{i}")
    for i in range(4):
        params[f"up{i}"] = {
            "deconv": _conv_entry(sd, f"Up.{i}.deconv", transposed=True)}
    params["head"] = _conv_entry(sd, "Up.4")
    return params


def import_seg2(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Import a base-generation SEG decoder (networks2.py:489-531,
    ``Seg_de``) into our `models.s2d_networks.SEG2` variables (skip-decoder
    body + the activation BN head)."""
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {"dec": _import_skip_decoder(sd)}
    stats: Dict[str, Any] = {}
    p, s = _bn(sd, "activation_seg.0")
    params["act_norm"], stats["act_norm"] = p, s
    return {"params": params, "batch_stats": stats}


def import_dep2(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Import a base-generation DEP decoder (networks2.py:534-566,
    ``Dep_de``) into our `models.s2d_networks.DEP2` variables."""
    sd = strip_module_prefix(dict(sd))
    return {"params": {"dec": _import_skip_decoder(sd)}}


def import_resnetlw(sd: Mapping[str, np.ndarray],
                    layers=(3, 4, 23, 3)) -> Dict[str, Any]:
    """Import a reference ResNetLW checkpoint (new_model/my_rf_lw.py:226-321,
    e.g. the 'res101_model.pth' / 'my_ins_res101_model.pth' weight files the
    reference loads) into our `models.refinenet.ResNetLW` variables."""
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["conv1"] = _conv_entry(sd, "conv1")
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")

    # ---- trunk layers + per-domain instance adapters ----
    for li, blocks in enumerate(layers, start=1):
        lp: Dict[str, Any] = {}
        ls: Dict[str, Any] = {}
        for b in range(blocks):
            base = f"layer{li}.{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for c in (1, 2, 3):
                bp[f"conv{c}"] = _conv_entry(sd, f"{base}.conv{c}")
                bp[f"bn{c}"], bs[f"bn{c}"] = _bn(sd, f"{base}.bn{c}")
            if f"{base}.downsample.0.weight" in sd:
                bp["down_conv"] = _conv_entry(sd, f"{base}.downsample.0")
                bp["down_bn"], bs["down_bn"] = _bn(sd, f"{base}.downsample.1")
            lp[f"block{b}"] = bp
            ls[f"block{b}"] = bs
        params[f"layer{li}"] = lp
        stats[f"layer{li}"] = ls
        for suffix in ("s", "r"):
            name = f"ins_layer{li}_{suffix}"
            if f"{name}.0.weight" in sd:
                params[name] = {"conv": _conv_entry(sd, f"{name}.0")}

    # ---- top-down fusion ----
    def cbr(torch_prefix: str, mine: str):
        params[mine] = {"conv": _conv_entry(sd, f"{torch_prefix}.0")}
        bnp, bns = _bn(sd, f"{torch_prefix}.1")
        params[mine]["bn"] = bnp
        stats[mine] = {"bn": bns}

    def psp(torch_prefix: str, mine: str):
        pp: Dict[str, Any] = {}
        ps: Dict[str, Any] = {}
        for i in range(4):
            pp[f"psp{i}_conv"] = _conv_entry(sd, f"{torch_prefix}.{i + 1}_pspconv.0")
            pp[f"psp{i}_bn"], ps[f"psp{i}_bn"] = _bn(
                sd, f"{torch_prefix}.{i + 1}_pspconv.1")
        pp["res_conv"] = _conv_entry(sd, f"{torch_prefix}.conv.0")
        pp["res_bn"], ps["res_bn"] = _bn(sd, f"{torch_prefix}.conv.1")
        params[mine] = pp
        stats[mine] = ps

    def at(torch_prefix: str, mine: str):
        pp: Dict[str, Any] = {"at_conv": _conv_entry(sd, f"{torch_prefix}.attention_bs2.0"),
                              "proj": _conv_entry(sd, f"{torch_prefix}.conv")}
        ps: Dict[str, Any] = {}
        pp["at_bn"], ps["at_bn"] = _bn(sd, f"{torch_prefix}.attention_bs2.1")
        params[mine] = pp
        stats[mine] = ps

    cbr("p_ims1d2_outl1_dimred_", "outl1_dimred")
    psp("psp4.0", "psp4")
    params["g1_dimred"] = _conv_entry(sd, "mflow_conv_g1_b3_joint_varout_dimred")
    cbr("p_ims1d2_outl2_dimred_", "outl2_dimred")
    params["adapt2"] = _conv_entry(sd, "adapt_stage2_b2_joint_varout_dimred")
    at("CAT3", "cat3")
    psp("psp3.0", "psp3")
    params["g2_dimred"] = _conv_entry(sd, "mflow_conv_g2_b3_joint_varout_dimred")
    cbr("p_ims1d2_outl3_dimred_", "outl3_dimred")
    params["adapt3"] = _conv_entry(sd, "adapt_stage3_b2_joint_varout_dimred")
    at("CAT2", "cat2")
    psp("psp2.0", "psp2")
    params["g3_dimred"] = _conv_entry(sd, "mflow_conv_g3_b3_joint_varout_dimred")
    cbr("p_ims1d2_outl4_dimred_", "outl4_dimred")
    params["adapt4"] = _conv_entry(sd, "adapt_stage4_b2_joint_varout_dimred")
    at("CAT1", "cat1")
    psp("psp1.0", "psp1")

    # ---- depth block (my_rf_lw.py:169-224 ReLU6 variant) ----
    dp: Dict[str, Any] = {}
    ds: Dict[str, Any] = {}
    for i in range(4):
        dp[f"up{i}_deconv"] = _conv_entry(sd, f"dep.upconv.{i}.0", transposed=True)
        dp[f"up{i}_norm0"], ds[f"up{i}_norm0"] = _bn(sd, f"dep.upconv.{i}.2")
        dp[f"up{i}_conv"] = _conv_entry(sd, f"dep.upconv.{i}.3")
        dp[f"up{i}_norm1"], ds[f"up{i}_norm1"] = _bn(sd, f"dep.upconv.{i}.5")
        dp[f"depth_out{i}"] = _conv_entry(sd, f"dep.depth_out.{i}.0")
        dp[f"at{i}_conv"] = _conv_entry(sd, f"dep.attention_bs.{i}.0")
        dp[f"at{i}_norm"], ds[f"at{i}_norm"] = _bn(sd, f"dep.attention_bs.{i}.2")
    dp["fuse_conv"] = _conv_entry(sd, "dep.conv.0")
    dp["fuse_norm"], ds["fuse_norm"] = _bn(sd, "dep.conv.2")
    dp["dep_conv"] = _conv_entry(sd, "dep.depconv.0")
    params["dep"] = dp
    stats["dep"] = ds
    return {"params": params, "batch_stats": stats}


def import_segd(sd: Mapping[str, np.ndarray], up_scale: int) -> Dict[str, Any]:
    """Import a reference segd head (new_model/my_rf_lw.py:493-516)."""
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(up_scale):
        params[f"up{i}"] = {"deconv": _conv_entry(sd, f"Up.{i}.deconv",
                                                  transposed=True)}
    params["head"] = _conv_entry(sd, f"Up.{up_scale}")
    return {"params": params, "batch_stats": stats}


def import_preunet16(sd: Mapping[str, np.ndarray], layers: int = 4
                     ) -> Dict[str, Any]:
    """Import a reference _PreUNet16 state dict (models/seg_network.py:353-439)
    into our `models.seg_network.PreUNet16` variables.

    The torch names follow the reference's Sequential packing: the VGG16
    encoder stacks renumber torchvision's ``features.{0,2,5,…}`` as
    ``conv1.{0,2}`` / ``conv2.{0,2}`` / ``conv3.{0,2,4}`` / ``conv4.{0,2,4}``;
    _InceptionBlock convs live at ``layer{i}.1`` / ``branch1x1.1`` (index 1:
    after the ReflectionPad2d), _DecoderUpBlock at ``model.{1,2,4,5}`` and
    _OutputBlock at ``model.1``. The shared PReLU appears under several
    aliases of the same tensor — any one supplies ``prelu_alpha``.
    """
    if layers != 4:
        raise NotImplementedError("reference _PreUNet16 is only functional "
                                  "at layers=4 (see PreUNet16 docstring)")
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    vgg: Dict[str, Any] = {}
    for stage, idxs in (("conv1", (0, 2)), ("conv2", (0, 2)),
                        ("conv3", (0, 2, 4)), ("conv4", (0, 2, 4))):
        for j in idxs:
            vgg[f"{stage}_{j}"] = _conv_entry(sd, f"{stage}.{j}")
    params["vgg"] = vgg

    def inception(prefix: str, width: int):
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        for i in range(width):
            p[f"branch{i}"] = _conv_entry(sd, f"{prefix}.layer{i}.1")
        p["fuse1x1"] = _conv_entry(sd, f"{prefix}.branch1x1.1")
        p["norm1"], s["norm1"] = _bn(sd, f"{prefix}.norm1")
        p["norm2"], s["norm2"] = _bn(sd, f"{prefix}.norm2")
        return p, s

    def dec_up(prefix: str):
        p: Dict[str, Any] = {"conv": _conv_entry(sd, f"{prefix}.model.1"),
                             "up": _conv_entry(sd, f"{prefix}.model.4",
                                               transposed=True)}
        s: Dict[str, Any] = {}
        p["norm1"], s["norm1"] = _bn(sd, f"{prefix}.model.2")
        p["norm2"], s["norm2"] = _bn(sd, f"{prefix}.model.5")
        return p, s

    width = 7 - layers
    for i in range(width):
        params[f"center{i}"], stats[f"center{i}"] = inception(f"center.{i}",
                                                              width)
    params["center_up"], stats["center_up"] = dec_up(f"center.{width}")
    for name in ("deconv4", "deconv3", "deconv2"):
        params[name], stats[name] = dec_up(name)
    for name in ("output4", "output3", "output2", "deconv1"):
        params[name] = {"conv": _conv_entry(sd, f"{name}.model.1")}

    for key in sd:
        if key.endswith("nonlinearity.weight") and sd[key].shape == (1,):
            params["prelu_alpha"] = _np(sd[key])
            break
    else:
        params["prelu_alpha"] = np.full((1,), 0.25, np.float32)
    return {"params": params, "batch_stats": stats}


def import_drop_discriminator(sd: Mapping[str, np.ndarray],
                              repeat_num: int = 4) -> Dict[str, Any]:
    """Import the base-generation feature Discriminator state dict
    (my_seg_depth/networks2.py:331-353, model2's ``Dis_en``) into our
    `models.s2d_networks.DropDiscriminator` params. The torch Sequential
    packs [conv, LeakyReLU, Dropout2d] triples → convs at main.{0,3,6,...};
    the bias-free 1×1 head is ``conv1``.
    """
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {}
    for i in range(1, repeat_num):
        params[f"conv{i}"] = _conv_entry(sd, f"main.{3 * (i - 1)}")
    params["head"] = _conv_entry(sd, "conv1")
    return {"params": params}


def import_discriminator2_seg(sd: Mapping[str, np.ndarray],
                              repeat_num: int = 3) -> Dict[str, Any]:
    """Import a reference Discriminator2_seg state dict (the checked-in
    ``iter_4000_net_Dis0_en.pth``; net at new_multi/networks5_ds.py:842-864)
    into our `models.s2d_networks.Discriminator2Seg` variables. The torch
    Sequential packs [conv, LeakyReLU, BN] triples: convs at main.{0,3,6},
    BNs at main.{2,5,8}; the stride-2 head is ``conv1``.
    """
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(repeat_num):
        params[f"conv{i}"] = _conv_entry(sd, f"main.{3 * i}")
        params[f"norm{i}"], stats[f"norm{i}"] = _bn(sd, f"main.{3 * i + 2}")
    params["head"] = _conv_entry(sd, "conv1")
    return {"params": params, "batch_stats": stats}


def import_sdiscriminator(sd: Mapping[str, np.ndarray], n_layers: int = 3
                          ) -> Dict[str, Any]:
    """Import a reference ``_Discriminator`` (the S2D feature PatchGAN,
    new_multi/networks5_ds.py:527-566; saved as ``<iter>_net_FD{1,2,3}.pth``
    by model5.py save_networks) into `models.s2d_networks.SDiscriminator`
    variables.

    torch layout (flat Sequential ``model``): conv@0, shared PReLU@1 (the
    SAME module instance is re-appended before the last conv, so the state
    dict holds its α under both ``model.1.weight`` and the alias), then per
    middle layer i: conv@{3i-1}, BN@{3i}, own PReLU@{3i+1}; tail conv@{3n-1},
    BN@{3n}, shared PReLU alias, conv_out@{3n+2}.
    """
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["conv0"] = _conv_entry(sd, "model.0")
    params["prelu_alpha"] = _np(sd["model.1.weight"])
    for i in range(1, n_layers):
        base = 2 + 3 * (i - 1)
        params[f"conv{i}"] = _conv_entry(sd, f"model.{base}")
        params[f"norm{i}"], stats[f"norm{i}"] = _bn(sd, f"model.{base + 1}")
        params[f"prelu_mid{i}"] = _np(sd[f"model.{base + 2}.weight"])
    base = 2 + 3 * (n_layers - 1)
    params[f"conv{n_layers}"] = _conv_entry(sd, f"model.{base}")
    params[f"norm{n_layers}"], stats[f"norm{n_layers}"] = _bn(
        sd, f"model.{base + 1}")
    params["conv_out"] = _conv_entry(sd, f"model.{base + 3}")
    return {"params": params, "batch_stats": stats}


def _gside(sd: Mapping[str, np.ndarray], prefix: str):
    """Map a reference G_side (networks5_ds.py:623-651) onto our GSide."""
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    p["at_conv"] = _conv_entry(sd, f"{prefix}.attention_bs.0")
    p["at_norm"], s["at_norm"] = _bn(sd, f"{prefix}.attention_bs.1")
    p["side_conv0"] = _conv_entry(sd, f"{prefix}.side_conv.0")
    p["side_norm0"], s["side_norm0"] = _bn(sd, f"{prefix}.side_conv.2")
    p["side_conv1"] = _conv_entry(sd, f"{prefix}.side_conv.3")
    p["side_norm1"], s["side_norm1"] = _bn(sd, f"{prefix}.side_conv.5")
    p["out_conv0"] = _conv_entry(sd, f"{prefix}.conv.0")
    p["out_norm0"], s["out_norm0"] = _bn(sd, f"{prefix}.conv.2")
    p["out_conv1"] = _conv_entry(sd, f"{prefix}.conv.3")
    p["out_norm1"], s["out_norm1"] = _bn(sd, f"{prefix}.conv.5")
    return p, s


def import_rdep(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Import a reference ``R_dep`` refiner checkpoint
    (new_multi/networks5_ds.py:733-821, saved as ``<iter>_net_R_D.pth``)
    into `models.s2d_networks.RDep` variables.

    The reference's ``up0``/``dep_out``/``norm`` submodules are constructed
    but never used by its forward (networks5_ds.py:777-821), so their
    state-dict entries are intentionally dropped here — our RDep does not
    declare them.
    """
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for k in range(3):
        params[f"gs{k}"], stats[f"gs{k}"] = _gside(sd, f"AT.{k}")
    # seg_block (networks5_ds.py:708-728)
    sp: Dict[str, Any] = {"conv0": _conv_entry(sd, "seg_d.deconv.0"),
                          "conv1": _conv_entry(sd, "seg_d.deconv.3")}
    ss: Dict[str, Any] = {}
    sp["norm0"], ss["norm0"] = _bn(sd, "seg_d.deconv.2")
    sp["norm1"], ss["norm1"] = _bn(sd, "seg_d.bn")
    params["seg_d"], stats["seg_d"] = sp, ss
    # depth_block (networks5_ds.py:655-706)
    dp: Dict[str, Any] = {}
    ds: Dict[str, Any] = {}
    for i in range(4):
        dp[f"up{i}_deconv"] = _conv_entry(sd, f"dep.upconv.{i}.0",
                                          transposed=True)
        dp[f"up{i}_norm0"], ds[f"up{i}_norm0"] = _bn(sd, f"dep.upconv.{i}.2")
        dp[f"up{i}_conv"] = _conv_entry(sd, f"dep.upconv.{i}.3")
        dp[f"up{i}_norm1"], ds[f"up{i}_norm1"] = _bn(sd, f"dep.upconv.{i}.5")
        dp[f"depth_out{i}"] = _conv_entry(sd, f"dep.depth_out.{i}.0")
        dp[f"at{i}_conv0"] = _conv_entry(sd, f"dep.attention_bs.{i}.0")
        dp[f"at{i}_norm"], ds[f"at{i}_norm"] = _bn(sd, f"dep.attention_bs.{i}.2")
        dp[f"at{i}_conv1"] = _conv_entry(sd, f"dep.attention_bs.{i}.3")
    dp["fuse_conv0"] = _conv_entry(sd, "dep.conv.0")
    dp["fuse_norm0"], ds["fuse_norm0"] = _bn(sd, "dep.conv.2")
    dp["fuse_conv1"] = _conv_entry(sd, "dep.conv.3")
    dp["fuse_norm1"], ds["fuse_norm1"] = _bn(sd, "dep.conv.5")
    dp["dep_conv"] = _conv_entry(sd, "dep.depconv.0")
    dp["dep_norm"], ds["dep_norm"] = _bn(sd, "dep.depconv.1")
    params["dep"], stats["dep"] = dp, ds
    return {"params": params, "batch_stats": stats}


def import_gbase(sd: Mapping[str, np.ndarray], n_blocks: int = 3
                 ) -> Dict[str, Any]:
    """Import a base-generation alternate G_1 (my_seg_depth/networks.py:
    83-127 — CycleGAN-style BatchNorm encoder) into
    `models.s2d_networks.GBase` variables.

    torch flat Sequential: stem conv@1 BN@2, downs conv@{4,7} BN@{5,8},
    resnet blocks at 10..10+n−1 (``conv_block.{1,2,5,6}``), head conv at
    ``11+n``.
    """
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {"stem_conv": _conv_entry(sd, "model.1")}
    stats: Dict[str, Any] = {}
    params["stem_norm"], stats["stem_norm"] = _bn(sd, "model.2")
    for i in range(2):
        params[f"down{i}_conv"] = _conv_entry(sd, f"model.{4 + 3 * i}")
        params[f"down{i}_norm"], stats[f"down{i}_norm"] = _bn(
            sd, f"model.{5 + 3 * i}")
    for i in range(n_blocks):
        base = f"model.{10 + i}.conv_block"
        params[f"block{i}_conv0"] = _conv_entry(sd, f"{base}.1")
        params[f"block{i}_norm0"], stats[f"block{i}_norm0"] = _bn(
            sd, f"{base}.2")
        params[f"block{i}_conv1"] = _conv_entry(sd, f"{base}.5")
        params[f"block{i}_norm1"], stats[f"block{i}_norm1"] = _bn(
            sd, f"{base}.6")
    params["head"] = _conv_entry(sd, f"model.{11 + n_blocks}")
    return {"params": params, "batch_stats": stats}


def import_skip_decoder_alt(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Import a base-generation ALTERNATE SEG/DEP decoder
    (my_seg_depth/networks.py:289-351: ``trans`` 1×1 ModuleList + ``Up``
    ConvTranspose-k2-s2 ModuleList) into `SEGAlt`/`DEPAlt` variables."""
    sd = strip_module_prefix(dict(sd))
    dec: Dict[str, Any] = {}
    for i in range(3):
        dec[f"trans_{i}"] = _conv_entry(sd, f"trans.{i}")
    for i in range(4):
        dec[f"up_{i}"] = _conv_entry(sd, f"Up.{i}", transposed=True)
    return {"params": {"dec": dec}}


def import_feature_net(sd: Mapping[str, np.ndarray],
                       block_config=(6, 8, 8)) -> Dict[str, Any]:
    """Import a reference ``Feature_net`` (my_seg_depth/networks.py:226-288:
    stemless DenseNet growth-48 + the 4-branch PSP head) into
    `models.s2d_networks.FeatureNet` variables."""
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, n_layers in enumerate(block_config):
        params[f"denseblock{i + 1}"], stats[f"denseblock{i + 1}"] = _dense_block(
            sd, f"features.denseblock{i + 1}", n_layers)
        if i < len(block_config) - 1:
            tp: Dict[str, Any] = {
                "conv": _conv_entry(sd, f"features.transition{i + 1}.conv")}
            ts: Dict[str, Any] = {}
            tp["norm"], ts["norm"] = _bn(sd, f"features.transition{i + 1}.norm")
            params[f"transition{i + 1}"] = tp
            stats[f"transition{i + 1}"] = ts
    params["psp_norm_in"], stats["psp_norm_in"] = _bn(sd, "psp.0")
    for j, name in enumerate(("psp_b0", "psp_b1", "psp_b2", "psp_b3")):
        params[name] = _conv_entry(sd, f"psp.{j + 2}")
    params["psp_norm_out"], stats["psp_norm_out"] = _bn(sd, "psp.6")
    return {"params": params, "batch_stats": stats}


def _gside_st(sd: Mapping[str, np.ndarray], prefix: str):
    """Map a semantic_trans G_side (semantic_trans/networks5_ds.py:495-521)
    onto our GSideST (single side conv, concat fusion)."""
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    p["at_conv"] = _conv_entry(sd, f"{prefix}.attention_bs.0")
    p["at_norm"], s["at_norm"] = _bn(sd, f"{prefix}.attention_bs.1")
    p["side_conv"] = _conv_entry(sd, f"{prefix}.side_conv.0")
    p["side_norm"], s["side_norm"] = _bn(sd, f"{prefix}.side_conv.2")
    p["out_conv"] = _conv_entry(sd, f"{prefix}.conv.0")
    p["out_norm"], s["out_norm"] = _bn(sd, f"{prefix}.conv.2")
    return p, s


def import_rdep_st(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Import a semantic_trans-generation ``R_dep`` state dict
    (semantic_trans/networks5_ds.py:601-695, saved as ``<iter>_net_R_D.pth``
    by that snapshot) into `models.s2d_networks.RDepST` variables.

    Dead declared-but-unused reference submodules (``up0``, ``dep_out``,
    ``norm``) are dropped; the 4 AT/Dep/Seg levels map onto
    gs{0-3}/dep{0-3}/seg{0-3}.
    """
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for k in range(4):
        params[f"gs{k}"], stats[f"gs{k}"] = _gside_st(sd, f"AT.{k}")
        # seg_block: deconv / bn / result (networks5_ds.py:579-598)
        sp = {"deconv": _conv_entry(sd, f"Seg.{k}.deconv", transposed=True),
              "result": _conv_entry(sd, f"Seg.{k}.result")}
        ss: Dict[str, Any] = {}
        sp["bn"], ss["bn"] = _bn(sd, f"Seg.{k}.bn")
        params[f"seg{k}"], stats[f"seg{k}"] = sp, ss
        # depth_block (networks5_ds.py:523-577)
        dp: Dict[str, Any] = {}
        ds: Dict[str, Any] = {}
        for i in range(4):
            dp[f"up{i}_deconv"] = _conv_entry(sd, f"Dep.{k}.upconv.{i}.0",
                                              transposed=True)
            dp[f"up{i}_norm"], ds[f"up{i}_norm"] = _bn(
                sd, f"Dep.{k}.upconv.{i}.2")
            dp[f"depth_out{i}"] = _conv_entry(sd, f"Dep.{k}.depth_out.{i}.0")
            dp[f"at{i}_conv"] = _conv_entry(sd, f"Dep.{k}.attention_bs.{i}.0")
            dp[f"at{i}_norm"], ds[f"at{i}_norm"] = _bn(
                sd, f"Dep.{k}.attention_bs.{i}.2")
        dp["fuse_conv"] = _conv_entry(sd, f"Dep.{k}.conv.0")
        dp["fuse_norm"], ds["fuse_norm"] = _bn(sd, f"Dep.{k}.conv.2")
        dp["se_conv"] = _conv_entry(sd, f"Dep.{k}.s_econv.0")
        dp["se_norm"], ds["se_norm"] = _bn(sd, f"Dep.{k}.s_econv.1")
        dp["dep_conv"] = _conv_entry(sd, f"Dep.{k}.depconv.0")
        dp["dep_norm"], ds["dep_norm"] = _bn(sd, f"Dep.{k}.depconv.1")
        params[f"dep{k}"], stats[f"dep{k}"] = dp, ds
    return {"params": params, "batch_stats": stats}


def import_seg_decoder(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Import a reference ``SEG`` decoder (networks5_ds.py:866-890, both the
    semantic_trans and new_multi copies; saved as ``<iter>_net_Seg_de.pth``)
    into `models.s2d_networks.SEG` variables. The DeconvBlocks run with
    ``batch_norm=False`` so their declared ``bn`` entries are dead and
    dropped."""
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {
        f"up{i}": {"deconv": _conv_entry(sd, f"Up.{i}.deconv",
                                         transposed=True)}
        for i in range(4)}
    params["head"] = _conv_entry(sd, "Up.4")
    stats: Dict[str, Any] = {}
    params["act_norm"], stats["act_norm"] = _bn(sd, "activation_seg.0")
    return {"params": params, "batch_stats": stats}


def import_dep_decoder(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Import a reference ``DEP`` decoder (networks5_ds.py:892-921; saved as
    ``<iter>_net_Dep_de.pth``) into `models.s2d_networks.DEP` variables
    (ordimat coordinate channels are generated, not parameters)."""
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {
        f"up{i}": {"deconv": _conv_entry(sd, f"Up.{i}.deconv",
                                         transposed=True)}
        for i in range(4)}
    params["head"] = _conv_entry(sd, "Up.4")
    return {"params": params}


def import_star_discriminator(sd: Mapping[str, np.ndarray],
                              repeat_num: int = 6) -> Dict[str, Any]:
    """Import a reference ``Discriminator`` (StarGAN-style, norm-free —
    networks5_ds.py:264-288; the semantic_trans DIS/Dis_80/160/320 nets)
    into `models.s2d_networks.StarDiscriminator` variables."""
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {
        f"conv{i}": _conv_entry(sd, f"main.{2 * i}")
        for i in range(repeat_num)}
    params["head"] = _conv_entry(sd, "conv1")
    return {"params": params}


def import_torchvision_densenet(sd: Mapping[str, np.ndarray],
                                block_config=(6, 12, 32, 32)) -> Dict[str, Any]:
    """Import a torchvision DenseNet state dict (densenet121/169) into our
    `models.s2d_networks.GeneralNet2` variables for pretrained warm-starts —
    the reference does the same with a key-remap (networks5_ds.py:89-120).

    Accepts both modern torchvision names (``norm1``) and the legacy dotted
    names (``norm.1``) the reference's regex rewrites. The classifier and the
    final ``features.norm5`` have no counterpart here (the PSP head replaces
    them) and are skipped.
    """
    sd = {k.replace("norm.1", "norm1").replace("norm.2", "norm2")
           .replace("conv.1", "conv1").replace("conv.2", "conv2"): v
          for k, v in strip_module_prefix(dict(sd)).items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["conv0"] = _conv_entry(sd, "features.conv0")
    params["norm0"], stats["norm0"] = _bn(sd, "features.norm0")
    for i, n_layers in enumerate(block_config):
        params[f"denseblock{i + 1}"], stats[f"denseblock{i + 1}"] = _dense_block(
            sd, f"features.denseblock{i + 1}", n_layers)
        if i < len(block_config) - 1:
            tp: Dict[str, Any] = {
                "conv": _conv_entry(sd, f"features.transition{i + 1}.conv")}
            ts: Dict[str, Any] = {}
            tp["norm"], ts["norm"] = _bn(sd, f"features.transition{i + 1}.norm")
            params[f"transition{i + 1}"] = tp
            stats[f"transition{i + 1}"] = ts
    return {"params": params, "batch_stats": stats}


def warm_start(target_vars: Dict[str, Any], donor_vars: Dict[str, Any]
               ) -> Tuple[Dict[str, Any], int]:
    """Copy donor leaves into target wherever path+shape match (the
    reference's name-matching weight transfer, my_rf_lw.py:555-570).
    Returns ``(merged_variables, n_transferred)`` (review fix: the count was
    smuggled into the pytree as a bogus '_n_transferred' leaf).

    Rebuilds only the dict nodes and reuses unmatched leaf arrays as-is
    (leaves are never mutated in place), so warm-starting a 77M-param tree
    does not deep-copy ~300 MB of arrays."""

    def merge(dst, src):
        n = 0
        out = {}
        for k, v in dst.items():
            s = src.get(k) if isinstance(src, dict) else None
            if isinstance(v, dict):
                out[k], m = merge(v, s if isinstance(s, dict) else {})
                n += m
            elif s is not None and not isinstance(s, dict) and \
                    getattr(v, "shape", None) == getattr(s, "shape", ()):
                out[k] = s
                n += 1
            else:
                out[k] = v
        return out, n

    n = 0
    out = {}
    for coll, tree in dict(target_vars).items():
        if coll in donor_vars:
            out[coll], m = merge(tree, donor_vars[coll])
            n += m
        else:
            out[coll] = tree
    return out, n


def import_seg_df(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Import a deeperfeatures-generation SEG decoder
    (my_seg_depth/deeperfeatures/networks2.py:532-560, ``Seg_de`` of the
    model3 variants) into our `models.s2d_networks.SEGDF` variables: the
    skip-free Up.0-3 DeconvBlocks + the Up.4 1×1 class head + the
    activation BN. (Each torch DeconvBlock instantiates an unused ``bn`` —
    batch_norm=False — whose entries are skipped.)"""
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(4):
        params[f"up{i}"] = {
            "deconv": _conv_entry(sd, f"Up.{i}.deconv", transposed=True)}
    params["head"] = _conv_entry(sd, "Up.4")
    params["act_norm"], stats["act_norm"] = _bn(sd, "activation_seg.0")
    return {"params": params, "batch_stats": stats}


def import_dep_df(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Import a deeperfeatures-generation DEP decoder
    (my_seg_depth/deeperfeatures/networks2.py:563-610, ``Dep_de`` of the
    model3 variants) into our `models.s2d_networks.DEPDF` variables:
    features.0/2 growth-36 DenseBlocks, features.1 Transition, the
    ordimat-fed Up.0-3 DeconvBlocks and the Up.4 1×1 head."""
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["block0"], stats["block0"] = _dense_block(sd, "features.0", 8)
    tp: Dict[str, Any] = {"conv": _conv_entry(sd, "features.1.conv")}
    ts: Dict[str, Any] = {}
    tp["norm"], ts["norm"] = _bn(sd, "features.1.norm")
    params["trans0"], stats["trans0"] = tp, ts
    params["block1"], stats["block1"] = _dense_block(sd, "features.2", 18)
    for i in range(4):
        params[f"up{i}"] = {
            "deconv": _conv_entry(sd, f"Up.{i}.deconv", transposed=True)}
    params["head"] = _conv_entry(sd, "Up.4")
    return {"params": params, "batch_stats": stats}


def import_dis2seg_df(sd: Mapping[str, np.ndarray],
                      repeat_num: int = 3) -> Dict[str, Any]:
    """Import a deeperfeatures-generation Discriminator2_seg
    (my_seg_depth/deeperfeatures/networks2.py:499-531, ``Dis0_en`` of the
    model3 variants) into our `models.s2d_networks.Dis2SegDF` variables:
    main.{0,2,4} 1×1 convs + the bias-free conv1 head.

    The 28-class ``Discriminator_seg`` (new_depseg/networks2.py:462-494,
    ``Dis_en`` of the S2D_nd model) has the identical state-dict layout —
    this importer loads it into `DiscriminatorSeg` as well, and likewise
    new_depseg's own ``Discriminator2_seg`` (networks2.py:496-527, the
    ``Dis0_en``/``Dis1_en`` twin critics of the model3 "4dis" variant,
    256-ch ladder + 28-ch head) into ``Dis2SegDF(head_ch=28)``."""
    sd = strip_module_prefix(dict(sd))
    params: Dict[str, Any] = {
        f"conv{i}": _conv_entry(sd, f"main.{2 * i}") for i in range(repeat_num)}
    params["head"] = _conv_entry(sd, "conv1")
    return {"params": params}
