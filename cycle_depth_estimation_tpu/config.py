"""Config system: typed dataclass replacing the reference's argparse layer.

Reproduces the reference options surface (options/base_options.py:13-67,
options/train_options.py:5-34, options/test_options.py:5-19) as one dataclass
with the same semantics:

- two-phase parse: base flags → model/dataset plugins adjust defaults
  (`apply_model_defaults`, mirroring ``modify_commandline_options``) → final
  parse;
- provenance dump of the full option table to ``checkpoints/<name>/opt.txt``
  (reference options/base_options.py:94-112).

Field names are snake_case versions of the reference flags (``loadSize`` →
``load_size``); the CLI accepts both spellings.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import List, Optional

# reference flag name → dataclass field for CLI compatibility
_FLAG_ALIASES = {
    "loadSize": "load_size",
    "fineSize": "fine_size",
    "batchSize": "batch_size",
    "netG": "net_g",
    "netD": "net_d",
    "n_layers_D": "n_layers_d",
    "lr_D": "lr_d",
}


@dataclass
class Config:
    # ---- base options (reference options/base_options.py) ----
    dataroot: str = "./datasets"
    batch_size: int = 8
    load_size: int = 286
    fine_size: int = 256
    display_winsize: int = 256
    input_nc: int = 3
    output_nc: int = 3
    ngf: int = 64
    ndf: int = 64
    net_d: str = "basic"
    net_g: str = "resnet_9blocks"
    n_layers_d: int = 3
    name: str = "experiment_name"
    dataset_mode: str = "unaligned"
    model: str = "cycle_gan"
    direction: str = "AtoB"
    epoch: str = "latest"
    num_threads: int = 4
    checkpoints_dir: str = "./checkpoints"
    norm: str = "instance"
    serial_batches: bool = False
    no_dropout: bool = False
    max_dataset_size: int = 2 ** 31
    resize_or_crop: str = "resize_and_crop"
    no_flip: bool = False
    # TPU-native: host does decode+resize only (uint8), crop/flip/normalize
    # run jitted on device (data/device_transforms.py). resize_and_crop only.
    device_aug: bool = False
    init_type: str = "normal"
    init_gain: float = 0.02
    verbose: bool = False
    suffix: str = ""
    # domain-pair dataset paths (reference base_options.py:45-65)
    img_source_file_train: str = ""
    img_target_file_train: str = ""
    lab_source_file_train: str = ""
    lab_target_file_train: str = ""
    depth_source_file_train: str = ""
    img_source_file_test: str = ""
    img_target_file_test: str = ""
    lab_source_file_test: str = ""
    lab_target_file_test: str = ""
    depth_source_file_test: str = ""

    # ---- train options (reference options/train_options.py) ----
    is_train: bool = True
    display_freq: int = 400
    print_freq: int = 100
    save_latest_freq: int = 5000
    save_epoch_freq: int = 5
    continue_train: bool = False
    epoch_count: int = 1
    phase: str = "train"
    niter: int = 5
    niter_decay: int = 5
    beta1: float = 0.5
    lr: float = 2e-4
    # torch Adam default (models/cycle_gan_model.py betas only); raised in
    # synthetic DP-parity tests to damp Adam's step-1 sign amplification
    # (update ≈ sign(g)·lr, so reduction-order noise on a near-zero-grad
    # coordinate flips it by ~2·lr — CLAUDE.md measured caveat)
    adam_eps: float = 1e-8
    lr_d: float = 8e-5
    no_lsgan: bool = False
    pool_size: int = 50
    lr_policy: str = "lambda"
    lr_decay_iters: int = 15

    # ---- test options (reference options/test_options.py) ----
    ntest: int = 2 ** 31
    results_dir: str = "./results/"
    aspect_ratio: float = 1.0
    eval: bool = False
    num_test: int = 50

    # ---- model-specific ----
    lambda_a: float = 10.0          # --lambda_A
    lambda_b: float = 10.0          # --lambda_B
    lambda_identity: float = 0.5
    lambda_l1: float = 100.0        # pix2pix --lambda_L1
    model_suffix: str = ""          # test model
    d_steps_per_g: int = 4          # reference quirk: D stepped 4× per G step
                                    # (cycle_gan_model.py:151-160); set 1 for
                                    # the standard CycleGAN recipe.

    # ---- S2D (new_multi) architecture knobs; defaults = reference
    #      DenseNet-169 working point (networks5_ds.py:367) ----
    dense_block_config: Optional[List[int]] = None  # default (6, 12, 32, 32)
    g1_blocks: int = 3
    # reduced-width knobs for compile-bounded contexts (the driver's CPU
    # multi-chip dryrun, small tests); None = the reference working point
    dense_growth_rate: Optional[int] = None         # default 32
    s2d_mid_nc: Optional[int] = None                # default 1024 (= RDep base)
    resnet_layers: Optional[List[int]] = None       # rf_lw: default (3, 4, 23, 3)
    # dis_seg/G2Blocks generations (SURVEY rows 32-33): condition the
    # S2D_base feature discriminator on the seg label map (Discriminator.
    # forward(input, sege), dis_seg/networks2.py:346-354), and expose its
    # depth — G2Blocks trains repeat_num 3 instead of 4
    # (G2Blocks/networks2.py:332)
    dis_seg: bool = False
    d_repeat_num: int = 4  # plain int: Optional[int] would CLI-parse as str
    # S2D_df (model3 generation) knobs — defaults are the deeperfeatures
    # snapshot; the sibling snapshots' weights are reachable:
    # dilated/model3.py:468,509-517 → --df_adv_w 5 --df_g1_adv;
    # trymulti/model3.py:441 → --df_d_real_w 0.2
    df_adv_w: float = 2.0
    df_g1_adv: bool = False
    df_d_real_w: float = 1.0
    # S2D_nd model3 "4dis" variant (new_depseg/model3.py, checkpoints/4dis):
    # twin 256-ch-slice Discriminator2_seg critics with Adam and no WGAN-GP
    # replacing model2's single 1024-ch SGD+GP Dis_en, the cal_DisL G_2
    # adversarial term, and the 3× cross-domain real_dep_loss report
    nd_4dis: bool = False
    # rf_lw syn-branch adapter path: None keeps the driver default ('real',
    # mdoel6.py:470 / model7.py:397 pass no type); 'syn' selects the
    # model_ins-style per-domain split (reference model_ins.py:487)
    syn_domain: Optional[str] = None

    # ---- validation harness (reference new_multi/train5.py:85-115) ----
    eval_freq: int = 1000
    kitti_gt_dir: str = ""          # depth_selection groundtruth_depth dir
    records_file: str = "records.txt"

    # ---- profiling (SURVEY.md §5: replaces wall-clock-only timing) ----
    profile_dir: str = ""           # write a jax.profiler trace here
    profile_start: int = 10         # first step to capture
    profile_steps: int = 5          # number of steps to capture

    # ---- TPU-native additions ----
    dtype: str = "float32"          # compute dtype: float32 | bfloat16
    remat: bool = False             # rematerialize generator forwards in the
                                    # G loss (trades ~30% step time for the
                                    # activation memory of 6 G passes)
    seed: int = 0
    mesh_shape: Optional[List[int]] = None  # default: all devices on 'data'
    mesh_axes: Optional[List[str]] = None   # names for --mesh_shape dims
                                            # (default: data[, model[, stage]])
    parallel: str = "dp"   # dp | sp (H over 'model') | tp (Megatron trunk);
                           # pp is a library feature (parallel/pipeline.py)
    zero: str = "off"      # off | opt (ZeRO-1: shard Adam moments over
                           # 'data') | fsdp (params sharded too)
    prefetch_depth: int = 2
    worker_procs: int = 0  # >0: multi-process loader (ProcessDataLoader) —
                           # the reference's num_workers=8 analogue
                           # (new_multi/try_data.py:436); 0 = thread pool
    tpu_precision: str = "default"  # 'default' | 'highest' (parity runs)
    # multi-host (SURVEY.md §2.3 DCN row): when coordinator_address is set,
    # train.py calls jax.distributed.initialize before any jax use; every
    # process runs the same program over the global mesh. See
    # tools/launch_multihost.py for a local 2-process CPU demo.
    coordinator_address: Optional[str] = None
    num_processes: int = 1
    process_index: int = 0
    async_checkpoint: bool = False  # orbax AsyncCheckpointer in save_networks
    platform: str = "default"       # 'default' | 'cpu' | 'tpu' | 'axon'
    int8: bool = False              # test.py: serve the generator int8 (PTQ)

    def expr_dir(self) -> str:
        return os.path.join(self.checkpoints_dir, self.name)

    def compute_dtype(self):
        import jax.numpy as jnp

        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# per-model default overrides — the explicit-registry equivalent of each
# model's ``modify_commandline_options`` (e.g. reference
# models/pix2pix_model.py:12-22, models/cycle_gan_model.py:12-22).
MODEL_DEFAULTS = {
    "cycle_gan": dict(no_dropout=True),
    "pix2pix": dict(pool_size=0, no_lsgan=True, norm="batch",
                    dataset_mode="aligned", net_g="unet_256"),
    "test": dict(no_dropout=True, dataset_mode="single", is_train=False),
    "seg": dict(no_dropout=True, dataset_mode="synthia"),
    "seg_cycle": dict(no_dropout=True, dataset_mode="synthia"),
    "S2D": dict(dataset_mode="try", batch_size=1, fine_size=192),
    "semantic_trans": dict(dataset_mode="try", batch_size=1, fine_size=192),
    "semantic_trans_full": dict(dataset_mode="try", batch_size=1,
                                fine_size=192),
    "rf_lw": dict(dataset_mode="try", batch_size=1, fine_size=192),
    "rf_lw7": dict(dataset_mode="try", batch_size=1, fine_size=192),
    "S2D_base": dict(dataset_mode="try", batch_size=1, fine_size=192),
    "S2D_df": dict(dataset_mode="try", batch_size=1, fine_size=192),
    "S2D_nd": dict(dataset_mode="try", batch_size=1, fine_size=192),
    "S2D_alt": dict(dataset_mode="try", batch_size=1, fine_size=192,
                    net_g="3blocks"),
}


def apply_model_defaults(cfg: Config, explicit: Optional[set] = None) -> Config:
    """Apply per-model default overrides to fields the user didn't set."""
    overrides = MODEL_DEFAULTS.get(cfg.model, {})
    explicit = explicit or set()
    kw = {k: v for k, v in overrides.items() if k not in explicit}
    return cfg.replace(**kw) if kw else cfg


def parse_args(argv: Optional[List[str]] = None, is_train: bool = True) -> Config:
    """CLI → Config, with the reference's two-phase model-defaults pass."""
    import argparse

    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    base = Config(is_train=is_train)
    for f in dataclasses.fields(Config):
        flag = "--" + f.name
        aliases = ["--" + ref for ref, fld in _FLAG_ALIASES.items() if fld == f.name]
        # reference capitalized λ flags
        if f.name.startswith("lambda_") and len(f.name) == 8:
            aliases.append("--lambda_" + f.name[-1].upper())
        if f.name == "lambda_l1":
            aliases.append("--lambda_L1")
        default = getattr(base, f.name)
        if f.type == "bool" or isinstance(default, bool):
            parser.add_argument(flag, *aliases, dest=f.name,
                                action="store_true", default=None)
        else:
            typ = type(default) if default is not None else str
            if isinstance(default, list) or "List" in str(f.type):
                elem = str if "str" in str(f.type) else int
                parser.add_argument(flag, *aliases, dest=f.name, type=elem,
                                    nargs="*", default=None)
            else:
                parser.add_argument(flag, *aliases, dest=f.name, type=typ,
                                    default=None)
    ns = parser.parse_args(argv)
    explicit = {k for k, v in vars(ns).items() if v is not None}
    cfg = base.replace(**{k: v for k, v in vars(ns).items() if v is not None})
    if not is_train and "phase" not in explicit:
        cfg = cfg.replace(phase="test")  # reference test_options.py:12
    if not is_train and "model" not in explicit:
        # reference TestOptions set_defaults(model='test') — a bare
        # `python test.py --dataroot d/` must build TestModel, not CycleGAN
        cfg = cfg.replace(model="test")
    cfg = apply_model_defaults(cfg, explicit)
    if cfg.suffix:
        cfg = cfg.replace(name=cfg.name + "_" + cfg.suffix.format(**vars(cfg)))
    return cfg


def print_options(cfg: Config, save: bool = True) -> str:
    """Format + persist the option table (reference base_options.py:94-112)."""
    default = Config()
    lines = ["----------------- Options ---------------"]
    for f in sorted(dataclasses.fields(Config), key=lambda f: f.name):
        v = getattr(cfg, f.name)
        comment = ""
        if v != getattr(default, f.name):
            comment = f"\t[default: {getattr(default, f.name)}]"
        lines.append(f"{f.name:>25}: {str(v):<30}{comment}")
    lines.append("----------------- End -------------------")
    message = "\n".join(lines)
    if save:
        os.makedirs(cfg.expr_dir(), exist_ok=True)
        with open(os.path.join(cfg.expr_dir(), "opt.txt"), "wt") as fh:
            fh.write(message + "\n")
    return message
