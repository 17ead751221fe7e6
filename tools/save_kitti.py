"""Dump S2D refined depth predictions for the KITTI depth_selection split.

Re-design of reference new_multi/save_kitti.py:32-75: run the S2D (or rf_lw)
model over the ``try`` test split and write per-image refined depth maps,
named by the KITTI crop file names the loader extracts (``f_name``), into
--out_dir — ready for `tools/eval_kitti.py` / the official devkit.

    python tools/save_kitti.py --model S2D --epoch latest \
        --img_source_file_test ... --out_dir preds/
"""

from __future__ import annotations

import os
import sys

import numpy as np


def save_depth_maps(cfg, out_dir: str, max_items: int = 10 ** 9,
                    model=None, state=None) -> int:
    import jax

    from cycle_depth_estimation_tpu.data import create_dataloader
    from cycle_depth_estimation_tpu.models import create_model

    loader = create_dataloader(cfg.replace(is_train=False), phase="test",
                               shuffle=False)
    if model is None:
        model = create_model(cfg)
    if state is None:
        state = model.init_state(jax.random.key(cfg.seed))
        if os.path.isdir(model._ckpt_dir(cfg.epoch)):
            state = model.load_networks(state, cfg.epoch)
        else:
            print("warning: no checkpoint found — random init")
    os.makedirs(out_dir, exist_ok=True)
    from PIL import Image

    n = 0
    for batch in loader:
        if n >= max_items:
            break
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
        _, visuals = model.eval_step(state, arrays)
        key = "real_dep_ref" if "real_dep_ref" in visuals else "real_dep_pre"
        dep = np.asarray(visuals[key])  # (B, H, W, 1) in [-1, 1]
        for b in range(dep.shape[0]):
            if n >= max_items:
                break
            name = batch.get("f_name", [f"{n:06d}.png"])[b] or f"{n:06d}.png"
            if not name.endswith(".png"):
                name = name + ".png"
            img = ((dep[b, :, :, 0] + 1.0) / 2.0 * 255.0).clip(0, 255)
            Image.fromarray(img.astype(np.uint8)).save(
                os.path.join(out_dir, os.path.basename(name)))
            n += 1
    return n


def main(argv=None):
    from cycle_depth_estimation_tpu.config import parse_args

    args = list(sys.argv[1:] if argv is None else argv)
    out_dir = "./save_kitti"
    if "--out_dir" in args:
        i = args.index("--out_dir")
        out_dir = args[i + 1]
        del args[i:i + 2]
    cfg = parse_args(args, is_train=False)
    n = save_depth_maps(cfg, out_dir, max_items=cfg.num_test)
    print(f"wrote {n} depth maps to {out_dir}")


if __name__ == "__main__":
    main()
