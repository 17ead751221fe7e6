"""Evaluate a trained model over a dataset split and dump losses + visuals.

Re-design of reference visualize.py:10-38 (CycleGAN-checkpoint eval-on-KITTI
driver): loads a checkpoint, runs eval steps over up to --num_test batches,
logs per-batch losses to JSONL and writes the visual images per batch.

    python tools/visualize.py --model cycle_gan --dataset_mode kitti \
        --epoch latest --num_test 100 ...
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def main(argv=None):
    import jax

    from cycle_depth_estimation_tpu.config import parse_args
    from cycle_depth_estimation_tpu.data import create_dataloader
    from cycle_depth_estimation_tpu.models import create_model
    from cycle_depth_estimation_tpu.utils.images import (
        depth2im,
        label2im,
        save_image,
        tensor2im,
    )

    cfg = parse_args(argv, is_train=False)
    if cfg.platform != "default":
        jax.config.update("jax_platforms", cfg.platform)
    loader = create_dataloader(cfg, phase=cfg.phase, shuffle=False)
    model = create_model(cfg)
    state = model.init_state(jax.random.key(cfg.seed))
    if os.path.isdir(model._ckpt_dir(cfg.epoch)):
        state = model.load_networks(state, cfg.epoch)
    else:
        print("warning: no checkpoint found — random init")

    out_dir = os.path.join(cfg.results_dir, cfg.name, f"visualize_{cfg.epoch}")
    os.makedirs(out_dir, exist_ok=True)
    log_path = os.path.join(out_dir, "losses.jsonl")
    with open(log_path, "w") as log:
        for i, batch in enumerate(loader):
            if i >= cfg.num_test:
                break
            arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
            metrics, visuals = model.eval_step(state, arrays)
            rec = {"i": i}
            rec.update({k: float(v) for k, v in metrics.items()})
            log.write(json.dumps(rec) + "\n")
            for name, img in visuals.items():
                arr = np.asarray(img)
                if "seg" in name or "lab" in name:
                    im = label2im(arr)
                elif "dep" in name:
                    im = depth2im(arr)
                else:
                    im = tensor2im(arr)
                save_image(im, os.path.join(out_dir, f"{i:04d}_{name}.png"))
            print(f"[{i}] " + " ".join(f"{k}={float(v):.3f}"
                                       for k, v in metrics.items()))
    print(f"wrote visuals + {log_path}")


if __name__ == "__main__":
    main()
