"""Inference CLI — mirrors the reference test driver (reference test.py:9-40).

Loads a generator (orbax checkpoint or a reference ``.pth`` via
``--pth_path``), runs it over a SingleDataset folder, and writes an HTML
gallery of input/output pairs under ``results/<name>/<phase>_<epoch>/``.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def main(argv=None):
    from cycle_depth_estimation_tpu.config import parse_args, print_options
    from cycle_depth_estimation_tpu.data import create_dataloader
    from cycle_depth_estimation_tpu.models import create_model
    from cycle_depth_estimation_tpu.utils.html import HTML
    from cycle_depth_estimation_tpu.utils.visualizer import save_images

    import sys

    args = list(sys.argv[1:] if argv is None else argv)
    pth_path = None
    for i, a in enumerate(args):
        if a == "--pth_path":
            if i + 1 >= len(args):
                raise SystemExit("--pth_path requires a value")
            pth_path = args[i + 1]
            del args[i:i + 2]
            break
        if a.startswith("--pth_path="):
            pth_path = a.split("=", 1)[1]
            del args[i]
            break

    cfg = parse_args(args, is_train=False)
    # reference TestOptions defaults (test_options.py): model='test' is set
    # in parse_args; batch/threads 1 (variable-shape transform modes cannot
    # stack >1), no flip, serial order, loadSize=fineSize
    cfg = cfg.replace(load_size=cfg.fine_size, no_flip=True,
                      serial_batches=True, batch_size=1, num_threads=1)
    print(print_options(cfg, save=False))
    if cfg.platform != "default":
        jax.config.update("jax_platforms", cfg.platform)
    if cfg.tpu_precision == "highest":
        jax.config.update("jax_default_matmul_precision", "highest")

    loader = create_dataloader(cfg, phase=cfg.phase, shuffle=False)

    def _finish_on_device(it):
        """cfg.device_aug datasets ship resize-only uint8 — finish the
        (deterministic center-crop) transform on device before the model."""
        if not cfg.device_aug:
            return it
        from cycle_depth_estimation_tpu.data.device_transforms import (
            wrap_for_config)
        return wrap_for_config(it, cfg, jax.random.key(cfg.seed))

    model = create_model(cfg)
    state = model.init_state_on_host(jax.random.key(cfg.seed))
    if pth_path is not None:
        state = model.load_reference_generator(state, pth_path)
    elif os.path.isdir(model._ckpt_dir(cfg.epoch)):
        state = model.load_networks(state, cfg.epoch)
    else:
        print("warning: no checkpoint found — running with random init")

    serve_int8 = None
    if cfg.int8:
        # generic PTQ serving (models/ptq.py): calibrate on the first batch,
        # then run the generator int8 for the whole gallery
        import jax.numpy as jnp

        from cycle_depth_estimation_tpu.models.ptq import (
            calibrate_model,
            int8_apply,
        )

        name = model.model_names[0]
        g = model.net_G
        variables = {"params": state.params[name]}
        if state.batch_stats.get(name):
            variables["batch_stats"] = state.batch_stats[name]
        first = next(_finish_on_device(iter(loader)))
        calib = jnp.asarray(first["A"])
        sites = calibrate_model(lambda a: g.apply(variables, a), calib)
        print(f"int8 serving: {len(sites)} conv sites quantized")
        serve_int8 = jax.jit(lambda s, a: int8_apply(
            lambda b: g.apply(variables, b), s, a))

    web_dir = os.path.join(cfg.results_dir, cfg.name, f"{cfg.phase}_{cfg.epoch}")
    webpage = HTML(web_dir, f"Experiment = {cfg.name}, Phase = {cfg.phase}, "
                            f"Epoch = {cfg.epoch}")
    n_done = 0
    for batch in _finish_on_device(iter(loader)):
        if n_done >= cfg.num_test:
            break
        arrays = {k: jax.numpy.asarray(v) for k, v in batch.items()
                  if not isinstance(v, list)}
        if serve_int8 is not None:
            visuals = {"real_A": arrays["A"],
                       "fake_B": serve_int8(sites, arrays["A"])}
        else:
            _, visuals = model.eval_step(state, arrays)
        for b in range(arrays["A"].shape[0]):
            if n_done >= cfg.num_test:
                break
            path = batch["A_paths"][b]
            per_sample = {k: np.asarray(v[b]) for k, v in visuals.items()}
            print(f"processing ({n_done:04d})-th image... {path}")
            save_images(webpage, per_sample, path,
                        aspect_ratio=cfg.aspect_ratio,
                        width=cfg.display_winsize)
            n_done += 1
    webpage.save()
    return web_dir


if __name__ == "__main__":
    main()
