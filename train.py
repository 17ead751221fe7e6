"""Training CLI — mirrors the reference driver loop (reference train.py:10-81).

Example (tiny synthetic run):
    python train.py --model cycle_gan --dataroot ./datasets/maps \
        --niter 5 --niter_decay 5 --batch_size 8

Flow: parse config → train/test dataloaders → create model → init (or resume)
state → per-batch jitted train step with device prefetch → periodic console/
JSONL/HTML logging, in-loop eval, checkpoint saves → per-epoch LR policy step.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np


def main(argv=None):
    from cycle_depth_estimation_tpu.config import parse_args, print_options
    from cycle_depth_estimation_tpu.data import create_dataloader
    from cycle_depth_estimation_tpu.data.loader import prefetch_to_device
    from cycle_depth_estimation_tpu.models import create_model
    from cycle_depth_estimation_tpu.parallel import make_mesh, replicated
    from cycle_depth_estimation_tpu.utils.visualizer import Visualizer

    cfg = parse_args(argv, is_train=True)
    print(print_options(cfg))
    if cfg.platform != "default":
        jax.config.update("jax_platforms", cfg.platform)
    if cfg.tpu_precision == "highest":
        jax.config.update("jax_default_matmul_precision", "highest")
    if cfg.coordinator_address:
        # multi-host: same program on every process, one global mesh over
        # DCN (SURVEY.md §2.3 — the reference is single-process only)
        jax.distributed.initialize(cfg.coordinator_address,
                                   num_processes=cfg.num_processes,
                                   process_id=cfg.process_index)

    loader_train = create_dataloader(cfg, phase="train")
    try:
        loader_test = create_dataloader(cfg.replace(is_train=False), phase="test",
                                        shuffle=False)
    except (AssertionError, FileNotFoundError, KeyError):
        loader_test = None
    print(f"#training batches = {len(loader_train)}")

    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    model = create_model(cfg)
    model.donate_state = True  # old state is dead each step; update in place
    state = model.init_state_on_host(jax.random.key(cfg.seed))
    if cfg.continue_train:
        state = model.load_networks(state, cfg.epoch)
    # place the state onto the mesh up front so the first and second steps
    # compile identically (outputs inherit mesh shardings)
    state = _place_state(cfg, model, state, mesh)
    sp_axis = "model" if cfg.parallel == "sp" else None
    visualizer = Visualizer(cfg)

    total_steps = 0
    profiling = False
    rng = jax.random.key(cfg.seed + 1)
    eval_metric = None  # monitored by the plateau LR policy
    for epoch in range(cfg.epoch_count, cfg.niter + cfg.niter_decay + 1):
        epoch_start = time.time()
        loader_train.set_epoch(epoch)
        iter_start = time.time()
        data_iter = prefetch_to_device(loader_train, mesh,
                                       depth=cfg.prefetch_depth,
                                       spatial_axis=sp_axis)
        if cfg.device_aug:
            # host shipped resize-only uint8; finish crop/flip/normalize on
            # device (data/device_transforms.py)
            from cycle_depth_estimation_tpu.data.device_transforms import (
                wrap_for_config)
            data_iter = wrap_for_config(
                data_iter, cfg,
                jax.random.fold_in(jax.random.key(cfg.seed + 2), epoch))
        for batch in data_iter:
            t_data = time.time() - iter_start
            arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
            rng, step_rng = jax.random.split(rng)
            if cfg.profile_dir and total_steps == cfg.profile_start * cfg.batch_size:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
            state, losses = model.train_step(state, arrays, step_rng)
            total_steps += cfg.batch_size
            if cfg.profile_dir and total_steps == (
                    (cfg.profile_start + cfg.profile_steps) * cfg.batch_size):
                jax.block_until_ready(losses)
                jax.profiler.stop_trace()
                profiling = False
                print(f"profiler trace written to {cfg.profile_dir}")

            if total_steps % cfg.print_freq < cfg.batch_size:
                losses_host = {k: float(v) for k, v in losses.items()}
                t_step = time.time() - iter_start - t_data
                visualizer.print_current_losses(epoch, total_steps, losses_host,
                                                t_step, t_data)
                visualizer.log_scalars(epoch, total_steps, losses_host)

            if total_steps % cfg.display_freq < cfg.batch_size:
                _, visuals = model.eval_step(state, arrays)
                visualizer.display_current_results(
                    {k: np.asarray(v) for k, v in visuals.items()}, epoch)

            if total_steps % cfg.save_latest_freq < cfg.batch_size:
                print(f"saving the latest model (epoch {epoch}, "
                      f"total_steps {total_steps})")
                model.save_networks(state, "latest")

            # periodic KITTI depth validation → records.txt (mirrors the
            # reference per-1000-iter harness, new_multi/train5.py:85-115)
            if (cfg.kitti_gt_dir and loader_test is not None
                    and total_steps % cfg.eval_freq < cfg.batch_size):
                _kitti_validate(cfg, model, state, epoch, total_steps)
            iter_start = time.time()

        # ---- in-loop validation (reference train.py:33-49) ----
        if loader_test is not None:
            eval_losses = []
            eval_iter = prefetch_to_device(loader_test, mesh,
                                           spatial_axis=sp_axis)
            if cfg.device_aug:
                from cycle_depth_estimation_tpu.data.device_transforms import (
                    wrap_for_config)
                eval_iter = wrap_for_config(
                    eval_iter, cfg.replace(is_train=False),
                    jax.random.key(cfg.seed + 3))
            for i, batch in enumerate(eval_iter):
                if i >= 50:
                    break
                arrays = {k: v for k, v in batch.items()
                          if not isinstance(v, list)}
                m, _ = model.eval_step(state, arrays)
                eval_losses.append({k: float(v) for k, v in m.items()})
            if eval_losses:
                avg = {k: float(np.mean([e[k] for e in eval_losses]))
                       for k in eval_losses[0]}
                print(f"[eval epoch {epoch}] "
                      + " ".join(f"{k}: {v:.3f}" for k, v in avg.items()))
                visualizer.log_scalars(epoch, total_steps,
                                       {f"eval_{k}": v for k, v in avg.items()})
                eval_metric = float(np.mean(list(avg.values())))

        if epoch % cfg.save_epoch_freq == 0:
            print(f"saving the model at the end of epoch {epoch}")
            model.save_networks(state, "latest")
            model.save_networks(state, epoch)

        print(f"End of epoch {epoch} / {cfg.niter + cfg.niter_decay} \t "
              f"Time Taken: {time.time() - epoch_start:.0f} sec")
        visualizer.save_html(epoch)
        state = model.update_learning_rate(state, epoch, metric=eval_metric)
    if profiling:
        # training ended inside the profile window — close the trace so the
        # requested dump is actually written (review fix)
        jax.profiler.stop_trace()
        print(f"profiler trace written to {cfg.profile_dir} (early stop)")
    model.finish_checkpoints()  # drain async saves before returning
    return state


def _place_state(cfg, model, state, mesh):
    """Lay the initial ModelState out on the mesh per the CLI parallelism
    flags (one-flag parallelism, matching the reference's single
    nn.DataParallel switch, /root/reference/models/seg_network.py:90-93):

    - default / ``--parallel dp``: replicate everything; the batch sharding
      over 'data' (prefetch_to_device) makes XLA emit the grad all-reduce.
    - ``--zero opt|fsdp``: shard Adam moments (and params for fsdp) over
      'data' (parallel/zero.py).
    - ``--parallel sp``: needs a 'model' axis; input H is sharded at the
      host→HBM boundary, state placement is unchanged.
    - ``--parallel tp``: Megatron col/row sharding of the cycle_gan resnet
      trunks + their Adam moments over 'model' (parallel/tensor.py).
    """
    from cycle_depth_estimation_tpu.parallel import replicated

    if cfg.parallel not in ("dp", "sp", "tp"):
        raise SystemExit(
            f"--parallel {cfg.parallel!r} is not a train-CLI mode (dp|sp|tp);"
            " pipeline parallelism is a library feature —"
            " parallel/pipeline.py gpipe_apply")
    if cfg.parallel in ("sp", "tp") and "model" not in mesh.shape:
        raise SystemExit(
            f"--parallel {cfg.parallel} needs a 'model' mesh axis: pass"
            " --mesh_shape D M (axes default to data model)")

    if cfg.zero != "off":
        from cycle_depth_estimation_tpu.parallel.zero import zero_state

        if cfg.zero not in ("opt", "fsdp"):
            raise SystemExit(f"--zero {cfg.zero!r}: expected off|opt|fsdp")
        state = zero_state(mesh, state, shard_params=(cfg.zero == "fsdp"))
    else:
        state = jax.device_put(state, replicated(mesh))

    if cfg.parallel == "tp":
        if cfg.model != "cycle_gan" or "resnet" not in cfg.net_g:
            raise SystemExit(
                "--parallel tp is wired for the cycle_gan resnet generators"
                f" (got model={cfg.model!r}, net_g={cfg.net_g!r}); other"
                " models run dp/sp, or use parallel/tensor.py directly")
        if (4 * cfg.ngf) % mesh.shape["model"] != 0:
            raise SystemExit(
                f"--parallel tp: trunk width 4*ngf={4 * cfg.ngf} must divide"
                f" by the model axis ({mesh.shape['model']})")
        from cycle_depth_estimation_tpu.parallel.tensor import shard_state_tp

        state = shard_state_tp(state, mesh)
    return state


def _kitti_validate(cfg, model, state, epoch, total_steps):
    """Write test-split refined depths + run the KITTI metric suite and
    append a records line (reference new_multi/train5.py:85-115,113-114)."""
    import json

    from cycle_depth_estimation_tpu.utils.metrics import eval_depth_dirs
    from tools.save_kitti import save_depth_maps

    pred_dir = os.path.join(cfg.expr_dir(), "pred")
    try:
        save_depth_maps(cfg, pred_dir, max_items=cfg.num_test,
                        model=model, state=state)
        metrics = eval_depth_dirs(cfg.kitti_gt_dir, pred_dir)
    except Exception as exc:  # keep training alive if the val split is broken
        print(f"[kitti eval] skipped: {exc}")
        return
    line = json.dumps({"epoch": epoch, "iters": total_steps, **metrics})
    print("[kitti eval]", line)
    with open(os.path.join(cfg.expr_dir(), cfg.records_file), "a") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
