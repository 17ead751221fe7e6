"""Data-loader throughput validation (profile-guided, CLAUDE.md round-3 item).

Measures host-side pipeline throughput — JPEG decode + reference transforms
(data/transforms.py) + batch stacking through ``data.loader.DataLoader`` —
and compares it against the measured on-chip train-step rates so we know the
input pipeline is not the bottleneck (reference analogue: picking
``--nThreads`` for torch DataLoader, data/__init__.py:59-63).

Chip-side rates to sustain (CLAUDE.md "Measured perf", v5e):
  CycleGAN bf16 full train step   41.5 img/s  (the most data-hungry trainer)
  S2D 4-phase train step (bf16)    7.2 img/s
  serving (fused int8 generator) 1407   img/s  (inference-only; serving input
                                               is usually pre-decoded, so this
                                               is an upper-bound stress goal)

With no ``--dataroot`` a synthetic JPEG dataset is written to a temp dir
(decode cost is what matters; synthetic pixels decode like real ones).

Usage:
  python tools/bench_loader.py                       # default sweep
  python tools/bench_loader.py --workers 1 2 4 8
  python tools/bench_loader.py --dataroot /data/h2z --batch-size 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
from cycle_depth_estimation_tpu.data import create_dataset
from cycle_depth_estimation_tpu.data.loader import DataLoader

TRAIN_RATES = {"cycle_gan bf16 train": 41.5, "S2D bf16 train": 7.2}


def synthesize_dataset(root: str, n: int, size: int, seed: int = 0) -> None:
    """Write ``n`` JPEGs per side (trainA/trainB) at ``size``×``size``."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    for side in ("trainA", "trainB"):
        d = os.path.join(root, side)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            # band-limited noise → realistic JPEG entropy (pure noise would
            # inflate decode cost; flat color would deflate it)
            low = rng.integers(0, 255, (size // 8, size // 8, 3), np.uint8)
            img = Image.fromarray(low).resize((size, size), Image.BILINEAR)
            img.save(os.path.join(d, f"{i:05d}.jpg"), quality=92)


def _batch_size(batch) -> int:
    for v in batch.values():
        if isinstance(v, np.ndarray):
            return len(v)
    return len(next(iter(batch.values())))


def run_epochs(loader: DataLoader, epochs: int) -> tuple[float, int]:
    """Return (seconds, images) over ``epochs`` full passes (first is warmup)."""
    n_img = 0
    t0 = None
    for ep in range(epochs + 1):
        loader.set_epoch(ep)
        for batch in loader:
            if t0 is not None:
                n_img += _batch_size(batch)
        if t0 is None:  # warmup epoch done (thread pool spun up, page cache)
            t0 = time.perf_counter()
    return time.perf_counter() - t0, n_img


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--dataroot", default=None,
                   help="existing dataset root (trainA/trainB); default: synthesize")
    p.add_argument("--num-images", type=int, default=64)
    p.add_argument("--src-size", type=int, default=512,
                   help="synthetic source JPEG side length")
    p.add_argument("--load-size", type=int, default=286)
    p.add_argument("--fine-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--procs", type=int, nargs="+", default=[],
                   help="also sweep the multi-process loader "
                        "(ProcessDataLoader, --worker_procs) at these counts")
    p.add_argument("--epochs", type=int, default=2, help="timed epochs (+1 warmup)")
    p.add_argument("--dataset-mode", default="unaligned")
    p.add_argument("--device-aug", action="store_true",
                   help="also measure the cfg.device_aug split: host does "
                        "decode+resize only (uint8), crop/flip/normalize "
                        "jitted on device")
    p.add_argument("--json", action="store_true", help="print one JSON line only")
    args = p.parse_args(argv)

    tmp = None
    root = args.dataroot
    if root is None:
        tmp = tempfile.TemporaryDirectory(prefix="bench_loader_")
        root = tmp.name
        synthesize_dataset(root, args.num_images, args.src_size)

    cfg = apply_model_defaults(Config(
        dataroot=root, dataset_mode=args.dataset_mode,
        load_size=args.load_size, fine_size=args.fine_size,
        batch_size=args.batch_size, is_train=True))
    dataset = create_dataset(cfg, "train")

    results = []
    for w in args.workers:
        loader = DataLoader(dataset, batch_size=args.batch_size,
                            shuffle=True, num_workers=w, seed=0)
        secs, n_img = run_epochs(loader, args.epochs)
        rate = n_img / secs if secs > 0 else float("inf")
        results.append({"num_workers": w, "img_per_s": round(rate, 1)})
        if not args.json:
            print(f"workers={w:2d}  {rate:8.1f} img/s "
                  f"({n_img} imgs in {secs:.2f}s)")

    proc_results = []
    for w in args.procs:
        from cycle_depth_estimation_tpu.data.loader import ProcessDataLoader

        loader = ProcessDataLoader(dataset, batch_size=args.batch_size,
                                   shuffle=True, num_workers=w, seed=0)
        secs, n_img = run_epochs(loader, args.epochs)
        loader.shutdown()
        rate = n_img / secs if secs > 0 else float("inf")
        proc_results.append({"worker_procs": w, "img_per_s": round(rate, 1)})
        if not args.json:
            print(f"procs={w:2d}    {rate:8.1f} img/s "
                  f"({n_img} imgs in {secs:.2f}s)")

    dev_results = []
    if args.device_aug:
        import jax

        from cycle_depth_estimation_tpu.data.device_transforms import (
            wrap_for_config)

        cfg_dev = cfg.replace(device_aug=True)
        ds_dev = create_dataset(cfg_dev, "train")
        for w in args.workers:
            loader = DataLoader(ds_dev, batch_size=args.batch_size,
                                shuffle=True, num_workers=w, seed=0)
            n_img, t0 = 0, None
            for ep in range(args.epochs + 1):
                loader.set_epoch(ep)
                for batch in wrap_for_config(iter(loader), cfg_dev,
                                             jax.random.key(ep)):
                    arrs = [v for v in batch.values()
                            if isinstance(v, jax.Array)]
                    jax.block_until_ready(arrs)
                    if t0 is not None:
                        n_img += len(arrs[0])
                if t0 is None:
                    t0 = time.perf_counter()
            secs = time.perf_counter() - t0
            rate = n_img / secs if secs > 0 else float("inf")
            dev_results.append({"num_workers": w, "img_per_s": round(rate, 1)})
            if not args.json:
                print(f"device-aug workers={w:2d}  {rate:8.1f} img/s")

    best = max(results, key=lambda r: r["img_per_s"])
    verdict = {name: ("OK" if best["img_per_s"] >= need else "BOTTLENECK")
               for name, need in TRAIN_RATES.items()}
    out = {"metric": "loader_throughput", "value": best["img_per_s"],
           "unit": "img/s", "best_workers": best["num_workers"],
           "sweep": results, "sustains": verdict}
    if proc_results:
        out["process_sweep"] = proc_results
    if dev_results:
        best_dev = max(dev_results, key=lambda r: r["img_per_s"])
        out["device_aug"] = {"value": best_dev["img_per_s"],
                             "best_workers": best_dev["num_workers"],
                             "sweep": dev_results,
                             "speedup_vs_host": round(
                                 best_dev["img_per_s"] / best["img_per_s"], 2)}
    if args.json:
        print(json.dumps(out))
    else:
        print(f"\nbest: {best['img_per_s']} img/s at "
              f"num_workers={best['num_workers']}")
        for name, need in TRAIN_RATES.items():
            print(f"  vs {name:24s} ({need:5.1f} img/s needed): {verdict[name]}")
    if tmp is not None:
        tmp.cleanup()
    return out


if __name__ == "__main__":
    main()
