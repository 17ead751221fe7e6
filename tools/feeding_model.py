"""Multi-host feeding model (VERDICT r3 item 7): which host count feeds
which chip count, per model family.

The reference trains single-host with num_workers=8
(/root/reference/new_multi/try_data.py:436). TPU scale-out is DP over a
mesh (parallel/mesh.py); each *host* runs the data pipeline for the chips
it feeds (`data/loader.py` per-host sharding + `--worker_procs N`
ProcessDataLoader). A family starves when

    chips_per_host × img_per_s_per_chip  >  host_loader_rate(workers)

Host-side measured constants (1-CPU axon box, tools/bench_loader.py,
bench_runs.jsonl):

- try pipeline (S2D families, KITTI-native 1242×375 5-file samples):
  11.3 img/s/worker full host path (post LUT-remap + vectorized band fast
  paths); PNG decode alone is ~59 ms/sample → 16.9 img/s/worker ceiling
  for the `--device_aug` split (host = decode+resize only; crop/flip/
  normalize/remap/edges/bands run jitted on device).
- CycleGAN 286→256 pipeline: 62 img/s/worker host path, 88 with
  `--device_aug`.

Worker scaling is modeled linear to `--worker_procs` up to the host core
count (per-sample fork-pool parallelism, batch-exact by per-(epoch,index)
seeded RNG). HONEST CAVEAT: linearity is *modeled*, not measured — this
box has 1 CPU; the mechanism is process-parallel per-sample decode, the
classic embarrassingly-parallel shape, but NUMA/page-cache effects on a
real 8+-core host are unverified.

Regenerate with current chip rates:  python -m tools.feeding_model
Writes feeding_model.json and prints the README markdown table.
"""

from __future__ import annotations

import json
import os

# img/s/worker, measured single-worker on the 1-CPU box
HOST = {
    "try_host": 11.3,          # full host path (S2D-family batches)
    "try_device_aug": 16.9,    # decode-bound ceiling (59 ms/sample PNG)
    "cyclegan_host": 62.0,
    "cyclegan_device_aug": 88.0,
}

# img/s/chip, v5e, from tools/bench_runs.jsonl (update when re-measured)
CHIP = {
    # family: (rate, dtype/batch note, host pipeline key)
    "S2D bf16 bs1": (9.376, "2026-08-20", "try"),
    "S2D bf16 bs2": (8.314, "2026-08-20", "try"),
    "S2D bf16 bs8": (21.21, "2026-08-21 working point", "try"),
    "S2D_base bf16": (11.498, "2026-08-20", "try"),
    "S2D_base bf16 bs8": (27.08, "2026-08-21 working point", "try"),
    "S2D_df bf16": (17.178, "2026-08-21", "try"),
    "S2D_df bf16 bs8": (37.672, "2026-08-21 working point", "try"),
    "S2D_nd bf16": (19.822, "2026-08-19", "try"),
    "S2D_nd bf16 bs8": (44.11, "2026-08-21 working point", "try"),
    "semantic_trans bf16 bs8": (20.61, "2026-08-21 working point", "try"),
    "rf_lw bf16 bs2": (31.768, "2026-08-19", "try"),
    "semantic_trans bf16": (8.797, "2026-08-20", "try"),
    "cycle_gan bf16 bs16": (41.5, "2026-08-19 (r2)", "cyclegan"),
}

WORKERS = 8  # the reference's own num_workers


def rows(chip=CHIP, host=HOST, workers=WORKERS):
    out = []
    for fam, (rate, date, pipe) in chip.items():
        if rate is None:
            continue
        base = host[f"{pipe}_host"] * workers
        aug = host[f"{pipe}_device_aug"] * workers
        out.append({
            "family": fam,
            "img_per_s_per_chip": rate,
            "rate_date": date,
            "host_rate_8w": round(base, 1),
            "host_rate_8w_device_aug": round(aug, 1),
            "chips_fed_per_host": round(base / rate, 1),
            "chips_fed_per_host_device_aug": round(aug / rate, 1),
            "hosts_per_8_chips": round(8 * rate / base, 2),
            "hosts_per_8_chips_device_aug": round(8 * rate / aug, 2),
        })
    return out


def main():
    table = rows()
    print("| family | img/s/chip | 8-worker host img/s | chips fed/host "
          "| + --device_aug | hosts per 8-chip slice |")
    print("|---|---|---|---|---|---|")
    for r in table:
        print(f"| {r['family']} | {r['img_per_s_per_chip']} "
              f"| {r['host_rate_8w']} | {r['chips_fed_per_host']} "
              f"| {r['chips_fed_per_host_device_aug']} "
              f"| {r['hosts_per_8_chips']} "
              f"({r['hosts_per_8_chips_device_aug']} w/ aug) |")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "feeding_model.json")
    with open(path, "w") as f:
        json.dump({"host_img_per_s_per_worker": HOST, "workers": WORKERS,
                   "rows": table}, f, indent=1)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
