"""KITTI depth-metric harness CLI.

Wraps `utils.metrics.eval_depth_dirs` (the port of reference
new_multi/my_eval.py:35-108) and appends a records line like the reference
training loop does (new_multi/train5.py:113-114).

    python tools/eval_kitti.py --gt_dir .../groundtruth_depth \
        --pred_dir preds/ [--records records.txt]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    from cycle_depth_estimation_tpu.utils.metrics import (
        DEPTH_METRIC_NAMES,
        eval_depth_dirs,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--gt_dir", required=True)
    p.add_argument("--pred_dir", required=True)
    p.add_argument("--records", default=None,
                   help="append results to this records.txt")
    a = p.parse_args()
    metrics = eval_depth_dirs(a.gt_dir, a.pred_dir)
    header = ",".join(f"{k:>10}" for k in DEPTH_METRIC_NAMES)
    values = ",".join(f"{metrics[k]:10.4f}" for k in DEPTH_METRIC_NAMES)
    print(header)
    print(values)
    if a.records:
        with open(a.records, "a") as fh:
            fh.write(json.dumps({"t": time.time(), **metrics}) + "\n")


if __name__ == "__main__":
    main()
