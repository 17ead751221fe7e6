"""Trace-derived per-op time breakdown of a train step (VERDICT r2 item 3).

Captures a `jax.profiler` trace around a few steady-state train steps of a
registered model and aggregates the device-plane XLA op durations into a
top-K table — profile evidence for where the step time actually goes
(vs the flop-math MFU story in tools/mfu_report.py). No TensorBoard needed:
the .xplane.pb protos are decoded by tools/xplane.py.

Usage:
  python -m tools.profile_top_ops --model S2D --dtype bfloat16 [--steps 3]
  python -m tools.profile_top_ops --model rf_lw --dtype bfloat16
  python -m tools.profile_top_ops --parse-only /tmp/trace_dir

Writes tools/profile_<model>_<dtype>.json with the table and the
category rollup (convs / fusions / copies / collectives / infeed).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.xplane import find_xplane_files, load_xspace, op_time_table


def categorize(name: str) -> str:
    n = name.lower()
    if "convolution" in n or n.startswith("conv") or "%conv" in n:
        return "conv"
    if "fusion" in n:
        return "fusion"
    if any(k in n for k in ("all-reduce", "all-gather", "reduce-scatter",
                            "collective", "permute")):
        return "collective"
    if any(k in n for k in ("copy", "transpose", "reshape", "bitcast")):
        return "copy/layout"
    if any(k in n for k in ("infeed", "outfeed", "transfer")):
        return "transfer"
    if "dot" in n:
        return "dot"
    return "other"


def capture(model_name: str, dtype: str, steps: int, batch: int,
            trace_dir: str) -> None:
    import jax

    from tools.long_run_s2d import make_batches

    from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
    from cycle_depth_estimation_tpu.models import create_model

    cfg = apply_model_defaults(Config(model=model_name, batch_size=batch,
                                      dtype=dtype))
    model = create_model(cfg)
    model.donate_state = True
    state = model.init_state_on_host(jax.random.key(0))
    batches = make_batches(batch, 3)
    # compile + warm up OUTSIDE the trace window
    for i in range(2):
        state, m = model.train_step(state, batches[i % 3], jax.random.key(i))
    jax.block_until_ready(m)
    jax.profiler.start_trace(trace_dir)
    for i in range(steps):
        state, m = model.train_step(state, batches[(2 + i) % 3],
                                    jax.random.key(10 + i))
    jax.block_until_ready(m)
    jax.profiler.stop_trace()


def report(trace_dir: str, top_k: int = 15) -> dict:
    files = find_xplane_files(trace_dir)
    if not files:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    planes = []
    for f in files:
        planes.extend(load_xspace(f))
    device_planes = [p for p in planes
                     if "TPU" in p.name or "device" in p.name.lower()]
    use = device_planes or planes
    table = op_time_table(use)
    # drop obvious trace-structure rows (steps markers etc.)
    total_ps = sum(r["total_ps"] for r in table.values())
    rows = sorted(table.items(), key=lambda kv: -kv[1]["total_ps"])
    cats: dict = {}
    for name, r in rows:
        c = categorize(name)
        cats[c] = cats.get(c, 0) + r["total_ps"]
    out = {
        "planes": [p.name for p in use],
        "total_ms": round(total_ps / 1e9, 3),
        "top_ops": [
            {"name": name[:120], "ms": round(r["total_ps"] / 1e9, 4),
             "pct": round(100 * r["total_ps"] / max(total_ps, 1), 2),
             "count": r["count"], "line": r["line"]}
            for name, r in rows[:top_k]
        ],
        "categories_pct": {c: round(100 * v / max(total_ps, 1), 2)
                           for c, v in sorted(cats.items(),
                                              key=lambda kv: -kv[1])},
    }
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="S2D")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--parse-only", default=None,
                    help="skip capture; parse this existing trace dir")
    args = ap.parse_args(argv)

    if args.parse_only:
        trace_dir = args.parse_only
    else:
        trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="jaxtrace_")
        capture(args.model, args.dtype, args.steps, args.batch, trace_dir)
        print(f"trace captured → {trace_dir}")

    out = report(trace_dir, args.top)
    out["model"] = args.model if not args.parse_only else None
    out["dtype"] = args.dtype if not args.parse_only else None
    print(f"{'op':60s} {'ms':>9s} {'pct':>6s} {'count':>7s}")
    for r in out["top_ops"]:
        print(f"{r['name'][:60]:60s} {r['ms']:9.3f} {r['pct']:6.2f} "
              f"{r['count']:7d}")
    print("categories:", json.dumps(out["categories_pct"]))
    if not args.parse_only:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f"profile_{args.model}_{args.dtype}.json")
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {path}")
    return out


if __name__ == "__main__":
    main()
