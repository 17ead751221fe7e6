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


def op_base(full: str) -> str:
    """The HLO opcode-ish base of an 'XLA Ops' event name: the lhs
    identifier before ' = ', stripped of %-prefix and trailing .N ids
    (``%fusion.1411 = (bf16[...`` → ``fusion``)."""
    o = full.split(" = ")[0].lstrip("%")
    return o.rstrip("0123456789.").rstrip(".") or o


def is_async(full: str) -> bool:
    """copy-start/copy-done/slice-start/... run on the DMA queues; their
    event duration spans the whole in-flight window (start→done), which
    OVERLAPS compute — summing them alongside sync ops double-counts and
    once mislabeled this step '55% copy-bound'. They are rolled up
    separately as ``async_dma_window_ms``."""
    o = op_base(full)
    return o.endswith("-start") or o.endswith("-done") or "-start." in o


def categorize(name: str) -> str:
    """Bucket a SYNC op by its opcode base. Caveat: on TPU, XLA wraps
    convolutions inside plain ``%fusion.N`` ops (the fused epilogues), so
    'fusion' includes the MXU conv compute — the bare 'conv' bucket only
    catches unfused convolutions."""
    o = op_base(name).lower()
    if "convolution" in o:
        return "conv"
    if "dot" in o:
        return "dot"
    if any(k in o for k in ("all-reduce", "all-gather", "reduce-scatter",
                            "collective", "permute")):
        return "collective"
    if "fusion" in o:
        return "fusion"
    if any(k in o for k in ("copy", "transpose", "reshape", "bitcast",
                            "concatenate", "pad", "slice", "reverse",
                            "dynamic-update")):
        return "data-movement"
    if any(k in o for k in ("infeed", "outfeed", "transfer")):
        return "transfer"
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
    # Restrict to per-op events when the trace has the 'XLA Ops' line —
    # the 'XLA Modules'/'Steps' lines span the same time and would
    # double-count it.
    op_rows = {n: r for n, r in table.items() if r["line"] == "XLA Ops"}
    if not op_rows:
        op_rows = table
    module_ps = sum(r["total_ps"] for r in table.values()
                    if r["line"] == "XLA Modules")
    sync = {n: r for n, r in op_rows.items() if not is_async(n)}
    async_ps = sum(r["total_ps"] for n, r in op_rows.items() if is_async(n))
    total_ps = sum(r["total_ps"] for r in sync.values())
    rows = sorted(sync.items(), key=lambda kv: -kv[1]["total_ps"])
    cats: dict = {}
    opcodes: dict = {}
    for name, r in rows:
        c = categorize(name)
        cats[c] = cats.get(c, 0) + r["total_ps"]
        o = op_base(name)
        opcodes[o] = opcodes.get(o, 0) + r["total_ps"]
    out = {
        "planes": [p.name for p in use],
        # sync (compute-stream) op time; ≈ the module window when the
        # core is busy. Async DMA windows overlap it and are kept apart.
        "total_ms": round(total_ps / 1e9, 3),
        "module_window_ms": round(module_ps / 1e9, 3),
        "async_dma_window_ms": round(async_ps / 1e9, 3),
        "top_ops": [
            {"name": name[:120], "ms": round(r["total_ps"] / 1e9, 4),
             "pct": round(100 * r["total_ps"] / max(total_ps, 1), 2),
             "count": r["count"], "line": r["line"]}
            for name, r in rows[:top_k]
        ],
        "categories_pct": {c: round(100 * v / max(total_ps, 1), 2)
                           for c, v in sorted(cats.items(),
                                              key=lambda kv: -kv[1])},
        "top_opcodes_ms": {o: round(v / 1e9, 2)
                           for o, v in sorted(opcodes.items(),
                                              key=lambda kv: -kv[1])[:15]},
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
    out["steps_traced"] = args.steps if not args.parse_only else None
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
