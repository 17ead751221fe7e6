"""Long-horizon S2D training stability run on the chip (VERDICT r2 item 2).

The reference's working loop is tens of thousands of iterations with a
periodic KITTI eval (/root/reference/new_multi/train5.py:85-115); the
convergence validations in tools/convergence_compare_*.py are 12-200 steps.
This runs the FULL S2D 4-phase train step (DenseNet-169 trunk, 576×192, the
reference working point) for ``--steps`` steps (default 1000) in bf16 on the
real device, with rotated synthetic batches (training on a repeated batch is
known to NaN after ~10 steps — adversarial + BN pathology, CLAUDE.md), and
records:

- per-``--log_every`` (default 100) step losses → tools/long_run_s2d.json
  (+ per-10-step JSONL stream at --out while running, crash-safe);
- an eval_step every ``--eval_every`` steps on a held-out batch;
- wall-clock img/s over the whole run;
- a finiteness verdict per metric.

Usage:  python -m tools.long_run_s2d [--steps 1000] [--batch 2]
        [--dtype bfloat16] [--rotate 8]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def make_batches(batch: int, n_rotate: int, h: int = 192, w: int = 576,
                 seed0: int = 0, device=None):
    """Structured synthetic try_data batches (bench.py pattern), pre-placed
    on device so the step loop pays no host→HBM transfer over the relay."""
    from cycle_depth_estimation_tpu.models.quantization import (
        synthetic_calibration_batch,
    )

    rng = np.random.RandomState(1234)

    def simg(seed):
        a = synthetic_calibration_batch(seed, batch, h).repeat(3, axis=2)
        return jnp.asarray(a[:, :, :w, :])

    out = []
    for j in range(n_rotate):
        b = {
            "img_syn": simg(seed0 + 1 + 10 * j),
            "img_real": simg(seed0 + 2 + 10 * j),
            "seg_l_syn": jnp.asarray(rng.randint(0, 28, (batch, h, w)),
                                     jnp.int32),
            "seg_l_real": jnp.asarray(rng.randint(0, 28, (batch, h, w)),
                                      jnp.int32),
            "dep_l_syn": jnp.asarray(rng.rand(batch, h, w, 1) * 2 - 1,
                                     jnp.float32),
            "depth_l_s": jnp.asarray(np.sign(rng.randn(batch, h, w, 4)),
                                     jnp.float32),
        }
        out.append(jax.device_put(b, device or jax.devices()[0]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--rotate", type=int, default=8,
                    help="number of distinct device-resident batches cycled")
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "long_run_s2d.json"))
    ap.add_argument("--model", default="S2D")
    args = ap.parse_args()

    from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
    from cycle_depth_estimation_tpu.models import create_model

    cfg = apply_model_defaults(Config(model=args.model,
                                      batch_size=args.batch,
                                      dtype=args.dtype))
    model = create_model(cfg)
    model.donate_state = True
    print(f"[long_run] init {args.model} on host ...", flush=True)
    state = model.init_state_on_host(jax.random.key(0))
    batches = make_batches(args.batch, args.rotate)
    held_out = make_batches(args.batch, 1, seed0=900)[0]

    stream_path = args.out + "l"  # crash-safe JSONL stream
    log = []
    t_start = None
    print(f"[long_run] compiling + stepping {args.steps} steps "
          f"(batch {args.batch}, {args.dtype}) ...", flush=True)
    with open(stream_path, "w") as stream:
        for step in range(1, args.steps + 1):
            state, m = model.train_step(state, batches[step % args.rotate],
                                        jax.random.key(step))
            if step == 1 or step % args.log_every == 0 or step == args.steps:
                mh = {k: float(v) for k, v in jax.device_get(m).items()}
                rec = {"step": step, **mh}
                if step % args.eval_every == 0 or step == args.steps:
                    em, _ = model.eval_step(state, held_out)
                    rec.update({f"eval_{k}": float(v)
                                for k, v in jax.device_get(em).items()})
                log.append(rec)
                stream.write(json.dumps(rec) + "\n")
                stream.flush()
                bad = [k for k, v in rec.items() if not math.isfinite(v)]
                print(f"[long_run] {rec}", flush=True)
                if bad:
                    print(f"[long_run] NON-FINITE at step {step}: {bad}",
                          flush=True)
                    break
            if step == 2:  # start the clock after compile + warmup
                jax.block_until_ready(m["G2"])
                t_start = time.perf_counter()
    jax.block_until_ready(m["G2"])
    dt = time.perf_counter() - t_start if t_start else float("nan")
    steps_timed = args.steps - 2
    img_s = args.batch * steps_timed / dt

    first = log[0]
    last = log[-1]
    summary = {
        "model": args.model,
        "steps": args.steps,
        "batch": args.batch,
        "dtype": args.dtype,
        "rotate": args.rotate,
        "img_per_s_wall": round(img_s, 3),
        "sec_per_step_wall": round(dt / steps_timed, 4),
        "all_finite": all(math.isfinite(v) for r in log for v in r.values()),
        "first": first,
        "last": last,
        # trend over the run for the task losses (the stability criterion:
        # decreasing task losses, finite adversarial losses)
        "task_loss_trend": {
            k: {"first": first.get(k), "last": last.get(k)}
            for k in ("G1", "G2", "seg_syn", "seg_real", "dep_ref",
                      "acc_syn", "acc_real") if k in first
        },
        "log": log,
    }
    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "log"},
                     indent=1))

    try:  # optional curve plot
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        steps = [r["step"] for r in log]
        fig, ax = plt.subplots(figsize=(9, 5))
        for k in ("G1", "G2", "seg_syn", "seg_real", "dep_ref"):
            if k in log[0]:
                ax.plot(steps, [r[k] for r in log], label=k)
        ax.set_xlabel("step")
        ax.set_ylabel("loss")
        ax.set_title(f"{args.model} {args.dtype} bs{args.batch} — "
                     f"{args.steps}-step chip run")
        ax.legend()
        fig.tight_layout()
        png = os.path.splitext(args.out)[0] + ".png"
        fig.savefig(png, dpi=110)
        print(f"[long_run] curve → {png}")
    except Exception as exc:  # plot is best-effort
        print(f"[long_run] plot skipped: {exc}")


if __name__ == "__main__":
    main()
