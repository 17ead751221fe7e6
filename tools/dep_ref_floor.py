"""Decompose the 1,000-step run's flat dep_ref ≈ 197 (VERDICT r3 item 3).

``dep_ref`` (models/s2d.py rd_syn_loss_fn; reference new_multi/model5.py:
528-540 + networks5_ds.py:947-956) is

    L1(dep_o, sky·dep_l)  +  Σ_{i<4} BCEDepLoss(sky·band_i, sky4·dep_ls)

where BCEDepLoss = bce1 + bce0 + 50·L1 and each 1-channel band prediction
broadcasts against the 4-channel ±1 band target (the reference's
load-bearing broadcast).

The long run (tools/long_run_s2d.py, pre-r4) drew ``depth_l_s`` as
np.sign(randn) — i.i.d. per-pixel coin flips, independent across the 4
channels. No 1-channel prediction can beat a constant on that target, so
the term has an information-theoretic FLOOR, not a training failure:

- 50·L1: for any p ∈ [-1,1], ½(|p-1|+|p+1|) = 1 on every non-sky pixel
  → 50·(1 - sky_frac) per band call, FLAT in p (nothing to descend).
- bce1+bce0: optimal constant q = ½ → 2·ln2 · (non-sky)/2 per call.
- dep_o L1 vs uniform[-1,1] dep_l: optimal constant 0 → ½·(1 - sky_frac).

This script evaluates the floor two ways on the EXACT batches the long run
trained on (same RandomState(1234) consumption order) — analytically and
by calling the package's own bce_dep_loss with constant predictions — and
compares against the logged first/last dep_ref. Output:
tools/dep_ref_floor.json.

The fix for a *demonstrable* decreasing band term is structured bands:
long_run_s2d.py --structured_bands draws depth from a smooth synthetic
field through data/preprocess.depth_bands (the real KITTI band encoding,
try_data.py:240-272), making the bands learnable; models/s2d.py now logs
dep_l1 / dep_band separately.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cycle_depth_estimation_tpu.models.s2d_networks import (
        bce_dep_loss,
        get_masks,
    )

    batch, rotate, h, w = 2, 8, 192, 576
    SKY = 17

    # exact long-run batch reconstruction (tools/long_run_s2d.py
    # make_batches consumption order: seg_syn, seg_real, dep, bands per j)
    rng = np.random.RandomState(1234)
    batches = []
    for _ in range(rotate):
        seg_l_syn = rng.randint(0, 28, (batch, h, w))
        _seg_l_real = rng.randint(0, 28, (batch, h, w))
        dep_l_syn = (rng.rand(batch, h, w, 1) * 2 - 1).astype(np.float32)
        depth_l_s = np.sign(rng.randn(batch, h, w, 4)).astype(np.float32)
        batches.append((seg_l_syn, dep_l_syn, depth_l_s))

    rows = []
    for seg_l_syn, dep_l_syn, depth_l_s in batches:
        sky = (seg_l_syn != SKY).astype(np.float32)[..., None]
        sky_frac = 1.0 - sky.mean()
        sky4 = np.repeat(sky, 4, axis=-1)
        target = jnp.asarray(sky4 * depth_l_s)
        o_m, z_m = get_masks(target)

        # empirical floor: the package's own loss at the optimal constant
        # prediction (p=0 ⇒ q=½), one band call × 4 (identical by symmetry)
        pred0 = jnp.asarray(sky * np.zeros((batch, h, w, 1), np.float32))
        band_call_at_p0 = float(bce_dep_loss(pred0, target, o_m, z_m))

        # grid check that p=0 is (near-)optimal for a constant prediction
        grid = {}
        for p in (-0.5, -0.1, 0.0, 0.1, 0.5):
            pc = jnp.asarray(sky * np.full((batch, h, w, 1), p, np.float32))
            grid[str(p)] = round(float(bce_dep_loss(pc, target, o_m, z_m)), 4)

        # analytic per-call floor
        nonsky = 1.0 - sky_frac
        analytic_call = 50.0 * nonsky + 2.0 * np.log(2.0) * nonsky / 2.0
        # dep_o L1 vs uniform[-1,1] target at the constant optimum p=0
        dep_o_l1_floor = float(np.mean(np.abs(sky * dep_l_syn)))

        rows.append({
            "sky_frac": round(float(sky_frac), 5),
            "band_call_at_p0": round(band_call_at_p0, 4),
            "band_call_analytic": round(float(analytic_call), 4),
            "band_call_grid": grid,
            "dep_ref_floor": round(4 * band_call_at_p0 + dep_o_l1_floor, 3),
        })

    floors = [r["dep_ref_floor"] for r in rows]
    out = {
        "what": "information-theoretic floor of dep_ref on the pre-r4 long "
                "run's sign-random bands (4 × BCEDepLoss + dep_o L1, "
                "optimal-constant prediction)",
        "per_batch": rows,
        "floor_mean_over_rotation": round(float(np.mean(floors)), 3),
        "floor_range": [min(floors), max(floors)],
        "logged_dep_ref": {"first_step": 196.84, "last_step": 197.00,
                           "source": "tools/long_run_s2d.json task_loss_trend"},
        "conclusion": "the flat ≈197 sits ~0.4% above the ≈196.0 floor — "
                      "the dominant band term had NOTHING to learn on "
                      "sign-random synthetic bands; it is a floor, not a "
                      "training failure. The 50×L1 component (≈193 of it) "
                      "is flat in the prediction over [-1,1], so no "
                      "gradient signal exists at all for it.",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "dep_ref_floor.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "per_batch"},
                     indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
