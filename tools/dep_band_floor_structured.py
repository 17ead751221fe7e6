"""Floor analysis for the STRUCTURED-band long run (VERDICT r4 item 4).

The structured 1,000-step run (tools/long_run_s2d.py --structured_bands)
replaces sign(randn) coin-flip band targets with the real KITTI band
encoding (data/preprocess.depth_bands) of a smooth synthetic depth field.
tools/dep_ref_floor.py proved the OLD flat dep_ref ≈ 197 was an
information-theoretic floor; this script computes the corresponding floors
for the structured targets so the new curve can be judged quantitatively:

- **perfect-predictor floor**: each of the 4 band heads emits one channel
  that is compared (via the reference's load-bearing broadcast,
  networks5_ds.py:947-956) against the SAME 4-channel target, so the best
  any head can do is the per-pixel minimizer of

      g_px(p) = Σ_c [ −log((p+1)/2)·1[t_c=+1] − log((1−p)/2)·1[t_c=−1]
                      + 50·|p − t_c| ]

  (BCE terms act only on the clip-saturated ±1 elements that get_masks
  marks; the 50×L1 acts on all four continuous band values). dep_band =
  4 identical calls, each meaning over B·H·W·4 elements.
- **constant-predictor floor**: min over a constant p of the same mean —
  the "nothing learned spatially" baseline. The gap between the two is
  exactly the signal available to training.

Both are evaluated on the EXACT batches the run trained on (same
make_batches(structured=True) construction), grid-minimizing over
p ∈ [-1, 1]. A package-level cross-check evaluates
models.s2d_networks.bce_dep_loss at the per-pixel-optimal prediction and
at the best constant. Output: tools/dep_band_floor_structured.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRID = np.linspace(-1.0, 1.0, 401, dtype=np.float32)


def _per_call_losses(pred_px, target):
    """Mean-over-elements band-call loss for a per-pixel prediction map.

    pred_px: (B,H,W) prediction; target: (B,H,W,4) sky-masked band target.
    Mirrors bce_dep_loss: mean over all B·H·W·4 elements.
    """
    p = pred_px[..., None].astype(np.float32)
    q = (p + 1.0) / 2.0
    o_m = target == 1.0
    z_m = target == -1.0
    eps = 1e-12
    bce = (-np.log(np.maximum(q, eps)) * o_m
           - np.log(np.maximum(1.0 - q, eps)) * z_m)
    l1 = 50.0 * np.abs(p - target)
    return float(np.mean(bce + l1))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from cycle_depth_estimation_tpu.models.s2d_networks import (
        bce_dep_loss,
        get_masks,
    )
    from tools.long_run_s2d import make_batches

    batch, rotate = 2, 8
    batches = make_batches(batch, rotate, structured=True,
                           device=jax.devices("cpu")[0])

    rows = []
    for b in batches:
        seg = np.asarray(b["seg_l_syn"])
        sky = (seg != 17).astype(np.float32)[..., None]
        sky4 = np.repeat(sky, 4, axis=-1)
        target = sky4 * np.asarray(b["depth_l_s"], np.float32)  # (B,H,W,4)

        o_m = target == 1.0
        z_m = target == -1.0
        eps = 1e-12
        # per-pixel loss as a function of the grid: (G,1,1,1) vs (B,H,W,4)
        # evaluated channel-summed per pixel, chunked over the grid to
        # bound memory
        best = None
        best_p = None
        for g0 in range(0, GRID.size, 40):
            gs = GRID[g0:g0 + 40][:, None, None, None, None]
            q = (gs + 1.0) / 2.0
            elt = (-np.log(np.maximum(q, eps)) * o_m
                   - np.log(np.maximum(1.0 - q, eps)) * z_m
                   + 50.0 * np.abs(gs - target))
            px = elt.sum(axis=-1)  # (g,B,H,W)
            if best is None:
                best = px.min(axis=0)
                best_p = GRID[g0:g0 + 40][px.argmin(axis=0)]
            else:
                cand = px.min(axis=0)
                cand_p = GRID[g0:g0 + 40][px.argmin(axis=0)]
                upd = cand < best
                best = np.where(upd, cand, best)
                best_p = np.where(upd, cand_p, best_p)
        perfect_call = float(best.mean() / 4.0)  # mean over B,H,W,4

        # constant floor on this batch
        const_losses = []
        for p in GRID[::4]:
            const_losses.append(_per_call_losses(
                np.full(target.shape[:3], p, np.float32) * sky[..., 0],
                target))
        const_call = float(np.min(const_losses))
        const_p = float(GRID[::4][int(np.argmin(const_losses))])

        # cross-check with the package's own loss at the optimal prediction
        import jax.numpy as jnp
        omj, zmj = get_masks(jnp.asarray(target))
        pkg_perfect = float(bce_dep_loss(
            jnp.asarray((best_p * sky[..., 0])[..., None], jnp.float32),
            jnp.asarray(target), omj, zmj))

        rows.append({
            "perfect_call_floor": round(perfect_call, 4),
            "perfect_dep_band_floor_4x": round(4 * perfect_call, 3),
            "package_check_at_optimum": round(pkg_perfect, 4),
            "constant_call_floor": round(const_call, 4),
            "constant_dep_band_floor_4x": round(4 * const_call, 3),
            "constant_best_p": const_p,
        })

    perfects = [r["perfect_dep_band_floor_4x"] for r in rows]
    consts = [r["constant_dep_band_floor_4x"] for r in rows]
    out = {
        "what": "dep_band floors on the structured long-run batches "
                "(perfect per-pixel vs best constant prediction)",
        "per_batch": rows,
        "perfect_floor_mean": round(float(np.mean(perfects)), 3),
        "perfect_floor_range": [min(perfects), max(perfects)],
        "constant_floor_mean": round(float(np.mean(consts)), 3),
        "constant_floor_range": [min(consts), max(consts)],
        "learnable_gap": round(float(np.mean(consts) - np.mean(perfects)), 3),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "dep_band_floor_structured.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "per_batch"},
                     indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
