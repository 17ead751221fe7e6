"""Convergence-shape validation (SURVEY §7 milestone 5): the jitted
CycleGAN multi-optimizer choreography trains like the reference loop over
many steps, not just single-step numerics. A torch loop with reference
semantics and our model run from the SAME init on the SAME data stream;
smoothed loss curves must track. Full 200-step results + plot are committed
at tools/convergence_results.json / convergence_curves.png."""

import numpy as np

from tools.convergence_compare import (
    compare,
    make_batches,
    run_ours,
    run_torch,
    smooth,
)


def test_cycle_gan_convergence_tracks_torch():
    batches = make_batches(60, batch=2, size=32, seed=3)
    curves_t, init_sds = run_torch(batches)
    curves_j = run_ours(batches, init_sds)
    report = compare(curves_t, curves_j)

    # deterministic-objective curves (no pool randomness in them) must track
    # almost exactly
    for k in ("cycle_A", "cycle_B", "idt_A", "idt_B"):
        assert report[k]["corr"] > 0.95, (k, report[k])
        assert report[k]["rel_final_gap"] < 0.05, (k, report[k])
        # and both frameworks actually train (loss decreases)
        for side in ("torch", "jax"):
            first, last = report[k][f"{side}_first"], report[k][f"{side}_last"]
            assert last < first, (k, side, first, last)

    # adversarial curves carry independent ImagePool randomness — require
    # same equilibrium neighborhood rather than pointwise tracking
    for k in ("D_A", "D_B", "G_A", "G_B"):
        a = smooth(curves_t[k])
        b = smooth(curves_j[k])
        assert abs(a[-1] - b[-1]) < 0.5 * (abs(a[-1]) + abs(b[-1])) + 0.05, (
            k, float(a[-1]), float(b[-1]))
