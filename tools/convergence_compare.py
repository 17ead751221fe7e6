"""CycleGAN convergence-shape validation against a torch oracle.

SURVEY §7 milestone 5 asks for loss-curve-shape validation that the jitted
multi-optimizer choreography *trains like* the reference beyond single-step
numerics. The reference's checked-in TensorBoard traces
(/root/reference/new_multi/summary/1_13_vt_t) come from its research model on
private data, so they can't be replayed directly; instead this harness runs
the SAME experiment in both frameworks and compares curve shapes:

- a torch training loop implementing the reference CycleGAN semantics
  (models/cycle_gan_model.py: joint G update; 4× D updates per G step each
  with a fresh ImagePool query, :151-160; LSGAN; pool p=0.5 swap,
  util/image_pool.py:5-32; Adam(0.5, 0.999) over chained G/D params);
- our jitted CycleGANModel, warm-started from the torch nets' state dicts
  through the `.pth` importers (exact same init);
- the same synthetic smooth-image stream feeds both.

ImagePool draws use independent RNG in the two frameworks, so curves are
compared as smoothed shapes, not step-for-step.

CLI: ``python -m tools.convergence_compare [--steps N] [--out results.json]``
writes per-loss curves, smoothed-curve correlations, and decrease ratios.
Committed results: tools/convergence_results.json.
"""

from __future__ import annotations

import argparse
import json
import random as pyrandom
from typing import Dict, List

import numpy as np


# ---------------------------------------------------------------------------
# torch oracle
# ---------------------------------------------------------------------------


def build_torch_resnet_g(in_c, out_c, ngf, n_blocks):
    """Reference-shaped ResnetGenerator (instance norm, reflect pad,
    models/networks.py:145-191); state-dict names match the importer."""
    import torch.nn as tnn

    def IN(c):
        return tnn.InstanceNorm2d(c, affine=False, track_running_stats=False)

    class Block(tnn.Module):
        def __init__(self, d):
            super().__init__()
            self.conv_block = tnn.Sequential(
                tnn.ReflectionPad2d(1), tnn.Conv2d(d, d, 3), IN(d),
                tnn.ReLU(True),
                tnn.ReflectionPad2d(1), tnn.Conv2d(d, d, 3), IN(d),
            )

        def forward(self, x):
            return x + self.conv_block(x)

    layers = [tnn.ReflectionPad2d(3), tnn.Conv2d(in_c, ngf, 7), IN(ngf),
              tnn.ReLU(True)]
    for i in range(2):
        m = 2 ** i
        layers += [tnn.Conv2d(ngf * m, ngf * m * 2, 3, 2, 1),
                   IN(ngf * m * 2), tnn.ReLU(True)]
    layers += [Block(ngf * 4) for _ in range(n_blocks)]
    for i in range(2):
        m = 2 ** (2 - i)
        layers += [tnn.ConvTranspose2d(ngf * m, ngf * m // 2, 3, 2, 1,
                                       output_padding=1),
                   IN(ngf * m // 2), tnn.ReLU(True)]
    layers += [tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, out_c, 7), tnn.Tanh()]
    net = tnn.Module()
    net.model = tnn.Sequential(*layers)
    net.forward = lambda x: net.model(x)
    return net


def build_torch_nlayer_d(in_c, ndf, n_layers=3):
    import torch.nn as tnn

    def IN(c):
        return tnn.InstanceNorm2d(c, affine=False, track_running_stats=False)

    layers = [tnn.Conv2d(in_c, ndf, 4, 2, 1), tnn.LeakyReLU(0.2, True)]
    m = 1
    for n in range(1, n_layers):
        mp, m = m, min(2 ** n, 8)
        layers += [tnn.Conv2d(ndf * mp, ndf * m, 4, 2, 1), IN(ndf * m),
                   tnn.LeakyReLU(0.2, True)]
    mp, m = m, min(2 ** n_layers, 8)
    layers += [tnn.Conv2d(ndf * mp, ndf * m, 4, 1, 1), IN(ndf * m),
               tnn.LeakyReLU(0.2, True), tnn.Conv2d(ndf * m, 1, 4, 1, 1)]
    net = tnn.Module()
    net.model = tnn.Sequential(*layers)
    net.forward = lambda x: net.model(x)
    return net


class _TorchPool:
    """Reference ImagePool semantics (util/image_pool.py:5-32): grow to
    ``size``, then per-image p=0.5 swap-with-random-history."""

    def __init__(self, size, rng):
        self.size = size
        self.rng = rng
        self.images = []

    def query(self, images):
        import torch

        out = []
        for img in images:
            img = img.unsqueeze(0)
            if len(self.images) < self.size:
                self.images.append(img.clone())
                out.append(img)
            elif self.rng.random() > 0.5:
                idx = self.rng.randint(0, self.size - 1)
                tmp = self.images[idx].clone()
                self.images[idx] = img.clone()
                out.append(tmp)
            else:
                out.append(img)
        return torch.cat(out, 0)


def run_torch(batches, ngf=8, ndf=8, n_blocks=3, lr=2e-4, beta1=0.5,
              lambda_ab=10.0, lambda_idt=0.5, pool_size=50,
              d_steps_per_g=4, seed=0):
    """Reference optimize_parameters loop (models/cycle_gan_model.py:58-160);
    returns (loss curves, initial state dicts for the matched jax init)."""
    import itertools

    import torch
    import torch.nn as tnn

    torch.manual_seed(seed)
    G_A = build_torch_resnet_g(3, 3, ngf, n_blocks)
    G_B = build_torch_resnet_g(3, 3, ngf, n_blocks)
    D_A = build_torch_nlayer_d(3, ndf)
    D_B = build_torch_nlayer_d(3, ndf)
    init_sds = {name: {k: v.detach().clone() for k, v in
                       net.state_dict().items()}
                for name, net in (("G_A", G_A), ("G_B", G_B),
                                  ("D_A", D_A), ("D_B", D_B))}
    opt_G = torch.optim.Adam(
        itertools.chain(G_A.parameters(), G_B.parameters()),
        lr=lr, betas=(beta1, 0.999))
    opt_D = torch.optim.Adam(
        itertools.chain(D_A.parameters(), D_B.parameters()),
        lr=lr, betas=(beta1, 0.999))
    mse = tnn.MSELoss()
    l1 = tnn.L1Loss()
    prng = pyrandom.Random(seed)
    pool_A = _TorchPool(pool_size, prng)
    pool_B = _TorchPool(pool_size, prng)

    def gan(pred, real):
        return mse(pred, torch.full_like(pred, 1.0 if real else 0.0))

    curves: Dict[str, List[float]] = {}
    for real_A_np, real_B_np in batches:
        real_A = torch.from_numpy(real_A_np.transpose(0, 3, 1, 2))
        real_B = torch.from_numpy(real_B_np.transpose(0, 3, 1, 2))
        # ---- G update (backward_G, :120-149) ----
        fake_B = G_A(real_A)
        rec_A = G_B(fake_B)
        fake_A = G_B(real_B)
        rec_B = G_A(fake_A)
        idt_A = G_A(real_B)
        idt_B = G_B(real_A)
        loss = {
            "G_A": gan(D_A(fake_B), True),
            "G_B": gan(D_B(fake_A), True),
            "cycle_A": l1(rec_A, real_A) * lambda_ab,
            "cycle_B": l1(rec_B, real_B) * lambda_ab,
            "idt_A": l1(idt_A, real_B) * lambda_ab * lambda_idt,
            "idt_B": l1(idt_B, real_A) * lambda_ab * lambda_idt,
        }
        opt_G.zero_grad()
        sum(loss.values()).backward()
        opt_G.step()
        # ---- D updates ×4, fresh pool query each (:151-160, :110-118) ----
        for _ in range(d_steps_per_g):
            opt_D.zero_grad()
            fb = pool_B.query(fake_B.detach())
            fa = pool_A.query(fake_A.detach())
            loss["D_A"] = (gan(D_A(real_B), True) + gan(D_A(fb), False)) * 0.5
            loss["D_B"] = (gan(D_B(real_A), True) + gan(D_B(fa), False)) * 0.5
            (loss["D_A"] + loss["D_B"]).backward()
            opt_D.step()
        for k, v in loss.items():
            curves.setdefault(k, []).append(float(v))
    return curves, init_sds


# ---------------------------------------------------------------------------
# our side
# ---------------------------------------------------------------------------


def run_ours(batches, init_sds, ngf=8, ndf=8, n_blocks=3, pool_size=50,
             d_steps_per_g=4, seed=0, force_cpu=False):
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
    from cycle_depth_estimation_tpu.models import create_model
    from cycle_depth_estimation_tpu.utils.torch_import import (
        import_nlayer_discriminator,
        import_resnet_generator,
    )

    h = batches[0][0].shape[1]
    cfg = apply_model_defaults(Config(
        model="cycle_gan", fine_size=h, ngf=ngf, ndf=ndf,
        net_g=f"resnet_{n_blocks}blocks", batch_size=batches[0][0].shape[0],
        pool_size=pool_size, d_steps_per_g=d_steps_per_g, no_dropout=True))
    model = create_model(cfg)
    state = model.init_state(jax.random.key(seed))
    params = dict(state.params)
    for g in ("G_A", "G_B"):
        params[g] = jax.tree.map(
            jnp.asarray, import_resnet_generator(
                {k: v.numpy() for k, v in init_sds[g].items()},
                n_blocks=n_blocks))
    for d in ("D_A", "D_B"):
        params[d] = jax.tree.map(
            jnp.asarray, import_nlayer_discriminator(
                {k: v.numpy() for k, v in init_sds[d].items()}))
    # optimizer states must be rebuilt over the imported params
    g_sub = {"G_A": params["G_A"], "G_B": params["G_B"]}
    d_sub = {"D_A": params["D_A"], "D_B": params["D_B"]}
    state = state.replace(params=params,
                          opt_states={"G": model.opt_G.init(g_sub),
                                      "D": model.opt_D.init(d_sub)})
    rng = jax.random.key(seed + 1)
    curves: Dict[str, List[float]] = {}
    for real_A, real_B in batches:
        rng, k = jax.random.split(rng)
        batch = {"img_source": jnp.asarray(real_A),
                 "img_target": jnp.asarray(real_B)}
        state, metrics = model.train_step(state, batch, k)
        for name, v in metrics.items():
            curves.setdefault(name, []).append(float(v))
    return curves


# ---------------------------------------------------------------------------
# comparison
# ---------------------------------------------------------------------------


def smooth(xs, frac=0.1):
    w = max(2, int(len(xs) * frac))
    k = np.ones(w) / w
    return np.convolve(np.asarray(xs, np.float64), k, mode="valid")


def compare(curves_t, curves_j) -> Dict[str, Dict[str, float]]:
    out = {}
    for k in sorted(set(curves_t) & set(curves_j)):
        a, b = smooth(curves_t[k]), smooth(curves_j[k])
        n = min(len(a), len(b))
        a, b = a[:n], b[:n]
        corr = float(np.corrcoef(a, b)[0, 1]) if a.std() > 0 and b.std() > 0 \
            else float("nan")
        out[k] = {
            "corr": corr,
            "torch_first": float(a[0]), "torch_last": float(a[-1]),
            "jax_first": float(b[0]), "jax_last": float(b[-1]),
            "rel_final_gap": float(abs(a[-1] - b[-1])
                                   / max(1e-8, abs(a[-1]) + abs(b[-1]))),
        }
    return out


def make_batches(n_steps, batch, size, seed=0):
    from cycle_depth_estimation_tpu.models.quantization import (
        synthetic_calibration_batch,
    )

    out = []
    for i in range(n_steps):
        a = synthetic_calibration_batch(seed * 100000 + 2 * i, batch, size)
        b = synthetic_calibration_batch(seed * 100000 + 2 * i + 1, batch, size)
        out.append((a, b))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--out", default="tools/convergence_results.json")
    ap.add_argument("--plot", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="run the jax side on CPU (leave the TPU free)")
    args = ap.parse_args(argv)

    batches = make_batches(args.steps, args.batch, args.size)
    curves_t, init_sds = run_torch(batches)
    curves_j = run_ours(batches, init_sds, force_cpu=args.cpu)
    report = compare(curves_t, curves_j)
    result = {"steps": args.steps, "batch": args.batch, "size": args.size,
              "comparison": report,
              "curves": {"torch": curves_t, "jax": curves_j}}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    for k, v in report.items():
        print(f"{k:9s} corr={v['corr']:+.3f} "
              f"torch {v['torch_first']:.3f}->{v['torch_last']:.3f}  "
              f"jax {v['jax_first']:.3f}->{v['jax_last']:.3f}  "
              f"gap {v['rel_final_gap']:.3f}")
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        keys = sorted(report)
        fig, axes = plt.subplots(2, 4, figsize=(16, 6))
        for ax, k in zip(axes.ravel(), keys):
            ax.plot(smooth(curves_t[k]), label="torch")
            ax.plot(smooth(curves_j[k]), label="jax")
            ax.set_title(k)
            ax.legend()
        fig.tight_layout()
        fig.savefig(args.plot, dpi=100)
    return result


if __name__ == "__main__":
    main()
