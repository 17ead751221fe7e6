"""S2D_nd (new_depseg model2) convergence-shape validation against the
reference's own nets.

Companion to tools/convergence_compare_df.py: the torch oracle transcribes
my_seg_depth/new_depseg/model2.py:432-505 (double-D WGAN-GP loop) driving
the reference's OWN new_depseg/networks2.py SEG / DEP / Discriminator_seg
modules plus the reduced-width General_net builder of tools/torch_oracles.py;
our side is the registered `S2D_nd` jitted step, initialized from the same
torch state dicts.

The GP's interpolation coefficient alpha is an independent random draw on
each side (like the Dropout2d draws in the S2D_base comparison), so the
D/GP channels are compared as smoothed shapes; the task channels are
deterministic and match tightly.

``--variant 4dis`` validates the snapshot's model3 variant instead
(new_depseg/model3.py, our ``--nd_4dis``): twin 256-slice
``Discriminator2_seg`` critics Adam-stepped without GP, ``cal_DisL(real,
False)`` in G_2 plus the gradient-free 3× ``real_dep_loss`` report, and
the syn-only Dep phase. That loop has NO random draws (no GP alpha, no
dropout), so every channel is deterministic and compared tightly.

CLI: ``python -m tools.convergence_compare_nd [--steps N] [--variant 4dis]``.
Committed results: tools/convergence_results_nd.json (model2) /
tools/convergence_results_nd4.json (4dis).
"""

from __future__ import annotations

import argparse
import contextlib
import importlib.util
import io
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.convergence_compare import compare  # noqa: E402
from tools.convergence_compare_s2d import (  # noqa: E402
    make_batches,
    reference_init_weights,
)
from tools.torch_oracles import build_torch_general_net2  # noqa: E402

H, W = 64, 96
LR, BETA1 = 2e-4, 0.5
BLOCKS = (2, 2, 2, 2)
KEYS = ("G_1", "G_2", "G2_dis", "seg_real", "dep_syn", "D_syn", "D_real",
        "gp")
KEYS_4DIS = ("G_1", "G_2", "G2_dis", "seg_real", "dep_syn", "dep_real",
             "D_syn", "D_real")
REF_ND = "/root/reference/my_seg_depth/new_depseg/networks2.py"


def run_torch(batches, seed=0, variant="model2"):
    import torch
    import torch.nn.functional as tF
    from torch import autograd

    torch.Tensor.cuda = lambda self, *a, **k: self
    spec = importlib.util.spec_from_file_location("networks2_nd_cc", REF_ND)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    torch.manual_seed(seed)
    G_1, _ = build_torch_general_net2(BLOCKS)
    G_2, _ = build_torch_general_net2(BLOCKS)
    Seg = ref.SEG(n_cls=28)
    Dep = ref.DEP()
    nets = dict(G_1=G_1, G_2=G_2, Seg_de=Seg, Dep_de=Dep)
    opts = {"G_1": torch.optim.Adam(G_1.parameters(), LR / 2,
                                    betas=(BETA1, 0.999)),
            "G_2": torch.optim.Adam(G_2.parameters(), LR / 2,
                                    betas=(BETA1, 0.999)),
            "Seg": torch.optim.Adam(Seg.parameters(), LR / 2,
                                    betas=(BETA1, 0.999)),
            "Dep": torch.optim.Adam(Dep.parameters(), LR / 2,
                                    betas=(BETA1, 0.999))}
    if variant == "4dis":
        # model3.py:237-244, 292-295: twin Discriminator2_seg, Adam at lr
        Dis0 = ref.Discriminator2_seg()
        Dis1 = ref.Discriminator2_seg()
        reference_init_weights(Dis0, seed=seed + 1)
        reference_init_weights(Dis1, seed=seed + 2)
        nets.update(Dis0_en=Dis0, Dis1_en=Dis1)
        opts["D0"] = torch.optim.Adam(Dis0.parameters(), LR,
                                      betas=(BETA1, 0.999))
        opts["D1"] = torch.optim.Adam(Dis1.parameters(), LR,
                                      betas=(BETA1, 0.999))
    else:
        Dis = ref.Discriminator_seg()
        reference_init_weights(Dis, seed=seed + 1)
        nets["Dis_en"] = Dis
        opts["D"] = torch.optim.SGD(Dis.parameters(), LR / 3)
    init_sds = {k: {kk: vv.detach().clone()
                    for kk, vv in n.state_dict().items()}
                for k, n in nets.items()}

    def bce(pred, real):
        t = torch.ones_like(pred) if real else torch.zeros_like(pred)
        # clamp like our bce_gan_loss — torch BCELoss NaNs on the D's
        # leaky-negative outputs (the documented reference hazard)
        return tF.binary_cross_entropy(pred.clamp(1e-7, 1 - 1e-7), t)

    def ce(p, t):
        return tF.cross_entropy(p, t.long(), ignore_index=255)

    def grad_penalty(netD, real_data, fake_data):
        # model2.py:319-338 verbatim semantics
        alpha = torch.rand(1)
        interpolates = real_data.clone()
        interpolates[0] = alpha * real_data[0] + (1 - alpha) * fake_data[0]
        interpolates = interpolates.requires_grad_(True)
        d_out = netD(interpolates)
        grads = autograd.grad(outputs=d_out, inputs=interpolates,
                              grad_outputs=torch.ones(d_out.size()),
                              create_graph=True, retain_graph=True,
                              only_inputs=True)[0]
        return ((grads.norm(2, dim=1) - 1) ** 2).mean() * 10

    def d_phase():
        for n in nets.values():
            for p in n.parameters():
                p.requires_grad_(False)
        for p in Dis.parameters():
            p.requires_grad_(True)
        opts["D"].zero_grad()
        f1s = G_1.fwd(syn_img, "R")[1].detach()
        f1r = G_2.fwd(real_img, "R")[1].detach()
        l_syn = bce(Dis(f1s), True)
        l_real = bce(Dis(f1r), False)
        gp = grad_penalty(Dis, f1r, f1s)
        (l_syn + l_real + gp).backward()
        opts["D"].step()
        return l_syn, l_real, gp

    def d_phase_4dis():
        # model3.py:356-398: both critics' forwards precomputed, then one
        # Adam step each; targets syn→False, real→True (un-inverted)
        for n in nets.values():
            for p in n.parameters():
                p.requires_grad_(False)
        for d in (Dis0, Dis1):
            for p in d.parameters():
                p.requires_grad_(True)
        opts["D0"].zero_grad()
        opts["D1"].zero_grad()
        f1s = G_1.fwd(syn_img, "R")[1].detach()
        f1r = G_2.fwd(real_img, "R")[1].detach()
        l_s0 = bce(Dis0(f1s[:, :256]), False)
        l_s1 = bce(Dis1(f1s[:, 256:512]), False)
        l_r0 = bce(Dis0(f1r[:, :256]), True)
        (l_r0 + l_s0).backward()
        opts["D0"].step()
        l_r1 = bce(Dis1(f1r[:, 256:512]), True)
        (l_r1 + l_s1).backward()
        opts["D1"].step()
        return l_s0 + l_s1, l_r0 + l_r1

    def cal_disl(f1, real):
        # model3.py:347-356
        return (bce(Dis0(f1[:, :256]), real) + bce(Dis1(f1[:, 256:512]), real))

    def real_dep_loss_t(seg_p, seg_l, dep_p, dep_l):
        # model3.py:434-447 verbatim (batch 1: the NCHW×NHW broadcast is
        # exact)
        seg_p = seg_p.detach()
        new_seg_p = seg_p.max(dim=1)[1].float()
        mask = torch.zeros(new_seg_p.shape)
        mask[new_seg_p == seg_l.float()] = 1
        return tF.l1_loss(mask * dep_p, mask * dep_l)

    curves = {k: [] for k in (KEYS_4DIS if variant == "4dis" else KEYS)}
    for step, b in enumerate(batches):
        syn_img = torch.from_numpy(b["img_syn"].transpose(0, 3, 1, 2))
        real_img = torch.from_numpy(b["img_real"].transpose(0, 3, 1, 2))
        syn_seg_l = torch.from_numpy(b["seg_l_syn"])
        real_seg_l = torch.from_numpy(b["seg_l_real"])
        syn_dep_l = torch.from_numpy(b["dep_l_syn"][..., 0])

        with contextlib.redirect_stdout(io.StringIO()):
            # ---- 1. D step #1 (model2.py:436-444; model3.py:511-520) ----
            if variant == "4dis":
                d_phase_4dis()
            else:
                d_phase()

            # ---- 2. G_1 (model2.py:393-414) ----
            for n in nets.values():
                for p in n.parameters():
                    p.requires_grad_(False)
            for p in G_1.parameters():
                p.requires_grad_(True)
            opts["G_1"].zero_grad()
            sf1 = G_1.fwd(syn_img, "R")[1]
            # .clone(): SEG/DEP's INPLACE first ReLU mutates their input
            # (networks2.py:30,36). In the reference this aliasing is benign
            # (the frozen D computes no weight-grads, and every later
            # consumer re-applies relu), but modern torch's version counter
            # rejects it — the clone is value-exact.
            l_g1 = (ce(Seg(sf1.clone()), syn_seg_l)
                    + tF.l1_loss(Dep(sf1.clone())[:, 0], syn_dep_l))
            l_g1.backward()
            opts["G_1"].step()
            syn_f1 = sf1.detach()

            # ---- 3. G_2 (model2.py:416-430) ----
            for p in G_1.parameters():
                p.requires_grad_(False)
            for p in G_2.parameters():
                p.requires_grad_(True)
            opts["G_2"].zero_grad()
            rf1 = G_2.fwd(real_img, "R")[1]
            if variant == "4dis":
                # model3.py:484-505: cal_DisL(real, False) + real CE +
                # 3× gradient-free real_dep_loss; Dep forward on the
                # detached features
                l_dis = cal_disl(rf1, False)
                seg_real_pre = Seg(rf1.clone())
                dep_real_pre = Dep(rf1.detach().clone())
                l_dep_real = real_dep_loss_t(seg_real_pre, syn_seg_l,
                                             dep_real_pre, syn_dep_l)
                l_g2 = (l_dis + ce(seg_real_pre, real_seg_l)
                        + 3 * l_dep_real)
                l_g2.backward()
            else:
                l_dis = bce(Dis(rf1), True)
                l_g2 = l_dis + ce(Seg(rf1.clone()), real_seg_l)
                l_g2.backward()
            opts["G_2"].step()
            real_f1 = rf1.detach()

            # ---- 4. Seg (model2.py:366-382) ----
            for p in G_2.parameters():
                p.requires_grad_(False)
            for p in Seg.parameters():
                p.requires_grad_(True)
            opts["Seg"].zero_grad()
            Seg(syn_f1.clone())  # stats/visuals only
            l_seg_real = 1.3 * ce(Seg(real_f1.clone()), real_seg_l)
            l_seg_real.backward()
            opts["Seg"].step()

            # ---- 5. Dep (model2.py:384-391) ----
            for p in Dep.parameters():
                p.requires_grad_(True)
            opts["Dep"].zero_grad()
            l_dep = tF.l1_loss(Dep(syn_f1.clone())[:, 0], syn_dep_l)
            if variant != "4dis":
                # model3's Dep phase is syn-only (model3.py:450-457)
                Dep(real_f1.clone())  # stats/visuals only
            l_dep.backward()
            opts["Dep"].step()

            # ---- 6. D step #2 (model2.py:496-505; model3.py:574-583) ----
            if variant == "4dis":
                l_d_syn, l_d_real = d_phase_4dis()
                gp = None
            else:
                l_d_syn, l_d_real, gp = d_phase()

        vals = dict(G_1=l_g1, G_2=l_g2, G2_dis=l_dis, seg_real=l_seg_real,
                    dep_syn=l_dep, D_syn=l_d_syn, D_real=l_d_real)
        if variant == "4dis":
            vals["dep_real"] = l_dep_real
        else:
            vals["gp"] = gp
        for k in curves:
            curves[k].append(float(vals[k]))
        if step % 10 == 0:
            probe = ("G_1", "seg_real", "dep_syn",
                     "dep_real" if variant == "4dis" else "gp")
            print(f"torch step {step}: " + " ".join(
                f"{k}={curves[k][-1]:.3f}" for k in probe), flush=True)
    return curves, init_sds


def run_ours(batches, init_sds, variant="model2"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
    from cycle_depth_estimation_tpu.models import create_model
    from cycle_depth_estimation_tpu.utils.torch_import import (
        import_dep_decoder,
        import_dis2seg_df,
        import_general_net2,
        import_seg_decoder,
    )

    cfg = apply_model_defaults(Config(model="S2D_nd", batch_size=1, lr=LR,
                                      beta1=BETA1, nd_4dis=variant == "4dis",
                                      dense_block_config=list(BLOCKS)))
    model = create_model(cfg)
    state = model.init_state_at(jax.random.key(0), H, W)

    def np_sd(sd):
        return {k: v.numpy() for k, v in sd.items()}

    imported = {
        "G_1": import_general_net2(np_sd(init_sds["G_1"]), BLOCKS),
        "G_2": import_general_net2(np_sd(init_sds["G_2"]), BLOCKS),
        "Seg_de": import_seg_decoder(np_sd(init_sds["Seg_de"])),
        "Dep_de": import_dep_decoder(np_sd(init_sds["Dep_de"])),
    }
    if variant == "4dis":
        imported["Dis0_en"] = import_dis2seg_df(np_sd(init_sds["Dis0_en"]))
        imported["Dis1_en"] = import_dis2seg_df(np_sd(init_sds["Dis1_en"]))
    else:
        imported["Dis_en"] = import_dis2seg_df(np_sd(init_sds["Dis_en"]))
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for name, vs in imported.items():
        params[name] = jax.tree.map(jnp.asarray, vs["params"])
        stats[name] = jax.tree.map(jnp.asarray, vs.get("batch_stats", {}))
    opt_states = {"G_1": model.opts["G_1"].init(params["G_1"]),
                  "G_2": model.opts["G_2"].init(params["G_2"]),
                  "Seg": model.opts["Seg"].init(params["Seg_de"]),
                  "Dep": model.opts["Dep"].init(params["Dep_de"])}
    if variant == "4dis":
        opt_states["D0"] = model.opts["D0"].init(params["Dis0_en"])
        opt_states["D1"] = model.opts["D1"].init(params["Dis1_en"])
    else:
        opt_states["D"] = model.opts["D"].init(params["Dis_en"])
    state = state.replace(params=params, batch_stats=stats,
                          opt_states=opt_states)

    keys = KEYS_4DIS if variant == "4dis" else KEYS
    curves = {k: [] for k in keys}
    for step, b in enumerate(batches):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        state, metrics = model.train_step(state, jb, jax.random.key(step))
        for k in keys:
            curves[k].append(float(metrics[k]))
        if step % 10 == 0:
            probe = ("G_1", "seg_real", "dep_syn",
                     "dep_real" if variant == "4dis" else "gp")
            print(f"ours  step {step}: " + " ".join(
                f"{k}={curves[k][-1]:.3f}" for k in probe), flush=True)
    return curves


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--variant", choices=("model2", "4dis"),
                    default="model2")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    if args.out is None:
        name = ("convergence_results_nd4.json" if args.variant == "4dis"
                else "convergence_results_nd.json")
        args.out = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), name)

    batches = make_batches(args.steps, 1, H, W, seed=5)
    curves_t, init_sds = run_torch(batches, variant=args.variant)
    curves_j = run_ours(batches, init_sds, variant=args.variant)
    stats = compare(curves_t, curves_j)
    out = {"steps": args.steps, "hw": [H, W], "blocks": list(BLOCKS),
           "variant": args.variant,
           "stats": stats, "torch": curves_t, "ours": curves_j}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(stats, indent=1))
    worst = min(v["corr"] for v in stats.values() if np.isfinite(v["corr"]))
    print(f"worst finite corr: {worst:.3f}")


if __name__ == "__main__":
    main()
