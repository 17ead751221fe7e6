"""S2D_df (model3 generation) convergence-shape validation against the
reference's own nets.

Companion to tools/convergence_compare_s2d.py / _alt.py for the
deeperfeatures "model3" variant: the torch oracle is a literal transcription
of my_seg_depth/deeperfeatures/model3.py:380-624 driving the reference's OWN
deeperfeatures/networks2.py SEG / DEP / Discriminator2_seg modules (imported
read-only) plus the reduced-width General_net builder of
tools/torch_oracles.py (the reference class hardcodes DenseNet-169 widths;
the trunk transcription is forward-parity-validated elsewhere). Our side is
the registered `S2D_df` model's jitted 5-phase step, initialized from the
same torch state dicts via import_general_net2 / import_seg_df /
import_dep_df / import_dis2seg_df.

The reference warm-starts G_1/G_2/Seg_de from prior-generation checkpoints
(model3.py:275-300, absolute paths not in the snapshot); both sides here
start from the same torch-native init as the stand-in, with init_net applied
to Dis0_en and Dep_de exactly as the reference does (model3.py:261-304).

CLI: ``python -m tools.convergence_compare_df [--steps N]``.
Committed results: tools/convergence_results_df.json.
"""

from __future__ import annotations

import argparse
import importlib.util
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
KEYS = ("G_1", "G_2", "seg_real", "adv_syn", "dep_syn", "dep_real",
        "D_syn", "D_real")
REF_DF = "/root/reference/my_seg_depth/deeperfeatures/networks2.py"


def run_torch(batches, seed=0, adv_w=2.0):
    import torch
    import torch.nn.functional as tF

    torch.Tensor.cuda = lambda self, *a, **k: self
    spec = importlib.util.spec_from_file_location("networks2_df_cc", REF_DF)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    torch.manual_seed(seed)
    G_1, _ = build_torch_general_net2(BLOCKS)
    G_2, _ = build_torch_general_net2(BLOCKS)
    Seg = ref.SEG(n_cls=28)
    Dep = ref.DEP()
    Dis0 = ref.Discriminator2_seg()
    # the reference init_net's only the freshly-created nets
    # (model3.py:261-304: Dis0_en and Dep_de; the rest are warm-started)
    reference_init_weights(Dis0, seed=seed + 1)
    reference_init_weights(Dep, seed=seed + 2)
    nets = dict(G_1=G_1, G_2=G_2, Seg_de=Seg, Dep_de=Dep, Dis0_en=Dis0)
    init_sds = {k: {kk: vv.detach().clone()
                    for kk, vv in n.state_dict().items()}
                for k, n in nets.items()}
    # Adam LR ratios: lr/3 (Gs), lr/2 (Seg, Dep), lr/5 (D0) — model3.py:313-327
    opts = {"G_1": torch.optim.Adam(G_1.parameters(), LR / 3,
                                    betas=(BETA1, 0.999)),
            "G_2": torch.optim.Adam(G_2.parameters(), LR / 3,
                                    betas=(BETA1, 0.999)),
            "Seg": torch.optim.Adam(Seg.parameters(), LR / 2,
                                    betas=(BETA1, 0.999)),
            "Dep": torch.optim.Adam(Dep.parameters(), LR / 2,
                                    betas=(BETA1, 0.999)),
            "D": torch.optim.Adam(Dis0.parameters(), LR / 5,
                                  betas=(BETA1, 0.999))}

    def gan(pred, real):
        # this generation's GANLoss is hardcoded MSE (networks2.py:645-665)
        t = torch.ones_like(pred) if real else torch.zeros_like(pred)
        return tF.mse_loss(pred, t)

    def ce(p, t):
        return tF.cross_entropy(p, t.long(), ignore_index=255)

    def real_dep_loss(seg_p, seg_l, dep_p, dep_l):
        # model3.py:472-483 verbatim semantics
        seg_p = seg_p.detach()
        new_seg_p = seg_p.max(dim=1)[1].float()
        m = torch.zeros(new_seg_p.shape)
        m[new_seg_p == seg_l.float()] = 1
        return tF.l1_loss(m * dep_p, m * dep_l)

    curves = {k: [] for k in KEYS}
    for step, b in enumerate(batches):
        syn_img = torch.from_numpy(b["img_syn"].transpose(0, 3, 1, 2))
        real_img = torch.from_numpy(b["img_real"].transpose(0, 3, 1, 2))
        syn_seg_l = torch.from_numpy(b["seg_l_syn"])
        real_seg_l = torch.from_numpy(b["seg_l_real"])
        syn_dep_l = torch.from_numpy(b["dep_l_syn"][..., 0])

        # ---- 1. G_1 (model3.py:497-516) ----
        for n in nets.values():
            for p in n.parameters():
                p.requires_grad_(False)
        for p in G_1.parameters():
            p.requires_grad_(True)
        opts["G_1"].zero_grad()
        sf1 = G_1.fwd(syn_img, "R")[1]
        seg_syn, sf2 = Seg(sf1)
        dep_syn = Dep(sf2)
        l_g1 = ce(seg_syn, syn_seg_l) + tF.l1_loss(dep_syn[:, 0], syn_dep_l)
        l_g1.backward()
        opts["G_1"].step()
        syn_f1 = sf1.detach()

        # ---- 2. G_2 (model3.py:518-548) ----
        for p in G_1.parameters():
            p.requires_grad_(False)
        for p in G_2.parameters():
            p.requires_grad_(True)
        opts["G_2"].zero_grad()
        rf1 = G_2.fwd(real_img, "R")[1]
        seg_real, rf2 = Seg(rf1)
        l_seg = ce(seg_real, real_seg_l)
        dep_real = Dep(rf2.detach())
        l_dep_real = real_dep_loss(seg_real, syn_seg_l, dep_real[:, 0],
                                   syn_dep_l)
        l_g2 = l_seg + 3 * l_dep_real
        l_g2.backward()
        opts["G_2"].step()
        real_f1 = rf1.detach()

        # ---- 3. Seg (model3.py:446-468) ----
        for p in G_2.parameters():
            p.requires_grad_(False)
        for p in Seg.parameters():
            p.requires_grad_(True)
        opts["Seg"].zero_grad()
        _, syn_f2 = Seg(syn_f1)
        seg_real_pre = Seg(real_f1)[0]
        l_seg_real = ce(seg_real_pre, real_seg_l)
        l_adv = gan(Dis0(syn_f2), True)
        (l_seg_real + adv_w * l_adv).backward()
        opts["Seg"].step()

        # ---- 4. Dep (model3.py:485-494) ----
        for p in Dep.parameters():
            p.requires_grad_(True)
        opts["Dep"].zero_grad()
        syn_f2u = Seg(syn_f1)[1].detach()
        l_dep = tF.l1_loss(Dep(syn_f2u)[:, 0], syn_dep_l)
        l_dep.backward()
        opts["Dep"].step()

        # ---- 5. D (model3.py:380-421) ----
        for n in nets.values():
            for p in n.parameters():
                p.requires_grad_(False)
        for p in Dis0.parameters():
            p.requires_grad_(True)
        opts["D"].zero_grad()
        f1s = G_1.fwd(syn_img, "R")[1].detach()
        f2s = Seg(f1s)[1].detach()
        pre_s = Dis0(f2s)
        l_d_syn = gan(pre_s, False)
        f1r = G_2.fwd(real_img, "R")[1].detach()
        pre_r = Dis0(Seg(f1r)[1].detach())
        l_d_real = gan(pre_r, True)
        (l_d_real + l_d_syn).backward()
        opts["D"].step()

        vals = dict(G_1=l_g1, G_2=l_g2, seg_real=l_seg_real, adv_syn=l_adv,
                    dep_syn=l_dep, dep_real=l_dep_real, D_syn=l_d_syn,
                    D_real=l_d_real)
        for k in KEYS:
            curves[k].append(float(vals[k]))
        if step % 10 == 0:
            print(f"torch step {step}: " + " ".join(
                f"{k}={curves[k][-1]:.3f}"
                for k in ("G_1", "seg_real", "dep_syn", "D_syn")), flush=True)
    return curves, init_sds


def run_ours(batches, init_sds):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
    from cycle_depth_estimation_tpu.models import create_model
    from cycle_depth_estimation_tpu.utils.torch_import import (
        import_dep_df,
        import_dis2seg_df,
        import_general_net2,
        import_seg_df,
    )

    cfg = apply_model_defaults(Config(model="S2D_df", batch_size=1, lr=LR,
                                      beta1=BETA1,
                                      dense_block_config=list(BLOCKS)))
    model = create_model(cfg)
    state = model.init_state_at(jax.random.key(0), H, W)

    def np_sd(sd):
        return {k: v.numpy() for k, v in sd.items()}

    imported = {
        "G_1": import_general_net2(np_sd(init_sds["G_1"]), BLOCKS),
        "G_2": import_general_net2(np_sd(init_sds["G_2"]), BLOCKS),
        "Seg_de": import_seg_df(np_sd(init_sds["Seg_de"])),
        "Dep_de": import_dep_df(np_sd(init_sds["Dep_de"])),
        "Dis0_en": import_dis2seg_df(np_sd(init_sds["Dis0_en"])),
    }
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for name, vs in imported.items():
        params[name] = jax.tree.map(jnp.asarray, vs["params"])
        stats[name] = jax.tree.map(jnp.asarray, vs.get("batch_stats", {}))
    opt_states = {"G_1": model.opts["G_1"].init(params["G_1"]),
                  "G_2": model.opts["G_2"].init(params["G_2"]),
                  "Seg": model.opts["Seg"].init(params["Seg_de"]),
                  "Dep": model.opts["Dep"].init(params["Dep_de"]),
                  "D": model.opts["D"].init(params["Dis0_en"])}
    state = state.replace(params=params, batch_stats=stats,
                          opt_states=opt_states)

    curves = {k: [] for k in KEYS}
    for step, b in enumerate(batches):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        state, metrics = model.train_step(state, jb, jax.random.key(step))
        for k in KEYS:
            curves[k].append(float(metrics[k]))
        if step % 10 == 0:
            print(f"ours  step {step}: " + " ".join(
                f"{k}={curves[k][-1]:.3f}"
                for k in ("G_1", "seg_real", "dep_syn", "D_syn")), flush=True)
    return curves


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "convergence_results_df.json"))
    args = ap.parse_args(argv)

    batches = make_batches(args.steps, 1, H, W, seed=3)
    curves_t, init_sds = run_torch(batches)
    curves_j = run_ours(batches, init_sds)
    stats = compare(curves_t, curves_j)
    out = {"steps": args.steps, "hw": [H, W], "blocks": list(BLOCKS),
           "stats": stats,
           "torch": curves_t, "ours": curves_j}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(stats, indent=1))
    worst = min(v["corr"] for v in stats.values()
                if np.isfinite(v["corr"]))
    print(f"worst finite corr: {worst:.3f}")


if __name__ == "__main__":
    main()
