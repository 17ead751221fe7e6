"""S2D_alt convergence-shape validation against the reference's own nets.

Companion to tools/convergence_compare_s2d.py, for the base generation's
ALTERNATE Feature_net pipeline: the torch oracle is the reference's own
my_seg_depth/networks.py modules (G_1 ×2, Feature_net, SEG, DEP,
Discriminator) driven by a literal transcription of the Seg_Depth loop
embedded in my_seg_depth/train.py:348-409; our side is the registered
`S2D_alt` model's jitted 5-phase step, initialized from the same torch
state dicts via import_gbase / import_feature_net / import_skip_decoder_alt
/ import_drop_discriminator.

The D's Dropout2d is ACTIVE in training on both sides with independent
draws (like the S2D_base comparison), so curves are compared as smoothed
shapes (tools/convergence_compare.compare).

CLI: ``python -m tools.convergence_compare_alt [--steps N]``.
Committed results: tools/convergence_results_alt.json.
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

H, W = 64, 96
LR, LR_D, BETA1 = 2e-4, 8e-5, 0.5
KEYS = ("G1_dis", "G1_seg", "G2_dis", "G2_seg", "seg_syn", "seg_real",
        "dep_syn", "D_G1", "D_G2")


def run_torch(batches, seed=0):
    import torch
    import torch.nn.functional as tF

    spec = importlib.util.spec_from_file_location(
        "networks_base_alt_cc", "/root/reference/my_seg_depth/networks.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    torch.manual_seed(seed)
    nets = dict(G_1=ref.G_1(input_nc=3, out_nc=128),
                G_2=ref.G_1(input_nc=3, out_nc=128),
                Feature=ref.Feature_net(input_nc=128, mid_nc=1024),
                Seg_de=ref.SEG(n_cls=28), Dep_de=ref.DEP(),
                Dis_en=ref.Discriminator())
    for i, net in enumerate(nets.values()):  # train.py init_nets all six
        reference_init_weights(net, seed=seed + i)
    init_sds = {k: {kk: vv.detach().clone() for kk, vv in n.state_dict().items()}
                for k, n in nets.items()}
    opts = {k: torch.optim.Adam(n.parameters(),
                                LR_D if k == "Dis_en" else LR,
                                betas=(BETA1, 0.999))
            for k, n in nets.items()}

    def rg(names, flag):
        for n in names:
            for p in nets[n].parameters():
                p.requires_grad_(flag)

    def gan(pred, real):
        t = torch.ones_like(pred) if real else torch.zeros_like(pred)
        return tF.mse_loss(pred, t)

    def ce(p, t):
        return tF.cross_entropy(p, t.long(), ignore_index=255)

    curves = {k: [] for k in KEYS}
    for step, b in enumerate(batches):
        syn_img = torch.from_numpy(b["img_syn"].transpose(0, 3, 1, 2))
        real_img = torch.from_numpy(b["img_real"].transpose(0, 3, 1, 2))
        syn_seg_l = torch.from_numpy(b["seg_l_syn"])
        real_seg_l = torch.from_numpy(b["seg_l_real"])
        syn_dep_l = torch.from_numpy(b["dep_l_syn"][..., 0]).unsqueeze(1)

        # forward (train.py:287-293)
        rg(nets, True)
        rg(["Dis_en"], False)
        sf1 = nets["G_1"](syn_img)
        rf1 = nets["G_2"](real_img)

        # backward_G (train.py:326-345,354-366)
        opts["G_1"].zero_grad()
        opts["G_2"].zero_grad()
        ps = nets["Dis_en"](sf1)
        pr = nets["Dis_en"](rf1)
        g1_dis, g2_dis = gan(ps, True), gan(pr, False)
        sF, spsp = nets["Feature"](sf1)
        rF, rpsp = nets["Feature"](rf1)
        g1_seg = ce(nets["Seg_de"](list(sF), spsp), syn_seg_l)
        g2_seg = ce(nets["Seg_de"](list(rF), rpsp), real_seg_l)
        (g1_dis + g1_seg).backward(retain_graph=True)
        (g2_dis + g2_seg).backward()
        opts["G_1"].step()
        opts["G_2"].step()
        sf1, rf1 = sf1.detach(), rf1.detach()

        # Feature update (train.py:367-375: 5×Seg + Dep, fresh forwards);
        # the reference passes inf.detach() (:312-313,321) — the PSP path
        # is cut, Feature grads flow only via the skip features
        opts["Feature"].zero_grad()
        sF, spsp = nets["Feature"](sf1)
        rF, rpsp = nets["Feature"](rf1)
        loss_s = (ce(nets["Seg_de"](list(sF), spsp.detach()), syn_seg_l)
                  + ce(nets["Seg_de"](list(rF), rpsp.detach()), real_seg_l))
        sF2, spsp2 = nets["Feature"](sf1)
        loss_d = tF.l1_loss(nets["Dep_de"](list(sF2), spsp2.detach()),
                            syn_dep_l)
        (5 * loss_s + loss_d).backward()
        opts["Feature"].step()

        # Seg update (train.py:377-385)
        opts["Seg_de"].zero_grad()
        sF, spsp = nets["Feature"](sf1)
        rF, rpsp = nets["Feature"](rf1)
        seg_syn = ce(nets["Seg_de"]([f.detach() for f in sF], spsp.detach()),
                     syn_seg_l)
        seg_real = ce(nets["Seg_de"]([f.detach() for f in rF], rpsp.detach()),
                      real_seg_l)
        (seg_syn + seg_real).backward()
        opts["Seg_de"].step()

        # Dep update (train.py:387-396)
        opts["Dep_de"].zero_grad()
        sF, spsp = nets["Feature"](sf1)
        dep_syn = tF.l1_loss(
            nets["Dep_de"]([f.detach() for f in sF], spsp.detach()), syn_dep_l)
        dep_syn.backward()
        opts["Dep_de"].step()

        # D update (backward_D, train.py:297-302,398-409)
        rg(nets, False)
        rg(["Dis_en"], True)
        opts["Dis_en"].zero_grad()
        d_g1 = gan(nets["Dis_en"](sf1), False)
        d_g2 = gan(nets["Dis_en"](rf1), True)
        (d_g1 + d_g2).backward()
        opts["Dis_en"].step()

        vals = dict(G1_dis=g1_dis, G1_seg=g1_seg, G2_dis=g2_dis,
                    G2_seg=g2_seg, seg_syn=seg_syn, seg_real=seg_real,
                    dep_syn=dep_syn, D_G1=d_g1, D_G2=d_g2)
        for k in KEYS:
            curves[k].append(float(vals[k]))
        if step % 10 == 0:
            print(f"torch step {step}: " + " ".join(
                f"{k}={curves[k][-1]:.3f}" for k in ("G1_seg", "dep_syn",
                                                     "D_G1")), flush=True)
    return curves, init_sds


def run_ours(batches, init_sds):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
    from cycle_depth_estimation_tpu.models import create_model
    from cycle_depth_estimation_tpu.utils.torch_import import (
        import_drop_discriminator,
        import_feature_net,
        import_gbase,
        import_skip_decoder_alt,
    )

    cfg = apply_model_defaults(Config(model="S2D_alt", batch_size=1, lr=LR,
                                      lr_d=LR_D, beta1=BETA1))
    model = create_model(cfg)
    state = model.init_state(jax.random.key(0), hw=(H, W))

    def np_sd(sd):
        return {k: v.numpy() for k, v in sd.items()}

    imported = {
        "G_1": import_gbase(np_sd(init_sds["G_1"])),
        "G_2": import_gbase(np_sd(init_sds["G_2"])),
        "Feature": import_feature_net(np_sd(init_sds["Feature"])),
        "Seg_de": import_skip_decoder_alt(np_sd(init_sds["Seg_de"])),
        "Dep_de": import_skip_decoder_alt(np_sd(init_sds["Dep_de"])),
        "Dis_en": import_drop_discriminator(np_sd(init_sds["Dis_en"]),
                                            repeat_num=4),
    }
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for name, vs in imported.items():
        params[name] = jax.tree.map(jnp.asarray, vs["params"])
        stats[name] = jax.tree.map(jnp.asarray, vs.get("batch_stats", {}))
    opt_states = {k: model.opts[k].init(params[k]) for k in model.opts}
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
                f"{k}={curves[k][-1]:.3f}" for k in ("G1_seg", "dep_syn",
                                                     "D_G1")), flush=True)
    return curves


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "convergence_results_alt.json"))
    args = ap.parse_args(argv)

    batches = make_batches(args.steps, 1, H, W)
    torch_curves, init_sds = run_torch(batches)
    ours_curves = run_ours(batches, init_sds)
    result = compare(torch_curves, ours_curves)
    print()
    for k, v in result.items():
        print(f"{k:9s} corr={v['corr']:+.3f} "
              f"t0={v['torch_first']:.4f} o0={v['jax_first']:.4f} "
              f"tN={v['torch_last']:.4f} oN={v['jax_last']:.4f} "
              f"relgap={v['rel_final_gap']:.3f}")
    with open(args.out, "w") as f:
        json.dump({"steps": args.steps, "hw": [H, W], "curves": result}, f,
                  indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
