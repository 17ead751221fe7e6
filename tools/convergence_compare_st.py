"""Matched-init convergence comparison: semantic_trans_full vs torch.

Same oracle pattern as tools/convergence_compare_s2d_full.py, for the
trymulti/semantic_trans generation: the torch side is the reference's OWN
networks (semantic_trans/networks5_ds.py imported read-only — G_1,
General_net, SEG, DEP, R_dep, Discriminator2_seg, Discriminator) driven by
a literal transcription of that snapshot's optimize_parameters
(model5.py:700-790: G_1 → G_2 → Seg → Dep → R_D real/syn → Dis0_en →
DIS/Dis_160/Dis_320). Our side is the registered `semantic_trans_full`
model's jitted 7-phase train step with the SAME initialization transferred
through utils.torch_import (import_g1 / import_general_net /
import_seg_decoder / import_dep_decoder / import_rdep_st /
import_discriminator2_seg / import_star_discriminator — each
forward-parity-tested in tests/).

Needs the full DenseNet-169 config (RDepST hardcodes the 1664/1280/512/256
skip widths), so this runs as a tool, not a test:

    python -m tools.convergence_compare_st [--steps 12]

Writes convergence_results_st.json next to this file. Runs on CPU (f32);
the 77M-param compile takes several minutes.
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

REF = ("/root/reference/my_seg_depth/trymulti/semantic_trans/"
       "networks5_ds.py")
H = W = 96
LR, BETA1 = 2e-4, 0.5

KEYS = ("G1", "G2", "seg_real", "dep_syn", "R_D_real", "R_D_syn", "dep_ref",
        "D_real", "D_syn", "DEP_real", "DEP_syn")


def make_batches(n, seed=0):
    g = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        out.append({
            "img_syn": g.randn(1, H, W, 3).astype(np.float32) * 0.5,
            "img_real": g.randn(1, H, W, 3).astype(np.float32) * 0.5,
            "seg_l_syn": g.randint(0, 28, (1, H, W)).astype(np.int32),
            "seg_l_real": g.randint(0, 28, (1, H, W)).astype(np.int32),
            "dep_l_syn": (g.rand(1, H, W, 1) * 2 - 1).astype(np.float32),
            "seg_e_syn": (g.rand(1, H, W, 1) > 0.9).astype(np.float32),
            "seg_e_real": (g.rand(1, H, W, 1) > 0.9).astype(np.float32),
        })
    return out


# ---------------------------------------------------------------------------
# torch oracle — reference networks + transcribed model5 phases
# ---------------------------------------------------------------------------

def run_torch(batches, steps, seed=7):
    import torch
    import torch.nn.functional as tF

    torch.Tensor.cuda = lambda self, *a, **k: self  # ordimat/GANLoss .cuda()
    spec = importlib.util.spec_from_file_location("networks5_ds_st_cc", REF)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    torch.manual_seed(seed)
    nets = dict(
        G_1=ref.G_1(), G_2=ref.General_net(), Seg_de=ref.SEG(n_cls=28),
        Dep_de=ref.DEP(), R_D=ref.R_dep(),
        Dis0_en=ref.Discriminator2_seg(),
        DIS=ref.Discriminator(curr_dim=2, repeat_num=5),
        Dis_160=ref.Discriminator(curr_dim=1, repeat_num=4),
        Dis_320=ref.Discriminator(curr_dim=1, repeat_num=4))
    # model5.py:253-283: lr/2 everywhere, lr/4 for the depth discriminators
    ratio = dict(G_1=2, G_2=2, Seg_de=2, Dep_de=2, R_D=2, Dis0_en=2,
                 DIS=4, Dis_160=4, Dis_320=4)
    opts = {k: torch.optim.Adam(n.parameters(), LR / ratio[k],
                                betas=(BETA1, 0.999))
            for k, n in nets.items()}
    init_sds = {k: {kk: vv.clone() for kk, vv in n.state_dict().items()}
                for k, n in nets.items()}

    def gan(pred, real):
        t = torch.ones_like(pred) if real else torch.zeros_like(pred)
        return tF.mse_loss(pred, t)

    def ce(p, t):
        return tF.cross_entropy(p, t.long(), ignore_index=255)

    hist = {k: [] for k in KEYS}
    for step in range(steps):
        b = batches[step % len(batches)]
        syn_img = torch.from_numpy(b["img_syn"].transpose(0, 3, 1, 2))
        real_img = torch.from_numpy(b["img_real"].transpose(0, 3, 1, 2))
        syn_seg_l = torch.from_numpy(b["seg_l_syn"])
        real_seg_l = torch.from_numpy(b["seg_l_real"])
        syn_dep_l = torch.from_numpy(b["dep_l_syn"][..., 0])
        syn_le = torch.from_numpy(b["seg_e_syn"][..., 0])
        real_le = torch.from_numpy(b["seg_e_real"][..., 0])

        def rg(names, flag):
            for n in names:
                for p in nets[n].parameters():
                    p.requires_grad_(flag)

        # ---- backward_G_1 (model5.py:625-652) ----
        rg(nets, False)
        rg(["G_1"], True)
        opts["G_1"].zero_grad()
        h = nets["G_1"](syn_img)
        f1, _ = nets["G_2"](h, "S")
        seg_pre, f2 = nets["Seg_de"](f1)
        pre_s = nets["Dis0_en"](f2)
        loss_G1 = ce(seg_pre, syn_seg_l) + 3 * gan(pre_s, True)
        loss_G1.backward()
        opts["G_1"].step()

        # ---- backward_G_2 (model5.py:654-698) ----
        rg(nets, False)
        rg(["G_2"], True)
        opts["G_2"].zero_grad()
        ss = nets["G_1"](syn_img)
        rf1, rF = nets["G_2"](real_img, "R")
        seg_r, rf2 = nets["Seg_de"](rf1)
        loss_seg = ce(seg_r, real_seg_l)
        _ = nets["Dep_de"](rf2.detach())  # visual forward (BN stats)
        sf1, sF = nets["G_2"](ss.detach(), "S")
        seg_s, sf2 = nets["Seg_de"](sf1)
        pre_s = nets["Dis0_en"](sf2)
        loss_G2 = loss_seg + ce(seg_s, syn_seg_l) + 5 * gan(pre_s, True)
        loss_G2.backward()
        opts["G_2"].step()
        syn_f1, syn_F = sf1.detach(), [f.detach() for f in sF]
        real_f1, real_F = rf1.detach(), [f.detach() for f in rF]

        # ---- backward_Seg (model5.py:449-477) ----
        rg(nets, False)
        rg(["Seg_de"], True)
        opts["Seg_de"].zero_grad()
        seg_s, f2s = nets["Seg_de"](syn_f1)
        seg_r, _ = nets["Seg_de"](real_f1)
        loss_seg_real = ce(seg_r, real_seg_l)
        pre_s = nets["Dis0_en"](f2s.detach())
        (loss_seg_real + gan(pre_s, True)).backward()
        opts["Seg_de"].step()

        # ---- backward_Dep (model5.py:617-623) ----
        rg(nets, False)
        rg(["Dep_de"], True)
        opts["Dep_de"].zero_grad()
        dep_s = nets["Dep_de"](syn_f1)
        loss_dep = tF.l1_loss(dep_s, syn_dep_l.unsqueeze(1))
        loss_dep.backward()
        opts["Dep_de"].step()

        # ---- backward_R_D real (model5.py:540-559) ----
        rg(nets, False)
        rg(["R_D"], True)
        opts["R_D"].zero_grad()
        with contextlib.redirect_stdout(io.StringIO()):
            r_seds, r_segs, _ = nets["R_D"](real_F, real_f1)
        se = 0
        for sed in r_seds:
            se = se + se + tF.binary_cross_entropy(sed[:, 0], real_le)
        seg_loss = se + ce(r_segs[2], real_seg_l)
        up4 = torch.nn.UpsamplingBilinear2d(scale_factor=0.25)
        up2 = torch.nn.UpsamplingBilinear2d(scale_factor=0.5)
        real_160 = up4(r_seds[0][:, 1].unsqueeze(1))
        real_320 = up2(r_seds[1][:, 1].unsqueeze(1))
        loss_rd_real = (se + seg_loss
                        + 0.2 * gan(nets["Dis_160"](real_160), False)
                        + gan(nets["Dis_320"](real_320), False))
        loss_rd_real.backward()
        opts["R_D"].step()
        real_dep_ref = r_seds[2][:, 1].unsqueeze(1).detach()
        real_160, real_320 = real_160.detach(), real_320.detach()

        # ---- backward_R_D syn (model5.py:560-608) ----
        opts["R_D"].zero_grad()
        with contextlib.redirect_stdout(io.StringIO()):
            s_seds, s_segs, _ = nets["R_D"](syn_F, syn_f1)
        s_se = sum(tF.binary_cross_entropy(sed[:, 0], syn_le)
                   for sed in s_seds)
        s_seg = sum(ce(seg, syn_seg_l) for seg in s_segs)
        loss_dep_ref = tF.l1_loss(s_seds[2][:, 1], syn_dep_l)
        loss_rd_syn = 10 * loss_dep_ref + s_se + s_seg
        loss_rd_syn.backward()
        opts["R_D"].step()
        syn_dep_ref = s_seds[2][:, 1].unsqueeze(1).detach()
        syn_160 = up4(s_seds[0][:, 1].unsqueeze(1)).detach()
        syn_320 = up2(s_seds[1][:, 1].unsqueeze(1)).detach()

        # ---- backward_D (model5.py:510-538) ----
        rg(nets, False)
        rg(["Dis0_en"], True)
        opts["Dis0_en"].zero_grad()
        s_f = nets["G_1"](syn_img)
        f1_d, _ = nets["G_2"](s_f, "S")
        f2_d = nets["Seg_de"](f1_d)[1].detach()
        pre_s = nets["Dis0_en"](f2_d)
        rf1_d = nets["G_2"](real_img, "R")[0].detach()
        pre_r = nets["Dis0_en"](nets["Seg_de"](rf1_d)[1].detach())
        l_syn, l_real = gan(pre_s, False), gan(pre_r, True)
        (l_real + l_syn).backward()
        opts["Dis0_en"].step()

        # ---- backward_DISDEP (model5.py:480-508) ----
        rg(nets, False)
        rg(["DIS"], True)
        opts["DIS"].zero_grad()
        rp = torch.cat([real_dep_ref, real_seg_l.unsqueeze(1).float()], 1)
        sp = torch.cat([syn_dep_ref, syn_seg_l.unsqueeze(1).float()], 1)
        D_real, D_fake = nets["DIS"](rp), nets["DIS"](sp)
        dep_real, dep_syn = gan(D_real, True), gan(D_fake, False)
        (dep_real + gan(D_fake, False)).backward()
        opts["DIS"].step()
        for name, r, f in (("Dis_160", real_160, syn_160),
                           ("Dis_320", real_320, syn_320)):
            rg([name], True)
            opts[name].zero_grad()
            (gan(nets[name](r), True) + gan(nets[name](f), False)).backward()
            torch.nn.utils.clip_grad_norm_(nets[name].parameters(),
                                           max_norm=1.0)
            opts[name].step()
            rg([name], False)

        vals = dict(G1=loss_G1, G2=loss_G2, seg_real=loss_seg_real,
                    dep_syn=loss_dep, R_D_real=loss_rd_real,
                    R_D_syn=loss_rd_syn, dep_ref=loss_dep_ref,
                    D_real=l_real, D_syn=l_syn, DEP_real=dep_real,
                    DEP_syn=dep_syn)
        for k in KEYS:
            hist[k].append(float(vals[k]))
        print("torch step", step, " ".join(
            f"{k}={hist[k][-1]:.4f}" for k in ("G1", "G2", "R_D_syn",
                                               "dep_ref")), flush=True)
    return hist, init_sds


# ---------------------------------------------------------------------------
# our side — jitted semantic_trans_full step, init imported from torch
# ---------------------------------------------------------------------------

def run_ours(batches, steps, init_sds):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
    from cycle_depth_estimation_tpu.models import create_model
    from cycle_depth_estimation_tpu.utils.torch_import import (
        import_dep_decoder,
        import_discriminator2_seg,
        import_g1,
        import_general_net,
        import_rdep_st,
        import_seg_decoder,
        import_star_discriminator,
    )

    cfg = apply_model_defaults(Config(model="semantic_trans_full",
                                      batch_size=1, lr=LR, beta1=BETA1))
    model = create_model(cfg)
    state = model.init_state(jax.random.key(0), hw=(H, W))

    def np_sd(sd):
        return {k: v.numpy() for k, v in sd.items()}

    imported = {
        "G_1": import_g1(np_sd(init_sds["G_1"])),
        "G_2": import_general_net(np_sd(init_sds["G_2"])),
        "Seg_de": import_seg_decoder(np_sd(init_sds["Seg_de"])),
        "Dep_de": import_dep_decoder(np_sd(init_sds["Dep_de"])),
        "R_D": import_rdep_st(np_sd(init_sds["R_D"])),
        "Dis0_en": import_discriminator2_seg(np_sd(init_sds["Dis0_en"])),
        "DIS": import_star_discriminator(np_sd(init_sds["DIS"]),
                                         repeat_num=5),
        "Dis_160": import_star_discriminator(np_sd(init_sds["Dis_160"]),
                                             repeat_num=4),
        "Dis_320": import_star_discriminator(np_sd(init_sds["Dis_320"]),
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

    hist = {k: [] for k in KEYS}
    for step in range(steps):
        b = {k: jnp.asarray(v) for k, v in batches[step % len(batches)].items()}
        state, metrics = model.train_step(state, b, jax.random.key(step))
        for k in KEYS:
            hist[k].append(float(metrics[k]))
        print("ours  step", step, " ".join(
            f"{k}={hist[k][-1]:.4f}" for k in ("G1", "G2", "R_D_syn",
                                               "dep_ref")), flush=True)
    return hist


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "convergence_results_st.json"))
    args = ap.parse_args(argv)

    batches = make_batches(4)
    torch_hist, init_sds = run_torch(batches, args.steps)
    ours_hist = run_ours(batches, args.steps, init_sds)

    result = {"steps": args.steps, "hw": [H, W], "curves": {}}
    print()
    for k in KEYS:
        t = np.asarray(torch_hist[k])
        o = np.asarray(ours_hist[k])
        corr = float(np.corrcoef(t, o)[0, 1]) if len(t) > 1 else float("nan")
        gap0 = float(abs(t[0] - o[0]))
        result["curves"][k] = {"torch": t.tolist(), "ours": o.tolist(),
                               "corr": corr, "step0_gap": gap0}
        print(f"{k:9s} corr={corr:+.3f} step0 torch={t[0]:.4f} "
              f"ours={o[0]:.4f} gap={gap0:.4f}  "
              f"final torch={t[-1]:.4f} ours={o[-1]:.4f}")
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
