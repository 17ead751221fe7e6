"""Matched-init convergence comparison: full new_multi S2D vs torch.

The strongest flagship validation: the torch oracle is the reference's OWN
networks (networks5_ds.py imported read-only from /root/reference/new_multi —
G_1, General_net, R_dep, _Discriminator), driven by a literal transcription
of model5.py's optimize_parameters (backward_G_2 :585-638, backward_G_1
:563-583, backward_R_D :479-560, backward_DISDEP :415-472, phase order
:640-697, per-net Adam LR ratios :248-275). Our side is the registered
`S2D` model's jitted train step with the SAME initialization transferred
through utils.torch_import (import_g1 / import_general_net / import_rdep /
import_sdiscriminator — each forward-parity-tested in tests/test_s2d.py).

Requires the full DenseNet-169 config (the reference R_dep hardcodes the
1664/1280/512-ch skip channels) and >=192 px per axis (the FD PatchGANs
emit zero-size outputs below that), so this runs as a tool, not a test:

    python -m tools.convergence_compare_s2d_full [--steps 12]

Writes convergence_results_s2d_full.json next to this file. Runs on CPU
(f32) for ~1e-4 numerics; the 77M-param compile takes several minutes.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_NM = "/root/reference/new_multi"
H, W = 192, 192
SKY = 17
LR, BETA1 = 2e-4, 0.5


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
            "depth_l_s": np.sign(g.randn(1, H, W, 4)).astype(np.float32),
        })
    return out


# ---------------------------------------------------------------------------
# torch oracle — reference networks + transcribed model5 phases
# ---------------------------------------------------------------------------

def run_torch(batches, steps, seed=7):
    import torch
    import torch.nn.functional as tF

    if REF_NM not in sys.path:
        sys.path.insert(0, REF_NM)
    import networks5_ds as ref

    torch.manual_seed(seed)
    G_1, G_2, R_D = ref.G_1(), ref.General_net(), ref.R_dep()
    FD1 = ref._Discriminator(input_nc=512)
    FD2 = ref._Discriminator(input_nc=256)
    FD3 = ref._Discriminator(input_nc=128)
    nets = dict(G_1=G_1, G_2=G_2, R_D=R_D, FD1=FD1, FD2=FD2, FD3=FD3)
    # model5.py:248-275 per-net Adam LR ratios
    ratio = dict(G_1=5, G_2=3, R_D=2, FD1=4, FD2=4, FD3=4)
    opts = {k: torch.optim.Adam(n.parameters(), LR / ratio[k],
                                betas=(BETA1, 0.999))
            for k, n in nets.items()}
    init_sds = {k: {kk: vv.clone() for kk, vv in n.state_dict().items()}
                for k, n in nets.items()}

    def rg(ns, flag):
        for n in ns:
            for p in n.parameters():
                p.requires_grad_(flag)

    def gan(pred, real):  # lsgan GANLoss (networks5_ds.py:926-943)
        t = torch.ones_like(pred) if real else torch.zeros_like(pred)
        return tF.mse_loss(pred, t)

    def ce(p, t):
        return tF.cross_entropy(p, t.long(), ignore_index=255)

    def bce_dep(pred, target, o_m, z_m):  # new_multi BCEDepLoss :947-956
        b1 = tF.binary_cross_entropy((pred + 1) / 2 * o_m,
                                     (target + 1) / 2 * o_m)
        b0 = tF.binary_cross_entropy((pred + 1) / 2 * z_m,
                                     (target + 1) / 2 * z_m)
        l1v = torch.mean(torch.abs(torch.broadcast_tensors(pred, target)[0]
                                   - target))
        return b1 + b0 + 50.0 * l1v

    hist = {k: [] for k in ("G2", "G1", "R_D_real", "dep_ref", "FD")}
    for step in range(steps):
        b = batches[step % len(batches)]
        syn_img = torch.from_numpy(b["img_syn"].transpose(0, 3, 1, 2))
        real_img = torch.from_numpy(b["img_real"].transpose(0, 3, 1, 2))
        syn_seg_l = torch.from_numpy(b["seg_l_syn"])
        real_seg_l = torch.from_numpy(b["seg_l_real"])
        syn_dep_l = torch.from_numpy(b["dep_l_syn"][..., 0])      # (1,H,W)
        syn_dep_ls = torch.from_numpy(
            b["depth_l_s"].transpose(0, 3, 1, 2))                 # (1,4,H,W)
        sky = (syn_seg_l != SKY).float()                          # (1,H,W)
        sky4 = sky.unsqueeze(1).repeat(1, 4, 1, 1)
        oms, zms = ref.get_masks(sky4 * syn_dep_ls)

        # ---- backward_G_2 (model5.py:585-638) ----
        rg(nets.values(), False)
        rg([G_2], True)
        opts["G_2"].zero_grad()
        ss = G_1(syn_img)
        f1, F = G_2(ss.detach(), "S")
        feats, seg, (dep_4, dep_o) = R_D(F, f1)
        d_syn = (tF.l1_loss(dep_o, sky * syn_dep_l) + ce(seg, syn_seg_l))
        syn_features1 = f1.detach()
        syn_Features = [f.detach() for f in F]
        f1r, Fr = G_2(real_img, "R")
        featsr, segr, _ = R_D(Fr, f1r)
        real_features1 = f1r.detach()
        real_Features = [f.detach() for f in Fr]
        loss_G2 = d_syn + 2 * ce(segr, real_seg_l)
        loss_G2.backward()
        opts["G_2"].step()

        # ---- backward_G_1 (model5.py:563-583) ----
        rg(nets.values(), False)
        rg([G_1], True)
        opts["G_1"].zero_grad()
        ss = G_1(syn_img)
        f1, F = G_2(ss, "S")
        _, s_seg, (_, s_dep_o) = R_D(F, f1)
        loss_G1 = tF.l1_loss(s_dep_o, syn_dep_l) + ce(s_seg, syn_seg_l)
        loss_G1.backward()
        opts["G_1"].step()

        # ---- backward_R_D real (model5.py:479-511) ----
        rg(nets.values(), False)
        rg([R_D], True)
        opts["R_D"].zero_grad()
        feats, seg, (dep_4, dep_o) = R_D(real_Features, real_features1)
        d_real = (ce(seg, real_seg_l)
                  + 0.2 * gan(FD1(feats[0]), False)
                  + 0.2 * gan(FD2(feats[1]), False)
                  + 0.2 * gan(FD3(feats[2]), False))
        d_real.backward()
        opts["R_D"].step()
        real_feats = [f.detach() for f in feats]

        # ---- backward_R_D syn (model5.py:513-560) ----
        opts["R_D"].zero_grad()
        feats, seg, (dep_4, dep_o) = R_D(syn_Features, syn_features1)
        dep_loss = tF.l1_loss(dep_o, sky * syn_dep_l)
        for s_Dep in dep_4:
            dep_loss = dep_loss + bce_dep(sky.unsqueeze(1) * s_Dep,
                                          sky4 * syn_dep_ls, oms, zms)
        d_syn_loss = dep_loss + ce(seg, syn_seg_l)
        d_syn_loss.backward()
        opts["R_D"].step()
        syn_feats = [f.detach() for f in feats]

        # ---- backward_DISDEP (model5.py:415-472) ----
        rg(nets.values(), False)
        fd_loss = 0.0
        for fd_name, i in (("FD1", 0), ("FD2", 1), ("FD3", 2)):
            fd = nets[fd_name]
            rg([fd], True)
            opts[fd_name].zero_grad()
            loss = (gan(fd(real_feats[i]), True)
                    + gan(fd(syn_feats[i]), False))
            loss.backward()
            opts[fd_name].step()
            fd_loss += float(loss)
            rg([fd], False)

        hist["G2"].append(float(loss_G2))
        hist["G1"].append(float(loss_G1))
        hist["R_D_real"].append(float(d_real))
        hist["dep_ref"].append(float(dep_loss))
        hist["FD"].append(fd_loss)
        print(f"torch step {step}: G2={float(loss_G2):.4f} "
              f"G1={float(loss_G1):.4f} RDr={float(d_real):.4f} "
              f"dep={float(dep_loss):.4f} FD={fd_loss:.4f}", flush=True)
    return hist, init_sds


# ---------------------------------------------------------------------------
# our side — jitted S2D train step, init imported from the torch nets
# ---------------------------------------------------------------------------

def run_ours(batches, steps, init_sds):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
    from cycle_depth_estimation_tpu.models import create_model
    from cycle_depth_estimation_tpu.utils.torch_import import (
        import_g1,
        import_general_net,
        import_rdep,
        import_sdiscriminator,
    )

    cfg = apply_model_defaults(Config(model="S2D", batch_size=1,
                                      lr=LR, beta1=BETA1))
    model = create_model(cfg)
    # already on the CPU platform — plain init, at the tool's resolution
    state = model.init_state(jax.random.key(0), hw=(H, W))

    def np_sd(sd):
        return {k: v.numpy() for k, v in sd.items()}

    imported = {
        "G_1": import_g1(np_sd(init_sds["G_1"])),
        "G_2": import_general_net(np_sd(init_sds["G_2"])),
        "R_D": import_rdep(np_sd(init_sds["R_D"])),
        "FD1": import_sdiscriminator(np_sd(init_sds["FD1"])),
        "FD2": import_sdiscriminator(np_sd(init_sds["FD2"])),
        "FD3": import_sdiscriminator(np_sd(init_sds["FD3"])),
    }
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for name, vs in imported.items():
        params[name] = jax.tree.map(jnp.asarray, vs["params"])
        stats[name] = jax.tree.map(jnp.asarray, vs.get("batch_stats", {}))
    # rebuild optimizer states on the imported params
    opt_states = {k: model.opts[k].init(params[k]) for k in model.opts}
    state = state.replace(params=params, batch_stats=stats,
                          opt_states=opt_states)

    hist = {k: [] for k in ("G2", "G1", "R_D_real", "dep_ref", "FD")}
    key_map = {"G2": "G2", "G1": "G1", "R_D_real": "R_D_real",
               "dep_ref": "dep_ref", "FD": "FD"}
    for step in range(steps):
        b = {k: jnp.asarray(v) for k, v in batches[step % len(batches)].items()}
        state, metrics = model.train_step(state, b, jax.random.key(step))
        for k, mk in key_map.items():
            hist[k].append(float(metrics[mk]))
        print(f"ours  step {step}: " + " ".join(
            f"{k}={hist[k][-1]:.4f}" for k in hist), flush=True)
    return hist


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "convergence_results_s2d_full.json"))
    args = ap.parse_args(argv)

    batches = make_batches(4)
    sink = io.StringIO()  # reference R_dep.forward prints every call
    with contextlib.redirect_stdout(sink):
        torch_hist, init_sds = run_torch(batches, args.steps)
    for line in sink.getvalue().splitlines():
        if "step" in line:
            print(line)
    ours_hist = run_ours(batches, args.steps, init_sds)

    result = {"steps": args.steps, "hw": [H, W], "curves": {}}
    print()
    for k in torch_hist:
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
