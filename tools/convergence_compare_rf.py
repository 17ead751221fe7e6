"""Matched-init convergence comparison: rf_lw (new_model/mdoel6) vs torch.

Third-family convergence validation (after tools/convergence_compare.py
CycleGAN and convergence_compare_s2d.py S2D_base): build the reference
RefineNet-LW seg/depth game in torch (trunk + 4 segd heads, G step with
frozen heads + per-head fake-class DIS steps, per-net LR ratios — reference
new_model/mdoel6.py:209-222,365-541), import its exact initialization into
our jitted `rf_lw` model (utils.torch_import), train BOTH on identical
synthetic batches, and compare the loss trajectories.

Run:  python tools/convergence_compare_rf.py [--steps 80]
Writes convergence_results_rf.json + convergence_curves_rf.png next to this
file.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LAYERS = (1, 1, 1, 1)
H, W = 64, 96
N_CLS = 28
SKY = 17


# ---------------------------------------------------------------------------
# synthetic try-style batches (identical for both frameworks, NHWC float32)
# ---------------------------------------------------------------------------

def make_batches(n_batches: int, batch: int, seed: int = 0):
    from cycle_depth_estimation_tpu.data.preprocess import depth_bands

    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(n_batches):
        raw_dep = rng.uniform(0, 9000, (batch, H, W)).astype(np.float32)
        full = np.stack([depth_bands(d, train=True)[0] for d in raw_dep])
        bands = np.stack([depth_bands(d, train=True)[1] for d in raw_dep])
        seg_syn = rng.randint(0, N_CLS, (batch, H, W)).astype(np.int32)
        seg_syn[:, :H // 4] = SKY  # a sky region so the mask is nontrivial
        batches.append({
            "img_syn": rng.uniform(-1, 1, (batch, H, W, 3)).astype(np.float32),
            "img_real": rng.uniform(-1, 1, (batch, H, W, 3)).astype(np.float32),
            "seg_l_syn": seg_syn,
            "seg_l_real": rng.randint(0, N_CLS, (batch, H, W)).astype(np.int32),
            "dep_l_syn": full,
            "depth_l_s": bands,
        })
    return batches


# ---------------------------------------------------------------------------
# torch oracle (reference semantics, NCHW)
# ---------------------------------------------------------------------------

def run_torch(batches, steps, lr, beta1, seed=7):
    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_rf_import import TResNetLW  # validated forward-parity oracle

    class TDeconvBlock(tnn.Module):
        # reference DeconvBlock: bn constructed but unused (my_rf_lw.py)
        def __init__(self, i, o):
            super().__init__()
            self.deconv = tnn.ConvTranspose2d(i, o, 4, 2, 1)
            self.bn = tnn.BatchNorm2d(o)
            self.relu = tnn.LeakyReLU(0.02)

        def forward(self, x):
            return self.deconv(self.relu(x))

    class TSegd(tnn.Module):
        def __init__(self, cin, up_scale):
            super().__init__()
            mods, c = [], cin
            for _ in range(up_scale):
                mods.append(TDeconvBlock(c, c // 2))
                c //= 2
            mods.append(tnn.Conv2d(c, N_CLS + 1, 1))
            for m in mods:
                for p in m.modules():
                    if isinstance(p, (tnn.Conv2d, tnn.ConvTranspose2d)):
                        tnn.init.normal_(p.weight, 0, 0.02)
                        if p.bias is not None:
                            tnn.init.zeros_(p.bias)
            self.Up = tnn.ModuleList(mods)

        def forward(self, x):
            for m in self.Up:
                x = m(x)
            return x

    torch.manual_seed(seed)
    G = TResNetLW(LAYERS)
    heads = {"seg8": TSegd(512, 3), "seg4": TSegd(256, 2),
             "seg2": TSegd(256, 1), "seg2_0": TSegd(256, 1)}
    head_lr = {"seg8": lr / 3, "seg4": lr / 2, "seg2": lr / 2, "seg2_0": lr / 2}
    g_opt = torch.optim.Adam(G.parameters(), lr / 4, betas=(beta1, 0.999))
    h_opts = {k: torch.optim.Adam(h.parameters(), head_lr[k],
                                  betas=(beta1, 0.999))
              for k, h in heads.items()}

    init_sds = {"G": {k: v.clone() for k, v in G.state_dict().items()}}
    for k, h in heads.items():
        init_sds[k] = {kk: vv.clone() for kk, vv in h.state_dict().items()}

    def up2(t):
        return tF.interpolate(t, scale_factor=2, mode="nearest")

    def ce(logits, labels, target_is_real):
        tgt = labels if target_is_real else torch.full_like(labels, N_CLS)
        return tF.cross_entropy(logits, tgt, ignore_index=255)

    def bce_dep(pred, target, o_m, z_m):
        # mdoel6 trains with the TRUNCATED semantic_trans BCEDepLoss
        # (single o_m term, semantic_trans/networks5_ds.py:849-852)
        del z_m
        return tF.binary_cross_entropy((pred + 1) / 2 * o_m,
                                       (target + 1) / 2 * o_m)

    hist = {k: [] for k in ("G", "dep_syn", "adv_d")}
    for step in range(steps):
        b = batches[step % len(batches)]
        t = {k: torch.from_numpy(np.ascontiguousarray(
                v.transpose(0, 3, 1, 2))) if v.ndim == 4
             else torch.from_numpy(v).long()
             for k, v in b.items()}
        sky = (t["seg_l_syn"] != SKY).float().unsqueeze(1)
        sky4 = sky.repeat(1, 4, 1, 1)
        masked = sky4 * t["depth_l_s"]
        o_m, z_m = (masked == 1.0).float(), (masked == -1.0).float()

        # ---- G step (heads frozen/eval) ----
        G.train()
        for h in heads.values():
            h.eval()
        g_opt.zero_grad()
        r_outs, r_pred, r_feats = G(t["img_real"], "real")
        g_real = sum(ce(up2(heads[k](r_feats[i])), t["seg_l_real"], True)
                     for i, k in enumerate(("seg8", "seg4", "seg2", "seg2_0")))
        s_outs, s_pred, s_feats = G(t["img_syn"], "real")
        g_syn = sum(ce(up2(heads[k](s_feats[i])), t["seg_l_syn"], True)
                    for i, k in enumerate(("seg8", "seg4", "seg2", "seg2_0")))
        dep = 20.0 * tF.l1_loss(sky * up2(s_pred), sky * t["dep_l_syn"])
        for band in s_outs:
            dep = dep + bce_dep(sky * up2(band), masked, o_m, z_m)
        loss_g = g_real + g_syn + dep
        loss_g.backward()
        g_opt.step()

        # ---- DIS steps (per head, fake class, detached feats) ----
        adv_d = 0.0
        r_det = [f.detach() for f in r_feats]
        s_det = [f.detach() for f in s_feats]
        for i, k in enumerate(("seg8", "seg4", "seg2", "seg2_0")):
            heads[k].train()
            h_opts[k].zero_grad()
            l = (ce(up2(heads[k](r_det[i])), t["seg_l_real"], False)
                 + ce(up2(heads[k](s_det[i])), t["seg_l_syn"], False))
            l.backward()
            h_opts[k].step()
            adv_d += float(l.detach())
        hist["G"].append(float(loss_g.detach()))
        hist["dep_syn"].append(float(dep.detach()))
        hist["adv_d"].append(adv_d)
    return hist, init_sds


# ---------------------------------------------------------------------------
# ours (jit, NHWC), matched init via the validated importers
# ---------------------------------------------------------------------------

def run_ours(batches, steps, init_sds):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
    from cycle_depth_estimation_tpu.models import create_model
    from cycle_depth_estimation_tpu.utils.torch_import import (
        import_resnetlw, import_segd)

    cfg = apply_model_defaults(Config(model="rf_lw", fine_size=H,
                                      batch_size=len(batches[0]["img_syn"]),
                                      resnet_layers=list(LAYERS)))
    model = create_model(cfg)
    state = model.init_state_at(jax.random.key(0), H, W)
    params = dict(state.params)
    stats = dict(state.batch_stats)
    vg = import_resnetlw({k: v.numpy() for k, v in init_sds["G"].items()},
                         layers=LAYERS)
    params["G"], stats["G"] = (jax.tree.map(jnp.asarray, vg["params"]),
                               jax.tree.map(jnp.asarray,
                                            vg.get("batch_stats", {})))
    for name, scale in (("seg8", 3), ("seg4", 2), ("seg2", 1), ("seg2_0", 1)):
        vh = import_segd({k: v.numpy() for k, v in init_sds[name].items()},
                         up_scale=scale)
        params[name] = jax.tree.map(jnp.asarray, vh["params"])
        stats[name] = jax.tree.map(jnp.asarray, vh.get("batch_stats", {}))
    state = state.replace(params=params, batch_stats=stats)

    hist = {k: [] for k in ("G", "dep_syn", "adv_d")}
    rng = jax.random.key(1)
    for step in range(steps):
        b = {k: jnp.asarray(v) for k, v in batches[step % len(batches)].items()}
        rng, sub = jax.random.split(rng)
        state, m = model.train_step(state, b, sub)
        hist["G"].append(float(m["G"]))
        hist["dep_syn"].append(float(m["dep_syn"]))
        hist["adv_d"].append(float(m["adv_d_seg_syn"]) +
                             float(m["adv_d_seg_real"]))
    return hist


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=80)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--n-batches", type=int, default=8)
    args = p.parse_args(argv)

    batches = make_batches(args.n_batches, args.batch)
    from cycle_depth_estimation_tpu.config import Config
    lr, beta1 = Config().lr, Config().beta1
    print(f"torch oracle: {args.steps} steps (lr={lr}, beta1={beta1})")
    th_hist, init_sds = run_torch(batches, args.steps, lr, beta1)
    print("ours (matched init, jitted):")
    our_hist = run_ours(batches, args.steps, init_sds)

    report = {}
    for k in th_hist:
        a, b = np.asarray(th_hist[k]), np.asarray(our_hist[k])
        corr = float(np.corrcoef(a, b)[0, 1]) if a.std() > 0 else 1.0
        report[k] = {
            "torch_first": round(float(a[0]), 4),
            "ours_first": round(float(b[0]), 4),
            "torch_last": round(float(a[-1]), 4),
            "ours_last": round(float(b[-1]), 4),
            "corr": round(corr, 4),
            "first_step_rel_diff": round(
                float(abs(a[0] - b[0]) / (abs(a[0]) + 1e-9)), 5),
        }
        print(f"  {k:8s} corr={corr:.4f}  torch {a[0]:.3f}->{a[-1]:.3f}  "
              f"ours {b[0]:.3f}->{b[-1]:.3f}")

    out = {"steps": args.steps, "batch": args.batch, "layers": LAYERS,
           "hw": [H, W], "losses": report,
           "torch": {k: [round(float(x), 4) for x in v]
                     for k, v in th_hist.items()},
           "ours": {k: [round(float(x), 4) for x in v]
                    for k, v in our_hist.items()}}
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "convergence_results_rf.json"), "w") as f:
        json.dump(out, f, indent=1)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 3, figsize=(13, 3.5))
        for ax, k in zip(axes, th_hist):
            ax.plot(th_hist[k], label="torch (reference semantics)")
            ax.plot(our_hist[k], "--", label="ours (jit, matched init)")
            ax.set_title(k)
            ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(os.path.join(here, "convergence_curves_rf.png"), dpi=110)
    except Exception as e:  # matplotlib optional
        print(f"(no plot: {e})")
    return out


if __name__ == "__main__":
    main()
