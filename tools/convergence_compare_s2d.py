"""S2D_base convergence-shape validation against a torch oracle.

Companion to tools/convergence_compare.py (CycleGAN): runs the base
my_seg_depth generation's round-robin training (reference
my_seg_depth/model2.py:288-401) in BOTH frameworks from the SAME initial
weights (transferred through `utils.torch_import`) on the same synthetic
SYNTHIA-like stream, and compares smoothed loss-curve shapes.

Faithful oracle details:
- G step: G_1 ← LSGAN(Dis_en(syn_feat), True); G_2 ← seg CE (syn + real)
  through the frozen Seg decoder (model2.py:322-338);
- Seg step: 5×real + syn weighted CE (model2.py:306-314); Dep step: L1
  (model2.py:316-321); D step: LSGAN real-vs-syn on the 64-ch features
  (model2.py:297-303);
- the reference's ``detach_list`` no-op bug (model2.py:281-284) leaks
  gradients into G_2 during the Seg/Dep steps, but they are zeroed before
  G_2's next update, so update semantics match our stop_gradient form;
- known BN-stat cadence divergence: the reference re-forwards G_2('S') in
  each of backward_G/backward_Seg/backward_Dep (3 stat updates per step);
  our jitted step computes the shared features once. Curves are compared as
  smoothed shapes, which tolerates this momentum difference.

CLI: ``python -m tools.convergence_compare_s2d [--steps N] [--out f.json]``.
Committed results: tools/convergence_results_s2d.json.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List

import numpy as np

from tools.convergence_compare import compare, smooth
from tools.torch_oracles import (
    build_torch_drop_discriminator,
    build_torch_g1_base,
    build_torch_general_net2,
    build_torch_dep2,
    build_torch_seg2,
)

N_CLS = 28


def make_batches(n_steps, batch, h, w, seed=0):
    """Synthetic SYNTHIA-like stream: smooth images, smooth quantized seg
    labels (with a few ignore pixels), smooth depth in [-1, 1]."""
    from cycle_depth_estimation_tpu.models.quantization import (
        synthetic_calibration_batch,
    )

    def field(s, n):
        a = synthetic_calibration_batch(s, n, max(h, w))[:, :h, :w, :]
        return a

    rng = np.random.RandomState(seed)
    out = []
    for i in range(n_steps):
        syn = field(seed * 91 + 4 * i, batch)
        real = field(seed * 91 + 4 * i + 1, batch)
        lab_src = field(seed * 91 + 4 * i + 2, batch)
        seg_syn = np.clip(((lab_src[..., 0] + 1) / 2 * N_CLS), 0,
                          N_CLS - 1).astype(np.int64)
        seg_real = np.clip(((lab_src[..., 1] + 1) / 2 * N_CLS), 0,
                           N_CLS - 1).astype(np.int64)
        # sprinkle ignore pixels like unlabeled regions
        mask = rng.rand(*seg_real.shape) < 0.02
        seg_real = np.where(mask, 255, seg_real)
        dep = lab_src[..., 2:3].astype(np.float32)
        out.append(dict(img_syn=syn, img_real=real, seg_l_syn=seg_syn,
                        seg_l_real=seg_real, dep_l_syn=dep))
    return out


# ---------------------------------------------------------------------------
# torch oracle loop (model2.py:288-401)
# ---------------------------------------------------------------------------


def reference_init_weights(net, gain=0.02, seed=0):
    """networks2.py:250-271 init_net semantics (normal 0.02; BN N(1, 0.02))."""
    import torch
    from torch.nn import init

    torch.manual_seed(seed)
    for m in net.modules():
        cls = m.__class__.__name__
        if hasattr(m, "weight") and ("Conv" in cls or "Linear" in cls):
            init.normal_(m.weight.data, 0.0, gain)
            if getattr(m, "bias", None) is not None:
                init.constant_(m.bias.data, 0.0)
        elif "BatchNorm2d" in cls:
            init.normal_(m.weight.data, 1.0, gain)
            init.constant_(m.bias.data, 0.0)


def run_torch(batches, block_config=(2, 2, 2, 2), g1_blocks=1, ndf=64,
              lr=2e-4, beta1=0.5, seed=0):
    import torch
    import torch.nn as tnn

    torch.manual_seed(seed)
    G_1 = build_torch_g1_base(n_blocks=g1_blocks)
    G_2, _ = build_torch_general_net2(block_config)
    # trunk skip widths for the decoders (stem + 4 dense blocks)
    nf, skips = 64, [64]
    for i, n in enumerate(block_config):
        nf += 32 * n
        skips.append(nf)
        if i != len(block_config) - 1:
            nf //= 2
    Seg = build_torch_seg2(skips)
    Dep = build_torch_dep2(skips)
    Dis = build_torch_drop_discriminator(conv_dim=ndf)
    for i, net in enumerate((Seg, Dep, Dis)):  # model2 init_nets these three
        reference_init_weights(net, seed=seed + i)
    init_sds = {name: {k: v.detach().clone() for k, v in
                       net.state_dict().items()}
                for name, net in (("G_1", G_1), ("G_2", G_2), ("Seg", Seg),
                                  ("Dep", Dep), ("Dis", Dis))}

    opts = {
        "G_1": torch.optim.Adam(G_1.parameters(), lr=lr, betas=(beta1, 0.999)),
        "G_2": torch.optim.Adam(G_2.parameters(), lr=lr, betas=(beta1, 0.999)),
        "Seg": torch.optim.Adam(Seg.parameters(), lr=lr, betas=(beta1, 0.999)),
        "Dep": torch.optim.Adam(Dep.parameters(), lr=lr, betas=(beta1, 0.999)),
        "D": torch.optim.Adam(Dis.parameters(), lr=lr, betas=(beta1, 0.999)),
    }
    from cycle_depth_estimation_tpu.models.s2d_networks import (
        CLASS_WEIGHTS_28,
    )

    ce = tnn.CrossEntropyLoss(weight=torch.tensor(CLASS_WEIGHTS_28),
                              ignore_index=255)
    mse = tnn.MSELoss()
    l1 = tnn.L1Loss()

    def gan(pred, real):
        return mse(pred, torch.full_like(pred, 1.0 if real else 0.0))

    curves: Dict[str, List[float]] = {}
    for b in batches:
        syn_img = torch.from_numpy(b["img_syn"].transpose(0, 3, 1, 2))
        real_img = torch.from_numpy(b["img_real"].transpose(0, 3, 1, 2))
        seg_l_syn = torch.from_numpy(b["seg_l_syn"])
        seg_l_real = torch.from_numpy(b["seg_l_real"])
        dep_l_syn = torch.from_numpy(b["dep_l_syn"][..., 0])

        # ---- forward (model2.py:293-299) ----
        syn_f1 = G_1.fwd(syn_img)
        real_f2, real_inf = G_2.fwd(real_img, "R")
        real_feat64 = real_f2[0].detach()

        # ---- G step (backward_G, :322-338) ----
        for o in (opts["G_1"], opts["G_2"]):
            o.zero_grad()
        pre_s = Dis.fwd(syn_f1)
        loss_G1 = gan(pre_s, True)
        syn_f2, syn_inf = G_2.fwd(syn_f1.detach(), "S")
        real_f2b, real_infb = G_2.fwd(real_img, "R")
        seg_syn_pre = Seg.fwd(syn_f2, syn_inf)
        seg_real_pre = Seg.fwd(real_f2b, real_infb)
        loss_G2 = ce(seg_syn_pre, seg_l_syn) + ce(seg_real_pre, seg_l_real)
        loss_G1.backward()
        loss_G2.backward()
        opts["G_1"].step()
        opts["G_2"].step()

        # ---- Seg step (:306-314) ----
        opts["Seg"].zero_grad()
        syn_f2, syn_inf = G_2.fwd(syn_f1.detach(), "S")
        syn_f2 = [f.detach() for f in syn_f2]
        seg_syn_pre2 = Seg.fwd(syn_f2, syn_inf.detach())
        seg_real_pre2 = Seg.fwd([f.detach() for f in real_f2],
                                real_inf.detach())
        loss_seg_syn = ce(seg_syn_pre2, seg_l_syn)
        loss_seg_real = ce(seg_real_pre2, seg_l_real)
        (5 * loss_seg_real + loss_seg_syn).backward()
        opts["Seg"].step()

        # ---- Dep step (:316-321) ----
        opts["Dep"].zero_grad()
        syn_f2, syn_inf = G_2.fwd(syn_f1.detach(), "S")
        syn_f2 = [f.detach() for f in syn_f2]
        dep_pre = Dep.fwd(syn_f2, syn_inf.detach())
        loss_dep = l1(dep_pre, dep_l_syn)
        loss_dep.backward()
        opts["Dep"].step()

        # ---- D step (:297-303) ----
        opts["D"].zero_grad()
        loss_D_syn = gan(Dis.fwd(syn_f1.detach()), False)
        loss_D_real = gan(Dis.fwd(real_feat64), True)
        (loss_D_syn + loss_D_real).backward()
        opts["D"].step()

        for k, v in (("G1_dis", loss_G1), ("seg_syn", loss_seg_syn),
                     ("seg_real", loss_seg_real), ("dep_syn", loss_dep),
                     ("D_syn", loss_D_syn), ("D_real", loss_D_real)):
            curves.setdefault(k, []).append(float(v))
    return curves, init_sds


# ---------------------------------------------------------------------------
# our side
# ---------------------------------------------------------------------------


def run_ours(batches, init_sds, block_config=(2, 2, 2, 2), g1_blocks=1,
             ndf=64, seed=0, force_cpu=False):
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
    from cycle_depth_estimation_tpu.models import create_model
    from cycle_depth_estimation_tpu.utils.torch_import import (
        import_dep2,
        import_drop_discriminator,
        import_g1_base,
        import_general_net2,
        import_seg2,
    )

    h, w = batches[0]["img_syn"].shape[1:3]
    cfg = apply_model_defaults(Config(
        model="S2D_base", batch_size=batches[0]["img_syn"].shape[0], ndf=ndf,
        dense_block_config=list(block_config), g1_blocks=g1_blocks))
    model = create_model(cfg)
    state = model.init_state_at(jax.random.key(seed), h, w)

    def np_sd(sd):
        return {k: v.numpy() for k, v in sd.items()}

    imported = {
        "G_1": import_g1_base(np_sd(init_sds["G_1"]), n_blocks=g1_blocks),
        "G_2": import_general_net2(np_sd(init_sds["G_2"]), block_config),
        "Seg_de": import_seg2(np_sd(init_sds["Seg"])),
        "Dep_de": import_dep2(np_sd(init_sds["Dep"])),
        "Dis_en": import_drop_discriminator(np_sd(init_sds["Dis"])),
    }
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for name, tree in imported.items():
        params[name] = jax.tree.map(jnp.asarray, tree["params"])
        if tree.get("batch_stats"):
            stats[name] = jax.tree.map(jnp.asarray, tree["batch_stats"])
    opt_states = {"G_1": model.opts["G_1"].init(params["G_1"]),
                  "G_2": model.opts["G_2"].init(params["G_2"]),
                  "Seg": model.opts["Seg"].init(params["Seg_de"]),
                  "Dep": model.opts["Dep"].init(params["Dep_de"]),
                  "D": model.opts["D"].init(params["Dis_en"])}
    state = state.replace(params=params, batch_stats=stats,
                          opt_states=opt_states)

    rng = jax.random.key(seed + 1)
    curves: Dict[str, List[float]] = {}
    for b in batches:
        rng, k = jax.random.split(rng)
        batch = {"img_syn": jnp.asarray(b["img_syn"]),
                 "img_real": jnp.asarray(b["img_real"]),
                 "seg_l_syn": jnp.asarray(b["seg_l_syn"], jnp.int32),
                 "seg_l_real": jnp.asarray(b["seg_l_real"], jnp.int32),
                 "dep_l_syn": jnp.asarray(b["dep_l_syn"])}
        state, metrics = model.train_step(state, batch, k)
        for name, v in metrics.items():
            curves.setdefault(name, []).append(float(v))
    return curves


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--size", type=int, default=64, help="image height (w=1.5h)")
    ap.add_argument("--out", default="tools/convergence_results_s2d.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    h, w = args.size, args.size // 2 * 3
    batches = make_batches(args.steps, 1, h, w)
    curves_t, init_sds = run_torch(batches)
    curves_j = run_ours(batches, init_sds, force_cpu=args.cpu)
    report = compare(curves_t, curves_j)
    result = {"steps": args.steps, "size": [h, w], "comparison": report,
              "curves": {"torch": curves_t, "jax": curves_j}}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    for k, v in report.items():
        print(f"{k:9s} corr={v['corr']:+.3f} "
              f"torch {v['torch_first']:.3f}->{v['torch_last']:.3f}  "
              f"jax {v['jax_first']:.3f}->{v['jax_last']:.3f}  "
              f"gap {v['rel_final_gap']:.3f}")
    return result


if __name__ == "__main__":
    main()
