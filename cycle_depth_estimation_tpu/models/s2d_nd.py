"""new_depseg "model2" seg+depth model (`S2D_nd`).

TPU-native re-design of reference my_seg_depth/new_depseg/model2.py — the
WGAN-GP generation of the lineage (SURVEY row 34). (The deeperfeatures copy
of this file imports the WRONG networks2 — its SEG/DEP call sites crash on
that generation's signatures — so new_depseg/model2.py is the runnable
original; documented, not reproduced.)

- nets (model2.py:234-279): ``G_1``/``G_2`` = per-domain General_net trunks
  (raw 3-ch images, 1024-ch psp features), shared ``Seg_de`` = the
  single-return SEG ladder and ``Dep_de`` = the ordimat DEP WITH its tanh
  head (new_depseg/networks2.py:529-592 — plain-ReLU DeconvBlocks), and
  ``Dis_en`` = the 1024-ch 28-class ``Discriminator_seg``
  (networks2.py:462-494) critiquing the psp features directly;
- losses: plain CE(ignore=255), L1 depth, and **BCE** GAN terms on the
  D's LeakyReLU outputs (GANLoss hardcodes BCELoss, networks2.py:626-650)
  with the WGAN-GP gradient penalty (model2.py:319-338);
- six sub-updates in ONE jit step (model2.py:432-505) — the D is stepped
  TWICE per iteration, before G_1 and again after Dep, each time on fresh
  (updated-net) forwards with a fresh GP draw:
  1. Dis_en: BCE(syn psp → True) + BCE(real psp → False) + GP —
     INVERTED polarity vs the sibling generations (syn is the D's "real"
     class) — via SGD at lr/3 (model2.py:291-292);
  2. G_1: syn CE + syn depth L1 through the frozen decoders;
  3. G_2: real CE + BCE(D(real psp) → True) — pushing real features
     toward the D's syn class;
  4. Seg: 1.3× real CE (model2.py:382) on the cached pre-update features
     (the syn forward still runs — BN stats + visuals only);
  5. Dep: syn L1 (the real forward likewise runs for stats/visuals);
  6. Dis_en again (model2.py:496-505).
- Adam lr/2 for G_1/G_2/Seg/Dep (model2.py:281-290).

``--nd_4dis`` selects the snapshot's model3 variant (new_depseg/model3.py,
its "./checkpoints/4dis" run): the single SGD+GP ``Dis_en`` is replaced by
TWO ``Discriminator2_seg`` critics (256-ch 1×1 ladder, 28-ch sigmoid head,
new_depseg/networks2.py:496-527) over the first two 256-channel slices of
the 1024-ch psp features, each Adam-stepped at full lr with NO gradient
penalty and un-inverted targets (syn→False, real→True, model3.py:356-398);
G_2's adversarial term becomes ``cal_DisL(real_features1, False)`` —
pushing real features toward the D's FAKE class, a double inversion kept
as written (model3.py:484-489) — plus a 3× cross-domain ``real_dep_loss``
report (gradient-free: every input detached/frozen, model3.py:434-447,
492-505); the Dep phase drops its real-branch forward (it moves into the
G_2 phase, model3.py:450-457). The commented-out Dis2/Dis3 critics on the
upper two slices are documented, not invented.

BatchNorm batch-stats thread in the reference's eager forward order: per
step G_1 ×3, G_2 ×3, Seg ×4, Dep ×3. The reference warm-starts G_1/G_2/
Seg_de from prior-generation checkpoints (model2.py:243-279, absolute
paths); we initialize fresh and support warm-starting via the importers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from . import register_model
from ..config import Config
from .base_model import BaseModel, ModelState
from .networks import l1_loss
from .s2d import make_adam
from .s2d_networks import (
    DEP,
    Dis2SegDF,
    DiscriminatorSeg,
    GeneralNet2,
    SEG,
    bce_gan_loss,
    calc_gradient_penalty,
    real_dep_loss,
)
from .seg_network import cross_entropy_loss, seg_accuracy


@register_model("S2D_nd")
class S2DNDModel(BaseModel):
    loss_names = ("G_1", "G_2", "G2_dis", "seg_real", "dep_syn",
                  "D_syn", "D_real", "gp", "acc_syn", "acc_real")
    visual_names = ("syn_img", "real_img", "syn_seg_l", "real_seg_l",
                    "syn_seg_pre", "real_seg_pre", "syn_dep_l", "syn_dep_pre",
                    "real_dep_pre")
    model_names = ("G_1", "G_2", "Dis_en", "Seg_de", "Dep_de")
    lr_opt_names = ()

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        dt = cfg.compute_dtype()
        block_config = tuple(cfg.dense_block_config or (6, 12, 32, 32))
        self.net_G_1 = GeneralNet2(block_config=block_config, dtype=dt)
        self.net_G_2 = GeneralNet2(block_config=block_config, dtype=dt)
        # this generation's DeconvBlock is plain ReLU (networks2.py:30)
        self.net_Seg_de = SEG(n_cls=28, negative_slope=0.0, dtype=dt)
        self.net_Dep_de = DEP(tanh_head=True, negative_slope=0.0, dtype=dt)
        self.opts = {"G_1": make_adam(cfg.lr / 2.0, cfg.beta1),
                     "G_2": make_adam(cfg.lr / 2.0, cfg.beta1),
                     "Seg": make_adam(cfg.lr / 2.0, cfg.beta1),
                     "Dep": make_adam(cfg.lr / 2.0, cfg.beta1)}
        if cfg.nd_4dis:
            # model3 "4dis": twin 256-slice critics, Adam at full lr, no GP
            # (model3.py:237-240, 292-295)
            self.net_Dis0_en = Dis2SegDF(conv_dim=256, repeat_num=3,
                                         head_ch=28, dtype=dt)
            self.net_Dis1_en = Dis2SegDF(conv_dim=256, repeat_num=3,
                                         head_ch=28, dtype=dt)
            self.opts["D0"] = make_adam(cfg.lr, cfg.beta1)
            self.opts["D1"] = make_adam(cfg.lr, cfg.beta1)
            self.model_names = ("G_1", "G_2", "Dis0_en", "Dis1_en",
                                "Seg_de", "Dep_de")
            self.loss_names = ("G_1", "G_2", "G2_dis", "seg_real", "dep_syn",
                               "dep_real", "D_syn", "D_real", "acc_syn",
                               "acc_real")
        else:
            self.net_Dis_en = DiscriminatorSeg(conv_dim=1024, dtype=dt)
            self.opts["D"] = optax.sgd(cfg.lr / 3.0)

    def init_state(self, rng: jax.Array) -> ModelState:
        h, w = self.cfg.fine_size, self.cfg.fine_size * 3
        return self.init_state_at(rng, h, w)

    def init_state_at(self, rng: jax.Array, h: int, w: int) -> ModelState:
        keys = jax.random.split(rng, 6)
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        vG1 = self.net_G_1.init(keys[0], x, "R")
        _, psp = self.net_G_1.apply(vG1, x, "R")
        vG2 = self.net_G_2.init(keys[1], x, "R")
        vSeg = self.net_Seg_de.init(keys[2], psp)
        vDep = self.net_Dep_de.init(keys[3], psp)
        vs = dict(G_1=vG1, G_2=vG2, Seg_de=vSeg, Dep_de=vDep)
        if self.cfg.nd_4dis:
            vs["Dis0_en"] = self.net_Dis0_en.init(keys[4], psp[..., :256])
            vs["Dis1_en"] = self.net_Dis1_en.init(keys[5], psp[..., 256:512])
        else:
            vs["Dis_en"] = self.net_Dis_en.init(keys[4], psp)
        params = {k: v["params"] for k, v in vs.items()}
        stats = {k: v.get("batch_stats", {}) for k, v in vs.items()}
        opt_states = {"G_1": self.opts["G_1"].init(params["G_1"]),
                      "G_2": self.opts["G_2"].init(params["G_2"]),
                      "Seg": self.opts["Seg"].init(params["Seg_de"]),
                      "Dep": self.opts["Dep"].init(params["Dep_de"])}
        if self.cfg.nd_4dis:
            opt_states["D0"] = self.opts["D0"].init(params["Dis0_en"])
            opt_states["D1"] = self.opts["D1"].init(params["Dis1_en"])
        else:
            opt_states["D"] = self.opts["D"].init(params["Dis_en"])
        return ModelState(params=params, batch_stats=stats,
                          opt_states=opt_states, pools={},
                          step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def _d_phase(self, params, stats, opt_states, syn_img, real_img, rng):
        """One Dis_en update (model2.py:340-351,436-444): fresh detached
        trunk forwards, inverted targets (syn→True, real→False), WGAN-GP."""
        (_, f1s), stats["G_1"] = self._apply(self.net_G_1, params["G_1"],
                                             stats["G_1"], syn_img, "R",
                                             train=True)
        (_, f1r), stats["G_2"] = self._apply(self.net_G_2, params["G_2"],
                                             stats["G_2"], real_img, "R",
                                             train=True)
        f1s = jax.lax.stop_gradient(f1s)
        f1r = jax.lax.stop_gradient(f1r)

        def d_loss_fn(dp):
            def d_fn(x):
                return self.net_Dis_en.apply({"params": dp}, x)

            ls = bce_gan_loss(d_fn(f1s), True)
            lr_ = bce_gan_loss(d_fn(f1r), False)
            gp = calc_gradient_penalty(d_fn, f1r, f1s, rng)
            return ls + lr_ + gp, (ls, lr_, gp)

        (_, (l_syn, l_real, gp)), g = jax.value_and_grad(
            d_loss_fn, has_aux=True)(params["Dis_en"])
        upd, opt_states["D"] = self.opts["D"].update(g, opt_states["D"],
                                                     params["Dis_en"])
        params["Dis_en"] = optax.apply_updates(params["Dis_en"], upd)
        return l_syn, l_real, gp

    def _cal_disl(self, params, f1, target_is_real: bool):
        """cal_DisL (model3.py:347-356): BCE over the twin critics' 28-ch
        sigmoid maps on the first two 256-channel psp slices."""
        p0 = self.net_Dis0_en.apply({"params": params["Dis0_en"]},
                                    f1[..., :256])
        p1 = self.net_Dis1_en.apply({"params": params["Dis1_en"]},
                                    f1[..., 256:512])
        return (bce_gan_loss(p0, target_is_real)
                + bce_gan_loss(p1, target_is_real))

    def _d_phase_4dis(self, params, stats, opt_states, syn_img, real_img):
        """One twin-critic update (model3.py:356-398): fresh detached trunk
        forwards, syn→False / real→True (the model2 inversion undone), one
        Adam step per critic, no gradient penalty."""
        (_, f1s), stats["G_1"] = self._apply(self.net_G_1, params["G_1"],
                                             stats["G_1"], syn_img, "R",
                                             train=True)
        (_, f1r), stats["G_2"] = self._apply(self.net_G_2, params["G_2"],
                                             stats["G_2"], real_img, "R",
                                             train=True)
        f1s = jax.lax.stop_gradient(f1s)
        f1r = jax.lax.stop_gradient(f1r)
        l_syn = l_real = 0.0
        for i, (net, opt) in enumerate(
                ((self.net_Dis0_en, "D0"), (self.net_Dis1_en, "D1"))):
            name = f"Dis{i}_en"
            sl = slice(256 * i, 256 * (i + 1))

            def d_loss_fn(dp):
                ls = bce_gan_loss(net.apply({"params": dp}, f1s[..., sl]),
                                  False)
                lr_ = bce_gan_loss(net.apply({"params": dp}, f1r[..., sl]),
                                   True)
                return ls + lr_, (ls, lr_)

            (_, (ls, lr_)), g = jax.value_and_grad(
                d_loss_fn, has_aux=True)(params[name])
            upd, opt_states[opt] = self.opts[opt].update(
                g, opt_states[opt], params[name])
            params[name] = optax.apply_updates(params[name], upd)
            l_syn, l_real = l_syn + ls, l_real + lr_
        return l_syn, l_real

    def _step_train(self, state: ModelState, batch, rng):
        syn_img, real_img = batch["img_syn"], batch["img_real"]
        syn_seg_l, real_seg_l = batch["seg_l_syn"], batch["seg_l_real"]
        syn_dep_l = batch["dep_l_syn"]
        params = dict(state.params)
        stats = dict(state.batch_stats)
        opt_states = dict(state.opt_states)
        k_d1, k_d2 = jax.random.split(rng)
        metrics = {}

        # ---- 1. D step #1 (model2.py:432-444; model3.py:511-520) ----
        if self.cfg.nd_4dis:
            self._d_phase_4dis(params, stats, opt_states, syn_img, real_img)
        else:
            self._d_phase(params, stats, opt_states, syn_img, real_img, k_d1)

        # ---- 2. G_1: syn CE + dep L1 through frozen decoders
        #      (model2.py:393-414 backward_G_1) ----
        def g1_loss_fn(g1p):
            (_, f1), s_g1 = self._apply(self.net_G_1, g1p, stats["G_1"],
                                        syn_img, "R", train=True)
            (seg_syn, _), s_seg = self._apply(
                self.net_Seg_de, params["Seg_de"], stats["Seg_de"], f1,
                train=True)
            dep_syn, s_dep = self._apply(self.net_Dep_de, params["Dep_de"],
                                         stats["Dep_de"], f1, train=True)
            loss = (cross_entropy_loss(seg_syn, syn_seg_l, 255)
                    + l1_loss(dep_syn, syn_dep_l))
            aux = dict(s_g1=s_g1, s_seg=s_seg, s_dep=s_dep,
                       f1=jax.lax.stop_gradient(f1),
                       seg_syn=jax.lax.stop_gradient(seg_syn))
            return loss, aux

        (l_g1, aux), g = jax.value_and_grad(g1_loss_fn, has_aux=True)(
            params["G_1"])
        upd, opt_states["G_1"] = self.opts["G_1"].update(g, opt_states["G_1"],
                                                         params["G_1"])
        params["G_1"] = optax.apply_updates(params["G_1"], upd)
        stats["G_1"], stats["Seg_de"] = aux["s_g1"], aux["s_seg"]
        stats["Dep_de"] = aux["s_dep"]
        syn_f1 = aux["f1"]
        metrics["G_1"] = l_g1
        metrics["acc_syn"] = seg_accuracy(aux["seg_syn"], syn_seg_l, 255)

        # ---- 3. G_2: real CE + the adversarial term —
        #      model2: BCE(D(real psp) → True) (model2.py:416-430);
        #      4dis:   cal_DisL(real psp, False) + 3× gradient-free
        #              real_dep_loss, Dep_de forward on the DETACHED real
        #              features threading its stats (model3.py:484-505) ----
        def g2_loss_fn(g2p):
            (_, rf1), s_g2 = self._apply(self.net_G_2, g2p, stats["G_2"],
                                         real_img, "R", train=True)
            if self.cfg.nd_4dis:
                l_dis = self._cal_disl(params, rf1, False)
            else:
                pre_r = self.net_Dis_en.apply({"params": params["Dis_en"]},
                                              rf1)
                l_dis = bce_gan_loss(pre_r, True)
            (seg_real, _), s_seg = self._apply(
                self.net_Seg_de, params["Seg_de"], stats["Seg_de"], rf1,
                train=True)
            l_seg = cross_entropy_loss(seg_real, real_seg_l, 255)
            aux = dict(s_g2=s_g2, s_seg=s_seg,
                       rf1=jax.lax.stop_gradient(rf1),
                       seg_real=jax.lax.stop_gradient(seg_real),
                       l_dis=l_dis)
            loss = l_dis + l_seg
            if self.cfg.nd_4dis:
                dep_real, s_dep = self._apply(
                    self.net_Dep_de, params["Dep_de"], stats["Dep_de"],
                    jax.lax.stop_gradient(rf1), train=True)
                # every real_dep_loss input is detached/frozen in the
                # reference — a reported constant, not a gradient source
                l_dep_real = real_dep_loss(seg_real, syn_seg_l, dep_real,
                                           syn_dep_l)
                aux["s_dep"] = s_dep
                aux["l_dep_real"] = l_dep_real
                aux["dep_real"] = jax.lax.stop_gradient(dep_real)
                loss = loss + 3.0 * jax.lax.stop_gradient(l_dep_real)
            return loss, aux

        (l_g2, aux), g = jax.value_and_grad(g2_loss_fn, has_aux=True)(
            params["G_2"])
        upd, opt_states["G_2"] = self.opts["G_2"].update(g, opt_states["G_2"],
                                                         params["G_2"])
        params["G_2"] = optax.apply_updates(params["G_2"], upd)
        stats["G_2"], stats["Seg_de"] = aux["s_g2"], aux["s_seg"]
        real_f1 = aux["rf1"]
        metrics["G_2"] = l_g2
        metrics["G2_dis"] = aux["l_dis"]
        metrics["acc_real"] = seg_accuracy(aux["seg_real"], real_seg_l, 255)
        if self.cfg.nd_4dis:
            stats["Dep_de"] = aux["s_dep"]
            metrics["dep_real"] = aux["l_dep_real"]

        # ---- 4. Seg: 1.3× real CE; the syn forward runs for stats only
        #      (model2.py:366-382 backward_Seg) ----
        def seg_loss_fn(sp):
            _, s = self._apply(self.net_Seg_de, sp, stats["Seg_de"], syn_f1,
                               train=True)
            (seg_real, _), s = self._apply(self.net_Seg_de, sp, s, real_f1,
                                           train=True)
            return 1.3 * cross_entropy_loss(seg_real, real_seg_l, 255), s

        (l_seg_real, s_seg), g = jax.value_and_grad(
            seg_loss_fn, has_aux=True)(params["Seg_de"])
        upd, opt_states["Seg"] = self.opts["Seg"].update(g, opt_states["Seg"],
                                                         params["Seg_de"])
        params["Seg_de"] = optax.apply_updates(params["Seg_de"], upd)
        stats["Seg_de"] = s_seg
        metrics["seg_real"] = l_seg_real

        # ---- 5. Dep: syn L1; model2 also runs the real forward for
        #      stats/visuals (model2.py:384-391); model3 moved it into the
        #      G_2 phase, so 4dis is syn-only here (model3.py:450-457) ----
        def dep_loss_fn(dp):
            dep_syn, s = self._apply(self.net_Dep_de, dp, stats["Dep_de"],
                                     syn_f1, train=True)
            if not self.cfg.nd_4dis:
                _, s = self._apply(self.net_Dep_de, dp, s, real_f1,
                                   train=True)
            return l1_loss(dep_syn, syn_dep_l), s

        (l_dep, s_dep), g = jax.value_and_grad(dep_loss_fn, has_aux=True)(
            params["Dep_de"])
        upd, opt_states["Dep"] = self.opts["Dep"].update(g, opt_states["Dep"],
                                                         params["Dep_de"])
        params["Dep_de"] = optax.apply_updates(params["Dep_de"], upd)
        stats["Dep_de"] = s_dep
        metrics["dep_syn"] = l_dep

        # ---- 6. D step #2 on the updated nets (model2.py:496-505;
        #      model3.py:574-583) ----
        if self.cfg.nd_4dis:
            l_d_syn, l_d_real = self._d_phase_4dis(params, stats, opt_states,
                                                   syn_img, real_img)
            metrics["D_syn"], metrics["D_real"] = l_d_syn, l_d_real
        else:
            l_d_syn, l_d_real, gp = self._d_phase(params, stats, opt_states,
                                                  syn_img, real_img, k_d2)
            metrics["D_syn"], metrics["D_real"], metrics["gp"] = (l_d_syn,
                                                                  l_d_real,
                                                                  gp)

        return state.replace(params=params, batch_stats=stats,
                             opt_states=opt_states,
                             step=state.step + 1), self.metrics_dict(**metrics)

    def _step_eval(self, state: ModelState, batch):
        params, stats = state.params, state.batch_stats
        syn_img, real_img = batch["img_syn"], batch["img_real"]
        syn_seg_l = batch["seg_l_syn"]
        (_, syn_f1), _ = self._apply(self.net_G_1, params["G_1"],
                                     stats["G_1"], syn_img, "R", train=False)
        (seg_syn, _), _ = self._apply(self.net_Seg_de, params["Seg_de"],
                                      stats["Seg_de"], syn_f1, train=False)
        dep_syn, _ = self._apply(self.net_Dep_de, params["Dep_de"],
                                 stats["Dep_de"], syn_f1, train=False)
        (_, real_f1), _ = self._apply(self.net_G_2, params["G_2"],
                                      stats["G_2"], real_img, "R",
                                      train=False)
        (seg_real, _), _ = self._apply(self.net_Seg_de, params["Seg_de"],
                                       stats["Seg_de"], real_f1, train=False)
        dep_real, _ = self._apply(self.net_Dep_de, params["Dep_de"],
                                  stats["Dep_de"], real_f1, train=False)
        metrics = {
            "seg_syn": cross_entropy_loss(seg_syn, syn_seg_l, 255),
            "dep_syn": l1_loss(dep_syn, batch["dep_l_syn"]),
            "acc_syn": seg_accuracy(seg_syn, syn_seg_l, 255),
        }
        if "seg_l_real" in batch:
            metrics["seg_real"] = cross_entropy_loss(
                seg_real, batch["seg_l_real"], 255)
            metrics["acc_real"] = seg_accuracy(seg_real,
                                               batch["seg_l_real"], 255)
        visuals = dict(syn_img=syn_img, real_img=real_img,
                       syn_seg_l=syn_seg_l,
                       syn_seg_pre=jnp.argmax(seg_syn, -1),
                       real_seg_pre=jnp.argmax(seg_real, -1),
                       syn_dep_l=batch["dep_l_syn"], syn_dep_pre=dep_syn,
                       real_dep_pre=dep_real)
        if "seg_l_real" in batch:
            visuals["real_seg_l"] = batch["seg_l_real"]
        return self.metrics_dict(**metrics), visuals
