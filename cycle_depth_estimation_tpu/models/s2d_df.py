"""deeperfeatures "model3" seg+depth model (`S2D_df`).

TPU-native re-design of reference my_seg_depth/deeperfeatures/model3.py
(near-identical copies at dilated/model3.py, trymulti/model3.py,
new_depseg/model3.py, semantic_trans/model3.py) — the mid-lineage variant
with TWO full DenseNet trunks, one per domain:

- nets (model3.py:242-327): ``G_1`` = General_net encoding the SYN image,
  ``G_2`` = General_net encoding the REAL image (both consume raw 3-ch
  images in 'R' mode and emit the 1024-ch psp features), shared skip-free
  decoders ``Seg_de`` (SEGDF, 28-cls) and ``Dep_de`` (DEPDF, growth-36
  dense prefix + ordimat deconvs), and ``Dis0_en`` = Discriminator2_seg
  (Dis2SegDF) criticising the 512-ch SEG features;
- losses: plain CE(ignore=255) — NOT class-weighted — L1 depth, and MSE
  GAN terms on sigmoid D outputs (this generation's GANLoss is hardcoded
  to MSELoss regardless of use_lsgan, deeperfeatures/networks2.py:645-665);
- five sub-updates in ONE jit step (model3.py:550-624):
  1. G_1: syn CE + syn depth L1 through the frozen decoders
     (+ optionally the dilated generation's ``5×`` adversarial term on the
     SEG features, dilated/model3.py:509-517 — ``--df_g1_adv``);
  2. G_2: real CE + 3× the gradient-free ``real_dep_loss`` pseudo-label
     term (model3.py:472-483: every input detached — reports only);
  3. Seg: real CE + ``df_adv_w``× MSE(Dis0(syn f2), real) — 2 in
     deeperfeatures/trymulti, 5 in dilated (model3.py:468);
  4. Dep: syn depth L1 on the UPDATED Seg features (model3.py:485-494);
  5. Dis0_en: MSE real-vs-syn on the updated nets' features, with the
     trymulti generation's 0.2 real-branch weight reachable via
     ``--df_d_real_w`` (trymulti/model3.py:441).
- Adam LRs lr/3 (G_1, G_2), lr/2 (Seg, Dep), lr/5 (D0) — model3.py:313-327.

BatchNorm batch-stats thread in the reference's eager forward order:
per step G_1 ×2, G_2 ×2, Seg ×7, Dep ×3 (phases 1-5 re-run every forward in
train mode, including the detached ones). The reference warm-starts
G_1/G_2/Seg_de from absolute-path checkpoints of the previous generation
(model3.py:275-300); we initialize fresh (kaiming trunks, normal02 heads)
and support the same warm-starting via the checkpoint importers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from . import register_model
from ..config import Config
from .base_model import BaseModel, ModelState
from .networks import gan_loss, l1_loss
from .s2d import make_adam
from .s2d_networks import DEPDF, Dis2SegDF, GeneralNet2, SEGDF, real_dep_loss
from .seg_network import cross_entropy_loss, seg_accuracy


@register_model("S2D_df")
class S2DDFModel(BaseModel):
    loss_names = ("G_1", "G_2", "seg_real", "adv_syn", "dep_syn", "dep_real",
                  "D_syn", "D_real", "acc_syn", "acc_real")
    visual_names = ("syn_img", "real_img", "syn_seg_l", "real_seg_l",
                    "syn_seg_pre", "real_seg_pre", "syn_dep_l", "syn_dep_pre",
                    "real_dep_pre")
    model_names = ("G_1", "G_2", "Dis0_en", "Seg_de", "Dep_de")
    lr_opt_names = ()

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        dt = cfg.compute_dtype()
        block_config = tuple(cfg.dense_block_config or (6, 12, 32, 32))
        self.net_G_1 = GeneralNet2(block_config=block_config, dtype=dt)
        self.net_G_2 = GeneralNet2(block_config=block_config, dtype=dt)
        self.net_Seg_de = SEGDF(n_cls=28, dtype=dt)
        self.net_Dep_de = DEPDF(dtype=dt)
        self.net_Dis0_en = Dis2SegDF(dtype=dt)
        self.opts = {"G_1": make_adam(cfg.lr / 3.0, cfg.beta1),
                     "G_2": make_adam(cfg.lr / 3.0, cfg.beta1),
                     "Seg": make_adam(cfg.lr / 2.0, cfg.beta1),
                     "Dep": make_adam(cfg.lr / 2.0, cfg.beta1),
                     "D": make_adam(cfg.lr / 5.0, cfg.beta1)}

    def init_state(self, rng: jax.Array) -> ModelState:
        h, w = self.cfg.fine_size, self.cfg.fine_size * 3
        return self.init_state_at(rng, h, w)

    def init_state_at(self, rng: jax.Array, h: int, w: int) -> ModelState:
        keys = jax.random.split(rng, 5)
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        vG1 = self.net_G_1.init(keys[0], x, "R")
        _, psp = self.net_G_1.apply(vG1, x, "R")
        vG2 = self.net_G_2.init(keys[1], x, "R")
        vSeg = self.net_Seg_de.init(keys[2], psp)
        _, f2 = self.net_Seg_de.apply(vSeg, psp)
        vDep = self.net_Dep_de.init(keys[3], f2)
        vD = self.net_Dis0_en.init(keys[4], f2)
        vs = dict(G_1=vG1, G_2=vG2, Dis0_en=vD, Seg_de=vSeg, Dep_de=vDep)
        params = {k: v["params"] for k, v in vs.items()}
        stats = {k: v.get("batch_stats", {}) for k, v in vs.items()}
        opt_states = {"G_1": self.opts["G_1"].init(params["G_1"]),
                      "G_2": self.opts["G_2"].init(params["G_2"]),
                      "Seg": self.opts["Seg"].init(params["Seg_de"]),
                      "Dep": self.opts["Dep"].init(params["Dep_de"]),
                      "D": self.opts["D"].init(params["Dis0_en"])}
        return ModelState(params=params, batch_stats=stats,
                          opt_states=opt_states, pools={},
                          step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def _step_train(self, state: ModelState, batch, rng):
        syn_img, real_img = batch["img_syn"], batch["img_real"]
        syn_seg_l, real_seg_l = batch["seg_l_syn"], batch["seg_l_real"]
        syn_dep_l = batch["dep_l_syn"]
        params = dict(state.params)
        stats = dict(state.batch_stats)
        opt_states = dict(state.opt_states)
        metrics = {}

        # ---- 1. G_1: syn CE + dep L1 through frozen decoders
        #      (model3.py:497-516; dilated adds 5× GAN on the seg features,
        #      dilated/model3.py:509-517) ----
        def g1_loss_fn(g1p):
            (_, f1), s_g1 = self._apply(self.net_G_1, g1p, stats["G_1"],
                                        syn_img, "R", train=True)
            (seg_syn, f2), s_seg = self._apply(
                self.net_Seg_de, params["Seg_de"], stats["Seg_de"], f1,
                train=True)
            dep_syn, s_dep = self._apply(self.net_Dep_de, params["Dep_de"],
                                         stats["Dep_de"], f2, train=True)
            loss = (cross_entropy_loss(seg_syn, syn_seg_l, 255)
                    + l1_loss(dep_syn, syn_dep_l))
            if self.cfg.df_g1_adv:
                pre_s = self.net_Dis0_en.apply(
                    {"params": params["Dis0_en"]}, f2)
                loss = loss + 5.0 * gan_loss(pre_s, True)
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

        # ---- 2. G_2: real CE + 3× gradient-free real_dep_loss
        #      (model3.py:518-548) ----
        def g2_loss_fn(g2p):
            (_, rf1), s_g2 = self._apply(self.net_G_2, g2p, stats["G_2"],
                                         real_img, "R", train=True)
            (seg_real, rf2), s_seg = self._apply(
                self.net_Seg_de, params["Seg_de"], stats["Seg_de"], rf1,
                train=True)
            l_seg = cross_entropy_loss(seg_real, real_seg_l, 255)
            # dep path: features detached, Dep frozen — the term reports
            # but carries no gradient (model3.py:524-531,472-483)
            dep_real, s_dep = self._apply(
                self.net_Dep_de, params["Dep_de"], stats["Dep_de"],
                jax.lax.stop_gradient(rf2), train=True)
            l_dep_real = real_dep_loss(seg_real, syn_seg_l, dep_real,
                                       syn_dep_l)
            aux = dict(s_g2=s_g2, s_seg=s_seg, s_dep=s_dep,
                       rf1=jax.lax.stop_gradient(rf1),
                       seg_real=jax.lax.stop_gradient(seg_real),
                       l_dep_real=l_dep_real)
            return l_seg + 3.0 * l_dep_real, aux

        (l_g2, aux), g = jax.value_and_grad(g2_loss_fn, has_aux=True)(
            params["G_2"])
        upd, opt_states["G_2"] = self.opts["G_2"].update(g, opt_states["G_2"],
                                                         params["G_2"])
        params["G_2"] = optax.apply_updates(params["G_2"], upd)
        stats["G_2"], stats["Seg_de"] = aux["s_g2"], aux["s_seg"]
        stats["Dep_de"] = aux["s_dep"]
        real_f1 = aux["rf1"]
        metrics["G_2"] = l_g2
        metrics["dep_real"] = aux["l_dep_real"]
        metrics["acc_real"] = seg_accuracy(aux["seg_real"], real_seg_l, 255)

        # ---- 3. Seg: real CE + adv on the PRE-update G features
        #      (model3.py:446-468) ----
        def seg_loss_fn(sp):
            (_, syn_f2), s = self._apply(self.net_Seg_de, sp,
                                         stats["Seg_de"], syn_f1, train=True)
            (seg_real, _), s = self._apply(self.net_Seg_de, sp, s, real_f1,
                                           train=True)
            l_real = cross_entropy_loss(seg_real, real_seg_l, 255)
            pre_s = self.net_Dis0_en.apply({"params": params["Dis0_en"]},
                                           syn_f2)
            l_adv = gan_loss(pre_s, True)
            return l_real + self.cfg.df_adv_w * l_adv, (l_real, l_adv, s)

        (_, (l_seg_real, l_adv, s_seg)), g = jax.value_and_grad(
            seg_loss_fn, has_aux=True)(params["Seg_de"])
        upd, opt_states["Seg"] = self.opts["Seg"].update(g, opt_states["Seg"],
                                                         params["Seg_de"])
        params["Seg_de"] = optax.apply_updates(params["Seg_de"], upd)
        stats["Seg_de"] = s_seg
        metrics["seg_real"], metrics["adv_syn"] = l_seg_real, l_adv

        # ---- 4. Dep: syn L1 on the UPDATED Seg's features
        #      (model3.py:485-494) ----
        (_, syn_f2u), stats["Seg_de"] = self._apply(
            self.net_Seg_de, params["Seg_de"], stats["Seg_de"], syn_f1,
            train=True)
        syn_f2u = jax.lax.stop_gradient(syn_f2u)

        def dep_loss_fn(dp):
            pred, s = self._apply(self.net_Dep_de, dp, stats["Dep_de"],
                                  syn_f2u, train=True)
            return l1_loss(pred, syn_dep_l), s

        (l_dep, s_dep), g = jax.value_and_grad(dep_loss_fn, has_aux=True)(
            params["Dep_de"])
        upd, opt_states["Dep"] = self.opts["Dep"].update(g, opt_states["Dep"],
                                                         params["Dep_de"])
        params["Dep_de"] = optax.apply_updates(params["Dep_de"], upd)
        stats["Dep_de"] = s_dep
        metrics["dep_syn"] = l_dep

        # ---- 5. Dis0_en on the UPDATED nets' features, reference forward
        #      order G_1 → Seg → G_2 → Seg (model3.py:380-421) ----
        (_, f1s), stats["G_1"] = self._apply(self.net_G_1, params["G_1"],
                                             stats["G_1"], syn_img, "R",
                                             train=True)
        (_, f2s), stats["Seg_de"] = self._apply(
            self.net_Seg_de, params["Seg_de"], stats["Seg_de"],
            jax.lax.stop_gradient(f1s), train=True)
        (_, f1r), stats["G_2"] = self._apply(self.net_G_2, params["G_2"],
                                             stats["G_2"], real_img, "R",
                                             train=True)
        (_, f2r), stats["Seg_de"] = self._apply(
            self.net_Seg_de, params["Seg_de"], stats["Seg_de"],
            jax.lax.stop_gradient(f1r), train=True)
        f2s = jax.lax.stop_gradient(f2s)
        f2r = jax.lax.stop_gradient(f2r)

        def d_loss_fn(dp):
            pre_s = self.net_Dis0_en.apply({"params": dp}, f2s)
            pre_r = self.net_Dis0_en.apply({"params": dp}, f2r)
            ls = gan_loss(pre_s, False)
            lr_ = gan_loss(pre_r, True)
            return self.cfg.df_d_real_w * lr_ + ls, (ls, lr_)

        (_, (l_d_syn, l_d_real)), g = jax.value_and_grad(
            d_loss_fn, has_aux=True)(params["Dis0_en"])
        upd, opt_states["D"] = self.opts["D"].update(g, opt_states["D"],
                                                     params["Dis0_en"])
        params["Dis0_en"] = optax.apply_updates(params["Dis0_en"], upd)
        metrics["D_syn"], metrics["D_real"] = l_d_syn, l_d_real

        return state.replace(params=params, batch_stats=stats,
                             opt_states=opt_states,
                             step=state.step + 1), self.metrics_dict(**metrics)

    def _step_eval(self, state: ModelState, batch):
        params, stats = state.params, state.batch_stats
        syn_img, real_img = batch["img_syn"], batch["img_real"]
        syn_seg_l = batch["seg_l_syn"]
        (_, syn_f1), _ = self._apply(self.net_G_1, params["G_1"],
                                     stats["G_1"], syn_img, "R", train=False)
        (seg_syn, syn_f2), _ = self._apply(self.net_Seg_de, params["Seg_de"],
                                           stats["Seg_de"], syn_f1,
                                           train=False)
        dep_syn, _ = self._apply(self.net_Dep_de, params["Dep_de"],
                                 stats["Dep_de"], syn_f2, train=False)
        (_, real_f1), _ = self._apply(self.net_G_2, params["G_2"],
                                      stats["G_2"], real_img, "R",
                                      train=False)
        (seg_real, real_f2), _ = self._apply(
            self.net_Seg_de, params["Seg_de"], stats["Seg_de"], real_f1,
            train=False)
        dep_real, _ = self._apply(self.net_Dep_de, params["Dep_de"],
                                  stats["Dep_de"], real_f2, train=False)
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
            metrics["dep_real"] = real_dep_loss(seg_real, syn_seg_l,
                                                dep_real, batch["dep_l_syn"])
        visuals = dict(syn_img=syn_img, real_img=real_img,
                       syn_seg_l=syn_seg_l,
                       syn_seg_pre=jnp.argmax(seg_syn, -1),
                       real_seg_pre=jnp.argmax(seg_real, -1),
                       syn_dep_l=batch["dep_l_syn"], syn_dep_pre=dep_syn,
                       real_dep_pre=dep_real)
        if "seg_l_real" in batch:
            visuals["real_seg_l"] = batch["seg_l_real"]
        return self.metrics_dict(**metrics), visuals
