"""S2D_alt — the base generation's ALTERNATE Feature_net pipeline.

TPU-native re-design of the single-file Seg_Depth model embedded in
reference my_seg_depth/train.py:221-409 (driven by my_seg_depth/networks.py
— the `Feature_net`/`PSPModule` track, SURVEY §2.2 row 29's "alt pipeline";
my_seg_depth/model.py:178-342 is an earlier standalone copy of the same
model over the same networks.py nets):
two CycleGAN-style BatchNorm encoders (`GBase` — G_1 for syn, G_2 for real)
map both domains to a shared 128-ch feature space at 1/4 resolution; a
`DropDiscriminator` aligns the domains there; a stemless DenseNet
`FeatureNet` + PSP head feeds the alternate `SEGAlt`/`DEPAlt` skip decoders.

One jitted train step contains the reference loop (train.py:344-409):

1. **G_1 + G_2 update** (forward + backward_G, :287-289,326-346,356-366): the
   stored features feed D and the frozen Feature/Seg chain;
   ``loss_G1 = GAN(D(syn_f), real) + CE(seg_syn)`` steps G_1 and
   ``loss_G2 = GAN(D(real_f), fake) + CE(seg_real)`` steps G_2 — the two
   losses share no parameters, so one grad of their sum over {G_1, G_2}
   reproduces the reference's two separate backwards exactly.
2. **Feature update** (:368-377): ``5×(CE(seg_syn)+CE(seg_real)) + L1(dep)``
   through fresh Feature forwards on the detached stored features. The
   reference's ``detach_list`` is a NO-OP (it rebinds the loop variable) so
   the losses reach Feature through the three dense-block skip features —
   but ``inf.detach()`` (:312-313,321) is real: the PSP-head output path is
   cut, so this phase never trains ``psp_head`` (we stop_gradient the psp
   argument accordingly).
3. **Seg update** (:379-387): CE(syn)+CE(real) through ANOTHER fresh
   Feature forward pair (stats update again, as the reference recomputes).
4. **Dep update** (:389-397): L1 through one more fresh Feature forward.
5. **D update** (backward_D, :297-302 at :399-409): syn→fake, real→true on the detached
   stored features. Dropout2d in D stays ACTIVE in every training forward
   (the reference never switches it to eval).

Optimizers: Adam(lr) for G_1/G_2/Feature/Seg/Dep, Adam(lr_D) for D
(train.py:258-271). The two ImagePools the reference constructs are never
queried in its loop — not instantiated here.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

from . import register_model
from ..config import Config
from .base_model import BaseModel, ModelState, make_optimizer as make_adam
from .networks import gan_loss, l1_loss
from .s2d_networks import DEPAlt, DropDiscriminator, FeatureNet, GBase, SEGAlt
from .seg_network import cross_entropy_loss, seg_accuracy


@register_model("S2D_alt")
class S2DAltModel(BaseModel):
    loss_names = ("G1_dis", "G1_seg", "D_G1", "G2_dis", "G2_seg", "D_G2",
                  "seg_syn", "seg_real", "dep_syn", "acc_syn", "acc_real")
    visual_names = ("syn_img", "real_img", "syn_seg_l", "real_seg_l",
                    "syn_seg_pre", "real_seg_pre", "syn_dep_l", "syn_dep_pre")
    model_names = ("G_1", "G_2", "Dis_en", "Feature", "Seg_de", "Dep_de")
    lr_opt_names = ()

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        dt = cfg.compute_dtype()
        n_blocks = {"3blocks": 3, "6blocks": 6}.get(cfg.net_g, 3)
        self.net_G_1 = GBase(n_blocks=n_blocks, dtype=dt)
        self.net_G_2 = GBase(n_blocks=n_blocks, dtype=dt)
        self.net_Dis_en = DropDiscriminator(conv_dim=128, dtype=dt)
        self.net_Feature = FeatureNet(dtype=dt)
        self.net_Seg_de = SEGAlt(n_cls=28, dtype=dt)
        self.net_Dep_de = DEPAlt(dtype=dt)
        lr, b1 = cfg.lr, cfg.beta1
        self.opts = {
            "G_1": make_adam(lr, b1), "G_2": make_adam(lr, b1),
            "Feature": make_adam(lr, b1), "Seg_de": make_adam(lr, b1),
            "Dep_de": make_adam(lr, b1),
            "Dis_en": make_adam(cfg.lr_d, b1),
        }

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, hw=None) -> ModelState:
        cfg = self.cfg
        h, w = hw or (cfg.fine_size, cfg.fine_size * 3)
        keys = jax.random.split(rng, 6)
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        vG1 = self.net_G_1.init(keys[0], x)
        vG2 = self.net_G_2.init(keys[1], x)
        f1 = self.net_G_1.apply(vG1, x)
        vD = self.net_Dis_en.init(keys[2], f1)
        vF = self.net_Feature.init(keys[3], f1)
        feats, psp = self.net_Feature.apply(vF, f1)
        vSeg = self.net_Seg_de.init(keys[4], feats, psp)
        vDep = self.net_Dep_de.init(keys[5], feats, psp)
        vs = dict(G_1=vG1, G_2=vG2, Dis_en=vD, Feature=vF, Seg_de=vSeg,
                  Dep_de=vDep)
        params = {k: v["params"] for k, v in vs.items()}
        stats = {k: v.get("batch_stats", {}) for k, v in vs.items()}
        return ModelState(
            params=params, batch_stats=stats,
            opt_states={k: self.opts[k].init(params[k]) for k in params},
            pools={}, step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def _step_train(self, state: ModelState, batch, rng):
        syn_img, real_img = batch["img_syn"], batch["img_real"]
        syn_seg_l, real_seg_l = batch["seg_l_syn"], batch["seg_l_real"]
        syn_dep_l = batch["dep_l_syn"]
        params = dict(state.params)
        stats = dict(state.batch_stats)
        opt_states = dict(state.opt_states)
        metrics: Dict[str, jax.Array] = {}
        sg = jax.lax.stop_gradient
        rngs = jax.random.split(rng, 4)

        def feature(fp, s, x):
            return self._apply(self.net_Feature, fp, s, x, train=True)

        # ====== phase 1: G_1 + G_2 (forward + backward_G) ======
        def g_loss_fn(gp):
            sf1, s1 = self._apply(self.net_G_1, gp["G_1"], stats["G_1"],
                                  syn_img, train=True)
            rf1, s2 = self._apply(self.net_G_2, gp["G_2"], stats["G_2"],
                                  real_img, train=True)
            ps, _ = self._apply(self.net_Dis_en, params["Dis_en"],
                                stats["Dis_en"], sf1, train=True,
                                rng=rngs[0])
            pr, _ = self._apply(self.net_Dis_en, params["Dis_en"],
                                stats["Dis_en"], rf1, train=True,
                                rng=rngs[1])
            g1_dis, g2_dis = gan_loss(ps, True), gan_loss(pr, False)
            (sF, spsp), s_f = feature(params["Feature"], stats["Feature"], sf1)
            (rF, rpsp), s_f = feature(params["Feature"], s_f, rf1)
            seg_s, _ = self._apply(self.net_Seg_de, params["Seg_de"],
                                   stats["Seg_de"], sF, spsp, train=True)
            seg_r, _ = self._apply(self.net_Seg_de, params["Seg_de"],
                                   stats["Seg_de"], rF, rpsp, train=True)
            g1_seg = cross_entropy_loss(seg_s, syn_seg_l, 255)
            g2_seg = cross_entropy_loss(seg_r, real_seg_l, 255)
            loss = g1_dis + g1_seg + g2_dis + g2_seg
            aux = dict(sf1=sf1, rf1=rf1, s1=s1, s2=s2, s_f=s_f,
                       g1_dis=g1_dis, g2_dis=g2_dis, g1_seg=g1_seg,
                       g2_seg=g2_seg)
            return loss, aux

        (_, auxg), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            {"G_1": params["G_1"], "G_2": params["G_2"]})
        for name in ("G_1", "G_2"):
            upd, opt_states[name] = self.opts[name].update(
                grads[name], opt_states[name], params[name])
            params[name] = optax.apply_updates(params[name], upd)
        stats["G_1"], stats["G_2"] = auxg["s1"], auxg["s2"]
        stats["Feature"] = auxg["s_f"]
        sf1, rf1 = sg(auxg["sf1"]), sg(auxg["rf1"])
        metrics["G1_dis"], metrics["G2_dis"] = auxg["g1_dis"], auxg["g2_dis"]
        metrics["G1_seg"], metrics["G2_seg"] = auxg["g1_seg"], auxg["g2_seg"]

        # ====== phase 2: Feature (5×Seg + Dep, :368-377) ======
        # backward_Seg/backward_Dep call the decoders as
        # net_de(detach_list(f2), inf.detach()) (:312-313,321): detach_list
        # is a no-op but inf.detach() is NOT — the PSP-head output path is
        # CUT, so Feature's gradient flows only through the three
        # dense-block skip features into the trans_ adapters; the psp_head
        # params are never trained by this phase (review fix: they were).
        def f_loss_fn(fp):
            (sF, spsp), s_f = feature(fp, stats["Feature"], sf1)
            (rF, rpsp), s_f = feature(fp, s_f, rf1)
            seg_s, _ = self._apply(self.net_Seg_de, params["Seg_de"],
                                   stats["Seg_de"], sF, sg(spsp), train=True)
            seg_r, _ = self._apply(self.net_Seg_de, params["Seg_de"],
                                   stats["Seg_de"], rF, sg(rpsp), train=True)
            loss_s = (cross_entropy_loss(seg_s, syn_seg_l, 255)
                      + cross_entropy_loss(seg_r, real_seg_l, 255))
            # backward_Dep re-runs Feature on the syn features (:320-324)
            (sF2, spsp2), s_f = feature(fp, s_f, sf1)
            dep_s, _ = self._apply(self.net_Dep_de, params["Dep_de"],
                                   stats["Dep_de"], sF2, sg(spsp2),
                                   train=True)
            loss_d = l1_loss(dep_s, syn_dep_l)
            return 5.0 * loss_s + loss_d, s_f

        (_, s_f), f_grads = jax.value_and_grad(f_loss_fn, has_aux=True)(
            params["Feature"])
        upd, opt_states["Feature"] = self.opts["Feature"].update(
            f_grads, opt_states["Feature"], params["Feature"])
        params["Feature"] = optax.apply_updates(params["Feature"], upd)
        stats["Feature"] = s_f

        # ====== phase 3: Seg_de (:379-387) ======
        def seg_loss_fn(segp):
            (sF, spsp), s_f = feature(params["Feature"], stats["Feature"], sf1)
            (rF, rpsp), s_f = feature(params["Feature"], s_f, rf1)
            seg_s, _ = self._apply(self.net_Seg_de, segp, stats["Seg_de"],
                                   sF, spsp, train=True)
            seg_r, _ = self._apply(self.net_Seg_de, segp, stats["Seg_de"],
                                   rF, rpsp, train=True)
            l_syn = cross_entropy_loss(seg_s, syn_seg_l, 255)
            l_real = cross_entropy_loss(seg_r, real_seg_l, 255)
            return l_syn + l_real, (l_syn, l_real, seg_s, seg_r, s_f)

        (_, (l_syn, l_real, seg_s, seg_r, s_f)), seg_grads = (
            jax.value_and_grad(seg_loss_fn, has_aux=True)(params["Seg_de"]))
        upd, opt_states["Seg_de"] = self.opts["Seg_de"].update(
            seg_grads, opt_states["Seg_de"], params["Seg_de"])
        params["Seg_de"] = optax.apply_updates(params["Seg_de"], upd)
        stats["Feature"] = s_f
        metrics["seg_syn"], metrics["seg_real"] = l_syn, l_real
        metrics["acc_syn"] = seg_accuracy(seg_s, syn_seg_l, 255)
        metrics["acc_real"] = seg_accuracy(seg_r, real_seg_l, 255)

        # ====== phase 4: Dep_de (:389-397) ======
        def dep_loss_fn(depp):
            (sF, spsp), s_f = feature(params["Feature"], stats["Feature"], sf1)
            dep_s, _ = self._apply(self.net_Dep_de, depp, stats["Dep_de"],
                                   sF, spsp, train=True)
            return l1_loss(dep_s, syn_dep_l), s_f

        (loss_dep, s_f), dep_grads = jax.value_and_grad(
            dep_loss_fn, has_aux=True)(params["Dep_de"])
        upd, opt_states["Dep_de"] = self.opts["Dep_de"].update(
            dep_grads, opt_states["Dep_de"], params["Dep_de"])
        params["Dep_de"] = optax.apply_updates(params["Dep_de"], upd)
        stats["Feature"] = s_f
        metrics["dep_syn"] = loss_dep

        # ====== phase 5: Dis_en (backward_D, :297-302) ======
        def d_loss_fn(dp):
            ps, _ = self._apply(self.net_Dis_en, dp, stats["Dis_en"], sf1,
                                train=True, rng=rngs[2])
            pr, _ = self._apply(self.net_Dis_en, dp, stats["Dis_en"], rf1,
                                train=True, rng=rngs[3])
            d_g1, d_g2 = gan_loss(ps, False), gan_loss(pr, True)
            return d_g1 + d_g2, (d_g1, d_g2)

        (_, (d_g1, d_g2)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(params["Dis_en"])
        upd, opt_states["Dis_en"] = self.opts["Dis_en"].update(
            d_grads, opt_states["Dis_en"], params["Dis_en"])
        params["Dis_en"] = optax.apply_updates(params["Dis_en"], upd)
        metrics["D_G1"], metrics["D_G2"] = d_g1, d_g2

        new_state = state.replace(params=params, batch_stats=stats,
                                  opt_states=opt_states, step=state.step + 1)
        return new_state, self.metrics_dict(**metrics)

    # ------------------------------------------------------------------
    def _step_eval(self, state: ModelState, batch):
        params, stats = state.params, state.batch_stats
        sf1, _ = self._apply(self.net_G_1, params["G_1"], stats["G_1"],
                             batch["img_syn"], train=False)
        rf1, _ = self._apply(self.net_G_2, params["G_2"], stats["G_2"],
                             batch["img_real"], train=False)
        (sF, spsp), _ = self._apply(self.net_Feature, params["Feature"],
                                    stats["Feature"], sf1, train=False)
        (rF, rpsp), _ = self._apply(self.net_Feature, params["Feature"],
                                    stats["Feature"], rf1, train=False)
        seg_s, _ = self._apply(self.net_Seg_de, params["Seg_de"],
                               stats["Seg_de"], sF, spsp, train=False)
        seg_r, _ = self._apply(self.net_Seg_de, params["Seg_de"],
                               stats["Seg_de"], rF, rpsp, train=False)
        dep_s, _ = self._apply(self.net_Dep_de, params["Dep_de"],
                               stats["Dep_de"], sF, spsp, train=False)
        syn_seg_l = batch["seg_l_syn"]
        syn_dep_l = batch["dep_l_syn"]
        metrics = {
            "seg_syn": cross_entropy_loss(seg_s, syn_seg_l, 255),
            "dep_syn": l1_loss(dep_s, syn_dep_l),
            "acc_syn": seg_accuracy(seg_s, syn_seg_l, 255),
        }
        if "seg_l_real" in batch:
            metrics["seg_real"] = cross_entropy_loss(
                seg_r, batch["seg_l_real"], 255)
            metrics["acc_real"] = seg_accuracy(seg_r, batch["seg_l_real"], 255)
        visuals = dict(
            syn_img=batch["img_syn"], real_img=batch["img_real"],
            syn_seg_l=syn_seg_l, syn_dep_l=syn_dep_l,
            syn_seg_pre=jnp.argmax(seg_s, -1),
            real_seg_pre=jnp.argmax(seg_r, -1),
            syn_dep_pre=dep_s)
        if "seg_l_real" in batch:
            visuals["real_seg_l"] = batch["seg_l_real"]
        return self.metrics_dict(**metrics), visuals
