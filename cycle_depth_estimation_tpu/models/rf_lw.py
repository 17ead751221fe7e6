"""RefineNet-LW Seg_Depth model (`new_model` track).

TPU-native re-design of reference new_model/mdoel6.py:199-567 (driver
new_model/train_new.py): ResNetLW-101 with per-domain instance adapters as
the generator; four ``segd`` heads acting as BOTH seg decoders and domain
discriminators through ``seg_gan_loss`` —

- **G step** (mdoel6.py:434-541, heads frozen): real + syn branches; every
  head's ×2-upsampled logits pushed toward the TRUE labels; syn depth =
  sky-masked 20×L1 on the fused prediction + per-band BCEDepLoss;
- **DIS step** (mdoel6.py:365-427, G frozen): heads trained to emit the
  extra 'fake' class (28) on BOTH branches' detached features, one Adam per
  head (lr/3, lr/2, lr/2, lr/2; G at lr/4 — mdoel6.py:209-222).

All phases compile into one jit step; ×2 upsampling is nearest like the
reference's ``nn.Upsample(scale_factor=2)``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from . import register_model
from ..config import Config
from ..ops import resize_nearest
from .base_model import BaseModel, ModelState
from .networks import l1_loss
from .refinenet import ResNetLW, Segd, seg_gan_loss
from .s2d_networks import bce_dep_loss_truncated, get_masks
from .s2d import make_adam
from .seg_network import seg_accuracy


def up2(x):
    n, h, w, c = x.shape
    return resize_nearest(x, (h * 2, w * 2))


@register_model("rf_lw")
class RefineNetSegDepth(BaseModel):
    loss_names = ("G", "dep_syn", "adv_g_seg_syn", "adv_g_seg_real",
                  "adv_d_seg_syn", "adv_d_seg_real", "acc_syn", "acc_real")
    visual_names = ("syn_img", "real_img", "syn_seg_l", "real_seg_l",
                    "syn_seg_pre", "real_seg_pre", "syn_dep_l", "syn_dep_pre",
                    "real_dep_pre")
    model_names = ("G", "seg8", "seg4", "seg2", "seg2_0")
    lr_opt_names = ()

    SKY_CLASS = 17
    N_CLS = 28
    HEADS = ("seg8", "seg4", "seg2", "seg2_0")
    # Which ResNetLW adapter path the SYN branch takes. The mdoel6/model7
    # drivers call `self.net_G(self.syn_img)` with NO type argument
    # (mdoel6.py:470, model7.py:397), so the reference trains the `_r`
    # adapters on BOTH branches and the `_s` adapters never run (only
    # model_ins.py:487 passes type='syn'). Set to "syn" for the
    # model_ins-style per-domain split.
    SYN_DOMAIN = "real"

    def _apply_syn_domain(self, cfg: Config) -> None:
        """Validated --syn_domain override (shared by both __init__s; the
        choice is recorded in the run's opt.txt dump for provenance — it
        must be re-passed identically at eval/resume time, both adapter
        sets always exist so a mismatch cannot fail on shapes)."""
        if cfg.syn_domain is None:
            return
        if cfg.syn_domain not in ("real", "syn"):
            raise ValueError(
                f"syn_domain [{cfg.syn_domain}] must be 'real' or 'syn' — "
                "any other string would silently select the '_s' path")
        self.SYN_DOMAIN = cfg.syn_domain

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self._apply_syn_domain(cfg)  # model_ins-style per-domain split
        dt = cfg.compute_dtype()
        layers = tuple(cfg.resnet_layers or (3, 4, 23, 3))
        self.net_G = ResNetLW(layers=layers, dtype=dt)
        self.net_seg8 = Segd(n_cls=self.N_CLS, up_scale=3, dtype=dt)
        self.net_seg4 = Segd(n_cls=self.N_CLS, up_scale=2, dtype=dt)
        self.net_seg2 = Segd(n_cls=self.N_CLS, up_scale=1, dtype=dt)
        self.net_seg2_0 = Segd(n_cls=self.N_CLS, up_scale=1, dtype=dt)
        lr, b1 = cfg.lr, cfg.beta1
        self.opts = {
            "G": make_adam(lr / 4, b1),
            "seg8": make_adam(lr / 3, b1),
            "seg4": make_adam(lr / 2, b1),
            "seg2": make_adam(lr / 2, b1),
            "seg2_0": make_adam(lr / 2, b1),
        }

    def init_state(self, rng: jax.Array) -> ModelState:
        cfg = self.cfg
        h, w = cfg.fine_size, cfg.fine_size * 3
        return self.init_state_at(rng, h, w)

    def init_state_at(self, rng: jax.Array, h: int, w: int) -> ModelState:
        keys = jax.random.split(rng, 5)
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        vG = self.net_G.init(keys[0], x, "real")
        _, _, feats = self.net_G.apply(vG, x, "real")
        vs = {"G": vG}
        for i, name in enumerate(self.HEADS):
            vs[name] = getattr(self, f"net_{name}").init(keys[i + 1], feats[i])
        params = {k: v["params"] for k, v in vs.items()}
        stats = {k: v.get("batch_stats", {}) for k, v in vs.items()}
        return ModelState(
            params=params, batch_stats=stats,
            opt_states={k: self.opts[k].init(params[k]) for k in self.opts},
            pools={}, step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def _heads(self, params, stats, feats, train):
        outs = []
        for i, name in enumerate(self.HEADS):
            o, stats[name] = self._apply(getattr(self, f"net_{name}"),
                                         params[name], stats[name], feats[i],
                                         train=train)
            outs.append(o)
        return outs, stats

    def _step_train(self, state: ModelState, batch, rng):
        syn_img, real_img = batch["img_syn"], batch["img_real"]
        syn_seg_l, real_seg_l = batch["seg_l_syn"], batch["seg_l_real"]
        syn_dep_l, syn_dep_ls = batch["dep_l_syn"], batch["depth_l_s"]
        params = dict(state.params)
        stats = dict(state.batch_stats)
        opt_states = dict(state.opt_states)
        sky = (syn_seg_l != self.SKY_CLASS).astype(jnp.float32)[..., None]
        sky4 = jnp.repeat(sky, 4, axis=-1)
        oms, zms = get_masks(sky4 * syn_dep_ls)
        metrics: Dict[str, jax.Array] = {}

        # ---- G step (heads frozen) ----
        def g_loss_fn(gp):
            s = dict(stats)
            (r_outs, r_pred, r_feats), s["G"] = self._apply(
                self.net_G, gp, s["G"], real_img, "real", train=True)
            r_heads, s = self._heads(params, s, r_feats, False)
            g_real = sum(seg_gan_loss(up2(h), real_seg_l, True, self.N_CLS)
                         for h in r_heads)
            (s_outs, s_pred, s_feats), s["G"] = self._apply(
                self.net_G, gp, s["G"], syn_img, self.SYN_DOMAIN, train=True)
            s_heads, s = self._heads(params, s, s_feats, False)
            g_syn_seg = sum(seg_gan_loss(up2(h), syn_seg_l, True, self.N_CLS)
                            for h in s_heads)
            pred_full = up2(s_pred)
            dep_loss = 20.0 * l1_loss(sky * pred_full, sky * syn_dep_l)
            for band in s_outs:
                # mdoel6's criterionDep_bce is the TRUNCATED semantic_trans
                # BCEDepLoss (single o_m BCE term) — mdoel6.py:6-7,243,507
                dep_loss = dep_loss + bce_dep_loss_truncated(
                    sky * up2(band), sky4 * syn_dep_ls, oms, zms)
            total = g_real + g_syn_seg + dep_loss
            aux = dict(stats=s, dep_loss=dep_loss, g_real=g_real,
                       g_syn=g_syn_seg,
                       r_feats=[jax.lax.stop_gradient(f) for f in r_feats],
                       s_feats=[jax.lax.stop_gradient(f) for f in s_feats],
                       syn_seg_pre=s_heads[3], real_seg_pre=r_heads[3],
                       syn_dep_pre=pred_full,
                       real_dep_pre=up2(r_pred))
            return total, aux

        (loss_G, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            params["G"])
        upd, opt_states["G"] = self.opts["G"].update(g_grads, opt_states["G"],
                                                     params["G"])
        params["G"] = optax.apply_updates(params["G"], upd)
        stats = aux["stats"]
        metrics.update(G=loss_G, dep_syn=aux["dep_loss"],
                       adv_g_seg_syn=aux["g_syn"], adv_g_seg_real=aux["g_real"])
        metrics["acc_syn"] = seg_accuracy(up2(aux["syn_seg_pre"]), syn_seg_l, 255)
        metrics["acc_real"] = seg_accuracy(up2(aux["real_seg_pre"]), real_seg_l,
                                           255)

        # ---- DIS step: each head toward the fake class on both branches ----
        adv_d_syn = jnp.zeros(())
        adv_d_real = jnp.zeros(())
        for i, name in enumerate(self.HEADS):
            net = getattr(self, f"net_{name}")

            def d_loss_fn(hp, net=net, i=i, name=name):
                s = stats[name]
                r, s = self._apply(net, hp, s, aux["r_feats"][i], train=True)
                sy, s = self._apply(net, hp, s, aux["s_feats"][i], train=True)
                lr_ = seg_gan_loss(up2(r), real_seg_l, False, self.N_CLS)
                ls_ = seg_gan_loss(up2(sy), syn_seg_l, False, self.N_CLS)
                return lr_ + ls_, (lr_, ls_, s)

            (_, (lr_, ls_, s_h)), h_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(params[name])
            upd, opt_states[name] = self.opts[name].update(
                h_grads, opt_states[name], params[name])
            params[name] = optax.apply_updates(params[name], upd)
            stats[name] = s_h
            adv_d_real = adv_d_real + lr_
            adv_d_syn = adv_d_syn + ls_
        metrics.update(adv_d_seg_syn=adv_d_syn, adv_d_seg_real=adv_d_real)

        return state.replace(params=params, batch_stats=stats,
                             opt_states=opt_states,
                             step=state.step + 1), self.metrics_dict(**metrics)

    def _step_eval(self, state: ModelState, batch):
        params, stats = state.params, state.batch_stats
        syn_img, real_img = batch["img_syn"], batch["img_real"]
        (s_outs, s_pred, s_feats), _ = self._apply(
            self.net_G, params["G"], stats["G"], syn_img, self.SYN_DOMAIN, train=False)
        (r_outs, r_pred, r_feats), _ = self._apply(
            self.net_G, params["G"], stats["G"], real_img, "real", train=False)
        s_heads, _ = self._heads(params, dict(stats), s_feats, False)
        r_heads, _ = self._heads(params, dict(stats), r_feats, False)
        syn_seg_l = batch["seg_l_syn"]
        sky = (syn_seg_l != self.SKY_CLASS).astype(jnp.float32)[..., None]
        pred_full = up2(s_pred)
        metrics = {
            "dep_syn": 20.0 * l1_loss(sky * pred_full, sky * batch["dep_l_syn"]),
            "acc_syn": seg_accuracy(up2(s_heads[3]), syn_seg_l, 255),
        }
        if "seg_l_real" in batch:
            metrics["acc_real"] = seg_accuracy(up2(r_heads[3]),
                                               batch["seg_l_real"], 255)
        visuals = dict(syn_img=syn_img, real_img=real_img,
                       syn_seg_l=syn_seg_l, syn_dep_l=batch["dep_l_syn"],
                       syn_seg_pre=jnp.argmax(up2(s_heads[3]), -1),
                       real_seg_pre=jnp.argmax(up2(r_heads[3]), -1),
                       syn_dep_pre=pred_full, real_dep_pre=up2(r_pred))
        if "seg_l_real" in batch:
            visuals["real_seg_l"] = batch["seg_l_real"]
        return self.metrics_dict(**metrics), visuals


@register_model("rf_lw7")
class RefineNetSegDepth7(RefineNetSegDepth):
    """model7 variant of the RefineNet-LW track (reference
    new_model/model7.py, driver train7.py): rf_lw50 trunk by default
    (model7.py:213), ONE ``seg2_0`` head, bilinear ×2 upsampling
    (model7.py:212), and supervised (not fake-class) head training.

    - **G step** (model7.py:371-465, heads frozen):
      5·seg_gan(real, True) ×2 outer + 5·seg_gan(syn, True) + 3·dep where
      dep = sky-masked L1 on the fused prediction + 0.005·BCEDepLoss per
      ×2-upsampled band; G's Adam runs at full lr (model7.py:230-231).
    - **SEG step** (model7.py:539-564 backward_SEG): the head is trained
      toward the TRUE labels on detached features, syn + 0.01·real, at
      lr/2 — a supervised simplification of mdoel6's fake-class DIS step.
    - ``net_depth`` (``depth_block(256)``) and its Adam are constructed but
      never stepped/applied — reference quirk kept (model7.py:221-235,
      grep: no other net_depth use), like semantic_trans's Dis_80.
    - model7's depth L1 compares the half-resolution fused prediction
      against the full-resolution label (model7.py:432 — a torch shape
      error in the snapshot); we ×2-upsample the prediction like mdoel6,
      documented divergence.
    """

    loss_names = ("G", "dep_syn", "adv_g2_0_seg_syn", "adv_g2_0_seg_real",
                  "adv_d2_0_seg_syn", "adv_d2_0_seg_real", "acc_syn",
                  "acc_real")
    visual_names = ("syn_img", "real_img", "syn_seg_l", "syn_seg_pre",
                    "real_seg_pre", "syn_dep_l", "syn_dep_pre",
                    "real_dep_pre")
    model_names = ("G", "seg2_0", "depth")
    HEADS = ("seg2_0",)

    def __init__(self, cfg: Config):
        BaseModel.__init__(self, cfg)
        self._apply_syn_domain(cfg)  # model_ins-style per-domain split
        from .refinenet import DepthBlockR6

        dt = cfg.compute_dtype()
        layers = tuple(cfg.resnet_layers or (3, 4, 6, 3))  # rf_lw50
        self.net_G = ResNetLW(layers=layers, dtype=dt)
        self.net_seg2_0 = Segd(n_cls=self.N_CLS, up_scale=1, dtype=dt)
        # constructed-but-unstepped (model7.py:221-235)
        self.net_depth = DepthBlockR6(dtype=dt)
        lr, b1 = cfg.lr, cfg.beta1
        self.opts = {"G": make_adam(lr, b1),
                     "seg2_0": make_adam(lr / 2, b1),
                     "depth": make_adam(lr / 2, b1)}

    def init_state(self, rng: jax.Array) -> ModelState:
        cfg = self.cfg
        return self.init_state_at(rng, cfg.fine_size, cfg.fine_size * 3)

    def init_state_at(self, rng: jax.Array, h: int, w: int) -> ModelState:
        keys = jax.random.split(rng, 3)
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        vG = self.net_G.init(keys[0], x, "real")
        _, _, feats = self.net_G.apply(vG, x, "real")
        vs = {"G": vG,
              "seg2_0": self.net_seg2_0.init(keys[1], feats[3]),
              "depth": self.net_depth.init(keys[2], feats[2])}
        params = {k: v["params"] for k, v in vs.items()}
        stats = {k: v.get("batch_stats", {}) for k, v in vs.items()}
        return ModelState(
            params=params, batch_stats=stats,
            opt_states={k: self.opts[k].init(params[k]) for k in self.opts},
            pools={}, step=jnp.zeros((), jnp.int32))

    @staticmethod
    def _up2b(x):
        from ..ops import resize_bilinear

        n, h, w, c = x.shape
        return resize_bilinear(x, (h * 2, w * 2), align_corners=False)

    def _step_train(self, state: ModelState, batch, rng):
        up2b = self._up2b
        syn_img, real_img = batch["img_syn"], batch["img_real"]
        syn_seg_l, real_seg_l = batch["seg_l_syn"], batch["seg_l_real"]
        syn_dep_l, syn_dep_ls = batch["dep_l_syn"], batch["depth_l_s"]
        params = dict(state.params)
        stats = dict(state.batch_stats)
        opt_states = dict(state.opt_states)
        sky = (syn_seg_l != self.SKY_CLASS).astype(jnp.float32)[..., None]
        sky4 = jnp.repeat(sky, 4, axis=-1)
        oms, zms = get_masks(sky4 * syn_dep_ls)
        metrics: Dict[str, jax.Array] = {}

        # ---- G step (head frozen; model7.py:371-465) ----
        def g_loss_fn(gp):
            s = dict(stats)
            (r_outs, r_pred, r_feats), s["G"] = self._apply(
                self.net_G, gp, s["G"], real_img, "real", train=True)
            r_head, s["seg2_0"] = self._apply(
                self.net_seg2_0, params["seg2_0"], s["seg2_0"], r_feats[3],
                train=False)
            g_real = 5.0 * seg_gan_loss(up2b(r_head), real_seg_l, True,
                                        self.N_CLS)
            (s_outs, s_pred, s_feats), s["G"] = self._apply(
                self.net_G, gp, s["G"], syn_img, self.SYN_DOMAIN, train=True)
            s_head, s["seg2_0"] = self._apply(
                self.net_seg2_0, params["seg2_0"], s["seg2_0"], s_feats[3],
                train=False)
            g_syn = 5.0 * seg_gan_loss(up2b(s_head), syn_seg_l, True,
                                       self.N_CLS)
            pred_full = up2b(s_pred)
            dep = l1_loss(sky * pred_full, sky * syn_dep_l)
            for band in s_outs:
                # model7.py:424: 0.005 × the TRUNCATED BCEDepLoss variant
                dep = dep + 0.005 * bce_dep_loss_truncated(
                    sky * up2b(band), sky4 * syn_dep_ls, oms, zms)
            total = g_syn + 3.0 * dep + 2.0 * g_real
            aux = dict(stats=s, dep=dep, g_syn=g_syn, g_real=g_real,
                       r_f3=jax.lax.stop_gradient(r_feats[3]),
                       s_f3=jax.lax.stop_gradient(s_feats[3]),
                       syn_seg_pre=s_head, real_seg_pre=r_head,
                       syn_dep_pre=pred_full,
                       real_dep_pre=up2b(r_pred))
            return total, aux

        (loss_G, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            params["G"])
        upd, opt_states["G"] = self.opts["G"].update(g_grads, opt_states["G"],
                                                     params["G"])
        params["G"] = optax.apply_updates(params["G"], upd)
        stats = aux["stats"]
        metrics.update(G=loss_G, dep_syn=aux["dep"],
                       adv_g2_0_seg_syn=aux["g_syn"],
                       adv_g2_0_seg_real=aux["g_real"])
        metrics["acc_syn"] = seg_accuracy(up2b(aux["syn_seg_pre"]), syn_seg_l,
                                          255)
        metrics["acc_real"] = seg_accuracy(up2b(aux["real_seg_pre"]),
                                           real_seg_l, 255)

        # ---- SEG step (supervised, model7.py:539-564) ----
        def seg_loss_fn(hp):
            s = stats["seg2_0"]
            r, s = self._apply(self.net_seg2_0, hp, s, aux["r_f3"], train=True)
            sy, s = self._apply(self.net_seg2_0, hp, s, aux["s_f3"],
                                train=True)
            l_real = seg_gan_loss(up2b(r), real_seg_l, True, self.N_CLS)
            l_syn = seg_gan_loss(up2b(sy), syn_seg_l, True, self.N_CLS)
            return l_syn + 0.01 * l_real, (l_syn, l_real, s)

        (_, (l_syn, l_real, s_h)), h_grads = jax.value_and_grad(
            seg_loss_fn, has_aux=True)(params["seg2_0"])
        upd, opt_states["seg2_0"] = self.opts["seg2_0"].update(
            h_grads, opt_states["seg2_0"], params["seg2_0"])
        params["seg2_0"] = optax.apply_updates(params["seg2_0"], upd)
        stats["seg2_0"] = s_h
        metrics.update(adv_d2_0_seg_syn=l_syn, adv_d2_0_seg_real=l_real)

        return state.replace(params=params, batch_stats=stats,
                             opt_states=opt_states,
                             step=state.step + 1), self.metrics_dict(**metrics)

    def _step_eval(self, state: ModelState, batch):
        up2b = self._up2b
        params, stats = state.params, state.batch_stats
        syn_img, real_img = batch["img_syn"], batch["img_real"]
        (s_outs, s_pred, s_feats), _ = self._apply(
            self.net_G, params["G"], stats["G"], syn_img, self.SYN_DOMAIN, train=False)
        (r_outs, r_pred, r_feats), _ = self._apply(
            self.net_G, params["G"], stats["G"], real_img, "real", train=False)
        s_head, _ = self._apply(self.net_seg2_0, params["seg2_0"],
                                stats["seg2_0"], s_feats[3], train=False)
        r_head, _ = self._apply(self.net_seg2_0, params["seg2_0"],
                                stats["seg2_0"], r_feats[3], train=False)
        syn_seg_l = batch["seg_l_syn"]
        sky = (syn_seg_l != self.SKY_CLASS).astype(jnp.float32)[..., None]
        pred_full = up2b(s_pred)
        metrics = {
            "dep_syn": l1_loss(sky * pred_full, sky * batch["dep_l_syn"]),
            "acc_syn": seg_accuracy(up2b(s_head), syn_seg_l, 255),
        }
        if "seg_l_real" in batch:
            metrics["acc_real"] = seg_accuracy(up2b(r_head),
                                               batch["seg_l_real"], 255)
        visuals = dict(syn_img=syn_img, real_img=real_img,
                       syn_seg_l=syn_seg_l, syn_dep_l=batch["dep_l_syn"],
                       syn_seg_pre=jnp.argmax(up2b(s_head), -1),
                       real_seg_pre=jnp.argmax(up2b(r_head), -1),
                       syn_dep_pre=pred_full, real_dep_pre=up2b(r_pred))
        return self.metrics_dict(**metrics), visuals
