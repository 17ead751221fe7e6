"""S2D_semantic_trans — the `trymulti/semantic_trans` generation's training
machinery on top of the S2D pipeline.

The semantic_trans snapshot (reference my_seg_depth/trymulti/semantic_trans/
model5.py) is the generation between `trymulti` and `new_multi`: same
G_1/G_2/R_dep backbone family, plus a set of depth-adversarial objectives the
new_multi end-state later dropped:

- **DIS** — ``Discriminator(repeat_num=5)`` over the 2-channel concat of the
  refined depth and the segmentation label (model5.py:486-498);
- **Dis_80 / Dis_160 / Dis_320** — 1-channel multi-resolution depth
  discriminators (model5.py:243-250). Dis_160/320 are stepped on quarter- /
  half-resolution band-1 depth maps with gradient clipping at 1.0
  (model5.py:503-518); **Dis_80 is constructed but never stepped** in the
  reference loop — reproduced (constructed, optimizer allocated, unused);
- the R_D real branch gains ``0.2·GAN(D_160, False) + GAN(D_320, False)``
  feature-alignment terms (model5.py:541-548);
- **WGAN-GP** ``calc_gradient_penalty`` (model5.py:354-382). The reference
  attaches it in ``backward_DIS``, which references undefined attributes
  (``self.net_D``, ``self.net_Dis_en`` — a latent bug; the method cannot
  run). Here the penalty lands on the DIS update, its only coherent home.

Loss-criterion note: the band depth criterion here is the generation's own
TRUNCATED BCEDepLoss (single o_m BCE — semantic_trans/networks5_ds.py:
849-852), not new_multi's 3-term version; see ``band_criterion`` below.
The reference's additional per-scale ``sed[:,1]`` term (model5.py:576) has
no counterpart because this class reuses the new_multi R_D head, which
emits full-resolution bands rather than per-scale stacks.

Scale mapping note: the reference's 160/320-scale maps are band-1 slices of
the semantic_trans R_dep's per-scale 4-band stacks (``s_Seds[0][:,1]``,
bilinearly resized, model5.py:541-542, 588-589). Our RDep (the new_multi
end-state) exposes the four full-resolution band depths, so the same maps
are obtained by resizing band 1 to 1/4 and 1/2 resolution
(UpsamplingBilinear2d ⇒ align_corners=True).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from . import register_model
from ..config import Config
from ..ops import resize_bilinear
from .base_model import make_optimizer
from .networks import gan_loss
from .s2d import S2DModel
from .s2d_networks import (
    StarDiscriminator,
    bce_dep_loss_truncated,
    calc_gradient_penalty,
)


@register_model("semantic_trans")
class S2DSemanticTrans(S2DModel):
    loss_names = S2DModel.loss_names + ("DEP_DIS", "d160", "d320", "gp")
    model_names = S2DModel.model_names + ("DIS", "Dis_80", "Dis_160",
                                          "Dis_320")

    GP_LAMBDA = 10.0  # model5.py:380

    # this generation's local networks5_ds copy truncates BCEDepLoss to the
    # single o_m BCE term (semantic_trans/networks5_ds.py:849-852), and
    # model5.py:288,581 trains with that copy
    band_criterion = staticmethod(bce_dep_loss_truncated)

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        dt = cfg.compute_dtype()
        self.net_DIS = StarDiscriminator(repeat_num=5, dtype=dt)
        self.net_Dis_80 = StarDiscriminator(repeat_num=3, dtype=dt)
        self.net_Dis_160 = StarDiscriminator(repeat_num=4, dtype=dt)
        self.net_Dis_320 = StarDiscriminator(repeat_num=4, dtype=dt)
        lr, b1 = cfg.lr, cfg.beta1
        # all four at lr/4 (model5.py:266-277); Dis_160/320 updates clip the
        # global grad norm at 1.0 (torch clip_grad_norm_, model5.py:509,517)
        clipped = lambda: optax.chain(  # noqa: E731
            optax.clip_by_global_norm(1.0),
            make_optimizer(lr / 4, b1))
        self.opts = dict(self.opts, DIS=make_optimizer(lr / 4, b1),
                         Dis_80=make_optimizer(lr / 4, b1),
                         Dis_160=clipped(), Dis_320=clipped())

    # ------------------------------------------------------------------
    def init_state(self, rng, hw=None):
        state = super().init_state(rng, hw)
        h, w = hw or (self.cfg.fine_size, self.cfg.fine_size * 3)
        keys = jax.random.split(jax.random.fold_in(rng, 7), 4)
        params = dict(state.params)
        stats = dict(state.batch_stats)
        opt_states = dict(state.opt_states)
        two = jnp.zeros((1, h, w, 2), jnp.float32)
        one = jnp.zeros((1, h, w, 1), jnp.float32)
        for name, net, x, key in (
                ("DIS", self.net_DIS, two, keys[0]),
                ("Dis_80", self.net_Dis_80, one, keys[1]),
                ("Dis_160", self.net_Dis_160,
                 jnp.zeros((1, h // 4, w // 4, 1), jnp.float32), keys[2]),
                ("Dis_320", self.net_Dis_320,
                 jnp.zeros((1, h // 2, w // 2, 1), jnp.float32), keys[3])):
            vs = net.init(key, x)
            params[name] = vs["params"]
            stats[name] = vs.get("batch_stats", {})
            opt_states[name] = self.opts[name].init(params[name])
        return state.replace(params=params, batch_stats=stats,
                             opt_states=opt_states)

    # ------------------------------------------------------------------
    def _scaled_band(self, dep_4, factor: int):
        """band-1 depth at 1/factor resolution (model5.py:541-542)."""
        b = dep_4[1]
        n, h, w, _ = b.shape
        return resize_bilinear(b, (h // factor, w // factor),
                               align_corners=True)

    def _rd_real_adv_extra(self, params, stats, dep_4, dep_o):
        """R_D real-branch alignment vs the multi-res depth discriminators
        (model5.py:541-548): push D_160/D_320 outputs toward *fake*.

        Like the FDs, the reference never switches these to eval during
        training, so their BatchNorms use batch statistics here and the
        updated running stats thread into their own update phase."""
        d160, s160 = self._apply(self.net_Dis_160, params["Dis_160"],
                                 stats["Dis_160"],
                                 self._scaled_band(dep_4, 4), train=True)
        d320, s320 = self._apply(self.net_Dis_320, params["Dis_320"],
                                 stats["Dis_320"],
                                 self._scaled_band(dep_4, 2), train=True)
        return (0.2 * gan_loss(d160, False) + gan_loss(d320, False),
                {"Dis_160": s160, "Dis_320": s320})

    def _post_phases(self, params, stats, opt_states, metrics, ctx, rng):
        """backward_DISDEP (model5.py:480-519) + GP as one compiled phase."""
        real_pair = jnp.concatenate(
            [ctx["real_dep_ref"],
             ctx["real_seg_l"].astype(jnp.float32)[..., None]], axis=-1)
        syn_pair = jnp.concatenate(
            [ctx["syn_dep_ref"],
             ctx["syn_seg_l"].astype(jnp.float32)[..., None]], axis=-1)

        def dis_loss_fn(dp):
            pr, s = self._apply(self.net_DIS, dp, stats["DIS"], real_pair,
                                train=True)
            pf, s = self._apply(self.net_DIS, dp, s, syn_pair, train=True)
            gp = calc_gradient_penalty(
                lambda x: self._apply(self.net_DIS, dp, s, x, train=False)[0],
                real_pair, syn_pair, rng, self.GP_LAMBDA)
            return gan_loss(pr, True) + gan_loss(pf, False) + gp, (gp, s)

        (dis_loss, (gp, s_dis)), grads = jax.value_and_grad(
            dis_loss_fn, has_aux=True)(params["DIS"])
        upd, opt_states["DIS"] = self.opts["DIS"].update(
            grads, opt_states["DIS"], params["DIS"])
        params["DIS"] = optax.apply_updates(params["DIS"], upd)
        stats["DIS"] = s_dis
        metrics["DEP_DIS"] = dis_loss
        metrics["gp"] = gp

        for name, factor in (("Dis_160", 4), ("Dis_320", 2)):
            net = getattr(self, f"net_{name}")
            r = self._scaled_band(ctx["real_dep_4"], factor)
            f = self._scaled_band(ctx["syn_dep_4"], factor)

            def d_loss_fn(dp, net=net, name=name, r=r, f=f):
                pr, s = self._apply(net, dp, stats[name], r, train=True)
                pf, s = self._apply(net, dp, s, f, train=True)
                return gan_loss(pr, True) + gan_loss(pf, False), s

            (d_loss, s_d), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(params[name])
            upd, opt_states[name] = self.opts[name].update(
                grads, opt_states[name], params[name])
            params[name] = optax.apply_updates(params[name], upd)
            stats[name] = s_d
            metrics["d160" if factor == 4 else "d320"] = d_loss
        return params, stats, opt_states, metrics
