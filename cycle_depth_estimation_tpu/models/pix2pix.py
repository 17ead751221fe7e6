"""pix2pix — aligned-pair conditional GAN (U-Net G + concat-AB PatchGAN D).

TPU-native re-design of reference models/pix2pix_model.py:7-111. One jitted
train step with the reference's update ORDER preserved: forward G → D update
(pooled, detached fake pair) → G update against the *updated* D
(pix2pix_model.py:100-111). BatchNorm running stats are threaded through the
same forward sequence the torch code executes (G once; D on fake, real, then
the G-loss pass).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from . import register_model
from ..config import Config
from ..utils.image_pool import init_pool, pool_query
from .base_model import BaseModel, ModelState, make_optimizer
from .networks import define_D, define_G, gan_loss, l1_loss


@register_model("pix2pix")
class Pix2PixModel(BaseModel):
    loss_names = ("G_GAN", "G_L1", "D_real", "D_fake")
    visual_names = ("real_A", "fake_B", "real_B")
    model_names = ("G", "D")
    lr_opt_names = ("G", "D")

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        dt = cfg.compute_dtype()
        self.net_G = define_G(cfg.output_nc, cfg.ngf, cfg.net_g, norm=cfg.norm,
                              use_dropout=not cfg.no_dropout,
                              init_type=cfg.init_type, init_gain=cfg.init_gain,
                              dtype=dt)
        self.net_D = define_D(cfg.ndf, cfg.net_d, cfg.n_layers_d, norm=cfg.norm,
                              use_sigmoid=False, init_type=cfg.init_type,
                              init_gain=cfg.init_gain, dtype=dt)
        self.gan_mode = "vanilla" if cfg.no_lsgan else "lsgan"
        # reference pix2pix uses lr for both optimizers (pix2pix_model.py:54-57)
        self.opt_G = make_optimizer(cfg.lr, cfg.beta1)
        self.opt_D = make_optimizer(cfg.lr, cfg.beta1)

    def init_state(self, rng: jax.Array) -> ModelState:
        cfg = self.cfg
        kG, kD, kdrop = jax.random.split(rng, 3)
        xa = jnp.zeros((1, cfg.fine_size, cfg.fine_size, cfg.input_nc), jnp.float32)
        xab = jnp.zeros(
            (1, cfg.fine_size, cfg.fine_size, cfg.input_nc + cfg.output_nc),
            jnp.float32)
        vG = self.net_G.init({"params": kG, "dropout": kdrop}, xa)
        vD = self.net_D.init(kD, xab)
        params = {"G": vG["params"], "D": vD["params"]}
        stats = {"G": vG.get("batch_stats", {}), "D": vD.get("batch_stats", {})}
        pools = {"fake_AB": init_pool(
            cfg.pool_size,
            (cfg.fine_size, cfg.fine_size, cfg.input_nc + cfg.output_nc))}
        return ModelState(
            params=params, batch_stats=stats,
            opt_states={"G": self.opt_G.init(params["G"]),
                        "D": self.opt_D.init(params["D"])},
            pools=pools, step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def _step_train(self, state: ModelState, batch, rng):
        cfg = self.cfg
        real_A, real_B = batch["A"], batch["B"]
        k_drop, k_pool = jax.random.split(rng)
        params, stats = state.params, dict(state.batch_stats)
        pools = dict(state.pools)

        # forward: fake_B = G(A), updating G batch stats (train mode)
        fake_B, stats_G = self._apply(self.net_G, params["G"], stats["G"], real_A,
                                      train=True, rng=k_drop)
        fake_B_d = jax.lax.stop_gradient(fake_B)

        # ---- D update (pooled, detached) ----
        fake_AB = jnp.concatenate([real_A, fake_B_d], axis=-1)
        pools["fake_AB"], fake_AB = pool_query(pools["fake_AB"], fake_AB, k_pool,
                                               cfg.pool_size)
        real_AB = jnp.concatenate([real_A, real_B], axis=-1)

        def d_loss_fn(dp):
            s = stats["D"]
            pred_fake, s = self._apply(self.net_D, dp, s, fake_AB, train=True)
            pred_real, s = self._apply(self.net_D, dp, s, real_AB, train=True)
            loss_fake = gan_loss(pred_fake, False, self.gan_mode)
            loss_real = gan_loss(pred_real, True, self.gan_mode)
            return 0.5 * (loss_fake + loss_real), (loss_fake, loss_real, s)

        ((_, (loss_D_fake, loss_D_real, stats_D)), d_grads) = jax.value_and_grad(
            d_loss_fn, has_aux=True)(params["D"])
        d_upd, opt_D_state = self.opt_D.update(d_grads, state.opt_states["D"],
                                               params["D"])
        d_params = optax.apply_updates(params["D"], d_upd)

        # ---- G update against the updated D ----
        def g_loss_fn(gp):
            fb, _ = self._apply(self.net_G, gp, stats["G"], real_A,
                                train=True, rng=k_drop)
            fab = jnp.concatenate([real_A, fb], axis=-1)
            pred_fake, s = self._apply(self.net_D, d_params, stats_D, fab,
                                       train=True)
            loss_gan = gan_loss(pred_fake, True, self.gan_mode)
            loss_l1 = l1_loss(fb, real_B) * cfg.lambda_l1
            return loss_gan + loss_l1, (loss_gan, loss_l1, fb, s)

        ((_, (loss_G_GAN, loss_G_L1, fake_B, stats_D)), g_grads) = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(params["G"]))
        g_upd, opt_G_state = self.opt_G.update(g_grads, state.opt_states["G"],
                                               params["G"])
        g_params = optax.apply_updates(params["G"], g_upd)

        metrics = self.metrics_dict(G_GAN=loss_G_GAN, G_L1=loss_G_L1,
                                    D_real=loss_D_real, D_fake=loss_D_fake)
        new_state = state.replace(
            params={"G": g_params, "D": d_params},
            batch_stats={"G": stats_G, "D": stats_D},
            opt_states={"G": opt_G_state, "D": opt_D_state},
            pools=pools, step=state.step + 1)
        return new_state, metrics

    def _step_eval(self, state: ModelState, batch):
        real_A, real_B = batch["A"], batch["B"]
        params, stats = state.params, state.batch_stats
        fake_B, _ = self._apply(self.net_G, params["G"], stats["G"], real_A,
                                train=False)
        fake_AB = jnp.concatenate([real_A, fake_B], axis=-1)
        real_AB = jnp.concatenate([real_A, real_B], axis=-1)
        pred_fake, _ = self._apply(self.net_D, params["D"], stats["D"], fake_AB,
                                   train=False)
        pred_real, _ = self._apply(self.net_D, params["D"], stats["D"], real_AB,
                                   train=False)
        metrics = self.metrics_dict(
            G_GAN=gan_loss(pred_fake, True, self.gan_mode),
            G_L1=l1_loss(fake_B, real_B) * self.cfg.lambda_l1,
            D_real=gan_loss(pred_real, True, self.gan_mode),
            D_fake=gan_loss(pred_fake, False, self.gan_mode))
        visuals = dict(real_A=real_A, fake_B=fake_B, real_B=real_B)
        return metrics, visuals
