"""CycleGAN — dual generator/discriminator unpaired translation.

TPU-native re-design of reference models/cycle_gan_model.py:8-160. The whole
``optimize_parameters`` round-robin (G joint update, then the reference's
quirky **4× D updates per G step**, cycle_gan_model.py:151-160, each with a
fresh ImagePool query of the same fakes) compiles into ONE XLA program.

Faithfulness notes:
- the reference does not detach fakes in the D loss (cycle_gan_model.py:92-93)
  but only steps optimizer_D there, so the *updates* are identical to a
  detached pass — here D grads are simply taken wrt D params only;
- ``d_steps_per_g`` (default 4) gates the quirk; set 1 for the standard
  CycleGAN recipe;
- loss/visual names match the reference exactly
  (cycle_gan_model.py:28-36).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from . import register_model
from ..config import Config
from ..utils.image_pool import init_pool, pool_query
from .base_model import BaseModel, ModelState, make_optimizer
from .networks import define_D, define_G, gan_loss, l1_loss


@register_model("cycle_gan")
class CycleGANModel(BaseModel):
    loss_names = ("D_A", "G_A", "cycle_A", "idt_A", "D_B", "G_B", "cycle_B", "idt_B")
    visual_names = ("real_A", "fake_B", "rec_A", "idt_B",
                    "real_B", "fake_A", "rec_B", "idt_A")
    model_names = ("G_A", "G_B", "D_A", "D_B")
    lr_opt_names = ("G", "D")

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        dt = cfg.compute_dtype()
        g_kw = dict(norm=cfg.norm, use_dropout=not cfg.no_dropout,
                    init_type=cfg.init_type, init_gain=cfg.init_gain, dtype=dt)
        d_kw = dict(norm=cfg.norm, use_sigmoid=False, init_type=cfg.init_type,
                    init_gain=cfg.init_gain, dtype=dt)
        self.net_G_A = define_G(cfg.output_nc, cfg.ngf, cfg.net_g, **g_kw)
        self.net_G_B = define_G(cfg.input_nc, cfg.ngf, cfg.net_g, **g_kw)
        self.net_D_A = define_D(cfg.ndf, cfg.net_d, cfg.n_layers_d, **d_kw)
        self.net_D_B = define_D(cfg.ndf, cfg.net_d, cfg.n_layers_d, **d_kw)
        self.gan_mode = "vanilla" if cfg.no_lsgan else "lsgan"
        self.opt_G = make_optimizer(cfg.lr, cfg.beta1)
        self.opt_D = make_optimizer(cfg.lr, cfg.beta1)

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array) -> ModelState:
        cfg = self.cfg
        kA, kB, kDA, kDB = jax.random.split(rng, 4)
        xa = jnp.zeros((1, cfg.fine_size, cfg.fine_size, cfg.input_nc), jnp.float32)
        xb = jnp.zeros((1, cfg.fine_size, cfg.fine_size, cfg.output_nc), jnp.float32)
        vs = {
            "G_A": self.net_G_A.init(kA, xa),
            "G_B": self.net_G_B.init(kB, xb),
            "D_A": self.net_D_A.init(kDA, xb),
            "D_B": self.net_D_B.init(kDB, xa),
        }
        params = {k: v["params"] for k, v in vs.items()}
        stats = {k: v.get("batch_stats", {}) for k, v in vs.items()}
        g_sub = {"G_A": params["G_A"], "G_B": params["G_B"]}
        d_sub = {"D_A": params["D_A"], "D_B": params["D_B"]}
        pools = {
            "fake_A": init_pool(cfg.pool_size,
                                (cfg.fine_size, cfg.fine_size, cfg.input_nc)),
            "fake_B": init_pool(cfg.pool_size,
                                (cfg.fine_size, cfg.fine_size, cfg.output_nc)),
        }
        return ModelState(
            params=params,
            batch_stats=stats,
            opt_states={"G": self.opt_G.init(g_sub), "D": self.opt_D.init(d_sub)},
            pools=pools,
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def _forward_g(self, params, stats, real_A, real_B, train, rng):
        """fake_B, rec_A, fake_A, rec_B (+ identity passes) + updated stats.

        BatchNorm stats (``--norm batch``; empty pytrees under the instance
        default) thread in the reference forward order — the 4 forward()
        passes then the 2 backward_G identity passes, which is exactly this
        sequence (cycle_gan_model.py:86-89,104-110).

        With cfg.remat, each generator application is wrapped in
        `jax.checkpoint`: the G loss holds 6 generator activations live for
        the backward pass, which caps the batch size (bs 32 spills on v5e);
        remat recomputes them instead.
        """
        k = jax.random.split(rng, 6) if rng is not None else [None] * 6
        stats = dict(stats)

        def apply_g(module, p, name, x, key):
            def fwd(p, x, s):
                return self._apply(module, p, s, x, train=train, rng=key)

            if self.cfg.remat:
                fwd = jax.checkpoint(fwd)
            out, stats[name] = fwd(p, x, stats[name])
            return out

        fake_B = apply_g(self.net_G_A, params["G_A"], "G_A", real_A, k[0])
        rec_A = apply_g(self.net_G_B, params["G_B"], "G_B", fake_B, k[1])
        fake_A = apply_g(self.net_G_B, params["G_B"], "G_B", real_B, k[2])
        rec_B = apply_g(self.net_G_A, params["G_A"], "G_A", fake_A, k[3])
        idt_A = apply_g(self.net_G_A, params["G_A"], "G_A", real_B, k[4])
        idt_B = apply_g(self.net_G_B, params["G_B"], "G_B", real_A, k[5])
        return fake_B, rec_A, fake_A, rec_B, idt_A, idt_B, stats

    def _g_losses(self, g_params, d_params, stats, real_A, real_B, train, rng):
        cfg = self.cfg
        fake_B, rec_A, fake_A, rec_B, idt_A, idt_B, stats = self._forward_g(
            g_params, stats, real_A, real_B, train, rng)
        if cfg.lambda_identity > 0:
            loss_idt_A = l1_loss(idt_A, real_B) * cfg.lambda_b * cfg.lambda_identity
            loss_idt_B = l1_loss(idt_B, real_A) * cfg.lambda_a * cfg.lambda_identity
        else:
            loss_idt_A = jnp.zeros(())
            loss_idt_B = jnp.zeros(())
        # reference backward_G runs the Ds in train mode (torch modules are
        # never .eval()'d during optimize_parameters) → BN stats advance here
        stats = dict(stats)
        pred_fake_B, stats["D_A"] = self._apply(
            self.net_D_A, d_params["D_A"], stats["D_A"], fake_B, train=train)
        pred_fake_A, stats["D_B"] = self._apply(
            self.net_D_B, d_params["D_B"], stats["D_B"], fake_A, train=train)
        loss_G_A = gan_loss(pred_fake_B, True, self.gan_mode)
        loss_G_B = gan_loss(pred_fake_A, True, self.gan_mode)
        loss_cycle_A = l1_loss(rec_A, real_A) * cfg.lambda_a
        loss_cycle_B = l1_loss(rec_B, real_B) * cfg.lambda_b
        loss_G = (loss_G_A + loss_G_B + loss_cycle_A + loss_cycle_B
                  + loss_idt_A + loss_idt_B)
        aux = dict(fake_B=fake_B, rec_A=rec_A, fake_A=fake_A, rec_B=rec_B,
                   idt_A=idt_A, idt_B=idt_B, stats=stats,
                   G_A=loss_G_A, G_B=loss_G_B, cycle_A=loss_cycle_A,
                   cycle_B=loss_cycle_B, idt_a=loss_idt_A, idt_b=loss_idt_B)
        return loss_G, aux

    def _d_losses(self, d_params, stats, real_B, fake_B_mix, real_A, fake_A_mix,
                  train=False):
        stats = dict(stats)

        def d_basic(module, p, name, real, fake):
            pred_real, s = self._apply(module, p, stats[name], real,
                                       train=train)
            pred_fake, stats[name] = self._apply(module, p, s, fake,
                                                 train=train)
            return 0.5 * (gan_loss(pred_real, True, self.gan_mode)
                          + gan_loss(pred_fake, False, self.gan_mode))

        loss_D_A = d_basic(self.net_D_A, d_params["D_A"], "D_A",
                           real_B, fake_B_mix)
        loss_D_B = d_basic(self.net_D_B, d_params["D_B"], "D_B",
                           real_A, fake_A_mix)
        return loss_D_A + loss_D_B, (loss_D_A, loss_D_B, stats)

    # ------------------------------------------------------------------
    def _step_train(self, state: ModelState, batch, rng):
        cfg = self.cfg
        real_A = batch["img_source"]
        real_B = batch["img_target"]
        k_drop, k_pool = jax.random.split(rng)

        params, stats = state.params, state.batch_stats
        g_sub = {"G_A": params["G_A"], "G_B": params["G_B"]}
        d_sub = {"D_A": params["D_A"], "D_B": params["D_B"]}

        # ---- G update (D frozen: grads taken wrt G subtree only) ----
        def g_loss_fn(gp):
            return self._g_losses(gp, d_sub, stats, real_A, real_B, True, k_drop)

        (loss_G, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(g_sub)
        g_upd, opt_G_state = self.opt_G.update(g_grads, state.opt_states["G"], g_sub)
        g_sub = optax.apply_updates(g_sub, g_upd)
        stats = jax.lax.stop_gradient(aux["stats"])  # G+D BN stats so far

        fake_B = jax.lax.stop_gradient(aux["fake_B"])
        fake_A = jax.lax.stop_gradient(aux["fake_A"])

        # ---- D updates ×d_steps_per_g, each with a fresh pool query ----
        pools = dict(state.pools)
        opt_D_state = state.opt_states["D"]
        loss_D_A = loss_D_B = jnp.zeros(())
        for i in range(cfg.d_steps_per_g):
            kb, ka, k_pool = jax.random.split(k_pool, 3)
            pools["fake_B"], fake_B_mix = pool_query(pools["fake_B"], fake_B, kb,
                                                     cfg.pool_size)
            pools["fake_A"], fake_A_mix = pool_query(pools["fake_A"], fake_A, ka,
                                                     cfg.pool_size)

            def d_loss_fn(dp, stats=stats):
                total, (la, lb, s) = self._d_losses(
                    dp, stats, real_B, fake_B_mix, real_A, fake_A_mix,
                    train=True)
                return total, (la, lb, s)

            (_, (loss_D_A, loss_D_B, stats)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(d_sub)
            stats = jax.lax.stop_gradient(stats)
            d_upd, opt_D_state = self.opt_D.update(d_grads, opt_D_state, d_sub)
            d_sub = optax.apply_updates(d_sub, d_upd)

        new_params = {**g_sub, **d_sub}
        metrics = self.metrics_dict(
            D_A=loss_D_A, G_A=aux["G_A"], cycle_A=aux["cycle_A"], idt_A=aux["idt_a"],
            D_B=loss_D_B, G_B=aux["G_B"], cycle_B=aux["cycle_B"], idt_B=aux["idt_b"],
        )
        new_state = state.replace(
            params=new_params,
            batch_stats=stats,
            opt_states={"G": opt_G_state, "D": opt_D_state},
            pools=pools,
            step=state.step + 1,
        )
        return new_state, metrics

    def _step_eval(self, state: ModelState, batch):
        real_A = batch["img_source"]
        real_B = batch["img_target"]
        params, stats = state.params, state.batch_stats
        g_sub = {"G_A": params["G_A"], "G_B": params["G_B"]}
        d_sub = {"D_A": params["D_A"], "D_B": params["D_B"]}
        loss_G, aux = self._g_losses(g_sub, d_sub, stats, real_A, real_B,
                                     False, None)
        _, (loss_D_A, loss_D_B, _) = self._d_losses(d_sub, stats, real_B,
                                                    aux["fake_B"], real_A,
                                                    aux["fake_A"])
        metrics = self.metrics_dict(
            D_A=loss_D_A, G_A=aux["G_A"], cycle_A=aux["cycle_A"], idt_A=aux["idt_a"],
            D_B=loss_D_B, G_B=aux["G_B"], cycle_B=aux["cycle_B"], idt_B=aux["idt_b"],
        )
        visuals = dict(real_A=real_A, fake_B=aux["fake_B"], rec_A=aux["rec_A"],
                       real_B=real_B, fake_A=aux["fake_A"], rec_B=aux["rec_B"],
                       idt_A=aux["idt_A"], idt_B=aux["idt_B"])
        return metrics, visuals
