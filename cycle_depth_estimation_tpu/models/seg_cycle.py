"""SegCycle — CycleGAN + dual U-Net encoder/decoder segmentation.

TPU-native re-design of reference models/seg_cycle.py:9-180: the CycleGAN
game (dual G/D, cycle/identity L1, LSGAN, ImagePool) plus four seg branches
over cross-wired encoder/decoder pairs —

    segAreal = decoderA(encoderA(real_A))   vs lab_A
    segAfake = decoderA(encoderB(fake_B))   vs lab_A
    segBreal = decoderB(encoderB(real_B))   vs lab_B
    segBfake = decoderB(encoderA(fake_A))   vs lab_B

— all four CE losses added to the G objective (seg_cycle.py:136-155). One
jitted step: joint G-group update (G_A, G_B, encoders, decoders) then one
D update with pooled detached fakes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from . import register_model
from ..config import Config
from ..utils.image_pool import init_pool, pool_query
from .base_model import BaseModel, ModelState, make_optimizer
from .encoder_decoder import UNetDecoder, UNetEncoder
from .networks import define_D, define_G, gan_loss, l1_loss
from .seg_network import cross_entropy_loss


@register_model("seg_cycle")
class SegCycleModel(BaseModel):
    loss_names = ("D_A", "G_A", "cycle_A", "idt_A", "D_B", "G_B", "cycle_B",
                  "idt_B", "segAreal", "segBreal", "segAfake", "segBfake")
    visual_names = ("real_A", "fake_B", "rec_A", "lab_A", "segAreal", "segAfake",
                    "idt_A", "real_B", "fake_A", "rec_B", "lab_B", "segBreal",
                    "segBfake", "idt_B")
    model_names = ("G_A", "G_B", "D_A", "D_B", "encoderA", "encoderB",
                   "decoderA", "decoderB")
    lr_opt_names = ("G", "D")

    NC_SYN = 22   # decoderA classes (seg_cycle.py:51)
    NC_REAL = 28  # decoderB classes (seg_cycle.py:52)

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
        # reference builds encoders/decoders with their default batch norm
        # (encoder_decoder.py get_norm_layer default, seg_cycle.py:48-52);
        # ngf follows cfg (reference hardcodes 64 == the cfg default)
        self.net_encoderA = UNetEncoder(ngf=cfg.ngf, dtype=dt)
        self.net_encoderB = UNetEncoder(ngf=cfg.ngf, dtype=dt)
        self.net_decoderA = UNetDecoder(output_nc=self.NC_SYN, ngf=cfg.ngf, dtype=dt)
        self.net_decoderB = UNetDecoder(output_nc=self.NC_REAL, ngf=cfg.ngf, dtype=dt)
        self.gan_mode = "vanilla" if cfg.no_lsgan else "lsgan"
        self.opt_G = make_optimizer(cfg.lr, cfg.beta1)
        self.opt_D = make_optimizer(cfg.lr, cfg.beta1)
        self.G_GROUP = ("G_A", "G_B", "encoderA", "encoderB",
                        "decoderA", "decoderB")

    def init_state(self, rng: jax.Array) -> ModelState:
        cfg = self.cfg
        keys = jax.random.split(rng, 9)
        h = w = cfg.fine_size
        xa = jnp.zeros((1, h, w, cfg.input_nc), jnp.float32)
        xb = jnp.zeros((1, h, w, cfg.output_nc), jnp.float32)
        vs = {
            "G_A": self.net_G_A.init(keys[0], xa),
            "G_B": self.net_G_B.init(keys[1], xb),
            "D_A": self.net_D_A.init(keys[2], xb),
            "D_B": self.net_D_B.init(keys[3], xa),
            "encoderA": self.net_encoderA.init(keys[4], xa),
            "encoderB": self.net_encoderB.init(keys[5], xb),
        }
        featsA = self.net_encoderA.apply(vs["encoderA"], xa)
        vs["decoderA"] = self.net_decoderA.init(keys[6], featsA)
        vs["decoderB"] = self.net_decoderB.init(keys[7], featsA)
        params = {k: v["params"] for k, v in vs.items()}
        stats = {k: v.get("batch_stats", {}) for k, v in vs.items()}
        g_sub = {k: params[k] for k in self.G_GROUP}
        d_sub = {k: params[k] for k in ("D_A", "D_B")}
        pools = {
            "fake_A": init_pool(cfg.pool_size, (h, w, cfg.input_nc)),
            "fake_B": init_pool(cfg.pool_size, (h, w, cfg.output_nc)),
        }
        return ModelState(params=params, batch_stats=stats,
                          opt_states={"G": self.opt_G.init(g_sub),
                                      "D": self.opt_D.init(d_sub)},
                          pools=pools, step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def _seg_basic(self, enc_mod, dec_mod, enc_p, dec_p, enc_s, dec_s, x, gt,
                   train, rng):
        feats, enc_s = self._apply(enc_mod, enc_p, enc_s, x, train=train, rng=rng)
        outs, dec_s = self._apply(dec_mod, dec_p, dec_s, feats, train=train,
                                  rng=rng)
        return cross_entropy_loss(outs[-1], gt, 255), outs[-1], enc_s, dec_s

    def _g_losses(self, g_sub, d_sub, state, batch, train, rng):
        cfg = self.cfg
        real_A, real_B = batch["img_source"], batch["img_target"]
        lab_A, lab_B = batch["lab_source"], batch["lab_target"]
        stats = dict(state.batch_stats)
        # one key per seg-branch forward — independent dropout/noise
        # draws like the reference's eager calls (review fix)
        k = jax.random.split(rng, 10) if rng is not None else [None] * 10

        # G_A/G_B BatchNorm stats thread in reference forward order (empty
        # pytrees under the instance default; review fix — were discarded)
        fake_B, stats["G_A"] = self._apply(self.net_G_A, g_sub["G_A"],
                                           stats["G_A"], real_A,
                                           train=train, rng=k[0])
        rec_A, stats["G_B"] = self._apply(self.net_G_B, g_sub["G_B"],
                                          stats["G_B"], fake_B,
                                          train=train, rng=k[1])
        fake_A, stats["G_B"] = self._apply(self.net_G_B, g_sub["G_B"],
                                           stats["G_B"], real_B,
                                           train=train, rng=k[2])
        rec_B, stats["G_A"] = self._apply(self.net_G_A, g_sub["G_A"],
                                          stats["G_A"], fake_A,
                                          train=train, rng=k[3])
        idt_A, stats["G_A"] = self._apply(self.net_G_A, g_sub["G_A"],
                                          stats["G_A"], real_B,
                                          train=train, rng=k[4])
        idt_B, stats["G_B"] = self._apply(self.net_G_B, g_sub["G_B"],
                                          stats["G_B"], real_A,
                                          train=train, rng=k[5])
        loss_idt_A = l1_loss(idt_A, real_B) * cfg.lambda_b * cfg.lambda_identity
        loss_idt_B = l1_loss(idt_B, real_A) * cfg.lambda_a * cfg.lambda_identity

        # the four seg branches, in reference order (seg_cycle.py:136-147);
        # encoder/decoder batch stats thread through sequentially
        sA, segAreal, stats["encoderA"], stats["decoderA"] = self._seg_basic(
            self.net_encoderA, self.net_decoderA, g_sub["encoderA"],
            g_sub["decoderA"], stats["encoderA"], stats["decoderA"],
            real_A, lab_A, train, k[6])
        sAf, segAfake, stats["encoderB"], stats["decoderA"] = self._seg_basic(
            self.net_encoderB, self.net_decoderA, g_sub["encoderB"],
            g_sub["decoderA"], stats["encoderB"], stats["decoderA"],
            fake_B, lab_A, train, k[8])
        sB, segBreal, stats["encoderB"], stats["decoderB"] = self._seg_basic(
            self.net_encoderB, self.net_decoderB, g_sub["encoderB"],
            g_sub["decoderB"], stats["encoderB"], stats["decoderB"],
            real_B, lab_B, train, k[7])
        sBf, segBfake, stats["encoderA"], stats["decoderB"] = self._seg_basic(
            self.net_encoderA, self.net_decoderB, g_sub["encoderA"],
            g_sub["decoderB"], stats["encoderA"], stats["decoderB"],
            fake_A, lab_B, train, k[9])

        # reference runs the Ds in train mode here (never .eval()'d)
        pred_fake_B, stats["D_A"] = self._apply(self.net_D_A, d_sub["D_A"],
                                                stats["D_A"], fake_B,
                                                train=train)
        pred_fake_A, stats["D_B"] = self._apply(self.net_D_B, d_sub["D_B"],
                                                stats["D_B"], fake_A,
                                                train=train)
        loss_G_A = gan_loss(pred_fake_B, True, self.gan_mode)
        loss_G_B = gan_loss(pred_fake_A, True, self.gan_mode)
        loss_cycle_A = l1_loss(rec_A, real_A) * cfg.lambda_a
        loss_cycle_B = l1_loss(rec_B, real_B) * cfg.lambda_b
        total = (loss_G_A + loss_G_B + loss_cycle_A + loss_cycle_B + loss_idt_A
                 + loss_idt_B + sAf + sA + sBf + sB)
        aux = dict(fake_B=fake_B, fake_A=fake_A, rec_A=rec_A, rec_B=rec_B,
                   idt_A=idt_A, idt_B=idt_B, segAreal=segAreal, segAfake=segAfake,
                   segBreal=segBreal, segBfake=segBfake,
                   losses=dict(G_A=loss_G_A, G_B=loss_G_B, cycle_A=loss_cycle_A,
                               cycle_B=loss_cycle_B, idt_A=loss_idt_A,
                               idt_B=loss_idt_B, segAreal=sA, segAfake=sAf,
                               segBreal=sB, segBfake=sBf),
                   stats=stats)
        return total, aux

    def _d_losses(self, d_sub, stats, real_B, fake_B, real_A, fake_A,
                  train=False):
        stats = dict(stats)

        def d_basic(mod, p, name, real, fake):
            pr, s = self._apply(mod, p, stats[name], real, train=train)
            pf, stats[name] = self._apply(mod, p, s, fake, train=train)
            return 0.5 * (gan_loss(pr, True, self.gan_mode)
                          + gan_loss(pf, False, self.gan_mode))

        la = d_basic(self.net_D_A, d_sub["D_A"], "D_A", real_B, fake_B)
        lb = d_basic(self.net_D_B, d_sub["D_B"], "D_B", real_A, fake_A)
        return la + lb, (la, lb, stats)

    # ------------------------------------------------------------------
    def _step_train(self, state: ModelState, batch, rng):
        cfg = self.cfg
        real_A, real_B = batch["img_source"], batch["img_target"]
        k_g, k_pool = jax.random.split(rng)
        params = state.params
        g_sub = {k: params[k] for k in self.G_GROUP}
        d_sub = {k: params[k] for k in ("D_A", "D_B")}

        def g_loss_fn(gp):
            return self._g_losses(gp, d_sub, state, batch, True, k_g)

        (_, aux), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(g_sub)
        g_upd, opt_G_state = self.opt_G.update(grads, state.opt_states["G"], g_sub)
        g_sub = optax.apply_updates(g_sub, g_upd)

        fake_B = jax.lax.stop_gradient(aux["fake_B"])
        fake_A = jax.lax.stop_gradient(aux["fake_A"])
        pools = dict(state.pools)
        kb, ka = jax.random.split(k_pool)
        pools["fake_B"], fake_B_mix = pool_query(pools["fake_B"], fake_B, kb,
                                                 cfg.pool_size)
        pools["fake_A"], fake_A_mix = pool_query(pools["fake_A"], fake_A, ka,
                                                 cfg.pool_size)

        def d_loss_fn(dp):
            total, (la, lb, s) = self._d_losses(
                dp, aux["stats"], real_B, fake_B_mix, real_A, fake_A_mix,
                train=True)
            return total, (la, lb, s)

        (_, (loss_D_A, loss_D_B, d_stats)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_sub)
        d_stats = jax.lax.stop_gradient(d_stats)
        d_upd, opt_D_state = self.opt_D.update(d_grads, state.opt_states["D"],
                                               d_sub)
        d_sub = optax.apply_updates(d_sub, d_upd)

        ls = aux["losses"]
        metrics = self.metrics_dict(D_A=loss_D_A, D_B=loss_D_B, **ls)
        return state.replace(
            params={**g_sub, **d_sub},
            batch_stats=d_stats,
            opt_states={"G": opt_G_state, "D": opt_D_state},
            pools=pools, step=state.step + 1), metrics

    def _step_eval(self, state: ModelState, batch):
        params = state.params
        g_sub = {k: params[k] for k in self.G_GROUP}
        d_sub = {k: params[k] for k in ("D_A", "D_B")}
        _, aux = self._g_losses(g_sub, d_sub, state, batch, False, None)
        _, (loss_D_A, loss_D_B, _) = self._d_losses(
            d_sub, state.batch_stats, batch["img_target"], aux["fake_B"],
            batch["img_source"], aux["fake_A"])
        metrics = self.metrics_dict(D_A=loss_D_A, D_B=loss_D_B, **aux["losses"])
        visuals = dict(real_A=batch["img_source"], fake_B=aux["fake_B"],
                       rec_A=aux["rec_A"], lab_A=batch["lab_source"],
                       segAreal=jnp.argmax(aux["segAreal"], -1),
                       segAfake=jnp.argmax(aux["segAfake"], -1),
                       idt_A=aux["idt_A"],
                       real_B=batch["img_target"], fake_A=aux["fake_A"],
                       rec_B=aux["rec_B"], lab_B=batch["lab_target"],
                       segBreal=jnp.argmax(aux["segBreal"], -1),
                       segBfake=jnp.argmax(aux["segBfake"], -1),
                       idt_B=aux["idt_B"])
        return metrics, visuals
