"""SegModel ("T2Net") — frozen s2t generator + dual-head seg task net.

TPU-native re-design of reference models/seg_model.py:12-117: a frozen
CycleGAN generator translates synthetic images to the real style; the T2Net
UNetGenerator predicts segmentation with its 'syn' head on translated images
and its 'real' head on real images; cross-entropy (ignore 255) on both
branches, Adam(1e-3, β=(0.95, 0.999)) on the task net only
(seg_model.py:40). Both CE branches + metrics compile into one jit step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from . import register_model
from ..config import Config
from .base_model import BaseModel, ModelState
from .networks import define_G
from .seg_network import cross_entropy_loss, define_task_G, seg_accuracy


@register_model("seg")
class SegModel(BaseModel):
    loss_names = ("loss_lab_s", "loss_lab_t", "acc_real", "acc_syn")
    visual_names = ("img_s", "img_t", "lab_s_pre", "lab_s", "img_s2t",
                    "lab_t_pre", "lab_t")
    model_names = ("img2task",)
    lr_opt_names = ()  # fixed LR in the reference (no scheduler stepping used)

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        dt = cfg.compute_dtype()
        self.net_s2t = define_G(cfg.output_nc, cfg.ngf, cfg.net_g, norm=cfg.norm,
                                use_dropout=not cfg.no_dropout,
                                init_type=cfg.init_type, init_gain=cfg.init_gain,
                                dtype=dt)
        self.net_img2task = define_task_G(ngf=cfg.ngf, layers=4, norm=cfg.norm,
                                          activation="PReLU", model_type="UNet",
                                          init_type=cfg.init_type, weight=0.1,
                                          dtype=dt)
        self.opt_T = optax.inject_hyperparams(optax.adam)(
            learning_rate=1e-3, b1=0.95, b2=0.999)

    def init_state(self, rng: jax.Array) -> ModelState:
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(rng, 3)
        # domain datasets are 640×192 (w×h) — shapes here only seed params
        x = jnp.zeros((1, 192, 640, cfg.input_nc), jnp.float32)
        v_s2t = self.net_s2t.init(k1, x)
        v_task = self.net_img2task.init({"params": k2, "dropout": k3, "noise": k3},
                                        x, "syn")
        params = {"s2t": v_s2t["params"], "img2task": v_task["params"]}
        stats = {"s2t": v_s2t.get("batch_stats", {}),
                 "img2task": v_task.get("batch_stats", {})}
        return ModelState(params=params, batch_stats=stats,
                          opt_states={"T": self.opt_T.init(params["img2task"])},
                          pools={}, step=jnp.zeros((), jnp.int32))

    def load_reference_s2t(self, state: ModelState, pth_path: str) -> ModelState:
        """Warm-start the frozen s2t generator from a reference CycleGAN
        checkpoint (the reference loads it via --continue machinery)."""
        from ..utils.torch_import import import_resnet_generator, load_pth

        n_blocks = {"resnet_9blocks": 9, "resnet_6blocks": 6,
                    "resnet_3blocks": 3, "3blocks": 3}[self.cfg.net_g]
        p = import_resnet_generator(load_pth(pth_path), n_blocks=n_blocks)
        p = jax.tree.map(jnp.asarray, p)
        return state.replace(params={**state.params, "s2t": p})

    # ------------------------------------------------------------------
    def _losses(self, task_params, state, batch, train, rng):
        img_s, img_t = batch["img_source"], batch["img_target"]
        lab_s = batch["lab_source"]
        lab_t = batch["lab_target"]
        stats = state.batch_stats
        # frozen translator, eval mode (reference net_s2t.eval(), no_grad)
        img_s2t, _ = self._apply(self.net_s2t, state.params["s2t"], stats["s2t"],
                                 img_s, train=False)
        img_s2t = jax.lax.stop_gradient(img_s2t)
        # independent dropout/noise draws per forward, like the reference's
        # two eager task-net calls (code-review fix: a shared rng correlated
        # the syn/real streams when drop_rate>0 or add_noise)
        rng_syn, rng_real = (jax.random.split(rng) if rng is not None
                             else (None, None))
        out_syn, stats_t = self._apply(self.net_img2task, task_params,
                                       stats["img2task"], img_s2t, "syn",
                                       train=train, rng=rng_syn)
        out_real, stats_t = self._apply(self.net_img2task, task_params, stats_t,
                                        img_t, "real", train=train, rng=rng_real)
        lab_s_pre, lab_t_pre = out_syn[1], out_real[1]
        loss_s = cross_entropy_loss(lab_s_pre, lab_s, 255)
        loss_t = cross_entropy_loss(lab_t_pre, lab_t, 255)
        aux = dict(img_s2t=img_s2t, lab_s_pre=lab_s_pre, lab_t_pre=lab_t_pre,
                   loss_lab_s=loss_s, loss_lab_t=loss_t,
                   acc_syn=seg_accuracy(lab_s_pre, lab_s, 255),
                   acc_real=seg_accuracy(lab_t_pre, lab_t, 255),
                   stats_t=stats_t)
        return loss_s + loss_t, aux

    def _step_train(self, state: ModelState, batch, rng):
        def loss_fn(tp):
            return self._losses(tp, state, batch, True, rng)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params["img2task"])
        upd, opt_state = self.opt_T.update(grads, state.opt_states["T"],
                                           state.params["img2task"])
        new_task = optax.apply_updates(state.params["img2task"], upd)
        metrics = self.metrics_dict(
            loss_lab_s=aux["loss_lab_s"], loss_lab_t=aux["loss_lab_t"],
            acc_real=aux["acc_real"], acc_syn=aux["acc_syn"])
        return state.replace(
            params={**state.params, "img2task": new_task},
            batch_stats={**state.batch_stats, "img2task": aux["stats_t"]},
            opt_states={"T": opt_state}, step=state.step + 1), metrics

    def _step_eval(self, state: ModelState, batch):
        _, aux = self._losses(state.params["img2task"], state, batch, False, None)
        metrics = self.metrics_dict(
            loss_lab_s=aux["loss_lab_s"], loss_lab_t=aux["loss_lab_t"],
            acc_real=aux["acc_real"], acc_syn=aux["acc_syn"])
        visuals = dict(img_s=batch["img_source"], img_t=batch["img_target"],
                       lab_s_pre=jnp.argmax(aux["lab_s_pre"], -1),
                       lab_s=batch["lab_source"], img_s2t=aux["img_s2t"],
                       lab_t_pre=jnp.argmax(aux["lab_t_pre"], -1),
                       lab_t=batch["lab_target"])
        return metrics, visuals
