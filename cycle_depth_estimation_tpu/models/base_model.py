"""Model-orchestration contract — the framework's BaseModel.

Functional re-design of the reference's stateful BaseModel
(reference models/base_model.py:7-171). The reflection-over-name-lists
pattern survives (``loss_names``, ``visual_names``, ``model_names``), but the
lifecycle is functional:

- ``init_state(rng)``      → immutable `ModelState` pytree (params, norm
  stats, optimizer states, image pools, step counter).
- ``train_step(state, batch, rng)`` → (state', metrics) — ONE jit-compiled
  XLA program containing every sub-update of the reference's
  ``optimize_parameters`` round-robin (G step, D steps, pool replay);
  `stop_gradient` / selective-diff replaces detach / set_requires_grad.
- ``eval_step(state, batch)``      → (metrics, visuals) — pure.
- ``update_learning_rate(state, epoch)`` → state' (host-side policy, the
  scalar LR lives in optimizer hyperparams on device).
- ``save`` / ``load``        → orbax checkpoint of the whole state;
  ``load_reference_networks`` imports the reference's per-net ``.pth``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from .networks import lr_schedule


@struct.dataclass
class ModelState:
    params: Any
    batch_stats: Any
    opt_states: Any
    pools: Any
    step: jax.Array


def make_optimizer(lr: float, beta1: float,
                   eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam matching torch defaults used throughout the reference
    (betas=(beta1, 0.999), eps=1e-8; e.g. models/cycle_gan_model.py:66-69).

    ``eps`` stays at the torch default for training; synthetic DP-parity
    tests pass a large value (cfg.adam_eps) to damp step-1 sign
    amplification (see Config.adam_eps)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr, b1=beta1,
                                                b2=0.999, eps=eps)


def set_opt_lr(opt_state, lr: float):
    """Write a new learning rate into an inject_hyperparams state.

    The new scalar adopts the old scalar's sharding so the train step does
    not recompile after an epoch LR update.
    """
    hp = dict(opt_state.hyperparams)
    old = hp["learning_rate"]
    new = jnp.asarray(lr, jnp.float32)
    if hasattr(old, "sharding"):
        new = jax.device_put(new, old.sharding)
    hp["learning_rate"] = new
    return opt_state._replace(hyperparams=hp)


class BaseModel:
    """Shared lifecycle; concrete models define modules + step functions."""

    loss_names: Tuple[str, ...] = ()
    visual_names: Tuple[str, ...] = ()
    model_names: Tuple[str, ...] = ()

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self._train_step_jit = None
        self._eval_step_jit = None

    # ---- module application helper -------------------------------------
    def _apply(self, module, params, stats, *args, train: bool = False,
               rng: Optional[jax.Array] = None, **kwargs):
        """Apply a flax module, threading batch_stats when the net has them.

        Returns (y, new_stats). ``stats`` is {} for norm-free nets. The rng
        (when given) feeds both 'dropout' and 'noise' streams.
        """
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        rngs = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
            rngs = {"dropout": r1, "noise": r2}
        if train and stats:
            y, mut = module.apply(variables, *args, train=True, rngs=rngs,
                                  mutable=["batch_stats"], **kwargs)
            return y, mut["batch_stats"]
        y = module.apply(variables, *args, train=train, rngs=rngs, **kwargs)
        return y, stats

    # ---- lifecycle ------------------------------------------------------
    def init_state(self, rng: jax.Array) -> ModelState:  # pragma: no cover
        raise NotImplementedError

    def init_state_on_host(self, rng: jax.Array) -> ModelState:
        """Initialize params on CPU, then transfer once.

        Running the many small init computations through the TPU (especially
        over the axon relay, where each dispatch round-trips) is very slow —
        measured 17 min for the 77M-param S2D init vs seconds on host. One
        bulk device_put afterwards is the TPU-friendly pattern.
        """
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            state = self.init_state(rng)
        if jax.default_backend() != "cpu":
            state = jax.device_put(state, jax.devices()[0])
        return state

    #: donate the input state's buffers to the jitted train step. Train
    #: loops enable this (the old state is dead after the step — params +
    #: both Adam moments of a 77M-param model are ~0.9 GB of HBM that XLA
    #: can then update in place); tests/notebooks that keep the previous
    #: state for comparison leave it off (the default).
    donate_state: bool = False

    def train_step(self, state: ModelState, batch, rng: jax.Array):
        if self._train_step_jit is None:
            donate = (0,) if self.donate_state else ()
            self._train_step_jit = jax.jit(self._step_train,
                                           donate_argnums=donate)
        return self._train_step_jit(state, batch, rng)

    def eval_step(self, state: ModelState, batch):
        if self._eval_step_jit is None:
            self._eval_step_jit = jax.jit(self._step_eval)
        return self._eval_step_jit(state, batch)

    def _step_train(self, state, batch, rng):  # pragma: no cover
        raise NotImplementedError

    def _step_eval(self, state, batch):  # pragma: no cover
        raise NotImplementedError

    # ---- learning-rate policy (reference base_model.py:67-71) ----------
    lr_opt_names: Tuple[str, ...] = ()

    # host-side ReduceLROnPlateau state (torch defaults: mode='min',
    # factor=0.2, threshold=0.01 rel, patience=5 — reference networks.py:32).
    # Like the reference, scheduler state is NOT checkpointed. NOTE the
    # reference's stock loop calls scheduler.step() with no metric, which
    # torch rejects for plateau — so the policy never actually stepped there;
    # we accept a monitored metric (train.py passes the epoch eval mean) and
    # hold the LR when none is supplied.
    _plateau = None

    def update_learning_rate(self, state: ModelState, epoch: int,
                             metric: float = None) -> ModelState:
        cfg = self.cfg
        new_opts = dict(state.opt_states)
        if cfg.lr_policy == "plateau":
            if self._plateau is None:
                self._plateau = {"best": float("inf"), "bad": 0, "scale": 1.0}
            ps = self._plateau
            if metric is not None:
                if metric < ps["best"] * (1.0 - 0.01):
                    ps["best"], ps["bad"] = float(metric), 0
                else:
                    ps["bad"] += 1
                    if ps["bad"] > 5:
                        ps["scale"] *= 0.2
                        ps["bad"] = 0
            for name in self.lr_opt_names:
                new_opts[name] = set_opt_lr(state.opt_states[name],
                                            cfg.lr * ps["scale"])
            return state.replace(opt_states=new_opts)
        for name in self.lr_opt_names:
            # every scheduled optimizer is built and rebased from cfg.lr —
            # the reference steps all its schedulers from opt.lr (e.g.
            # models/cycle_gan_model.py builds optimizer_D with opt.lr);
            # cfg.lr_d is the base-generation my_seg_depth/train.py flag and
            # no scheduled model here initializes with it
            lr = lr_schedule(cfg.lr_policy, cfg.lr, epoch=epoch, niter=cfg.niter,
                             niter_decay=cfg.niter_decay,
                             lr_decay_iters=cfg.lr_decay_iters)
            new_opts[name] = set_opt_lr(state.opt_states[name], lr)
        return state.replace(opt_states=new_opts)

    # ---- checkpointing --------------------------------------------------
    def _ckpt_dir(self, epoch: str) -> str:
        return os.path.abspath(os.path.join(self.cfg.expr_dir(), f"ckpt_{epoch}"))

    _async_ckptr = None

    def save_networks(self, state: ModelState, epoch) -> str:
        """Orbax whole-state checkpoint (reference saved per-net .pth,
        models/base_model.py:102-114).

        With cfg.async_checkpoint the save runs in the background
        (StandardCheckpointer is an AsyncCheckpointer under the hood): the
        device→host copy happens now, serialization overlaps the next train
        steps. Call `finish_checkpoints()` before exit/restore.
        """
        import orbax.checkpoint as ocp

        path = self._ckpt_dir(str(epoch))
        if getattr(self.cfg, "async_checkpoint", False):
            if self._async_ckptr is None:
                self._async_ckptr = ocp.StandardCheckpointer()
            self._async_ckptr.save(path, jax.device_get(state), force=True)
            return path
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(state), force=True)
        ckptr.wait_until_finished()
        return path

    def finish_checkpoints(self):
        """Block until pending async saves are durable."""
        if self._async_ckptr is not None:
            self._async_ckptr.wait_until_finished()

    def load_networks(self, state: ModelState, epoch) -> ModelState:
        import orbax.checkpoint as ocp

        path = self._ckpt_dir(str(epoch))
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path, jax.device_get(state))
        return jax.tree.map(jnp.asarray, restored)

    # ---- metrics helpers ------------------------------------------------
    def metrics_dict(self, **kw) -> Dict[str, jax.Array]:
        return {k: jnp.asarray(v, jnp.float32) for k, v in kw.items()}
