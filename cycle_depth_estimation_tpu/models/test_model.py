"""TestModel — generator-only inference wrapper.

Re-design of reference models/test_model.py:6-46: loads a single generator
(optionally named with ``model_suffix``) and maps ``real_A → fake_B``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import register_model
from ..config import Config
from .base_model import BaseModel, ModelState
from .networks import define_G


@register_model("test")
class TestModel(BaseModel):
    loss_names = ()
    visual_names = ("real_A", "fake_B")
    lr_opt_names = ()

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.model_names = ("G" + cfg.model_suffix,)
        self.net_G = define_G(cfg.output_nc, cfg.ngf, cfg.net_g, norm=cfg.norm,
                              use_dropout=not cfg.no_dropout,
                              init_type=cfg.init_type, init_gain=cfg.init_gain,
                              dtype=cfg.compute_dtype())

    def init_state(self, rng: jax.Array) -> ModelState:
        cfg = self.cfg
        x = jnp.zeros((1, cfg.fine_size, cfg.fine_size, cfg.input_nc), jnp.float32)
        v = self.net_G.init(rng, x)
        name = self.model_names[0]
        return ModelState(params={name: v["params"]},
                          batch_stats={name: v.get("batch_stats", {})},
                          opt_states={}, pools={}, step=jnp.zeros((), jnp.int32))

    def load_reference_generator(self, state: ModelState, pth_path: str
                                 ) -> ModelState:
        """Import a reference ``<epoch>_net_G<suffix>.pth`` ResnetGenerator."""
        from ..utils.torch_import import import_resnet_generator, load_pth

        n_blocks = {"resnet_9blocks": 9, "resnet_6blocks": 6,
                    "resnet_3blocks": 3, "3blocks": 3}[self.cfg.net_g]
        params = import_resnet_generator(load_pth(pth_path), n_blocks=n_blocks,
                                         use_dropout=not self.cfg.no_dropout,
                                         norm=self.cfg.norm)
        name = self.model_names[0]
        params = jax.tree.map(jnp.asarray, params)
        return state.replace(params={**state.params, name: params})

    def _step_eval(self, state: ModelState, batch):
        name = self.model_names[0]
        fake_B, _ = self._apply(self.net_G, state.params[name],
                                state.batch_stats[name], batch["A"], train=False)
        return {}, dict(real_A=batch["A"], fake_B=fake_B)

    def _step_train(self, state, batch, rng):
        raise NotImplementedError("TestModel cannot be used in train mode")
