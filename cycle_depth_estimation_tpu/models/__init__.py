"""Model registry.

Explicit-dict replacement for the reference's importlib-by-convention plugin
registry (reference models/__init__.py:9-43). Same string keys the reference
CLI accepts: ``cycle_gan``, ``pix2pix``, ``test`` (and the research models as
they land: ``seg``, ``seg_cycle``, ``S2D``).
"""

from __future__ import annotations

from typing import Callable, Dict

_MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(cls):
        _MODEL_REGISTRY[name] = cls
        return cls

    return deco


# model modules with registration side effects; extended as models land
_MODEL_MODULES = ["cycle_gan", "pix2pix", "test_model", "seg_model", "seg_cycle",
                  "s2d", "rf_lw", "s2d_base", "s2d_alt", "s2d_df", "s2d_nd",
                  "semantic_trans", "semantic_trans_full"]


def _import_all():
    import importlib

    for mod in _MODEL_MODULES:
        importlib.import_module(f".{mod}", __package__)


def get_model_class(name: str):
    if name not in _MODEL_REGISTRY:
        _import_all()
    if name not in _MODEL_REGISTRY:
        raise KeyError(
            f"model [{name}] not registered; available: {sorted(_MODEL_REGISTRY)}"
        )
    return _MODEL_REGISTRY[name]


def create_model(config):
    """Reference ``create_model(opt)`` equivalent (models/__init__.py:38-43)."""
    cls = get_model_class(config.model)
    return cls(config)


def available_models():
    _import_all()
    return sorted(_MODEL_REGISTRY)
