"""Data layer: explicit dataset registry + threaded host pipeline.

Replaces the reference's importlib-by-convention registry and
torch DataLoader wrapper (reference data/__init__.py:7-75) with an explicit
dict registry and a GIL-light threaded loader feeding NHWC numpy batches,
plus a device double-buffer (`prefetch_to_device`) to overlap host decode
with TPU compute.

Registered keys match the reference CLI: ``unaligned | aligned | single``
(+ the domain-pair research loaders as they land: ``synthia``, ``kitti``,
``try``).
"""

from __future__ import annotations

from typing import Callable, Dict

_DATASET_REGISTRY: Dict[str, Callable] = {}


def register_dataset(name: str):
    def deco(cls):
        _DATASET_REGISTRY[name] = cls
        return cls

    return deco


_DATASET_MODULES = ["datasets", "domain_datasets"]


def _import_all():
    import importlib

    for mod in _DATASET_MODULES:
        importlib.import_module(f".{mod}", __package__)


def get_dataset_class(name: str):
    if name not in _DATASET_REGISTRY:
        _import_all()
    if name not in _DATASET_REGISTRY:
        raise KeyError(
            f"dataset [{name}] not registered; available: {sorted(_DATASET_REGISTRY)}")
    return _DATASET_REGISTRY[name]


# datasets whose __getitem__ honors cfg.device_aug (resize-only uint8 out);
# the domain loaders (synthia/kitti/try) do their preprocessing host-side
DEVICE_AUG_MODES = ("unaligned", "aligned", "single")


def create_dataset(cfg, phase: str = None):
    if getattr(cfg, "device_aug", False) and \
            cfg.dataset_mode not in DEVICE_AUG_MODES:
        raise ValueError(
            f"--device_aug supports dataset_mode {DEVICE_AUG_MODES}, not "
            f"[{cfg.dataset_mode}] — that loader ships preprocessed float "
            f"batches which the device augmenter would re-normalize")
    cls = get_dataset_class(cfg.dataset_mode)
    return cls(cfg, phase=phase or cfg.phase)


def create_dataloader(cfg, phase: str = None, shuffle: bool = None):
    """Reference ``CreateDataLoader(opt)`` equivalent (data/__init__.py:44-75).

    Divergence by design: with batch_size > 1 the final partial batch is
    DROPPED (torch default keeps it) — a ragged batch cannot device_put onto
    a sharded mesh axis and retriggers jit compilation of the train step on
    a single device (minutes over the axon relay). batch_size 1 keeps every
    sample (galleries/eval see the full dataset)."""
    from .loader import DataLoader, ProcessDataLoader

    ds = create_dataset(cfg, phase)
    if shuffle is None:
        shuffle = not cfg.serial_batches
    if getattr(cfg, "worker_procs", 0) > 0:
        # true multi-process loading (--worker_procs N): the reference's
        # torch DataLoader(num_workers=8) analogue for feeding multi-chip DP
        return ProcessDataLoader(ds, batch_size=cfg.batch_size,
                                 shuffle=shuffle,
                                 num_workers=cfg.worker_procs,
                                 max_dataset_size=cfg.max_dataset_size,
                                 seed=cfg.seed, drop_last=cfg.batch_size > 1)
    return DataLoader(ds, batch_size=cfg.batch_size, shuffle=shuffle,
                      num_workers=cfg.num_threads,
                      max_dataset_size=cfg.max_dataset_size, seed=cfg.seed,
                      drop_last=cfg.batch_size > 1)
