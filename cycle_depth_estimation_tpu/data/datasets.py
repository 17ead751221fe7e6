"""CycleGAN-style datasets: unaligned / aligned / single.

Re-designs of reference data/unaligned_dataset.py:8-61,
data/aligned_dataset.py:10-69, data/single_dataset.py:7-42. Each dataset is a
plain indexable returning a dict of HWC float32 arrays (+ path strings under
``*_paths``). Randomness (B-side pairing, crops, flips) is drawn from a
per-(epoch, index) `np.random.Generator` so loaders are reproducible and
order-independent.

Batches expose BOTH key styles used across the reference (``A``/``B`` and
``img_source``/``img_target`` — cf. models/cycle_gan_model.py:76-77 reading
``img_source`` while data/unaligned_dataset.py returns ``A``/``B``).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from . import register_dataset
from .image_folder import make_dataset
from .transforms import (apply_resize_only, apply_transform, load_rgb,
                         normalize, rgb_to_gray, resize, to_array)


class _Base:
    def __init__(self, cfg, phase: str):
        self.cfg = cfg
        self.phase = phase
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _rng(self, index: int) -> np.random.Generator:
        return np.random.default_rng(
            (self.cfg.seed * 1_000_003 + self.epoch) * 1_000_003 + index)

    def _load(self, path: str, rng, grayscale: bool) -> np.ndarray:
        """One image through the host pipeline — or, with ``cfg.device_aug``,
        decode+resize only (uint8; crop/flip/normalize/grayscale move to
        device, data/device_transforms.py)."""
        img = load_rgb(path)
        if getattr(self.cfg, "device_aug", False):
            return apply_resize_only(img, self.cfg)
        return apply_transform(img, self.cfg, rng, grayscale=grayscale)

    def _gray(self):
        cfg = self.cfg
        if cfg.direction == "BtoA":
            return cfg.output_nc == 1, cfg.input_nc == 1
        return cfg.input_nc == 1, cfg.output_nc == 1


@register_dataset("unaligned")
class UnalignedDataset(_Base):
    """trainA/trainB folders; B sampled randomly unless serial_batches."""

    def __init__(self, cfg, phase: str):
        super().__init__(cfg, phase)
        self.a_paths = sorted(make_dataset(os.path.join(cfg.dataroot, phase + "A")))
        self.b_paths = sorted(make_dataset(os.path.join(cfg.dataroot, phase + "B")))
        self.a_size = len(self.a_paths)
        self.b_size = len(self.b_paths)

    def __len__(self):
        return max(self.a_size, self.b_size)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        rng = self._rng(index) if cfg.is_train else None
        a_path = self.a_paths[index % self.a_size]
        if cfg.serial_batches:
            b_index = index % self.b_size
        else:
            b_index = int(self._rng(index ^ 0x5EED).integers(0, self.b_size))
        b_path = self.b_paths[b_index]
        gray_a, gray_b = self._gray()
        a = self._load(a_path, rng, gray_a)
        b = self._load(b_path, rng, gray_b)
        if getattr(cfg, "device_aug", False):
            # aliases are reattached on device post-augment (free — same
            # buffer); emitting them here would double the host→HBM bytes
            return {"A": a, "B": b, "A_paths": a_path, "B_paths": b_path}
        return {"A": a, "B": b, "img_source": a, "img_target": b,
                "A_paths": a_path, "B_paths": b_path}


@register_dataset("aligned")
class AlignedDataset(_Base):
    """Single AB side-by-side image split in half; joint crop + flip."""

    def __init__(self, cfg, phase: str):
        super().__init__(cfg, phase)
        assert cfg.resize_or_crop == "resize_and_crop"
        self.ab_paths = sorted(make_dataset(os.path.join(cfg.dataroot, phase)))

    def __len__(self):
        return len(self.ab_paths)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        rng = self._rng(index)
        ab_path = self.ab_paths[index]
        ab = load_rgb(ab_path)
        w, h = ab.size
        w2 = w // 2
        if getattr(cfg, "device_aug", False):
            # host = split + resize only; joint crop/flip run on device with
            # ALIGNED_GROUPS (one draw for the AB pair)
            a = np.asarray(resize(ab.crop((0, 0, w2, h)),
                                  (cfg.load_size, cfg.load_size)), np.uint8)
            b = np.asarray(resize(ab.crop((w2, 0, w, h)),
                                  (cfg.load_size, cfg.load_size)), np.uint8)
            return {"A": a, "B": b, "A_paths": ab_path, "B_paths": ab_path}
        a = to_array(resize(ab.crop((0, 0, w2, h)), (cfg.load_size, cfg.load_size)))
        b = to_array(resize(ab.crop((w2, 0, w, h)), (cfg.load_size, cfg.load_size)))
        # joint crop — same offsets for A and B (reference aligned_dataset.py:33-38;
        # torch randint high is loadSize - fineSize - 1, inclusive)
        span = max(0, cfg.load_size - cfg.fine_size - 1)
        top = int(rng.integers(0, span + 1)) if span > 0 else 0
        left = int(rng.integers(0, span + 1)) if span > 0 else 0
        a = a[top:top + cfg.fine_size, left:left + cfg.fine_size]
        b = b[top:top + cfg.fine_size, left:left + cfg.fine_size]
        a, b = normalize(a), normalize(b)
        if cfg.is_train and not cfg.no_flip and rng.random() < 0.5:
            a, b = a[:, ::-1], b[:, ::-1]
        gray_a, gray_b = self._gray()
        if gray_a:
            a = rgb_to_gray(a)
        if gray_b:
            b = rgb_to_gray(b)
        a = np.ascontiguousarray(a, np.float32)
        b = np.ascontiguousarray(b, np.float32)
        return {"A": a, "B": b, "img_source": a, "img_target": b,
                "A_paths": ab_path, "B_paths": ab_path}


@register_dataset("single")
class SingleDataset(_Base):
    """Inference-only A-side folder."""

    def __init__(self, cfg, phase: str):
        super().__init__(cfg, phase)
        self.a_paths = sorted(make_dataset(cfg.dataroot))

    def __len__(self):
        return len(self.a_paths)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        a_path = self.a_paths[index]
        gray_a, _ = self._gray()
        rng = self._rng(index) if cfg.is_train else None
        a = self._load(a_path, rng, gray_a)
        return {"A": a, "A_paths": a_path}
