"""Host-side image transform pipeline, NHWC numpy, explicit RNG.

Reimplements the reference transform modes (reference data/base_dataset.py:
24-102): ``resize_and_crop | crop | scale_width | scale_width_and_crop |
none``, optional random horizontal flip, ToTensor+Normalize(0.5) → [-1, 1].

Differences by design:
- output is HWC float32 (NHWC batches) instead of CHW torch tensors;
- randomness comes from an explicit ``np.random.Generator`` per sample
  (derived from cfg.seed + epoch + index), so runs are reproducible and
  shardable — no global ``random`` state;
- PIL does decode + bicubic resize (matches torchvision), crops/flips are
  numpy slices.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image


def load_rgb(path: str) -> Image.Image:
    return Image.open(path).convert("RGB")


def resize(img: Image.Image, size: Tuple[int, int]) -> Image.Image:
    """size = (w, h), bicubic (reference uses Image.BICUBIC)."""
    return img.resize(size, Image.BICUBIC)


def scale_width(img: Image.Image, target_width: int) -> Image.Image:
    """Reference __scale_width: width→target, height→multiple of 4
    (data/base_dataset.py:76-92)."""
    ow, oh = img.size
    mult = 4
    if ow == target_width and oh % mult == 0:
        return img
    target_height = int(target_width * oh / ow)
    h = ((target_height - 1) // mult + 1) * mult
    return img.resize((target_width, h), Image.BICUBIC)


def adjust_to_multiple(img: Image.Image, mult: int = 4) -> Image.Image:
    """Reference __adjust: round sizes up to a multiple of ``mult``
    (data/base_dataset.py:55-73)."""
    ow, oh = img.size
    if ow % mult == 0 and oh % mult == 0:
        return img
    w = ((ow - 1) // mult + 1) * mult
    h = ((oh - 1) // mult + 1) * mult
    return img.resize((w, h), Image.BICUBIC)


def to_array(img: Image.Image) -> np.ndarray:
    """ToTensor equivalent → HWC float32 in [0, 1]."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def normalize(arr: np.ndarray, mean: float = 0.5, std: float = 0.5) -> np.ndarray:
    return (arr - mean) / std


def random_crop(arr: np.ndarray, size: int, rng: np.random.Generator) -> np.ndarray:
    h, w = arr.shape[:2]
    top = int(rng.integers(0, h - size + 1)) if h > size else 0
    left = int(rng.integers(0, w - size + 1)) if w > size else 0
    return arr[top:top + size, left:left + size]


def maybe_hflip(arr: np.ndarray, rng: np.random.Generator,
                p: float = 0.5) -> np.ndarray:
    if rng.random() < p:
        return arr[:, ::-1]
    return arr


def rgb_to_gray(arr: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma (reference data/unaligned_dataset.py:43-49), HWC→HW1."""
    return (arr[..., 0:1] * 0.299 + arr[..., 1:2] * 0.587 + arr[..., 2:3] * 0.114)


def apply_resize_only(img: Image.Image, cfg) -> np.ndarray:
    """Host half of the device-aug split (``cfg.device_aug``): decode+resize
    only, returning uint8 HWC at ``load_size``. Crop/flip/normalize/grayscale
    then run on device (data/device_transforms.py). Only fixed-output-shape
    modes are supported (stacking into batches needs uniform shapes).
    """
    mode = cfg.resize_or_crop
    if mode == "resize_and_crop":
        img = resize(img, (cfg.load_size, cfg.load_size))
    else:
        raise ValueError(
            f"--device_aug supports resize_or_crop=resize_and_crop only "
            f"(got {mode}: variable pre-crop shapes cannot batch)")
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def apply_transform(img: Image.Image, cfg, rng: Optional[np.random.Generator],
                    grayscale: bool = False) -> np.ndarray:
    """The full reference get_transform pipeline for one image.

    ``rng=None`` disables the random augs (eval path: center behavior —
    crop at top-left like torch RandomCrop would not do; we use center crop
    for determinism and note the difference only matters for eval visuals).
    """
    mode = cfg.resize_or_crop
    if mode == "resize_and_crop":
        img = resize(img, (cfg.load_size, cfg.load_size))
    elif mode == "scale_width":
        img = scale_width(img, cfg.fine_size)
    elif mode == "scale_width_and_crop":
        img = scale_width(img, cfg.load_size)
    elif mode == "none":
        img = adjust_to_multiple(img)
    elif mode != "crop":
        raise ValueError(f"--resize_or_crop {mode} is not a valid option.")

    arr = to_array(img)
    if mode in ("resize_and_crop", "crop", "scale_width_and_crop"):
        if rng is not None:
            arr = random_crop(arr, cfg.fine_size, rng)
        else:
            h, w = arr.shape[:2]
            top = max(0, (h - cfg.fine_size) // 2)
            left = max(0, (w - cfg.fine_size) // 2)
            arr = arr[top:top + cfg.fine_size, left:left + cfg.fine_size]
    if cfg.is_train and not cfg.no_flip and rng is not None:
        arr = maybe_hflip(arr, rng)
    arr = normalize(arr)
    if grayscale:
        arr = rgb_to_gray(arr)
    return np.ascontiguousarray(arr, dtype=np.float32)
