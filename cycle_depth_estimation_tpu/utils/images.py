"""Tensor→image conversion and label colorization.

Re-design of reference util/util.py:7-124. ``tensor2im`` maps a [-1,1] NHWC
array to uint8 HWC ((x+1)/2·255, gray→3-channel tile); ``label2im``
colorizes integer label maps with a packaged deterministic palette —
replacing the reference's color LUTs loaded at import time from absolute
filesystem paths (util/util.py:7-23, a noted hazard in SURVEY.md §2.1 #24).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def tensor2im(x, imtype=np.uint8) -> np.ndarray:
    """First image of an NHWC (or HWC) array in [-1,1] → HWC uint8."""
    arr = np.asarray(x).astype(np.float32)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.shape[-1] == 1:
        arr = np.tile(arr, (1, 1, 3))
    arr = (arr + 1.0) / 2.0 * 255.0
    return np.clip(arr, 0, 255).astype(imtype)


def _make_palette(n: int = 256) -> np.ndarray:
    """Deterministic label palette (Pascal-VOC-style bit shuffle)."""
    palette = np.zeros((n, 3), np.uint8)
    for i in range(n):
        c = i
        r = g = b = 0
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        palette[i] = (r, g, b)
    return palette


_PALETTE = _make_palette()


def label2im(labels, ignore_index: int = 255) -> np.ndarray:
    """Integer label map (N)HW(1) → colorized HWC uint8."""
    arr = np.asarray(labels)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    if arr.ndim == 3:
        arr = arr[0]
    arr = np.clip(arr.astype(np.int64), 0, 255)
    out = _PALETTE[arr]
    out[arr == ignore_index] = 0
    return out


def depth2im(depth) -> np.ndarray:
    """Depth map (N)HW(1) in [-1,1] or [0,1] → grayscale HWC uint8."""
    arr = np.asarray(depth).astype(np.float32)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    lo, hi = float(arr.min()), float(arr.max())
    if hi - lo < 1e-6:
        hi = lo + 1e-6
    arr = (arr - lo) / (hi - lo) * 255.0
    return np.tile(arr[..., None], (1, 1, 3)).astype(np.uint8)


def save_image(image: np.ndarray, path: str):
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(image).save(path)


def diagnose_network(grads, name: str = "network") -> float:
    """Mean |grad| over a grad pytree (reference util/util.py diagnose)."""
    import jax

    leaves = [np.abs(np.asarray(g)).mean() for g in jax.tree.leaves(grads)]
    val = float(np.mean(leaves)) if leaves else 0.0
    print(f"{name}: mean |grad| = {val}")
    return val


def scale_pyramid(img, num_scales: int):
    """List of the image at [H/2^i, W/2^i] scales, area-style downsampling
    (reference util/util.py scale_pyramid)."""
    import jax

    from ..ops.layers import avg_pool

    out = [img]
    for _ in range(num_scales - 1):
        out.append(avg_pool(out[-1], 2, 2))
    return out
