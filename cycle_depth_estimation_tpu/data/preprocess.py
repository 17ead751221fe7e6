"""Label/depth preprocessing for the domain-adaptation datasets.

Numpy implementations of the reference's label-remap tables, seg-edge
extraction and multi-band depth encoding (reference
datasets/dataset_synthia.py:93-147, new_multi/try_data.py:43-68, 101-155,
240-272). These are pure functions over HW arrays so they are unit-testable
and can be lifted onto device (vmap/jit) for on-TPU preprocessing.

Faithfulness notes:
- remaps are applied **sequentially in table order** — the reference mutates
  the array as it iterates its dicts, so later keys can re-map earlier
  results (e.g. try_data's ``0→7`` pre-step then ``7→1``); we reproduce that
  by applying the same ordered substitutions;
- ``label_edges`` keeps the reference's class-21 (sky) suppression quirk;
- ``depth_bands(..., train=True)`` reproduces the reference's band-5
  normalization using band-4's min (try_data.py:268) and the train/eval
  formula split (min-max vs max-only);
- division guards: the reference divides by (max-min) with no guard and NaNs
  on constant maps; we clamp the denominator (documented divergence — only
  reachable on degenerate inputs).

NOT reproduced (documented reference bug): try_data.py:224-225 passes
``cv2.INTER_NEAREST`` as cv2.resize's positional ``dst`` argument, so labels
were actually bilinear-interpolated (invalid label mixing); we resize label
maps with true nearest-neighbour.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

IGNORE_LABEL_SYNTHIA = 255  # dataset_synthia.py:59
IGNORE_LABEL_TRY = 0        # try_data.py:14

# SYNTHIA 23-class → 22 train ids, 0 → ignore (dataset_synthia.py:93-116)
SYN_ID_TO_TRAINID = [(0, IGNORE_LABEL_SYNTHIA)] + [(k, k - 1) for k in range(1, 23)]

# Cityscapes 34-class → 28 train ids, ids ≤ 5 → ignore (dataset_synthia.py:117-147)
REAL_ID_TO_TRAINID_255 = ([(k, IGNORE_LABEL_SYNTHIA) for k in range(-1, 6)]
                          + [(k, k - 6) for k in range(6, 34)])

# try_data variant with ignore = 0 (try_data.py:125-155)
REAL_ID_TO_TRAINID_0 = ([(k, IGNORE_LABEL_TRY) for k in range(-1, 6)]
                        + [(k, k - 6) for k in range(6, 34)])

# vKITTI seg id → Cityscapes real id (try_data.py:101-124)
SYN_ID_TO_REALID = [
    (0, 0), (1, 7), (2, 8), (3, 11), (4, 12), (5, 13), (6, 17), (7, 19),
    (8, 20), (9, 21), (10, 22), (11, 23), (12, 24), (13, 25), (14, 26),
    (15, 27), (16, 28), (17, 31), (18, 32), (19, 33), (20, 7), (21, 0),
    (22, 0),
]


def compose_lut(table, size: int = 256) -> np.ndarray:
    """Collapse a sequential (key→value) substitution table into one lookup
    array: applying the rules in order to an identity LUT yields the exact
    composed function (each rule sees earlier rewrites, like the reference's
    in-place dict iteration). Rules match LUT *values*, so out-of-range keys
    (e.g. the tables' -1 rows, or a key introduced by an earlier rewrite)
    compose correctly; only the input domain must be [0, size). Shared by
    the host fast path below and the device gather
    (data/device_transforms.remap_labels)."""
    lut = np.arange(size, dtype=np.int64)
    for k, v in table:
        lut[lut == k] = v
    return lut


_LUT_CACHE: dict = {}


def remap_sequential(labels: np.ndarray, table) -> np.ndarray:
    """Apply (key → value) substitutions in order, mutating as we go —
    matching the reference's in-place dict iteration.

    Fast path: for non-negative labels < 256 (every real caller — ids ≤ 33)
    the sequential loop (~35 full-image passes, 24.5 ms at 1242×375) is
    replaced by one gather through the composed LUT (~1 ms); equivalence is
    tested in tests/test_device_transforms.py."""
    if labels.size and labels.min() >= 0 and labels.max() < 256:
        key = tuple(map(tuple, table))
        lut = _LUT_CACHE.get(key)
        if lut is None:
            lut = _LUT_CACHE.setdefault(key, compose_lut(table))
        return lut[labels.astype(np.int64)].astype(labels.dtype)
    out = labels.copy()
    for k, v in table:
        out[out == k] = v
    return out


def label_edges(labels: np.ndarray, suppress_class: int = 21) -> np.ndarray:
    """4-neighbour label-difference edge map (reference ``Canny``,
    try_data.py:43-68), float {0,1}.

    Pixels of ``suppress_class`` force their shifted comparisons equal, so
    that class (sky in the remapped id space) contributes no edges; zero
    padding at the borders marks nonzero border labels as edges — both as in
    the reference.
    """
    lab = labels.astype(np.uint8)
    sky = lab == suppress_class
    edge = np.zeros(lab.shape, np.float64)

    def shifted(dy: int, dx: int) -> np.ndarray:
        s = np.zeros_like(lab)
        h, w = lab.shape
        ys = slice(max(0, -dy), h - max(0, dy))
        yd = slice(max(0, dy), h - max(0, -dy))
        xs = slice(max(0, -dx), w - max(0, dx))
        xd = slice(max(0, dx), w - max(0, -dx))
        s[yd, xd] = lab[ys, xs]
        s[sky] = suppress_class
        return s

    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        edge[lab != shifted(dy, dx)] = 1.0
    return edge


def _safe_span(lo: float, hi: float) -> float:
    return max(hi - lo, 1e-6)


def depth_bands(depth: np.ndarray, train: bool = True
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Reference multi-band depth encoding (try_data.py:240-272, 325-355).

    Returns ``(full, bands)``: ``full`` HW1 in [-1,1], ``bands`` HW4 — the
    four clipped+renormalized depth ranges (8000/5000, 6000/3000, 4000/1000,
    2000). Train mode uses per-image (min,max) normalization — including the
    reference's band-5-normalized-by-band-4-min quirk; eval mode uses the
    reference's max-only formulas.
    """
    # vectorized rewrite of the reference's masked in-place band clips
    # (each `x[m] = v` pass costs a mask + fancy write; clip/where fuse) —
    # bitwise-identical outputs, asserted by the preexisting oracle tests.
    d0 = depth.astype(np.float32)
    d = np.minimum(d0, 8000)
    d2 = np.where(d0 < 5000, np.float32(5000), np.minimum(d0, 8000))
    d2 = 2 * (d2 - d2.min()) / _safe_span(d2.min(), d2.max()) - 1

    d3 = np.clip(d0, 3000, 6000)
    d3 = 2 * (d3 - d3.min()) / _safe_span(d3.min(), d3.max()) - 1

    d4 = np.clip(d0, 1000, 4000)
    d4_min = d4.min()
    d4n = 2 * (d4 - d4_min) / _safe_span(d4_min, d4.max()) - 1

    d5 = np.minimum(d0, 2000)
    if train:
        # reference quirk (try_data.py:268): band 5 is offset by
        # `depth_source_4.min()` — but by that line depth_source_4 has been
        # REASSIGNED to its normalized form, so the offset is the NORMALIZED
        # band-4 min, i.e. exactly -1 (review fix: an earlier reading used
        # the raw clipped min, shifting every band-5 label by ~2·raw_min/span)
        d5n = 2 * (d5 - d4n.min()) / _safe_span(d5.min(), d5.max()) - 1
        full = 2 * (d - d.min()) / _safe_span(d.min(), d.max()) - 1
    else:
        d5n = 2 * d5 / max(d5.max(), 1e-6) - 1
        full = 2 * d / max(d.max(), 1e-6) - 1

    bands = np.stack([d2, d3, d4n, d5n], axis=-1).astype(np.float32)
    return full[..., None].astype(np.float32), bands


def clip_depth_8000(depth: np.ndarray) -> np.ndarray:
    """KITTI/vKITTI depth label: clip to [0, 8000] and scale to [0, 1]
    (reference datasets/dataset_kitti.py:90-92)."""
    d = depth.astype(np.float32)
    np.clip(d, 0, 8000, out=d)
    return (d / 8000.0)[..., None]
