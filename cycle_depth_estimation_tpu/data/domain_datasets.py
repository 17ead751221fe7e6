"""Domain-pair datasets for the seg+depth research models.

- ``synthia``: SYNTHIA↔Cityscapes paired-domain loader
  (reference datasets/dataset_synthia.py:60-258) — source img+seg+depth,
  target img+seg at 640×192, label remap to 22/28 train ids (ignore 255),
  joint flip/±5° rotation.
- ``kitti``: unpaired vKITTI→KITTI loader
  (reference datasets/dataset_kitti.py:60-123) — 640×192 bicubic, source
  depth label clipped to 8000 and scaled /8000.
- ``try``: the final vKITTI→KITTI loader of the new_multi generation
  (reference new_multi/try_data.py:70-376) — 576×192, seg-edge maps, 4-band
  depth encoding, train/test branch split (test exposes the KITTI
  ``depth_selection`` crop names ``f_name``/``l_name``).

All outputs are HWC float32 / HW int32 numpy (NHWC batches); RNG is explicit
per (epoch, index).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
from PIL import Image

from . import register_dataset
from .datasets import _Base
from .image_folder import make_dataset, make_dataset_txt
from .preprocess import (
    REAL_ID_TO_TRAINID_0,
    REAL_ID_TO_TRAINID_255,
    SYN_ID_TO_TRAINID,
    clip_depth_8000,
    depth_bands,
    label_edges,
    remap_sequential,
)
from .transforms import normalize, to_array


def _paths(path: str):
    if path.endswith(".txt"):
        return make_dataset_txt(path)
    return make_dataset(path)


def _rotate(img: Image.Image, degree: float, resample) -> Image.Image:
    return img.rotate(degree, resample=resample)


def paired_augment(rng: np.random.Generator, images, resamples):
    """Joint h-flip (p=.5) + ±5° rotation (p=.5) across aligned maps
    (reference dataset_synthia.py:224-241 / try_data.py:377-415)."""
    out = list(images)
    if rng.random() > 0.5:
        out = [im.transpose(Image.FLIP_LEFT_RIGHT) for im in out]
    if rng.random() > 0.5:
        degree = int(rng.integers(-500, 500)) / 100.0
        out = [_rotate(im, degree, rs) for im, rs in zip(out, resamples)]
    return out


def _img_paths(cfg, phase: str, attr: str) -> str:
    suffix = "train" if phase == "train" else "test"
    return getattr(cfg, f"{attr}_file_{suffix}")


@register_dataset("synthia")
class SynthiaDataset(_Base):
    """SYNTHIA↔Cityscapes: {img,lab,depth}_source + {img,lab}_target.

    DOCUMENTED DIVERGENCE — depth_source range: the reference pushes the
    16-bit depth PNG through ToTensor+Normalize(0.5)
    (dataset_synthia.py:87,189), which for PIL integer modes performs NO
    /255 scaling, yielding values in the thousands (and it skips the
    paired augmentation for depth, so depth stops matching img/lab after a
    train-time rotation). We use the KITTI recipe clip(0,8000)/8000 → [0,1]
    (preprocess.clip_depth_8000) instead: a sane, bounded label. No
    registered model consumes depth_source from this loader (the reference
    seg/seg_cycle tracks read only img+lab), so the substitution is latent;
    revisit if a depth head is ever attached to the synthia pair."""

    ASPECT = 640 / 192  # reference works at 640×192 (dataset_synthia.py:156)

    @property
    def size(self):
        h = self.cfg.fine_size if self.cfg.fine_size != 256 else 192
        return (int(round(h * self.ASPECT)), h)  # (w, h)

    def __init__(self, cfg, phase: str):
        super().__init__(cfg, phase)
        self.img_source_paths = _paths(_img_paths(cfg, phase, "img_source"))
        self.img_target_paths = _paths(_img_paths(cfg, phase, "img_target"))
        self.lab_source_paths = _paths(_img_paths(cfg, phase, "lab_source"))
        self.lab_target_paths = _paths(_img_paths(cfg, phase, "lab_target"))
        self.depth_source_paths = _paths(_img_paths(cfg, phase, "depth_source"))

    def __len__(self):
        return max(len(self.img_source_paths), len(self.img_target_paths))

    def __getitem__(self, item: int) -> Dict[str, np.ndarray]:
        rng = self._rng(item)
        w, h = self.size
        n_src = len(self.img_source_paths)
        index = int(rng.integers(0, len(self.img_target_paths)))

        img_source = Image.open(self.img_source_paths[item % n_src]).convert("RGB")
        img_target = Image.open(self.img_target_paths[index]).convert("RGB")
        img_source = img_source.resize((w, h), Image.BILINEAR)
        img_target = img_target.resize((w, h), Image.BILINEAR)

        depth = Image.open(
            self.depth_source_paths[item % len(self.depth_source_paths)])
        depth = depth.resize((w, h), Image.BILINEAR)

        lab_source = Image.open(self.lab_source_paths[item % len(self.lab_source_paths)])
        lab_target = Image.open(self.lab_target_paths[index])
        lab_source = lab_source.resize((w, h), Image.NEAREST)
        lab_target = lab_target.resize((w, h), Image.NEAREST)

        lab_source_np = remap_sequential(np.array(lab_source), SYN_ID_TO_TRAINID)
        lab_target_np = remap_sequential(np.array(lab_target), REAL_ID_TO_TRAINID_255)
        lab_source = Image.fromarray(lab_source_np.astype(np.uint8))
        lab_target = Image.fromarray(lab_target_np.astype(np.uint8))

        if self.phase == "train":
            img_source, lab_source = paired_augment(
                rng, [img_source, lab_source], [Image.BILINEAR, Image.NEAREST])
            img_target, lab_target = paired_augment(
                rng, [img_target, lab_target], [Image.BILINEAR, Image.NEAREST])

        return {
            "img_source": normalize(to_array(img_source)).astype(np.float32),
            "img_target": normalize(to_array(img_target)).astype(np.float32),
            "lab_source": np.array(lab_source, dtype=np.int32),
            "lab_target": np.array(lab_target, dtype=np.int32),
            "depth_source": clip_depth_8000(np.array(depth)),
            "img_source_paths": self.img_source_paths[item % n_src],
            "img_target_paths": self.img_target_paths[index],
        }


@register_dataset("kitti")
class KittiDataset(_Base):
    """Unpaired vKITTI (img+depth) → KITTI (img)."""

    ASPECT = 640 / 192

    @property
    def size(self):
        h = self.cfg.fine_size if self.cfg.fine_size != 256 else 192
        return (int(round(h * self.ASPECT)), h)

    def __init__(self, cfg, phase: str):
        super().__init__(cfg, phase)
        self.img_source_paths = _paths(_img_paths(cfg, phase, "img_source"))
        self.img_target_paths = _paths(_img_paths(cfg, phase, "img_target"))
        self.lab_source_paths = _paths(_img_paths(cfg, phase, "depth_source"))

    def __len__(self):
        return max(len(self.img_source_paths), len(self.img_target_paths))

    def __getitem__(self, item: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        rng = self._rng(item)
        w, h = self.size
        index = int(rng.integers(0, len(self.img_target_paths)))
        src_path = self.img_source_paths[item % len(self.img_source_paths)]
        tgt_path = self.img_target_paths[index]
        img_source = Image.open(src_path).convert("RGB").resize((w, h), Image.BICUBIC)
        img_target = Image.open(tgt_path).convert("RGB").resize((w, h), Image.BICUBIC)
        out = {
            "img_source": normalize(to_array(img_source)).astype(np.float32),
            "img_target": normalize(to_array(img_target)).astype(np.float32),
            "img_source_paths": src_path,
            "img_target_paths": tgt_path,
        }
        if cfg.is_train and self.phase == "train":
            dep_path = self.lab_source_paths[item % len(self.lab_source_paths)]
            depth = Image.open(dep_path).resize((w, h), Image.BILINEAR)
            out["lab_source"] = clip_depth_8000(np.array(depth))
            out["lab_source_paths"] = dep_path
        return out


@register_dataset("try")
class TryDataset(_Base):
    """vKITTI→KITTI final-generation loader (S2D / new_multi pipeline).

    The working size follows cfg.fine_size with the reference 3:1 aspect
    (576×192 at the default fine_size=192, try_data.py:166)."""

    @property
    def size(self):
        h = self.cfg.fine_size if self.cfg.fine_size != 256 else 192
        return (h * 3, h)

    def __init__(self, cfg, phase: str):
        super().__init__(cfg, phase)
        self.img_syn_paths = _paths(_img_paths(cfg, phase, "img_source"))
        self.img_real_paths = _paths(_img_paths(cfg, phase, "img_target"))
        self.lab_syn_paths = _paths(_img_paths(cfg, phase, "lab_source"))
        self.depth_paths = _paths(_img_paths(cfg, phase, "depth_source"))
        if phase == "train":
            self.lab_real_paths = _paths(_img_paths(cfg, phase, "lab_target"))

    def __len__(self):
        return max(len(self.img_syn_paths), len(self.img_real_paths))

    def __getitem__(self, item: int) -> Dict[str, np.ndarray]:
        rng = self._rng(item)
        w, h = self.size
        index = int(rng.integers(0, len(self.img_real_paths)))
        img_syn_path = self.img_syn_paths[item % len(self.img_syn_paths)]
        img_real_path = self.img_real_paths[index]
        lab_syn_path = self.lab_syn_paths[item % len(self.lab_syn_paths)]
        dep_path = self.depth_paths[item % len(self.depth_paths)]

        img_syn = Image.open(img_syn_path).convert("RGB").resize((w, h), Image.BILINEAR)
        img_real = Image.open(img_real_path).convert("RGB").resize((w, h), Image.BILINEAR)
        depth = Image.open(dep_path).resize((w, h), Image.BILINEAR)
        lab_syn = Image.open(lab_syn_path)

        if self.phase == "train":
            lab_real = Image.open(self.lab_real_paths[index])
            img_syn, lab_syn, depth = paired_augment(
                rng, [img_syn, lab_syn, depth],
                [Image.BILINEAR, Image.NEAREST, Image.NEAREST])
            img_real, lab_real = paired_augment(
                rng, [img_real, lab_real], [Image.BILINEAR, Image.NEAREST])

            # vKITTI labels → train ids: 0→7 pre-step then the sequential
            # 34-class remap (try_data.py:199-204)
            lab_syn_np = np.array(lab_syn).astype(np.float32)
            lab_syn_np[lab_syn_np == 0] = 7
            lab_syn_np = remap_sequential(lab_syn_np, REAL_ID_TO_TRAINID_0)

            # real labels: id − 6, clamp negatives to ignore=0 (try_data.py:208-211)
            lab_real_np = np.array(lab_real).astype(np.float32) - 6
            lab_real_np[lab_real_np < 0] = 0

            edge_syn = label_edges(lab_syn_np)
            edge_real = label_edges(lab_real_np)
            edge_syn = _resize_map(edge_syn, (w, h))
            edge_real = _resize_map(edge_real, (w, h))
            lab_syn_np = _resize_labels(lab_syn_np.astype(np.uint8), (w, h))
            lab_real_np = _resize_labels(lab_real_np.astype(np.uint8), (w, h))

            full, bands = depth_bands(np.array(depth), train=True)
            return {
                "img_syn": normalize(to_array(img_syn)).astype(np.float32),
                "img_real": normalize(to_array(img_real)).astype(np.float32),
                "dep_l_syn": full, "depth_l_s": bands,
                "seg_l_syn": lab_syn_np.astype(np.int32),
                "seg_l_real": lab_real_np.astype(np.int32),
                "seg_e_syn": edge_syn.astype(np.float32)[..., None],
                "seg_e_real": edge_real.astype(np.float32)[..., None],
                "img_source_paths": img_syn_path, "img_target_paths": img_real_path,
                "name": img_real_path[-14:],
            }

        # ---- test branch (try_data.py:286-368) ----
        lab_syn = lab_syn.resize((w, h), Image.NEAREST)
        lab_syn_np = np.array(lab_syn)
        lab_raw = lab_syn_np.copy()
        lab_syn_np = lab_syn_np.copy().astype(np.float32)
        lab_syn_np[lab_syn_np == 0] = 7
        lab_syn_np = remap_sequential(lab_syn_np, REAL_ID_TO_TRAINID_0)
        # test-branch edge is computed on the RAW (un-remapped) labels
        # (try_data.py:311)
        edge_syn = label_edges(lab_raw)
        full, bands = depth_bands(np.array(depth), train=False)
        return {
            "img_syn": normalize(to_array(img_syn)).astype(np.float32),
            "img_real": normalize(to_array(img_real)).astype(np.float32),
            "dep_l_syn": full, "depth_l_s": bands,
            "seg_l_syn": lab_syn_np.astype(np.int32),
            "seg_e_syn": edge_syn.astype(np.float32)[..., None],
            "img_source_paths": img_syn_path, "img_target_paths": img_real_path,
            # KITTI depth_selection crop file-name slices (try_data.py:367)
            "f_name": img_real_path[-56:-29], "l_name": img_real_path[-24:],
        }


def _resize_labels(lab: np.ndarray, size) -> np.ndarray:
    """Nearest-neighbour label resize (see module docstring re the
    reference's cv2 dst/interpolation bug)."""
    w, h = size
    return np.array(Image.fromarray(lab).resize((w, h), Image.NEAREST))


def _resize_map(m: np.ndarray, size) -> np.ndarray:
    """cv2-default-INTER_LINEAR resize of the {0,1} seg-edge maps
    (reference try_data.py:219-220 `cv2.resize(lab_*_edge, (576, 192))`).

    Review fix: PIL BILINEAR antialiases on downscale (support scales with
    the shrink factor), spreading each 1-px edge over many fractional
    pixels; cv2 INTER_LINEAR samples only the 2×2 neighbourhood, which is
    what the reference's BCE edge targets actually see."""
    from ..utils.metrics import _resize_linear

    w, h = size
    return _resize_linear(m.astype(np.float32), (w, h)).astype(np.float32)
