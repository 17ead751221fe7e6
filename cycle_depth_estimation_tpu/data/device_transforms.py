"""On-device (jitted) augmentation + preprocessing kernels.

SURVEY.md §7 item 3: the reference does every transform on the host with
PIL/cv2 + torchvision (reference data/base_dataset.py:24-102, new_multi/
try_data.py:43-68,101-155,240-272). On TPU the host is the bottleneck
(tools/bench_loader.py measures the full host pipeline below the CycleGAN
train-step rate on small hosts), so here the host does **decode + resize
only** and ships uint8; crop / flip / normalize / grayscale / label-remap /
edge / depth-band kernels run vectorized on device inside one jitted program.
Shipping uint8 also cuts host→HBM bytes 4× vs float32.

Numerical parity with the host pipeline (data/transforms.py,
data/preprocess.py) is exact — same slices, same arithmetic, tested with
forced crop/flip decisions in tests/test_device_transforms.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LUMA = (0.299, 0.587, 0.114)


# LUT composition lives beside the host remap (same math both sides);
# re-exported here for device callers.
from .preprocess import compose_lut  # noqa: E402  (docstring: preprocess.py)


def remap_labels(labels: jax.Array, lut) -> jax.Array:
    """Device label remap: one gather through a composed LUT (host parity:
    preprocess.remap_sequential)."""
    return jnp.take(jnp.asarray(lut, jnp.int32), labels.astype(jnp.int32))


def label_edges(labels: jax.Array, suppress_class: int = 21) -> jax.Array:
    """4-neighbour label-difference edges, float {0,1} (host parity:
    preprocess.label_edges; reference 'Canny' try_data.py:43-68).

    Works on HW or NHW integer label maps. Pixels of ``suppress_class``
    force their shifted comparisons equal (sky emits no edges); zero padding
    marks nonzero border labels as edges — both reference behaviors.
    """
    lab = labels.astype(jnp.int32)
    sky = lab == suppress_class
    ay, ax = lab.ndim - 2, lab.ndim - 1

    def shifted(dy: int, dx: int) -> jax.Array:
        pad = [(0, 0)] * lab.ndim
        pad[ay] = (max(0, dy), max(0, -dy))
        pad[ax] = (max(0, dx), max(0, -dx))
        s = jnp.pad(lab, pad)
        idx = [slice(None)] * lab.ndim
        idx[ay] = slice(max(0, -dy), s.shape[ay] - max(0, dy))
        idx[ax] = slice(max(0, -dx), s.shape[ax] - max(0, dx))
        s = s[tuple(idx)]
        return jnp.where(sky, suppress_class, s)

    edge = jnp.zeros(lab.shape, jnp.bool_)
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        edge = edge | (lab != shifted(dy, dx))
    return edge.astype(jnp.float32)


def _renorm(x: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    return 2.0 * (x - lo) / jnp.maximum(hi - lo, 1e-6) - 1.0


def depth_bands(depth: jax.Array, train: bool = True
                ) -> Tuple[jax.Array, jax.Array]:
    """Device multi-band depth encoding (host parity: preprocess.depth_bands;
    reference try_data.py:240-272,325-355). ``depth`` is HW or NHW; returns
    (full …×1, bands …×4). Per-image min/max reductions run on device —
    including the reference band-5-normalized-by-band-4-min train quirk.
    """
    d = depth.astype(jnp.float32)
    ax = tuple(range(d.ndim - 2, d.ndim))  # per-image reductions
    kd = dict(axis=ax, keepdims=True)

    d0 = jnp.minimum(d, 8000.0)
    d2 = jnp.where(d < 5000.0, 5000.0, jnp.minimum(d, 8000.0))
    d2 = _renorm(d2, d2.min(**kd), d2.max(**kd))
    d3 = jnp.clip(d, 3000.0, 6000.0)
    d3 = _renorm(d3, d3.min(**kd), d3.max(**kd))
    d4 = jnp.clip(d, 1000.0, 4000.0)
    d4_min = d4.min(**kd)
    d4n = _renorm(d4, d4_min, d4.max(**kd))
    d5 = jnp.minimum(d, 2000.0)
    if train:
        # offset = NORMALIZED band-4 min (= -1): the reference reassigns
        # depth_source_4 before reading .min() at try_data.py:268
        d5n = 2.0 * (d5 - d4n.min(**kd)) / jnp.maximum(
            d5.max(**kd) - d5.min(**kd), 1e-6) - 1.0
        full = _renorm(d0, d0.min(**kd), d0.max(**kd))
    else:
        d5n = 2.0 * d5 / jnp.maximum(d5.max(**kd), 1e-6) - 1.0
        full = 2.0 * d0 / jnp.maximum(d0.max(**kd), 1e-6) - 1.0
    return full[..., None], jnp.stack([d2, d3, d4n, d5n], axis=-1)


def crop_flip_normalize(x: jax.Array, tops: jax.Array, lefts: jax.Array,
                        flips: jax.Array, fine_size: int, *,
                        grayscale: bool = False,
                        dtype=jnp.float32) -> jax.Array:
    """Batched crop + hflip + ToTensor/Normalize(0.5) on device.

    ``x`` NHWC uint8 (or float in [0,255]); ``tops``/``lefts`` int32 (N,),
    ``flips`` bool (N,). Output N×fine×fine×C in [-1,1] (host parity:
    transforms.random_crop / maybe_hflip / to_array / normalize, matching
    slice-then-flip order). If ``x`` is already fine_size, pass zeros.
    """

    def one(img, top, left, flip):
        c = jax.lax.dynamic_slice(
            img, (top, left, 0), (fine_size, fine_size, img.shape[-1]))
        return jnp.where(flip, c[:, ::-1], c)

    y = jax.vmap(one)(x, tops.astype(jnp.int32), lefts.astype(jnp.int32),
                      flips)
    y = y.astype(dtype) / 255.0
    y = (y - 0.5) / 0.5
    if grayscale:
        w = jnp.asarray(_LUMA, dtype)
        y = jnp.sum(y * w, axis=-1, keepdims=True)
    return y


def draw_augment_params(key: jax.Array, n: int, in_hw: Tuple[int, int],
                        fine_size: int, *, train: bool = True,
                        no_flip: bool = False, aligned: bool = False):
    """Per-sample crop offsets + flip decisions (device RNG).

    Unaligned/single (``aligned=False``) — train: uniform tops/lefts over
    the full valid range [0, size−fine] + Bernoulli(0.5) flips (the
    reference torchvision RandomCrop/RandomHorizontalFlip pair); eval:
    deterministic center crop, no flip (host parity: apply_transform
    rng=None branch).

    Aligned (``aligned=True``) — the reference AB pipeline crops with
    ``randint(0, loadSize − fineSize − 1)`` **inclusive high**, i.e. offsets
    in [0, size−fine−1], and crops randomly at eval too; flips remain
    train-only (host parity: datasets.AlignedDataset / reference
    aligned_dataset.py:33-38).
    """
    h, w = in_hw
    kt, kl, kf = jax.random.split(key, 3)
    if aligned:
        tops = jax.random.randint(kt, (n,), 0, max(1, h - fine_size))
        lefts = jax.random.randint(kl, (n,), 0, max(1, w - fine_size))
    elif train:
        tops = jax.random.randint(kt, (n,), 0, max(1, h - fine_size + 1))
        lefts = jax.random.randint(kl, (n,), 0, max(1, w - fine_size + 1))
    else:
        tops = jnp.full((n,), max(0, (h - fine_size) // 2), jnp.int32)
        lefts = jnp.full((n,), max(0, (w - fine_size) // 2), jnp.int32)
        return tops, lefts, jnp.zeros((n,), bool)
    flips = (jnp.bool_(train) & ~jnp.bool_(no_flip)
             & jax.random.bernoulli(kf, 0.5, (n,)))
    return tops, lefts, flips


@functools.partial(jax.jit, static_argnames=(
    "fine_size", "train", "no_flip", "groups", "aligned_flags",
    "grayscale_keys", "dtype"))
def _augment_batch(batch: Dict[str, jax.Array], key: jax.Array,
                   fine_size: int, train: bool, no_flip: bool,
                   groups: Tuple[Tuple[str, ...], ...],
                   aligned_flags: Tuple[bool, ...],
                   grayscale_keys: Tuple[str, ...], dtype) -> Dict[str, jax.Array]:
    out = dict(batch)
    for gi, (group, aligned) in enumerate(zip(groups, aligned_flags)):
        keys = [k for k in group if k in batch]
        if not keys:
            continue
        n, h, w = batch[keys[0]].shape[:3]
        tops, lefts, flips = draw_augment_params(
            jax.random.fold_in(key, gi), n, (h, w), fine_size,
            train=train, no_flip=no_flip, aligned=aligned)
        for k in keys:
            out[k] = crop_flip_normalize(
                batch[k], tops, lefts, flips, fine_size,
                grayscale=k in grayscale_keys, dtype=dtype)
    return out


# crop/flip sharing: aligned datasets draw ONE rng for the AB pair with the
# reference's narrower offset range (host parity: AlignedDataset joint
# crop); unaligned draw independently per side (host parity: separate
# apply_transform calls). The device_aug datasets emit only A/B — the
# reference's duplicate key spellings (img_source/img_target) are aliased
# back on device post-augment (same buffer, zero cost).
UNALIGNED_GROUPS = (("A",), ("B",))
ALIGNED_GROUPS = (("A", "B"),)
_ALIASES = {"img_source": "A", "img_target": "B"}


def wrap_for_config(iterator, cfg, key: jax.Array):
    """Pick groups/grayscale for ``cfg`` and wrap ``iterator`` (the
    ``cfg.device_aug`` path used by train.py/test.py).

    Mirrors datasets._Base._gray for the grayscale sides.
    """
    aligned = cfg.dataset_mode == "aligned"
    groups = ALIGNED_GROUPS if aligned else UNALIGNED_GROUPS
    flags = (True,) if aligned else (False, False)
    if cfg.direction == "BtoA":
        gray_a, gray_b = cfg.output_nc == 1, cfg.input_nc == 1
    else:
        gray_a, gray_b = cfg.input_nc == 1, cfg.output_nc == 1
    gkeys = (("A",) if gray_a else ()) + (("B",) if gray_b else ())
    return device_augment_batches(iterator, cfg, key, groups=groups,
                                  aligned_flags=flags, grayscale_keys=gkeys)


def device_augment_batches(iterator, cfg, key: jax.Array, *,
                           groups: Tuple[Tuple[str, ...], ...] = UNALIGNED_GROUPS,
                           aligned_flags: Tuple[bool, ...] = None,
                           grayscale_keys: Tuple[str, ...] = (),
                           dtype=jnp.float32):
    """Wrap a uint8-batch iterator (datasets built with cfg.device_aug) and
    yield augmented, normalized device batches.

    Leaves not named in ``groups`` (paths, metadata, labels) pass through
    untouched; the reference alias spellings (img_source=A, img_target=B)
    are attached to the output. Each batch gets a fresh fold of ``key`` so
    batches differ but runs are reproducible.
    """
    if aligned_flags is None:
        aligned_flags = (False,) * len(groups)
    for i, batch in enumerate(iterator):
        named = {k for g in groups for k in g}
        arrays = {k: v for k, v in batch.items()
                  if k in named and getattr(v, "ndim", 0) == 4}
        others = {k: v for k, v in batch.items() if k not in arrays}
        aug = _augment_batch(
            {k: jnp.asarray(v) for k, v in arrays.items()},
            jax.random.fold_in(key, i), cfg.fine_size,
            bool(cfg.is_train), bool(cfg.no_flip), groups,
            tuple(aligned_flags), tuple(grayscale_keys), dtype)
        out = {**{k: aug[k] for k in arrays}, **others}
        for alias, base in _ALIASES.items():
            if base in out and alias not in out:
                out[alias] = out[base]
        yield out
