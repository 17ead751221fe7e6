"""Device-side augmentation/preprocessing kernels vs the host pipeline.

Every kernel in data/device_transforms.py must match the host implementation
(data/transforms.py, data/preprocess.py) exactly — the device path is a
relocation of the same math, not a reimplementation with new semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cycle_depth_estimation_tpu.data import device_transforms as dt
from cycle_depth_estimation_tpu.data import preprocess as pp
from cycle_depth_estimation_tpu.data import transforms as ht

RNG = np.random.RandomState(11)


def test_crop_flip_normalize_matches_host():
    x = RNG.randint(0, 256, (4, 20, 24, 3)).astype(np.uint8)
    tops = np.array([0, 3, 5, 2])
    lefts = np.array([1, 0, 7, 4])
    flips = np.array([False, True, True, False])
    y = dt.crop_flip_normalize(jnp.asarray(x), jnp.asarray(tops),
                               jnp.asarray(lefts), jnp.asarray(flips), 13)
    for i in range(4):
        ref = x[i].astype(np.float32) / 255.0
        ref = ref[tops[i]:tops[i] + 13, lefts[i]:lefts[i] + 13]
        if flips[i]:
            ref = ref[:, ::-1]
        ref = ht.normalize(ref)
        np.testing.assert_array_equal(np.asarray(y[i]), ref)


def test_crop_flip_normalize_grayscale_matches_host():
    x = RNG.randint(0, 256, (2, 10, 10, 3)).astype(np.uint8)
    z = np.zeros(2, np.int32)
    y = dt.crop_flip_normalize(jnp.asarray(x), z, z, np.zeros(2, bool), 10,
                               grayscale=True)
    for i in range(2):
        ref = ht.rgb_to_gray(ht.normalize(x[i].astype(np.float32) / 255.0))
        np.testing.assert_allclose(np.asarray(y[i]), ref, atol=1e-6)


@pytest.mark.parametrize("table", [pp.REAL_ID_TO_TRAINID_255,
                                   pp.REAL_ID_TO_TRAINID_0,
                                   pp.SYN_ID_TO_REALID])
def test_remap_lut_matches_sequential(table):
    labels = RNG.randint(0, 256, (37, 41)).astype(np.uint8)
    lut = dt.compose_lut(table)
    got = np.asarray(dt.remap_labels(jnp.asarray(labels), lut))
    want = pp.remap_sequential(labels.astype(np.int32), table)
    np.testing.assert_array_equal(got, want)


def test_label_edges_matches_host():
    labels = RNG.randint(0, 28, (31, 29)).astype(np.uint8)
    labels[5:9, 5:9] = 21  # a sky patch must emit no edges
    got = np.asarray(dt.label_edges(jnp.asarray(labels)))
    want = pp.label_edges(labels)
    np.testing.assert_array_equal(got, want)
    # batched form agrees with per-image
    batch = np.stack([labels, labels[::-1]])
    got_b = np.asarray(dt.label_edges(jnp.asarray(batch)))
    np.testing.assert_array_equal(got_b[1], pp.label_edges(labels[::-1]))


@pytest.mark.parametrize("train", [True, False])
def test_depth_bands_match_host(train):
    depth = RNG.uniform(0, 10000, (17, 19)).astype(np.float32)
    full_h, bands_h = pp.depth_bands(depth, train=train)
    full_d, bands_d = dt.depth_bands(jnp.asarray(depth), train=train)
    np.testing.assert_allclose(np.asarray(full_d), full_h, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bands_d), bands_h, atol=1e-5)
    # batched: per-image statistics, not per-batch
    batch = np.stack([depth, depth * 0.5 + 100])
    fb, bb = dt.depth_bands(jnp.asarray(batch), train=train)
    f1, b1 = pp.depth_bands(batch[1], train=train)
    np.testing.assert_allclose(np.asarray(fb[1]), f1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bb[1]), b1, atol=1e-5)


def _mkimgs(root, n=6, size=40):
    from PIL import Image
    for side in ("trainA", "trainB", "testA", "testB"):
        d = root / side
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            arr = RNG.randint(0, 256, (size, size, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")


def _cfg(root, **kw):
    from cycle_depth_estimation_tpu.config import Config
    base = dict(dataroot=str(root), load_size=36, fine_size=32, batch_size=3,
                device_aug=True, is_train=True, dataset_mode="unaligned")
    base.update(kw)
    return Config(**base)


def test_unaligned_device_aug_end_to_end(tmp_path):
    from cycle_depth_estimation_tpu.data import create_dataset
    from cycle_depth_estimation_tpu.data.loader import DataLoader

    _mkimgs(tmp_path)
    cfg = _cfg(tmp_path)
    ds = create_dataset(cfg, "train")
    raw = ds[0]
    assert raw["A"].dtype == np.uint8 and raw["A"].shape == (36, 36, 3)

    loader = DataLoader(ds, batch_size=3, shuffle=False, num_workers=2)
    out = list(dt.wrap_for_config(iter(loader), cfg, jax.random.key(0)))
    assert len(out) == 2
    b = out[0]
    assert b["A"].shape == (3, 32, 32, 3) and b["A"].dtype == jnp.float32
    # ±1e-5 slack: jitted x/255 lowers to reciprocal-multiply
    assert float(jnp.max(b["A"])) <= 1.0 + 1e-5
    assert float(jnp.min(b["A"])) >= -1.0 - 1e-5
    # A and its img_source alias got the SAME draw
    np.testing.assert_array_equal(np.asarray(b["A"]), np.asarray(b["img_source"]))
    # paths pass through
    assert len(b["A_paths"]) == 3


def test_device_aug_eval_matches_host_eval(tmp_path):
    """Eval path (center crop, no flip) is bit-identical to the host eval
    transform — the strongest end-to-end parity statement."""
    from cycle_depth_estimation_tpu.data import create_dataset
    from cycle_depth_estimation_tpu.data.loader import DataLoader

    _mkimgs(tmp_path)
    cfg_dev = _cfg(tmp_path, is_train=False)
    cfg_host = cfg_dev.replace(device_aug=False)
    ds_dev = create_dataset(cfg_dev, "test")
    ds_host = create_dataset(cfg_host, "test")

    loader = DataLoader(ds_dev, batch_size=3, shuffle=False, num_workers=1)
    batch = next(iter(dt.wrap_for_config(iter(loader), cfg_dev,
                                         jax.random.key(0))))
    for i in range(3):
        np.testing.assert_allclose(np.asarray(batch["A"][i]),
                                   ds_host[i]["A"], atol=1e-6)


def test_aligned_device_aug_shares_crop(tmp_path):
    from PIL import Image

    from cycle_depth_estimation_tpu.data import create_dataset
    from cycle_depth_estimation_tpu.data.loader import DataLoader

    d = tmp_path / "train"
    d.mkdir()
    for i in range(4):
        arr = RNG.randint(0, 256, (30, 60, 3)).astype(np.uint8)
        arr[:, 30:] = arr[:, :30]  # B half == A half
        Image.fromarray(arr).save(d / f"{i}.png")
    cfg = _cfg(tmp_path, dataset_mode="aligned", batch_size=2)
    ds = create_dataset(cfg, "train")
    assert ds[0]["A"].dtype == np.uint8
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    batch = next(iter(dt.wrap_for_config(iter(loader), cfg,
                                         jax.random.key(1))))
    # identical halves + shared draw ⇒ identical outputs
    np.testing.assert_array_equal(np.asarray(batch["A"]),
                                  np.asarray(batch["B"]))


def test_wrap_for_config_grayscale(tmp_path):
    from cycle_depth_estimation_tpu.data import create_dataset
    from cycle_depth_estimation_tpu.data.loader import DataLoader

    _mkimgs(tmp_path)
    cfg = _cfg(tmp_path, input_nc=1)
    ds = create_dataset(cfg, "train")
    loader = DataLoader(ds, batch_size=3, shuffle=False, num_workers=1)
    batch = next(iter(dt.wrap_for_config(iter(loader), cfg,
                                         jax.random.key(2))))
    assert batch["A"].shape == (3, 32, 32, 1)
    assert batch["B"].shape == (3, 32, 32, 3)


def test_device_aug_rejects_preprocessed_datasets():
    """Domain loaders ship preprocessed floats; --device_aug must fail
    loudly there, not silently re-normalize (code-review finding)."""
    from cycle_depth_estimation_tpu.config import Config
    from cycle_depth_estimation_tpu.data import create_dataset

    with pytest.raises(ValueError, match="device_aug"):
        create_dataset(Config(dataset_mode="kitti", device_aug=True), "train")


def test_aligned_offsets_match_torch_range():
    """Aligned crops draw in [0, load-fine-1] (torch randint inclusive-high
    quirk), not the full [0, load-fine] range; eval still crops randomly."""
    h, w, fine = 36, 36, 32
    tops = []
    for s in range(40):
        t, l, f = dt.draw_augment_params(
            jax.random.key(s), 8, (h, w), fine, train=False, aligned=True)
        tops.append(np.asarray(t))
        assert not bool(np.asarray(f).any())  # flips stay train-only
    tops = np.concatenate(tops)
    assert tops.max() <= h - fine - 1
    assert tops.min() >= 0
    assert len(np.unique(tops)) > 1  # random at eval (reference quirk)


def test_compose_lut_out_of_range_chain():
    """Rules whose key is outside the input domain still compose (they can
    match values introduced by earlier rules)."""
    table = [(5, 300), (300, 7), (2, -1), (-1, 9)]
    labels = np.array([5, 2, 0], np.int32)
    # slow path oracle: apply sequentially by hand
    ref = labels.copy()
    for k, v in table:
        ref[ref == k] = v
    got = pp.compose_lut(table)[labels]
    np.testing.assert_array_equal(got, ref)
    # and the public fast path agrees
    np.testing.assert_array_equal(pp.remap_sequential(labels, table), ref)


def test_device_aug_no_alias_transfer(tmp_path):
    """device_aug datasets emit only A/B (no duplicated alias arrays on the
    host side); the wrapper reattaches img_source/img_target on device."""
    from cycle_depth_estimation_tpu.data import create_dataset
    from cycle_depth_estimation_tpu.data.loader import DataLoader

    _mkimgs(tmp_path)
    cfg = _cfg(tmp_path)
    ds = create_dataset(cfg, "train")
    assert "img_source" not in ds[0]
    loader = DataLoader(ds, batch_size=3, shuffle=False, num_workers=1)
    b = next(iter(dt.wrap_for_config(iter(loader), cfg, jax.random.key(4))))
    assert b["img_source"] is b["A"] and b["img_target"] is b["B"]
