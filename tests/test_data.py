"""Data-layer tests: folder datasets, loader, preprocessing oracles.

Oracle functions reimplement the reference's exact numpy recipes
(try_data.py Canny/depth-band code paths) independently, so the framework
implementations are checked against the reference *semantics*, not
themselves.
"""

import os

import numpy as np
import pytest
from PIL import Image

from cycle_depth_estimation_tpu.config import Config
from cycle_depth_estimation_tpu.data import create_dataloader, create_dataset
from cycle_depth_estimation_tpu.data.image_folder import make_dataset
from cycle_depth_estimation_tpu.data.loader import DataLoader, prefetch_to_device
from cycle_depth_estimation_tpu.data.preprocess import (
    REAL_ID_TO_TRAINID_0,
    SYN_ID_TO_TRAINID,
    depth_bands,
    label_edges,
    remap_sequential,
)

RNG = np.random.RandomState(42)


def _write_pngs(directory, n, size=(40, 30), mode="RGB"):
    os.makedirs(directory, exist_ok=True)
    paths = []
    for i in range(n):
        if mode == "RGB":
            arr = RNG.randint(0, 255, (size[1], size[0], 3), dtype=np.uint8)
        elif mode == "I;16":
            arr = RNG.randint(0, 9000, (size[1], size[0]), dtype=np.uint16)
        else:
            arr = RNG.randint(0, 34, (size[1], size[0]), dtype=np.uint8)
        img = Image.fromarray(arr)
        p = os.path.join(directory, f"img_{i:03d}.png")
        img.save(p)
        paths.append(p)
    return paths


@pytest.fixture(scope="module")
def gan_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gan_data"))
    _write_pngs(os.path.join(root, "trainA"), 6)
    _write_pngs(os.path.join(root, "trainB"), 4)
    _write_pngs(os.path.join(root, "train"), 5, size=(80, 40))  # aligned AB
    return root


def test_make_dataset_walks_sorted(gan_root):
    paths = make_dataset(os.path.join(gan_root, "trainA"))
    assert len(paths) == 6
    assert paths == sorted(paths)


def test_unaligned_dataset(gan_root):
    cfg = Config(dataroot=gan_root, load_size=36, fine_size=32, phase="train")
    ds = create_dataset(cfg.replace(dataset_mode="unaligned"))
    assert len(ds) == 6
    s = ds[0]
    assert s["A"].shape == (32, 32, 3) and s["A"].dtype == np.float32
    assert s["B"].shape == (32, 32, 3)
    assert -1.0 <= s["A"].min() and s["A"].max() <= 1.0
    assert "img_source" in s and "img_target" in s
    # reproducible: same index → same sample
    np.testing.assert_array_equal(ds[0]["A"], ds[0]["A"])
    # different epochs change the augmentation draw
    a0 = ds[1]["A"]
    ds.set_epoch(1)
    assert not np.array_equal(a0, ds[1]["A"])


def test_aligned_dataset(gan_root):
    cfg = Config(dataroot=gan_root, load_size=36, fine_size=32, phase="train",
                 dataset_mode="aligned")
    ds = create_dataset(cfg)
    s = ds[2]
    assert s["A"].shape == (32, 32, 3) and s["B"].shape == (32, 32, 3)
    assert s["A_paths"] == s["B_paths"]


def test_single_dataset(gan_root):
    cfg = Config(dataroot=os.path.join(gan_root, "trainA"), load_size=32,
                 fine_size=32, dataset_mode="single", is_train=False)
    ds = create_dataset(cfg, phase="test")
    assert len(ds) == 6
    assert ds[0]["A"].shape == (32, 32, 3)


def test_loader_batching_and_shuffle(gan_root):
    cfg = Config(dataroot=gan_root, load_size=36, fine_size=32, phase="train",
                 dataset_mode="unaligned", batch_size=4, num_threads=2)
    dl = create_dataloader(cfg)
    batches = list(dl)
    # 6 samples / bs 4 → ONE full batch; the ragged remainder is dropped
    # (it cannot device_put onto a sharded mesh axis and would retrigger
    # jit compilation — create_dataloader docstring)
    assert len(batches) == 1
    assert batches[0]["A"].shape == (4, 32, 32, 3)
    assert isinstance(batches[0]["A_paths"], list)
    # batch_size 1 keeps every sample (galleries/eval)
    dl1 = create_dataloader(cfg.replace(batch_size=1))
    assert len(list(dl1)) == 6
    # deterministic order per epoch; different across epochs
    order0 = [p for b in list(dl) for p in b["A_paths"]]
    order0b = [p for b in list(dl) for p in b["A_paths"]]
    dl.set_epoch(1)
    order1 = [p for b in list(dl) for p in b["A_paths"]]
    assert order0 == order0b
    assert order0 != order1


def test_prefetch_to_device(gan_root):
    import jax

    cfg = Config(dataroot=gan_root, load_size=36, fine_size=32, phase="train",
                 dataset_mode="unaligned", batch_size=2)
    dl = create_dataloader(cfg)
    out = list(prefetch_to_device(dl))
    assert len(out) == 3
    assert isinstance(out[0]["A"], jax.Array)
    assert out[0]["A_paths"][0].endswith(".png")


# ---------------------------------------------------------------------------
# preprocessing vs reference-recipe oracles
# ---------------------------------------------------------------------------

def _oracle_canny(img):
    """Reference try_data.py:43-68 recipe, transcribed as test oracle."""
    img_ = np.uint8(img)
    shifts = []
    for _ in range(4):
        shifts.append(np.zeros(img_.shape))
    shifts[0][:-1, :] = img_[1:, :]
    shifts[1][1:, :] = img_[:-1, :]
    shifts[2][:, :-1] = img_[:, 1:]
    shifts[3][:, 1:] = img_[:, :-1]
    edge = np.zeros(img_.shape)
    for s in shifts:
        s[img_ == 21] = 21
        edge[img_ != s] = 1
    return edge


def test_label_edges_matches_reference_recipe():
    lab = RNG.randint(0, 28, (20, 24)).astype(np.float32)
    lab[3:7, 3:9] = 21  # sky patch
    np.testing.assert_array_equal(label_edges(lab), _oracle_canny(lab))


def _oracle_bands_train(depth):
    """Reference try_data.py:240-272 recipe (train branch), incl. the
    band-5/band-4-min quirk."""
    d = depth.astype(np.float32).copy()
    d2, d3, d4, d5 = d.copy(), d.copy(), d.copy(), d.copy()
    d[d > 8000] = 8000
    d2[d2 > 8000] = 8000
    d2[d < 5000] = 5000
    d2 = 2 * (d2 - d2.min()) / (d2.max() - d2.min()) - 1
    d3[d > 6000] = 6000
    d3[d < 3000] = 3000
    d3 = 2 * (d3 - d3.min()) / (d3.max() - d3.min()) - 1
    d4[d > 4000] = 4000
    d4[d < 1000] = 1000
    # the reference REASSIGNS depth_source_4 to this normalized form before
    # band 5 reads its .min() (try_data.py:263-268) — mirror that exactly
    d4 = 2 * (d4 - d4.min()) / (d4.max() - d4.min()) - 1
    d4n = d4
    d5[d > 2000] = 2000
    d5n = 2 * (d5 - d4.min()) / (d5.max() - d5.min()) - 1
    dn = 2 * (d - d.min()) / (d.max() - d.min()) - 1
    return dn, np.stack([d2, d3, d4n, d5n], -1)


def test_depth_bands_match_reference_recipe():
    depth = RNG.randint(0, 12000, (16, 20)).astype(np.float32)
    full, bands = depth_bands(depth, train=True)
    ref_full, ref_bands = _oracle_bands_train(depth)
    np.testing.assert_allclose(full[..., 0], ref_full, atol=1e-6)
    np.testing.assert_allclose(bands, ref_bands, atol=1e-6)
    assert bands.shape == (16, 20, 4)


def test_depth_bands_degenerate_no_nan():
    full, bands = depth_bands(np.full((4, 4), 5000.0), train=True)
    assert np.isfinite(full).all() and np.isfinite(bands).all()


def test_remap_sequential_cascade():
    """try_data's 0→7 pre-step must cascade through 7→1 (sequential order)."""
    lab = np.array([[0.0, 7.0, 6.0, 33.0, 5.0]])
    lab[lab == 0] = 7
    out = remap_sequential(lab, REAL_ID_TO_TRAINID_0)
    np.testing.assert_array_equal(out[0], [1, 1, 0, 27, 0])


def test_synthia_remap_tables():
    lab = np.arange(23).reshape(1, -1)
    out = remap_sequential(lab, SYN_ID_TO_TRAINID)
    assert out[0, 0] == 255
    np.testing.assert_array_equal(out[0, 1:], np.arange(22))


# ---------------------------------------------------------------------------
# domain datasets end-to-end on synthetic data
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def domain_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("domain"))
    dirs = {}
    for name, mode, n in [("syn_rgb", "RGB", 4), ("real_rgb", "RGB", 3),
                          ("syn_lab", "L", 4), ("real_lab", "L", 3),
                          ("syn_dep", "I;16", 4)]:
        d = os.path.join(root, name)
        _write_pngs(d, n, size=(64, 32), mode=mode)
        dirs[name] = d
    return dirs


def _domain_cfg(dirs, **kw):
    return Config(
        img_source_file_train=dirs["syn_rgb"], img_target_file_train=dirs["real_rgb"],
        lab_source_file_train=dirs["syn_lab"], lab_target_file_train=dirs["real_lab"],
        depth_source_file_train=dirs["syn_dep"],
        img_source_file_test=dirs["syn_rgb"], img_target_file_test=dirs["real_rgb"],
        lab_source_file_test=dirs["syn_lab"], lab_target_file_test=dirs["real_lab"],
        depth_source_file_test=dirs["syn_dep"], **kw)


def test_synthia_dataset(domain_root):
    cfg = _domain_cfg(domain_root, dataset_mode="synthia")
    ds = create_dataset(cfg, phase="train")
    s = ds[0]
    assert s["img_source"].shape == (192, 640, 3)
    assert s["lab_source"].shape == (192, 640) and s["lab_source"].dtype == np.int32
    assert s["depth_source"].shape == (192, 640, 1)
    assert 0 <= s["depth_source"].min() and s["depth_source"].max() <= 1.0
    valid = s["lab_target"][s["lab_target"] != 255]
    assert valid.max() < 28


def test_kitti_dataset(domain_root):
    cfg = _domain_cfg(domain_root, dataset_mode="kitti")
    ds = create_dataset(cfg, phase="train")
    s = ds[1]
    assert s["img_source"].shape == (192, 640, 3)
    assert s["lab_source"].shape == (192, 640, 1)


def test_try_dataset_train_and_test(domain_root):
    cfg = _domain_cfg(domain_root, dataset_mode="try")
    ds = create_dataset(cfg, phase="train")
    s = ds[0]
    assert s["img_syn"].shape == (192, 576, 3)
    assert s["depth_l_s"].shape == (192, 576, 4)
    assert s["dep_l_syn"].shape == (192, 576, 1)
    assert s["seg_l_syn"].dtype == np.int32 and s["seg_l_syn"].max() < 28
    # edge maps are bilinear-resized from native label size (as in the
    # reference) → values in [0, 1], not strictly binary
    assert 0.0 <= s["seg_e_real"].min() and s["seg_e_real"].max() <= 1.0

    ds_t = create_dataset(cfg.replace(is_train=False), phase="test")
    t = ds_t[0]
    assert "seg_l_real" not in t
    assert "f_name" in t and "l_name" in t
    assert t["depth_l_s"].shape == (192, 576, 4)


def test_process_loader_matches_threaded(gan_root):
    """ProcessDataLoader (--worker_procs N, the reference num_workers=8
    analogue) yields the same batches as the thread loader, including
    epoch-dependent shuffling propagated into forked workers."""
    from cycle_depth_estimation_tpu.data.loader import ProcessDataLoader

    cfg = Config(dataroot=gan_root, load_size=36, fine_size=32, phase="train",
                 dataset_mode="unaligned", batch_size=2, num_threads=2,
                 worker_procs=2)
    dl_proc = create_dataloader(cfg)
    assert isinstance(dl_proc, ProcessDataLoader)
    dl_thr = create_dataloader(cfg.replace(worker_procs=0))
    for epoch in (0, 1):
        dl_proc.set_epoch(epoch)
        dl_thr.set_epoch(epoch)
        bp, bt = list(dl_proc), list(dl_thr)
        assert len(bp) == len(bt) == 3
        for a, b in zip(bp, bt):
            assert a["A_paths"] == b["A_paths"]
            np.testing.assert_array_equal(a["A"], b["A"])
            np.testing.assert_array_equal(a["B"], b["B"])
    dl_proc.shutdown()
