"""End-to-end CLI smokes: the reference's user surface driven through the
real argv parsers (reference train.py:10-81, test.py:9-40).

These run the actual repo-root ``train.py``/``test.py`` mains in-process on a
tiny synthetic dataset, exercising the full stack in one pass: config parse
(incl. reference flag aliases), dataloader + device prefetch onto a real
2-device DP mesh, jitted train/eval steps, visualizer artifacts (opt.txt,
loss_log.txt, scalars.jsonl, HTML web gallery), orbax checkpoint save, the
``--continue_train`` resume path, and the inference gallery writer.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_cli(name, fname):
    # load by path: the repo-root module names ("train", "test") collide with
    # the stdlib `test` package and must not be imported by bare name
    spec = importlib.util.spec_from_file_location(name, os.path.join(ROOT, fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


train_cli = _load_cli("_cli_train", "train.py")
test_cli = _load_cli("_cli_test", "test.py")

RNG = np.random.RandomState(7)


def _write_pngs(directory, n, size=(40, 30)):
    os.makedirs(directory, exist_ok=True)
    for i in range(n):
        arr = RNG.randint(0, 255, (size[1], size[0], 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(directory, f"img_{i:03d}.png"))


@pytest.fixture(scope="module")
def cli_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_data"))
    _write_pngs(os.path.join(root, "trainA"), 8)
    _write_pngs(os.path.join(root, "trainB"), 8)
    _write_pngs(os.path.join(root, "testA"), 4)
    _write_pngs(os.path.join(root, "testB"), 4)
    return root


@pytest.fixture(scope="module")
def trained(cli_root, tmp_path_factory):
    """One tiny 2-epoch CycleGAN run through the train CLI on a 2-device
    DP mesh (batch 4 sharded 2-way); shared by the artifact/resume tests."""
    ckpt = str(tmp_path_factory.mktemp("cli_ckpt"))
    argv = [
        "--model", "cycle_gan", "--dataroot", cli_root,
        "--checkpoints_dir", ckpt, "--name", "cli_smoke",
        "--net_g", "resnet_3blocks", "--ngf", "8", "--ndf", "8",
        # reference capitalized alias spellings on purpose
        "--loadSize", "36", "--fineSize", "32", "--batchSize", "4",
        "--mesh_shape", "2",
        "--niter", "1", "--niter_decay", "1",
        "--print_freq", "8", "--display_freq", "8",
        "--save_epoch_freq", "2", "--save_latest_freq", "1000000",
        "--num_threads", "2",
    ]
    state = train_cli.main(argv)
    return ckpt, state


def test_train_cli_artifacts(trained):
    ckpt, state = trained
    expr = os.path.join(ckpt, "cli_smoke")
    # opt.txt provenance dump (reference base_options.py:94-112)
    opt = open(os.path.join(expr, "opt.txt")).read()
    assert "cycle_gan" in opt and "fine_size" in opt
    # loss_log.txt console mirror (reference util/visualizer.py:156-169)
    log = open(os.path.join(expr, "loss_log.txt")).read()
    assert "epoch: " in log and "cycle_A" in log
    # JSONL scalar series incl. the in-loop eval means (train.py:119-143)
    recs = [json.loads(l) for l in open(os.path.join(expr, "scalars.jsonl"))]
    assert any("cycle_A" in r for r in recs)
    assert any(any(k.startswith("eval_") for k in r) for r in recs)
    for r in recs:
        for k, v in r.items():
            if k not in ("epoch", "iters", "t"):
                assert np.isfinite(v), (k, r)
    # HTML gallery of per-epoch visuals (reference util/visualizer.py:121-140)
    assert os.path.exists(os.path.join(expr, "web", "index.html"))
    assert any(f.startswith("epoch") and f.endswith(".png")
               for f in os.listdir(os.path.join(expr, "web", "images")))
    # orbax whole-state checkpoints at save_epoch_freq and epoch end
    assert os.path.isdir(os.path.join(expr, "ckpt_latest"))
    assert os.path.isdir(os.path.join(expr, "ckpt_2"))
    # the returned state has stepped: 2 epochs x 2 batches
    assert int(np.asarray(state.step)) == 4


def test_train_cli_resume(trained, cli_root):
    """--continue_train restores ckpt_latest and keeps training
    (reference base_model.py:42-43, train_options.py:17)."""
    ckpt, _ = trained
    argv = [
        "--model", "cycle_gan", "--dataroot", cli_root,
        "--checkpoints_dir", ckpt, "--name", "cli_smoke",
        "--net_g", "resnet_3blocks", "--ngf", "8", "--ndf", "8",
        "--loadSize", "36", "--fineSize", "32", "--batchSize", "4",
        "--mesh_shape", "2",
        "--continue_train", "--epoch_count", "2",
        "--niter", "1", "--niter_decay", "1",
        "--print_freq", "8", "--display_freq", "1000000",
        "--save_epoch_freq", "100", "--save_latest_freq", "1000000",
        "--num_threads", "2",
    ]
    state = train_cli.main(argv)
    # resumed at step 4, ran epoch 2 only (2 more batches)
    assert int(np.asarray(state.step)) == 6


def test_test_cli_gallery(cli_root, tmp_path):
    """Bare ``test.py --dataroot <folder>`` = TestModel over SingleDataset
    → results/<name>/<phase>_<epoch>/index.html (reference test.py:29-40)."""
    results = str(tmp_path / "results")
    web_dir = test_cli.main([
        "--dataroot", os.path.join(cli_root, "testA"),
        "--checkpoints_dir", str(tmp_path / "ck"), "--name", "cli_gallery",
        "--results_dir", results,
        "--net_g", "resnet_3blocks", "--ngf", "8", "--fineSize", "32",
        "--num_test", "3",
    ])
    assert web_dir == os.path.join(results, "cli_gallery", "test_latest")
    html = open(os.path.join(web_dir, "index.html")).read()
    assert "fake_B" in html
    imgs = sorted(os.listdir(os.path.join(web_dir, "images")))
    # 3 samples x (real_A, fake_B)
    assert len(imgs) == 6
    assert any(f.endswith("_real_A.png") for f in imgs)
    assert any(f.endswith("_fake_B.png") for f in imgs)


def test_train_cli_2d_mesh_tp(cli_root, tmp_path):
    """One-flag tensor parallelism from argv: ``--mesh_shape 2 4 --parallel
    tp`` trains a cycle_gan step on a ('data','model') mesh with the resnet
    trunks Megatron-sharded (VERDICT r2 item 6 — the reference's one-flag
    DataParallel analogue, reference models/seg_network.py:90-93)."""
    argv = [
        "--model", "cycle_gan", "--dataroot", cli_root,
        "--checkpoints_dir", str(tmp_path / "ck_tp"), "--name", "cli_tp",
        "--net_g", "resnet_3blocks", "--ngf", "8", "--ndf", "8",
        "--loadSize", "36", "--fineSize", "32", "--batchSize", "4",
        "--mesh_shape", "2", "4", "--parallel", "tp",
        "--niter", "1", "--niter_decay", "0",
        "--print_freq", "4", "--display_freq", "1000000",
        "--save_epoch_freq", "100", "--save_latest_freq", "1000000",
        "--num_threads", "2",
    ]
    state = train_cli.main(argv)
    assert int(np.asarray(state.step)) == 2
    # the trunk conv1 kernels really are channel-sharded over 'model'
    from jax.sharding import PartitionSpec as P
    k = state.params["G_A"]["block0"]["conv1"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")


def test_train_cli_sp_zero(cli_root, tmp_path):
    """``--parallel sp --zero opt``: image H sharded over 'model' at the
    host boundary + Adam moments ZeRO-sharded over 'data', from argv."""
    argv = [
        "--model", "cycle_gan", "--dataroot", cli_root,
        "--checkpoints_dir", str(tmp_path / "ck_sp"), "--name", "cli_sp",
        "--net_g", "resnet_3blocks", "--ngf", "8", "--ndf", "8",
        "--loadSize", "36", "--fineSize", "32", "--batchSize", "4",
        "--mesh_shape", "2", "4", "--parallel", "sp", "--zero", "opt",
        "--niter", "1", "--niter_decay", "0",
        "--print_freq", "4", "--display_freq", "1000000",
        "--save_epoch_freq", "100", "--save_latest_freq", "1000000",
        "--num_threads", "2",
    ]
    state = train_cli.main(argv)
    assert int(np.asarray(state.step)) == 2


def test_train_cli_parallel_errors(cli_root, tmp_path):
    """Unsupported parallelism combos fail fast with actionable messages."""
    base = [
        "--model", "cycle_gan", "--dataroot", cli_root,
        "--checkpoints_dir", str(tmp_path / "ck_err"), "--name", "cli_err",
        "--net_g", "resnet_3blocks", "--ngf", "8", "--ndf", "8",
        "--loadSize", "36", "--fineSize", "32", "--batchSize", "4",
        "--niter", "1", "--niter_decay", "0", "--num_threads", "2",
    ]
    with pytest.raises(SystemExit, match="library feature"):
        train_cli.main(base + ["--parallel", "pp"])
    with pytest.raises(SystemExit, match="'model' mesh axis"):
        train_cli.main(base + ["--parallel", "tp"])  # 1-D mesh
    with pytest.raises(SystemExit, match="must divide"):
        # trunk width 4*9=36 does not divide an 8-way model axis
        train_cli.main(base + ["--mesh_shape", "1", "8", "--parallel", "tp",
                               "--ngf", "9"])
