"""S2D (new_multi) pipeline tests.

Highlights: G1 numerical parity against the REAL checked-in reference
checkpoint (new_multi/checkpoints/iter_4000_net_G_1.pth) loaded into a
torch oracle built with reference naming, plus chain shapes and the full
4-phase jitted train step on a reduced DenseNet config.
"""

import os
from collections import OrderedDict

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
from cycle_depth_estimation_tpu.models import create_model
from cycle_depth_estimation_tpu.models.s2d_networks import (
    DEP,
    SEG,
    Discriminator2Seg,
    G1,
    GeneralNet,
    RDep,
    SDiscriminator,
    StarDiscriminator,
    bce_dep_loss,
    get_masks,
)
from cycle_depth_estimation_tpu.utils.torch_import import import_g1, load_pth

RNG = np.random.RandomState(11)
G1_PTH = "/root/reference/new_multi/checkpoints/iter_4000_net_G_1.pth"


# ---------------------------------------------------------------------------
# torch G_1 oracle with reference state-dict naming
# ---------------------------------------------------------------------------

def build_torch_g1(ngf=64, n_blocks=3):
    class DenseLayer(tnn.Sequential):
        def __init__(self, nin, growth, bn_size):
            super().__init__()
            self.add_module("norm1", tnn.BatchNorm2d(nin))
            self.add_module("relu1", tnn.ReLU(inplace=True))
            self.add_module("conv1", tnn.Conv2d(nin, bn_size * growth, 1, bias=False))
            self.add_module("norm2", tnn.BatchNorm2d(bn_size * growth))
            self.add_module("relu2", tnn.ReLU(inplace=True))
            self.add_module("conv2", tnn.Conv2d(bn_size * growth, growth, 3,
                                                padding=1, bias=False))

        def forward(self, x):
            return torch.cat([x, super().forward(x)], 1)

    class Block(tnn.Module):
        def __init__(self, d):
            super().__init__()
            self.conv0_block = tnn.Sequential(
                tnn.ReflectionPad2d(0), tnn.Conv2d(d, d, 1, dilation=2, bias=False),
                tnn.BatchNorm2d(d))
            self.conv1_block = tnn.Sequential(
                tnn.ReflectionPad2d(1), tnn.Conv2d(d, d, 3, bias=False),
                tnn.BatchNorm2d(d), tnn.ReLU(False))

        def forward(self, x):
            return x + self.conv0_block(x) + self.conv1_block(x)

    net = tnn.Module()
    feats = tnn.Sequential(OrderedDict([
        ("conv0", tnn.Conv2d(3, 64, 7, 2, 3, bias=False)),
        ("norm0", tnn.BatchNorm2d(64)),
        ("relu0", tnn.ReLU(inplace=False)),
    ]))
    db = tnn.Sequential()
    nf = 64
    for i in range(6):
        db.add_module(f"denselayer{i + 1}", DenseLayer(nf, 32, 4))
        nf += 32
    feats.add_module("denseblock1", db)
    net.features = feats
    layers = [tnn.ReflectionPad2d(1), tnn.Conv2d(nf, ngf, 3, bias=False),
              tnn.BatchNorm2d(ngf), tnn.ReLU(False)]
    layers += [Block(ngf) for _ in range(n_blocks)]
    net.model = tnn.Sequential(*layers)
    net.forward = lambda x: net.model(net.features(x))
    return net


@pytest.mark.skipif(not os.path.exists(G1_PTH), reason="reference ckpt absent")
def test_g1_parity_vs_reference_checkpoint():
    sd = torch.load(G1_PTH, map_location="cpu")
    sd = {k[7:]: v for k, v in sd.items()}  # strip DataParallel prefix
    tg = build_torch_g1()
    tg.load_state_dict(sd)
    tg.eval()
    x = RNG.randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    variables = import_g1(load_pth(G1_PTH))
    g = G1()
    out = g.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x),
                  train=False)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# chain shapes (reduced config)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def s2d_chain():
    h, w = 48, 96
    g1 = G1(n_blocks=1)
    g2 = GeneralNet(block_config=(2, 2, 2, 2))
    rd = RDep()
    x = jnp.zeros((1, h, w, 3))
    vg1 = g1.init(jax.random.key(0), x)
    y = g1.apply(vg1, x)
    vg2 = g2.init(jax.random.key(1), y, "S")
    psp, feats = g2.apply(vg2, y, "S")
    vrd = rd.init(jax.random.key(2), feats, psp)
    return g1, g2, rd, vg1, vg2, vrd, x, y, psp, feats


def test_g2_modes_and_feature_pyramid(s2d_chain):
    g1, g2, rd, vg1, vg2, vrd, x, y, psp, feats = s2d_chain
    h, w = x.shape[1:3]
    assert y.shape == (1, h // 2, w // 2, 64)
    assert psp.shape == (1, h // 16, w // 16, 1024)
    # skip features: db1 @1/2, db2 @1/4, db3 @1/8, db4 @1/16
    assert [f.shape[1] for f in feats] == [h // 2, h // 4, h // 8, h // 16]
    # 'R' mode consumes the raw image through the stem
    psp_r, feats_r = g2.apply(vg2, x, "R")
    assert psp_r.shape == psp.shape
    # trunk features are detached
    grads = jax.grad(
        lambda v: sum(jnp.sum(f) for f in g2.apply(v, y, "S")[1]))(vg2)
    assert all(float(jnp.abs(g).max()) == 0.0
               for g in jax.tree.leaves(grads["params"]))


def test_rdep_outputs(s2d_chain):
    g1, g2, rd, vg1, vg2, vrd, x, y, psp, feats = s2d_chain
    h, w = x.shape[1:3]
    (o0, o1, o2), seg, (dep4, dep_o) = rd.apply(vrd, feats, psp)
    assert o0.shape == (1, h // 8, w // 8, 512)
    assert o1.shape == (1, h // 4, w // 4, 256)
    assert o2.shape == (1, h // 2, w // 2, 128)
    assert seg.shape == (1, h, w, 28)
    assert dep_o.shape == (1, h, w, 1)
    assert len(dep4) == 4 and dep4[0].shape == (1, h, w, 1)
    assert float(jnp.abs(dep4[0]).max()) <= 1.0  # tanh band heads


def test_s2d_discriminators():
    x = jnp.zeros((1, 24, 48, 512))
    d = SDiscriminator()
    v = d.init(jax.random.key(0), x)
    assert d.apply(v, x).shape[-1] == 1
    sd = StarDiscriminator(repeat_num=3)
    vs = sd.init(jax.random.key(1), jnp.zeros((1, 64, 64, 2)))
    assert sd.apply(vs, jnp.zeros((1, 64, 64, 2))).ndim == 3  # squeezed
    d2 = Discriminator2Seg(conv_dim=512, repeat_num=2)
    vd2 = d2.init(jax.random.key(2), jnp.zeros((1, 8, 8, 512)))
    out = d2.apply(vd2, jnp.zeros((1, 8, 8, 512)))
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


def test_densenet_backbone_contract():
    """Repaired form of the reference's unrunnable DenseNet
    (networks5_ds.py:157-227, forward references a never-registered
    features.block0): 3 deepest outputs at 1/16, 1/64, 1/128 of input."""
    from cycle_depth_estimation_tpu.models.s2d_networks import DenseNetBackbone

    net = DenseNetBackbone(block_config=(2, 2, 2, 2))
    x = jnp.zeros((1, 256, 384, 3))
    v = net.init(jax.random.key(0), x)
    outs = net.apply(v, x)
    assert len(outs) == 3
    # stem 1/2; each transition pools ×2 and the loop adds an extra ×2 pool:
    # transition2 out = 1/16, transition3 out = 1/64, denseblock4 = 1/128
    assert outs[0].shape[1:3] == (16, 24)
    assert outs[1].shape[1:3] == (4, 6)
    assert outs[2].shape[1:3] == (2, 3)
    # channel contract: transitions halve (128→64), final block adds n·growth
    assert outs[0].shape[-1] == 64 and outs[1].shape[-1] == 64
    assert outs[2].shape[-1] == outs[1].shape[-1] + 2 * 32


def test_legacy_seg_dep_decoders():
    x = jnp.zeros((1, 4, 8, 1024))
    seg = SEG(n_cls=28)
    v = seg.init(jax.random.key(0), x)
    s, f = seg.apply(v, x)
    assert s.shape == (1, 64, 128, 28)
    dep = DEP()
    vd = dep.init(jax.random.key(1), x)
    assert dep.apply(vd, x).shape == (1, 64, 128, 1)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def test_bce_dep_loss_matches_torch():
    pred = np.tanh(RNG.randn(1, 8, 8, 1)).astype(np.float32)
    target = np.sign(RNG.randn(1, 8, 8, 4)).astype(np.float32)
    o_m, z_m = get_masks(jnp.asarray(target))
    ours = bce_dep_loss(jnp.asarray(pred), jnp.asarray(target), o_m, z_m)
    # torch oracle (reference networks5_ds.py:947-956 semantics)
    tp = torch.from_numpy(pred.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(target.transpose(0, 3, 1, 2))
    tom = tt.clone()
    tom[tom != 1] = 0
    tzm = tt.clone()
    tzm[tzm != -1] = 0
    tzm[tzm == -1] = 1
    ref = (tF.binary_cross_entropy((tp + 1) / 2 * tom, (tt + 1) / 2 * tom)
           + tF.binary_cross_entropy((tp + 1) / 2 * tzm, (tt + 1) / 2 * tzm)
           + 50 * tF.l1_loss(tp.expand_as(tt), tt))
    assert np.isclose(float(ours), ref.item(), rtol=1e-5)


# ---------------------------------------------------------------------------
# full train step (reduced config)
# ---------------------------------------------------------------------------

def test_s2d_train_step():
    cfg = apply_model_defaults(Config(model="S2D", batch_size=1,
                                      dense_block_config=[2, 2, 2, 2],
                                      g1_blocks=1))
    model = create_model(cfg)
    # both dims must be >= 192 so the 1/8-scale features survive FD1's
    # four stride-2/1 k4 convs (the reference works at 192x576)
    h, w = 192, 192

    # build state at the test resolution by initializing manually
    state = _init_at(model, h, w)
    batch = {
        "img_syn": jnp.asarray(RNG.randn(1, h, w, 3), jnp.float32),
        "img_real": jnp.asarray(RNG.randn(1, h, w, 3), jnp.float32),
        "seg_l_syn": jnp.asarray(RNG.randint(0, 28, (1, h, w)), jnp.int32),
        "seg_l_real": jnp.asarray(RNG.randint(0, 28, (1, h, w)), jnp.int32),
        "dep_l_syn": jnp.asarray(RNG.rand(1, h, w, 1) * 2 - 1, jnp.float32),
        "depth_l_s": jnp.asarray(np.sign(RNG.randn(1, h, w, 4)), jnp.float32),
    }
    state1, metrics = model.train_step(state, batch, jax.random.key(1))
    assert set(metrics) == set(model.loss_names)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    # the logged dep_ref decomposition (tools/dep_ref_floor.py relies on it)
    np.testing.assert_allclose(
        float(metrics["dep_ref"]),
        float(metrics["dep_l1"]) + float(metrics["dep_band"]), rtol=1e-5)
    for net in model.model_names:
        l0 = jax.tree.leaves(state.params[net])
        l1 = jax.tree.leaves(state1.params[net])
        assert any(not np.allclose(a, b) for a, b in zip(l0, l1)), net
    # eval
    m, visuals = model.eval_step(state1, batch)
    assert visuals["syn_dep_ref"].shape == (1, h, w, 1)
    assert visuals["syn_seg_pre"].shape == (1, h, w)


def _init_at(model, h, w):
    import jax

    from cycle_depth_estimation_tpu.models.base_model import ModelState

    keys = jax.random.split(jax.random.key(0), 6)
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    vG1 = model.net_G_1.init(keys[0], x)
    g1_out = model.net_G_1.apply(vG1, x)
    vG2 = model.net_G_2.init(keys[1], g1_out, "S")
    psp, feats = model.net_G_2.apply(vG2, g1_out, "S")
    vRD = model.net_R_D.init(keys[2], feats, psp)
    (f0, f1, f2), _, _ = model.net_R_D.apply(vRD, feats, psp)
    vFD1 = model.net_FD1.init(keys[3], f0)
    vFD2 = model.net_FD2.init(keys[4], f1)
    vFD3 = model.net_FD3.init(keys[5], f2)
    vs = dict(G_1=vG1, G_2=vG2, R_D=vRD, FD1=vFD1, FD2=vFD2, FD3=vFD3)
    params = {k: v["params"] for k, v in vs.items()}
    stats = {k: v.get("batch_stats", {}) for k, v in vs.items()}
    return ModelState(
        params=params, batch_stats=stats,
        opt_states={k: model.opts[k].init(params[k]) for k in model.opts},
        pools={}, step=jnp.zeros((), jnp.int32))


def _assert_params_close(tree_a, tree_b, net_lr, err_msg=""):
    """Post-Adam-step param comparison. Runs under a LARGE Adam eps
    (cfg.adam_eps): at the torch eps=1e-8, step 1 is ~sign(g)·lr, so
    reduction-order noise on any near-zero-grad coordinate flips its update
    by ~2·lr (measured: 5.4% of a G_1 leaf at 192² bs8 — CLAUDE.md caveat);
    eps=1e-3 caps the update sensitivity d(update)/dg at lr/eps.

    Even then, the 4-phase step is SEQUENTIAL — R_D's grads are taken after
    G_2's update, so phase-k grads inherit phase-(k-1) param diffs and a few
    |g|≈eps coordinates can still flip. Measured over two full runs: every
    leaf's max diff ≤ 1.2·its net lr; flip-scale (>net_lr) fraction ≲1e-3
    (deepest-phase FD2, ZeRO layout); bulk >1e-5 fraction ≤3.9% (G_1).
    The eps=1e-8 pathology this guards against measured 5.4% ABOVE the
    flip scale — 18× the bound here; a real divergence puts most coords at
    the update scale and trips all three checks."""
    for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
        d = np.abs(np.asarray(b, np.float64) - np.asarray(a, np.float64))
        assert d.max() <= 3.0 * net_lr, (err_msg, d.max())
        assert np.mean(d > net_lr) <= 3e-3, (err_msg, float(np.mean(d > net_lr)))
        assert np.mean(d > 1e-5) <= 0.08, (err_msg, float(np.mean(d > 1e-5)))


def test_dp_step_equals_single_device():
    """The FULL 4-phase S2D train step under data parallelism matches the
    single-device step.

    This is the flagship scale-out parity claim: the reference wraps exactly
    G_1/G_2/R_D in nn.DataParallel (new_multi/model5.py:212-223,
    networks5_ds.py:252-262). TPU-native DP is the SAME jit program with the
    batch carrying a NamedSharding over 'data' and params replicated —
    BatchNorm reduces over the full logical batch, so metrics and updated
    params must agree with the unsharded run up to reduction order.

    192×192 minimum: below that the FD1-3 stride-2 k4 ladders emit zero-size
    outputs (geometry, not numerics).

    adam_eps=1e-3 (vs the torch-default 1e-8 used in training) so the
    post-step param comparison is meaningful — see _assert_params_close.
    """
    cfg = apply_model_defaults(Config(model="S2D", batch_size=8,
                                      dense_block_config=[2, 2, 2, 2],
                                      g1_blocks=1, adam_eps=1e-3))
    model = create_model(cfg)
    h, w = 192, 192
    state = _init_at(model, h, w)
    b = 8
    batch = {
        "img_syn": jnp.asarray(RNG.randn(b, h, w, 3), jnp.float32),
        "img_real": jnp.asarray(RNG.randn(b, h, w, 3), jnp.float32),
        "seg_l_syn": jnp.asarray(RNG.randint(0, 28, (b, h, w)), jnp.int32),
        "seg_l_real": jnp.asarray(RNG.randint(0, 28, (b, h, w)), jnp.int32),
        "dep_l_syn": jnp.asarray(RNG.rand(b, h, w, 1) * 2 - 1, jnp.float32),
        "depth_l_s": jnp.asarray(np.sign(RNG.randn(b, h, w, 4)), jnp.float32),
    }

    state_ref, metrics_ref = model.train_step(state, batch, jax.random.key(1))
    metrics_ref = {k: float(v) for k, v in metrics_ref.items()}

    from cycle_depth_estimation_tpu.parallel import (
        host_shard_batch,
        make_mesh,
        replicated,
    )

    mesh = make_mesh()
    state_dp = jax.device_put(state, replicated(mesh))
    batch_dp = host_shard_batch(mesh, batch)
    assert len(batch_dp["img_syn"].sharding.device_set) == 8
    state_dp, metrics_dp = model.train_step(state_dp, batch_dp,
                                            jax.random.key(1))
    for k, v in metrics_dp.items():
        assert np.isfinite(float(v)), (k, float(v))
        np.testing.assert_allclose(float(v), metrics_ref[k], rtol=2e-4,
                                   atol=2e-5, err_msg=k)
    # updated params agree leaf-wise (grad all-reduce == unsharded reduce);
    # the 5e-5 bulk bound is below the smallest sign-flip scale (2·lr/5 =
    # 8e-5 for G_1) so a real divergence would still fail
    net_lrs = {"G_1": cfg.lr / 5, "G_2": cfg.lr / 3, "R_D": cfg.lr / 2,
               "FD1": cfg.lr / 4, "FD2": cfg.lr / 4, "FD3": cfg.lr / 4}
    for net in model.model_names:
        _assert_params_close(state_ref.params[net], state_dp.params[net],
                             net_lr=net_lrs[net], err_msg=net)
    # BatchNorm running stats threaded identically (full-batch reduction)
    for a, bb in zip(jax.tree.leaves(state_ref.batch_stats),
                     jax.tree.leaves(state_dp.batch_stats)):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   atol=5e-5, rtol=5e-4)

    # ---- ZeRO-1 layout: the 6 Adam moment trees sharded over 'data'
    # (parallel/zero.py) — same jit program, same numbers, 1/8 the
    # optimizer HBM per device ----
    from cycle_depth_estimation_tpu.parallel.zero import (
        memory_report,
        zero_state,
    )

    state_z = zero_state(mesh, state)
    rep = memory_report(state, mesh)
    assert rep["zero_per_device_bytes"]["opt_states"] < (
        rep["replicated_per_device_bytes"]["opt_states"] / 4)
    state_z, metrics_z = model.train_step(state_z, batch_dp, jax.random.key(1))
    for k, v in metrics_z.items():
        np.testing.assert_allclose(float(v), metrics_ref[k], rtol=2e-4,
                                   atol=2e-5, err_msg=f"zero:{k}")
    for net in model.model_names:
        _assert_params_close(state_ref.params[net], state_z.params[net],
                             net_lr=net_lrs[net], err_msg=f"zero:{net}")
    # updated moments keep their sharded layout (no silent re-replication)
    from jax.sharding import PartitionSpec as P
    big = [x for x in jax.tree.leaves(state_z.opt_states)
           if hasattr(x, "sharding") and getattr(x, "ndim", 0) >= 1
           and any(d % 8 == 0 and d >= 8 for d in x.shape)]
    assert big and any(x.sharding.spec != P() for x in big)


def test_s2d_base_train_step():
    cfg = apply_model_defaults(Config(model="S2D_base", batch_size=1, ndf=8,
                                      dense_block_config=[2, 2, 2, 2],
                                      g1_blocks=1))
    model = create_model(cfg)
    h, w = 64, 96
    state = model.init_state_at(jax.random.key(0), h, w)
    batch = {
        "img_syn": jnp.asarray(RNG.randn(1, h, w, 3), jnp.float32),
        "img_real": jnp.asarray(RNG.randn(1, h, w, 3), jnp.float32),
        "seg_l_syn": jnp.asarray(RNG.randint(0, 28, (1, h, w)), jnp.int32),
        "seg_l_real": jnp.asarray(RNG.randint(0, 28, (1, h, w)), jnp.int32),
        "dep_l_syn": jnp.asarray(RNG.rand(1, h, w, 1) * 2 - 1, jnp.float32),
    }
    state1, metrics = model.train_step(state, batch, jax.random.key(1))
    assert set(metrics) == set(model.loss_names)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    for net in model.model_names:
        l0 = jax.tree.leaves(state.params[net])
        l1 = jax.tree.leaves(state1.params[net])
        assert any(not np.allclose(a, b) for a, b in zip(l0, l1)), net
    m, visuals = model.eval_step(state1, batch)
    assert visuals["syn_dep_pre"].shape == (1, h, w, 1)
    assert visuals["syn_seg_pre"].shape == (1, h, w)


def test_weighted_cross_entropy_matches_torch():
    import torch.nn as tnn2
    logits = RNG.randn(1, 6, 6, 28).astype(np.float32)
    labels = RNG.randint(0, 28, (1, 6, 6))
    labels[0, 0, :3] = 255
    from cycle_depth_estimation_tpu.models.s2d_networks import CLASS_WEIGHTS_28
    from cycle_depth_estimation_tpu.models.seg_network import cross_entropy_loss
    w = torch.tensor(CLASS_WEIGHTS_28)
    ref = tnn2.CrossEntropyLoss(weight=w, ignore_index=255)(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels).long())
    ours = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels), 255,
                              jnp.asarray(CLASS_WEIGHTS_28))
    assert np.isclose(float(ours), ref.item(), atol=1e-6)


def build_torch_general_net(block_config=(2, 2, 2, 2), mid_nc=1024):
    """Reference-shaped General_net (networks5_ds.py:366-409) torch oracle."""
    from tests.test_s2d import build_torch_g1  # reuse DenseLayer via closure

    class DenseLayer(tnn.Sequential):
        def __init__(self, nin, growth, bn_size):
            super().__init__()
            self.add_module("norm1", tnn.BatchNorm2d(nin))
            self.add_module("relu1", tnn.ReLU(inplace=True))
            self.add_module("conv1", tnn.Conv2d(nin, bn_size * growth, 1, bias=False))
            self.add_module("norm2", tnn.BatchNorm2d(bn_size * growth))
            self.add_module("relu2", tnn.ReLU(inplace=True))
            self.add_module("conv2", tnn.Conv2d(bn_size * growth, growth, 3,
                                                padding=1, bias=False))

        def forward(self, x):
            return torch.cat([x, super().forward(x)], 1)

    class PspTrans(tnn.Module):
        def __init__(self, nin):
            super().__init__()
            nout = nin // 4
            self.trans = tnn.ModuleList([
                tnn.BatchNorm2d(nin), tnn.ReLU(inplace=False),
                tnn.Conv2d(nin, nout, 1, bias=False),
                tnn.Conv2d(nin, nout, 3, padding=1, bias=False),
                tnn.AvgPool2d(2, 2)])

        def forward(self, x):
            x = self.trans[1](self.trans[0](x))
            return self.trans[4](torch.cat([self.trans[2](x), self.trans[3](x)], 1))

    net = tnn.Module()
    feats = tnn.Sequential(OrderedDict([
        ("conv0", tnn.Conv2d(3, 64, 7, 2, 3, bias=False)),
        ("norm0", tnn.BatchNorm2d(64)),
        ("relu0", tnn.ReLU(inplace=False))]))
    psp_list = tnn.ModuleList()
    nf = 64
    for i, n_layers in enumerate(block_config):
        db = tnn.Sequential()
        for j in range(n_layers):
            db.add_module(f"denselayer{j + 1}", DenseLayer(nf, 32, 4))
            nf += 32
        feats.add_module(f"denseblock{i + 1}", db)
        if i != len(block_config) - 1:
            psp_list.append(PspTrans(nf))
            nf //= 2
    net.features = feats
    net.PSP = psp_list
    q = mid_nc // 4
    net.psp = tnn.ModuleList([
        tnn.BatchNorm2d(nf), tnn.ReLU(inplace=False),
        tnn.Conv2d(nf, q, 1, bias=False),
        tnn.Conv2d(nf, q, 1, dilation=1, bias=False),
        tnn.Conv2d(nf, q, 2, padding=1, dilation=2, bias=False),
        tnn.Conv2d(nf, q, 3, padding=2, dilation=2, bias=False),
        tnn.BatchNorm2d(mid_nc)])

    def forward(x, mode):
        h = x
        start = 0 if mode == "R" else 3
        if mode == "R":
            for i in range(3):
                h = net.features[i](h)
        feats_out = []
        for i in range(len(net.features) - 3):
            h = net.features[i + 3](h)
            feats_out.append(h.detach())
            if i < 3:
                h = net.PSP[i](h)
        h = net.psp[1](net.psp[0](h))
        h = torch.cat([net.psp[2](h), net.psp[3](h), net.psp[4](h),
                       net.psp[5](h)], 1)
        return net.psp[6](h), feats_out

    net.fwd = forward
    return net


def test_general_net_import_parity():
    from cycle_depth_estimation_tpu.utils.torch_import import import_general_net

    torch.manual_seed(3)
    tg = build_torch_general_net()
    tg.eval()
    x = RNG.randn(1, 3, 32, 64).astype(np.float32)  # NCHW
    with torch.no_grad():
        psp_ref, feats_ref = tg.fwd(torch.from_numpy(x), "R")
    sd = {k: v for k, v in tg.state_dict().items()}
    variables = import_general_net(sd, block_config=(2, 2, 2, 2))
    g = GeneralNet(block_config=(2, 2, 2, 2))
    variables = jax.tree.map(jnp.asarray, variables)
    psp, feats = g.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), "R",
                         train=False)
    np.testing.assert_allclose(
        np.asarray(psp), psp_ref.numpy().transpose(0, 2, 3, 1), atol=1e-3,
        rtol=1e-3)
    for mine, ref in zip(feats, feats_ref):
        np.testing.assert_allclose(
            np.asarray(mine), ref.numpy().transpose(0, 2, 3, 1), atol=1e-3,
            rtol=1e-3)


def test_torchvision_densenet_import_parity():
    """Warm-start GeneralNet2 from a torchvision-layout DenseNet state dict
    (features.denseblockN.denselayerM.{norm1,conv1,norm2,conv2},
    features.transitionN.{norm,conv}) and compare trunk features against the
    torch oracle chained without the stem maxpool (the reference trunk omits
    it). torchvision itself is not installed here; the oracle reproduces its
    exact module naming."""
    from cycle_depth_estimation_tpu.models.s2d_networks import GeneralNet2
    from cycle_depth_estimation_tpu.utils.torch_import import (
        import_torchvision_densenet,
        warm_start,
    )

    class DenseLayer(tnn.Sequential):
        def __init__(self, nin, growth, bn_size):
            super().__init__()
            self.add_module("norm1", tnn.BatchNorm2d(nin))
            self.add_module("relu1", tnn.ReLU(inplace=True))
            self.add_module("conv1", tnn.Conv2d(nin, bn_size * growth, 1, bias=False))
            self.add_module("norm2", tnn.BatchNorm2d(bn_size * growth))
            self.add_module("relu2", tnn.ReLU(inplace=True))
            self.add_module("conv2", tnn.Conv2d(bn_size * growth, growth, 3,
                                                padding=1, bias=False))

        def forward(self, x):
            return torch.cat([x, super().forward(x)], 1)

    torch.manual_seed(4)
    block_config = (2, 2, 2, 2)
    feats = tnn.Sequential(OrderedDict([
        ("conv0", tnn.Conv2d(3, 64, 7, 2, 3, bias=False)),
        ("norm0", tnn.BatchNorm2d(64))]))
    nf = 64
    for bi, n_layers in enumerate(block_config, start=1):
        db = tnn.Sequential()
        for j in range(n_layers):
            db.add_module(f"denselayer{j + 1}", DenseLayer(nf, 32, 4))
            nf += 32
        feats.add_module(f"denseblock{bi}", db)
        if bi < 4:
            tr = tnn.Sequential(OrderedDict([
                ("norm", tnn.BatchNorm2d(nf)),
                ("relu", tnn.ReLU(inplace=False)),
                ("conv", tnn.Conv2d(nf, nf // 2, 1, bias=False)),
                ("pool", tnn.AvgPool2d(2, 2))]))
            feats.add_module(f"transition{bi}", tr)
            nf //= 2
    tv = tnn.Module()
    tv.features = feats
    tv.eval()

    x = RNG.randn(1, 3, 32, 64).astype(np.float32)
    f = tv.features
    with torch.no_grad():
        h = f.norm0(f.conv0(torch.from_numpy(x)))
        h = torch.relu(h)
        # the reference's inplace relu0 mutates the appended norm0 tensor
        # (networks2.py:403,467-470) → stored stem skip is post-ReLU
        feats_ref = [h]
        for i in range(1, 5):
            h = getattr(f, f"denseblock{i}")(h)
            feats_ref.append(h)
            if i < 4:
                h = getattr(f, f"transition{i}")(h)

    variables = import_torchvision_densenet(tv.state_dict(),
                                            block_config=block_config)
    g = GeneralNet2(block_config=block_config)
    init_vars = g.init(jax.random.key(0),
                       jnp.asarray(x.transpose(0, 2, 3, 1)), "R")
    merged, n = warm_start(init_vars, jax.tree.map(jnp.asarray, variables))
    assert n > 80  # trunk leaves transferred; PSP head keeps fresh init
    feats_out, _ = g.apply(merged, jnp.asarray(x.transpose(0, 2, 3, 1)), "R",
                           train=False)
    for mine, ref in zip(feats_out, feats_ref):
        np.testing.assert_allclose(np.asarray(mine),
                                   ref.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-3, rtol=1e-2)


DIS0_PTH = "/root/reference/new_multi/checkpoints/iter_4000_net_Dis0_en.pth"


@pytest.mark.skipif(not os.path.exists(DIS0_PTH), reason="reference ckpt absent")
def test_dis0_en_parity_vs_reference_checkpoint():
    """The second real checked-in checkpoint (Discriminator2_seg) through the
    importer vs a torch oracle with the reference structure
    (new_multi/networks5_ds.py:842-864)."""
    from cycle_depth_estimation_tpu.models.s2d_networks import Discriminator2Seg
    from cycle_depth_estimation_tpu.utils.torch_import import (
        import_discriminator2_seg,
    )

    sd = torch.load(DIS0_PTH, map_location="cpu")
    sd = {k[7:]: v for k, v in sd.items()}  # strip DataParallel prefix

    layers = []
    dim = 1024
    for _ in range(3):
        layers += [tnn.Conv2d(dim, dim // 2, 1), tnn.LeakyReLU(0.01),
                   tnn.BatchNorm2d(dim // 2)]
        dim //= 2
    tnet = tnn.Sequential()
    tnet.main = tnn.Sequential(*layers)
    tnet.conv1 = tnn.Conv2d(dim, 1, 3, 2, 1, bias=False)
    tnet.load_state_dict(sd)
    tnet.eval()
    x = RNG.randn(1, 8, 12, 1024).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = torch.sigmoid(
            tnet.conv1(tnet.main(torch.from_numpy(x.transpose(0, 3, 1, 2))))
        ).squeeze(1).numpy()

    variables = import_discriminator2_seg(load_pth(DIS0_PTH))
    d = Discriminator2Seg()
    out = d.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x),
                  train=False)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# R_dep / FD importer parity — oracle = the reference's OWN torch modules
# (imported read-only from /root/reference at test time, never copied)
# ---------------------------------------------------------------------------

REF_NM = "/root/reference/new_multi"


def _randomize_state(net, seed):
    """Fill every param/buffer with non-trivial values so BN affine params
    and running stats are exercised (fresh torch BN is near-identity)."""
    g = np.random.RandomState(seed)
    with torch.no_grad():
        for k, v in net.state_dict().items():
            if k.endswith("num_batches_tracked"):
                continue
            if k.endswith("running_var"):
                v.copy_(torch.from_numpy(
                    g.rand(*v.shape).astype(np.float32) * 0.5 + 0.5))
            else:
                v.copy_(torch.from_numpy(
                    g.randn(*v.shape).astype(np.float32) * 0.2))


def _ref_module():
    import sys
    if REF_NM not in sys.path:
        sys.path.insert(0, REF_NM)
    import networks5_ds
    return networks5_ds


@pytest.mark.skipif(not os.path.isdir(REF_NM), reason="reference absent")
def test_sdiscriminator_import_parity_vs_reference_module():
    from cycle_depth_estimation_tpu.utils.torch_import import (
        import_sdiscriminator,
    )

    ref = _ref_module()
    tnet = ref._Discriminator(input_nc=64)
    _randomize_state(tnet, 3)
    tnet.eval()
    x = RNG.randn(1, 48, 64, 64).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    variables = import_sdiscriminator(
        {k: v.numpy() for k, v in tnet.state_dict().items()})
    d = SDiscriminator()
    got = d.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x),
                  train=False)
    np.testing.assert_allclose(np.asarray(got),
                               want.transpose(0, 2, 3, 1), atol=2e-4,
                               rtol=1e-3)


@pytest.mark.skipif(not os.path.isdir(REF_NM), reason="reference absent")
def test_rdep_import_parity_vs_reference_module():
    from cycle_depth_estimation_tpu.models.s2d_networks import RDep
    from cycle_depth_estimation_tpu.utils.torch_import import import_rdep

    ref = _ref_module()
    tnet = ref.R_dep()
    _randomize_state(tnet, 4)
    tnet.eval()
    g = np.random.RandomState(5)
    h, w = 6, 9
    d_feature = g.randn(1, 1024, h, w).astype(np.float32) * 0.3
    s_feats = [None,
               g.randn(1, 512, 4 * h, 4 * w).astype(np.float32) * 0.3,
               g.randn(1, 1280, 2 * h, 2 * w).astype(np.float32) * 0.3,
               g.randn(1, 1664, h, w).astype(np.float32) * 0.3]
    with torch.no_grad():
        (o0, o1, o2), sd_t, (dep4_t, dep1_t) = tnet(
            [None] + [torch.from_numpy(f) for f in s_feats[1:]],
            torch.from_numpy(d_feature))
    variables = import_rdep(
        {k: v.numpy() for k, v in tnet.state_dict().items()})
    net = RDep()
    feats, seg, (dep_4, dep_o) = net.apply(
        jax.tree.map(jnp.asarray, variables),
        [None] + [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in s_feats[1:]],
        jnp.asarray(d_feature.transpose(0, 2, 3, 1)), train=False)
    for mine, want in zip(feats, (o0, o1, o2)):
        np.testing.assert_allclose(np.asarray(mine),
                                   want.numpy().transpose(0, 2, 3, 1),
                                   atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(seg),
                               sd_t.numpy().transpose(0, 2, 3, 1),
                               atol=3e-4, rtol=1e-3)
    for mine, want in zip(dep_4, dep4_t):
        np.testing.assert_allclose(np.asarray(mine),
                                   want.numpy().transpose(0, 2, 3, 1),
                                   atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dep_o),
                               dep1_t.numpy().transpose(0, 2, 3, 1),
                               atol=3e-4, rtol=1e-3)


def test_phased_step_equals_fused():
    """`train_step_phased` (six jit programs — the driver dryrun's compile
    path) matches the fused `train_step` round-robin: metrics to float
    noise, post-Adam params within reduction-order tolerance at the damped
    adam_eps (see _assert_params_close for why step-1 Adam amplifies)."""
    cfg = apply_model_defaults(Config(model="S2D", batch_size=1,
                                      dense_block_config=[2, 2, 2, 2],
                                      g1_blocks=1, adam_eps=1e-3))
    fused = create_model(cfg)
    phased = create_model(cfg)
    h, w = 192, 192
    state = _init_at(fused, h, w)
    batch = {
        "img_syn": jnp.asarray(RNG.randn(1, h, w, 3), jnp.float32),
        "img_real": jnp.asarray(RNG.randn(1, h, w, 3), jnp.float32),
        "seg_l_syn": jnp.asarray(RNG.randint(0, 28, (1, h, w)), jnp.int32),
        "seg_l_real": jnp.asarray(RNG.randint(0, 28, (1, h, w)), jnp.int32),
        "dep_l_syn": jnp.asarray(RNG.rand(1, h, w, 1) * 2 - 1, jnp.float32),
        "depth_l_s": jnp.asarray(np.sign(RNG.randn(1, h, w, 4)), jnp.float32),
    }
    sA, mA = fused.train_step(state, batch, jax.random.key(1))
    sB, mB = phased.train_step_phased(state, batch, jax.random.key(1))
    assert set(mA) == set(mB)
    for k in mA:
        np.testing.assert_allclose(float(mB[k]), float(mA[k]), rtol=1e-4,
                                   atol=1e-5, err_msg=k)
    for net in sA.params:
        for a, b in zip(jax.tree.leaves(sA.params[net]),
                        jax.tree.leaves(sB.params[net])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=5e-4, rtol=0, err_msg=net)
    assert int(sB.step) == int(sA.step) == 1


def test_dense_chunked_parity(monkeypatch):
    """CDE_DENSE_CHUNKED re-expresses the dense blocks (Fenwick chunk list,
    normalize-once BN, 1×1-conv decomposition) with an IDENTICAL variable
    tree; outputs and updated batch stats must match the reference-shaped
    path to float32 noise in both train and eval modes."""
    net = GeneralNet(mid_nc=128, num_init_features=64, growth_rate=32,
                     block_config=(2, 3, 2))
    x = jnp.asarray(RNG.randn(2, 64, 64, 3), jnp.float32)

    monkeypatch.delenv("CDE_DENSE_CHUNKED", raising=False)
    variables = net.init(jax.random.key(0), x, "R")
    (psp_a, feats_a), mut_a = net.apply(variables, x, "R", train=True,
                                        mutable=["batch_stats"])
    (psp_ae, feats_ae) = net.apply(variables, x, "R", train=False)

    monkeypatch.setenv("CDE_DENSE_CHUNKED", "1")
    v_chunk = net.init(jax.random.key(0), x, "R")
    assert (jax.tree_util.tree_structure(v_chunk)
            == jax.tree_util.tree_structure(variables))
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(v_chunk)):
        assert a.shape == b.shape and a.dtype == b.dtype
    (psp_b, feats_b), mut_b = net.apply(variables, x, "R", train=True,
                                        mutable=["batch_stats"])
    (psp_be, feats_be) = net.apply(variables, x, "R", train=False)

    np.testing.assert_allclose(np.asarray(psp_b), np.asarray(psp_a),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(psp_be), np.asarray(psp_ae),
                               rtol=1e-4, atol=1e-4)
    for fa, fb in zip(feats_a, feats_b):
        np.testing.assert_allclose(np.asarray(fb), np.asarray(fa),
                                   rtol=1e-4, atol=1e-4)
    for fa, fb in zip(feats_ae, feats_be):
        np.testing.assert_allclose(np.asarray(fb), np.asarray(fa),
                                   rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(mut_a), jax.tree.leaves(mut_b)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
