"""Tests for the T2Net/SegCycle family: block parity vs torch, net shapes,
shared-PReLU semantics, CE-loss parity, and full jitted train steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
from cycle_depth_estimation_tpu.models import create_model
from cycle_depth_estimation_tpu.models.encoder_decoder import (
    UNetDecoder,
    UNetEncoder,
)
from cycle_depth_estimation_tpu.models.seg_network import (
    FeatureDiscriminator,
    MultiscaleDiscriminator,
    ResGenerator,
    UNetGenerator,
    cross_entropy_loss,
    seg_accuracy,
)

RNG = np.random.RandomState(7)


def rand(*shape):
    return RNG.randn(*shape).astype(np.float32)


# ---------------------------------------------------------------------------
# loss parity
# ---------------------------------------------------------------------------

def test_cross_entropy_matches_torch():
    logits = rand(2, 8, 8, 5)
    labels = RNG.randint(0, 5, (2, 8, 8))
    labels[0, :2] = 255  # ignored region
    ref = tnn.CrossEntropyLoss(ignore_index=255)(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels).long())
    out = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels), 255)
    assert np.isclose(float(out), ref.item(), atol=1e-6)


def test_seg_accuracy():
    logits = np.zeros((1, 2, 2, 3), np.float32)
    logits[0, :, :, 1] = 5.0  # predict class 1 everywhere
    labels = np.array([[[1, 1], [2, 255]]])
    acc = seg_accuracy(jnp.asarray(logits), jnp.asarray(labels), 255)
    assert np.isclose(float(acc), 2 / 3)


# ---------------------------------------------------------------------------
# network shapes
# ---------------------------------------------------------------------------

def test_unet_task_generator_dual_heads():
    g = UNetGenerator(ngf=8, layers=4, norm="batch")
    x = jnp.zeros((1, 64, 96, 3))
    vs = g.init({"params": jax.random.key(0)}, x, "syn")
    feat, out_syn = g.apply(vs, x, "syn")
    _, out_real = g.apply(vs, x, "real")
    assert feat.shape == (1, 4, 6, 64)       # center_in at 1/16, 8·ngf
    assert out_syn.shape == (1, 64, 96, 22)  # full-res 22-class syn head
    assert out_real.shape == (1, 64, 96, 28)
    # Tanh-squashed logits (reference _OutputBlock quirk)
    assert float(jnp.abs(out_syn).max()) <= 1.0
    # both heads' params exist regardless of the domain traced at init
    assert "head_syn" in vs["params"] and "head_real" in vs["params"]
    # network-wide shared PReLU α: exactly one at top level
    assert vs["params"]["prelu_alpha"].shape == (1,)


def test_res_generator_returns_feature_and_output():
    g = ResGenerator(output_nc=3, ngf=8, n_blocks=4, norm="instance",
                     activation="ReLU")
    x = jnp.zeros((1, 32, 32, 3))
    vs = g.init(jax.random.key(0), x)
    feat, out = g.apply(vs, x)
    assert feat.shape == (1, 8, 8, 16)
    assert out.shape == (1, 32, 32, 3)


def test_multiscale_discriminator():
    d = MultiscaleDiscriminator(ndf=8, num_d=2, norm="instance")
    x = jnp.zeros((1, 64, 64, 3))
    vs = d.init(jax.random.key(0), x)
    outs = d.apply(vs, x)
    assert len(outs) == 2
    assert outs[0].shape[1] > outs[1].shape[1]  # second scale on pooled input


def test_feature_discriminator_flatten_order():
    d = FeatureDiscriminator(input_nc=16, feature_hw=(4, 4))
    x = jnp.zeros((2, 4, 4, 16))
    vs = d.init(jax.random.key(0), x)
    out = d.apply(vs, x)
    assert out[0].shape == (2, 1)
    assert vs["params"]["fc0"]["kernel"].shape == (16 * 4 * 4, 16)


def test_unet_encoder_decoder_pair():
    enc = UNetEncoder(ngf=8)
    dec = UNetDecoder(output_nc=22, ngf=8)
    x = jnp.zeros((1, 64, 64, 3))
    v_enc = enc.init(jax.random.key(0), x)
    feats = enc.apply(v_enc, x)
    assert [f.shape for f in feats] == [
        (1, 32, 32, 8), (1, 16, 16, 16), (1, 8, 8, 32), (1, 4, 4, 64),
        (1, 4, 4, 64)]
    v_dec = dec.init(jax.random.key(1), feats)
    outs = dec.apply(v_dec, feats)
    # [center_in, output4 (1/8), output3 (1/4), output2 (1/2), output1 (1/1)]
    assert outs[0].shape == (1, 4, 4, 64)
    assert outs[1].shape == (1, 8, 8, 22)
    assert outs[2].shape == (1, 16, 16, 22)
    assert outs[3].shape == (1, 32, 32, 22)
    assert outs[4].shape == (1, 64, 64, 22)


# ---------------------------------------------------------------------------
# model train steps
# ---------------------------------------------------------------------------

def _domain_batch(h=64, w=96, n=1, nc_syn=22, nc_real=28):
    return {
        "img_source": jnp.asarray(rand(n, h, w, 3)),
        "img_target": jnp.asarray(rand(n, h, w, 3)),
        "lab_source": jnp.asarray(RNG.randint(0, nc_syn, (n, h, w)), jnp.int32),
        "lab_target": jnp.asarray(RNG.randint(0, nc_real, (n, h, w)), jnp.int32),
    }


def test_seg_model_train_step():
    cfg = apply_model_defaults(Config(model="seg", ngf=8, net_g="resnet_3blocks",
                                      batch_size=1))
    model = create_model(cfg)
    state = model.init_state(jax.random.key(0))
    batch = _domain_batch(h=64, w=96)
    state1, metrics = model.train_step(state, batch, jax.random.key(1))
    assert set(metrics) == set(model.loss_names)
    assert all(np.isfinite(float(v)) for v in metrics.values())
    assert 0.0 <= float(metrics["acc_syn"]) <= 1.0
    # only the task net updates; the s2t generator stays frozen
    for a, b in zip(jax.tree.leaves(state.params["s2t"]),
                    jax.tree.leaves(state1.params["s2t"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t0 = jax.tree.leaves(state.params["img2task"])
    t1 = jax.tree.leaves(state1.params["img2task"])
    assert any(not np.allclose(a, b) for a, b in zip(t0, t1))
    # loss falls on a fixed batch
    for i in range(4):
        state1, m = model.train_step(state1, batch, jax.random.key(i + 2))
    assert float(m["loss_lab_t"]) < float(metrics["loss_lab_t"])


def test_seg_cycle_train_step():
    cfg = apply_model_defaults(Config(model="seg_cycle", ngf=8, ndf=8,
                                      net_g="resnet_3blocks", fine_size=32,
                                      batch_size=1, pool_size=2))
    model = create_model(cfg)
    state = model.init_state(jax.random.key(0))
    batch = _domain_batch(h=32, w=32)
    state1, metrics = model.train_step(state, batch, jax.random.key(1))
    assert set(metrics) == set(model.loss_names)
    assert all(np.isfinite(float(v)) for v in metrics.values())
    # all eight nets update
    for net in model.model_names:
        l0 = jax.tree.leaves(state.params[net])
        l1 = jax.tree.leaves(state1.params[net])
        assert any(not np.allclose(a, b) for a, b in zip(l0, l1)), net
    # encoder/decoder batchnorm stats moved
    s0 = jax.tree.leaves(state.batch_stats["encoderA"])
    s1 = jax.tree.leaves(state1.batch_stats["encoderA"])
    assert any(not np.allclose(a, b) for a, b in zip(s0, s1))
    metrics_e, visuals = model.eval_step(state1, batch)
    assert set(visuals) == set(model.visual_names)
