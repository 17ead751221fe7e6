"""RefineNet-LW track tests: trunk/fusion shapes, domain adapters, segd
heads, seg_gan_loss, and the full two-phase jitted train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
from cycle_depth_estimation_tpu.models import create_model
from cycle_depth_estimation_tpu.models.refinenet import (
    ATBlock,
    CRPBlock,
    DCGANDiscriminator,
    PSPBlock,
    ResNetLW,
    Segd,
    seg_gan_loss,
)

RNG = np.random.RandomState(5)


@pytest.fixture(scope="module")
def small_rfw():
    net = ResNetLW(layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 96, 3))
    vs = net.init(jax.random.key(0), x, "real")
    return net, vs, x


def test_resnetlw_shapes_and_heads(small_rfw):
    net, vs, x = small_rfw
    dep_outs, pred_d, feats = net.apply(vs, x, "real")
    h, w = x.shape[1:3]
    # x4 @1/16, x3 @1/8, x2 @1/4, x1 @1/4
    assert feats[0].shape == (1, h // 16, w // 16, 512)
    assert feats[1].shape == (1, h // 8, w // 8, 256)
    assert feats[2].shape == (1, h // 4, w // 4, 256)
    assert feats[3].shape == (1, h // 4, w // 4, 256)
    # fused depth @1/2, tanh-bounded
    assert pred_d.shape == (1, h // 2, w // 2, 1)
    assert float(jnp.abs(pred_d).max()) <= 1.0
    assert len(dep_outs) == 4


def test_domain_adapters_differ(small_rfw):
    net, vs, x = small_rfw
    xr = jnp.asarray(RNG.randn(1, 64, 96, 3), jnp.float32)
    _, pr, _ = net.apply(vs, xr, "real")
    _, ps, _ = net.apply(vs, xr, "syn")
    # both adapter sets exist; different adapters → different outputs
    assert "ins_layer1_r" in vs["params"] and "ins_layer1_s" in vs["params"]
    assert not np.allclose(np.asarray(pr), np.asarray(ps))


def test_segd_heads_upscale(small_rfw):
    net, vs, x = small_rfw
    _, _, feats = net.apply(vs, x, "real")
    scales = (3, 2, 1, 1)
    for f, up in zip(feats, scales):
        head = Segd(n_cls=28, up_scale=up)
        vh = head.init(jax.random.key(1), f)
        out = head.apply(vh, f)
        assert out.shape[-1] == 29  # n_cls + fake class
        assert out.shape[1] == f.shape[1] * 2 ** up


def test_seg_gan_loss_directions():
    logits = jnp.asarray(RNG.randn(1, 8, 8, 29), jnp.float32)
    labels = jnp.asarray(RNG.randint(0, 28, (1, 8, 8)), jnp.int32)
    real = float(seg_gan_loss(logits, labels, True))
    fake = float(seg_gan_loss(logits, labels, False))
    assert np.isfinite(real) and np.isfinite(fake)
    # fake target is the constant class 28
    onehot_fake = jnp.zeros((1, 8, 8, 29)).at[..., 28].set(50.0)
    assert float(seg_gan_loss(onehot_fake, labels, False)) < 1e-3


def test_psp_at_crp_blocks():
    x = jnp.zeros((1, 8, 8, 64))
    psp = PSPBlock(64)
    v = psp.init(jax.random.key(0), x)
    assert psp.apply(v, x).shape == (1, 8, 8, 64)
    at = ATBlock(64)
    va = at.init(jax.random.key(1), x, x)
    assert at.apply(va, x, x).shape == (1, 8, 8, 64)
    crp = CRPBlock(64)
    vc = crp.init(jax.random.key(2), x)
    assert crp.apply(vc, x).shape == (1, 8, 8, 64)


def test_dcgan_d():
    d = DCGANDiscriminator(d_h_size=8, n_middle=3)
    x = jnp.zeros((2, 64, 64, 2))
    v = d.init(jax.random.key(0), x)
    out = d.apply(v, x)
    assert out.ndim == 1
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


def make_batch(h, w):
    return {
        "img_syn": jnp.asarray(RNG.randn(1, h, w, 3), jnp.float32),
        "img_real": jnp.asarray(RNG.randn(1, h, w, 3), jnp.float32),
        "seg_l_syn": jnp.asarray(RNG.randint(0, 28, (1, h, w)), jnp.int32),
        "seg_l_real": jnp.asarray(RNG.randint(0, 28, (1, h, w)), jnp.int32),
        "dep_l_syn": jnp.asarray(RNG.rand(1, h, w, 1) * 2 - 1, jnp.float32),
        "depth_l_s": jnp.asarray(np.sign(RNG.randn(1, h, w, 4)), jnp.float32),
    }


def test_rf_lw_train_step():
    cfg = apply_model_defaults(Config(model="rf_lw", batch_size=1,
                                      resnet_layers=[1, 1, 1, 1]))
    model = create_model(cfg)
    h, w = 64, 96
    state = model.init_state_at(jax.random.key(0), h, w)
    batch = make_batch(h, w)
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


def test_rf_lw_syn_domain_routing():
    """Driver default: BOTH branches run the 'real' adapters and the '_s'
    adapters stay untouched (mdoel6.py:470 / model7.py:397 pass no type);
    --syn_domain syn restores the model_ins-style split (model_ins.py:487)
    and trains the '_s' adapters too."""

    def s_adapters_changed(cfg):
        model = create_model(cfg)
        h, w = 64, 96
        state = model.init_state_at(jax.random.key(0), h, w)
        state1, _ = model.train_step(state, make_batch(h, w),
                                     jax.random.key(1))
        changed = []
        for name, p0 in state.params["G"].items():
            if name.startswith("ins_layer") and name.endswith("_s"):
                p1 = state1.params["G"][name]
                changed.append(any(
                    not np.allclose(a, b) for a, b in
                    zip(jax.tree.leaves(p0), jax.tree.leaves(p1))))
        assert changed  # the adapters exist
        return any(changed)

    # rf_lw7 plumbs the guard through its own __init__ (it bypasses the
    # parent's) — cover both models so a refactor can't drop one silently
    for m in ("rf_lw", "rf_lw7"):
        base = dict(model=m, batch_size=1, resnet_layers=[1, 1, 1, 1])
        assert not s_adapters_changed(apply_model_defaults(Config(**base)))
        assert s_adapters_changed(apply_model_defaults(
            Config(syn_domain="syn", **base)))
    with pytest.raises(ValueError):
        create_model(apply_model_defaults(
            Config(syn_domain="rael", **base)))


def test_rf_lw7_train_step():
    """model7 variant: single seg2_0 head, supervised SEG step, bilinear up,
    net_depth constructed-but-unstepped (reference model7.py quirks)."""
    cfg = apply_model_defaults(Config(model="rf_lw7", batch_size=1,
                                      resnet_layers=[1, 1, 1, 1]))
    model = create_model(cfg)
    h, w = 64, 96
    state = model.init_state_at(jax.random.key(0), h, w)
    batch = make_batch(h, w)
    state1, metrics = model.train_step(state, batch, jax.random.key(1))
    assert set(metrics) == set(model.loss_names)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    for net in ("G", "seg2_0"):
        l0 = jax.tree.leaves(state.params[net])
        l1 = jax.tree.leaves(state1.params[net])
        assert any(not np.allclose(a, b) for a, b in zip(l0, l1)), net
    # net_depth is constructed but never stepped (model7.py:221-235 quirk)
    l0 = jax.tree.leaves(state.params["depth"])
    l1 = jax.tree.leaves(state1.params["depth"])
    assert all(np.allclose(a, b) for a, b in zip(l0, l1))
    m, visuals = model.eval_step(state1, batch)
    assert visuals["syn_dep_pre"].shape == (1, h, w, 1)
    assert visuals["syn_seg_pre"].shape == (1, h, w)
