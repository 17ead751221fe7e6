"""new_depseg "model2" generation (`S2D_nd`).

Oracle tests import the reference's OWN torch modules read-only from
/root/reference/my_seg_depth/new_depseg/networks2.py (single-return SEG,
tanh-head ordimat DEP, 1024-ch 28-class Discriminator_seg — all with
plain-ReLU DeconvBlocks) and check forward parity through the checkpoint
importers; plus the BCE GANLoss torch parity and the six-phase
(double-D WGAN-GP) `S2D_nd` train step.
"""

import contextlib
import importlib.util
import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
from cycle_depth_estimation_tpu.models import create_model
from cycle_depth_estimation_tpu.models.s2d_networks import (
    DEP,
    Dis2SegDF,
    DiscriminatorSeg,
    SEG,
    bce_gan_loss,
)
from cycle_depth_estimation_tpu.utils.torch_import import (
    import_dep_decoder,
    import_dis2seg_df,
    import_seg_decoder,
)

RNG = np.random.RandomState(11)

REF_ND = "/root/reference/my_seg_depth/new_depseg/networks2.py"


@pytest.fixture(scope="module")
def ref_nd():
    torch = pytest.importorskip("torch")
    torch.Tensor.cuda = lambda self, *a, **k: self
    spec = importlib.util.spec_from_file_location("networks2_nd_test", REF_ND)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _sd(net):
    return {k: v.numpy() for k, v in net.state_dict().items()}


def test_seg_nd_matches_reference(ref_nd):
    import torch

    torch.manual_seed(0)
    net = ref_nd.SEG(n_cls=28).eval()
    vs = jax.tree.map(jnp.asarray, import_seg_decoder(_sd(net)))
    x_np = RNG.randn(1, 1024, 4, 6).astype(np.float32)
    with torch.no_grad():
        t_out = net(torch.from_numpy(x_np))
    o_out, _ = SEG(n_cls=28, negative_slope=0.0).apply(
        vs, jnp.asarray(x_np.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(o_out),
                               t_out.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_dep_nd_matches_reference(ref_nd):
    import torch

    torch.manual_seed(1)
    net = ref_nd.DEP().eval()
    vs = jax.tree.map(jnp.asarray, import_dep_decoder(_sd(net)))
    x_np = RNG.randn(1, 1024, 4, 6).astype(np.float32)
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        t_out = net(torch.from_numpy(x_np))
    o_out = DEP(tanh_head=True, negative_slope=0.0).apply(
        vs, jnp.asarray(x_np.transpose(0, 2, 3, 1)), train=False)
    assert float(np.abs(np.asarray(o_out)).max()) <= 1.0  # tanh head applied
    np.testing.assert_allclose(np.asarray(o_out),
                               t_out.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_discriminator_seg_matches_reference(ref_nd):
    import torch

    torch.manual_seed(2)
    net = ref_nd.Discriminator_seg().eval()
    vs = jax.tree.map(jnp.asarray, import_dis2seg_df(_sd(net)))
    x_np = RNG.randn(2, 1024, 4, 6).astype(np.float32)
    with torch.no_grad():
        t_out = net(torch.from_numpy(x_np))
    o_out = DiscriminatorSeg(conv_dim=1024).apply(
        vs, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    assert o_out.shape == (2, 4, 6, 28)
    np.testing.assert_allclose(np.asarray(o_out),
                               t_out.numpy().transpose(0, 2, 3, 1), atol=2e-6)


def test_discriminator2_seg_nd_matches_reference(ref_nd):
    """new_depseg's own Discriminator2_seg (networks2.py:496-527): 256-ch
    1×1 ladder, 28-channel sigmoid head (squeeze(1) is a no-op there) —
    the model3 "4dis" twin critic."""
    import torch

    torch.manual_seed(3)
    net = ref_nd.Discriminator2_seg().eval()
    vs = jax.tree.map(jnp.asarray, import_dis2seg_df(_sd(net)))
    x_np = RNG.randn(2, 256, 4, 6).astype(np.float32)
    with torch.no_grad():
        t_out = net(torch.from_numpy(x_np))
    o_out = Dis2SegDF(conv_dim=256, repeat_num=3, head_ch=28).apply(
        vs, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    assert o_out.shape == (2, 4, 6, 28)
    np.testing.assert_allclose(np.asarray(o_out),
                               t_out.numpy().transpose(0, 2, 3, 1), atol=2e-6)


def test_bce_gan_loss_matches_torch():
    """Exact BCELoss parity on in-range inputs (the reference's GANLoss,
    new_depseg/networks2.py:626-650)."""
    import torch

    pred = RNG.rand(1, 4, 6, 28).astype(np.float32) * 0.98 + 0.01
    for real in (True, False):
        t = torch.ones(1, 28, 4, 6) if real else torch.zeros(1, 28, 4, 6)
        ref = torch.nn.BCELoss()(
            torch.from_numpy(pred.transpose(0, 3, 1, 2)), t)
        ours = bce_gan_loss(jnp.asarray(pred), real)
        assert np.isclose(float(ours), ref.item(), atol=1e-6), real
    # out-of-range inputs (LeakyReLU negatives) stay finite on our side
    # where torch NaNs — the documented divergence
    assert np.isfinite(float(bce_gan_loss(jnp.asarray(pred - 0.5), True)))


def test_s2d_nd_4dis_train_step():
    """model3 "4dis" variant (--nd_4dis): twin 256-slice critics Adam-step
    twice per iteration, no GP; G_2 carries the cal_DisL(real, False) term
    and the gradient-free 3× real_dep_loss report (model3.py:484-505)."""
    cfg = apply_model_defaults(Config(model="S2D_nd", batch_size=1,
                                      nd_4dis=True,
                                      dense_block_config=[1, 1, 1, 1]))
    model = create_model(cfg)
    assert "Dis0_en" in model.model_names and "gp" not in model.loss_names
    h, w = 32, 48
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
    # the real_dep_loss report is constant w.r.t. every parameter: a second
    # step from the same state must leave it grad-free (smoke: finite and
    # non-negative L1)
    assert float(metrics["dep_real"]) >= 0
    m, visuals = model.eval_step(state1, batch)
    assert visuals["real_dep_pre"].shape == (1, h, w, 1)
    for k, v in m.items():
        assert np.isfinite(float(v)), k


def test_s2d_nd_train_step():
    cfg = apply_model_defaults(Config(model="S2D_nd", batch_size=1,
                                      dense_block_config=[1, 1, 1, 1]))
    model = create_model(cfg)
    h, w = 32, 48
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
    assert float(metrics["gp"]) > 0  # the GP grad-of-grad path is live
    for net in model.model_names:
        l0 = jax.tree.leaves(state.params[net])
        l1 = jax.tree.leaves(state1.params[net])
        assert any(not np.allclose(a, b) for a, b in zip(l0, l1)), net
    m, visuals = model.eval_step(state1, batch)
    assert visuals["syn_dep_pre"].shape == (1, h, w, 1)
    assert visuals["real_dep_pre"].shape == (1, h, w, 1)
    for k, v in m.items():
        assert np.isfinite(float(v)), k
