"""deeperfeatures "model3" generation (`S2D_df`).

Oracle tests import the reference's OWN torch modules read-only from
/root/reference/my_seg_depth/deeperfeatures/networks2.py (the model3
networks: skip-free SEG, growth-36 ordimat DEP, Discriminator2_seg) and
check forward parity against our flax transcriptions through the checkpoint
importers; plus real_dep_loss / GramMatrix / StyleLoss torch parity and the
five-phase `S2D_df` train step.
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
    DEPDF,
    Dis2SegDF,
    SEGDF,
    gram_matrix,
    real_dep_loss,
    style_loss,
)
from cycle_depth_estimation_tpu.utils.torch_import import (
    import_dep_df,
    import_dis2seg_df,
    import_seg_df,
)

RNG = np.random.RandomState(7)

REF_DF = "/root/reference/my_seg_depth/deeperfeatures/networks2.py"
REF_ST = ("/root/reference/my_seg_depth/trymulti/semantic_trans/"
          "networks5_ds.py")


def _load_ref(path, name):
    torch = pytest.importorskip("torch")
    # the reference's ordimat/GANLoss call .cuda() unconditionally; run the
    # CPU-only oracle by making .cuda a no-op (test-scope monkeypatch)
    torch.Tensor.cuda = lambda self, *a, **k: self
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_df():
    return _load_ref(REF_DF, "networks2_df_test")


def _sd(net):
    return {k: v.numpy() for k, v in net.state_dict().items()}


def test_seg_df_matches_reference(ref_df):
    import torch

    torch.manual_seed(0)
    net = ref_df.SEG(n_cls=28).eval()
    vs = jax.tree.map(jnp.asarray, import_seg_df(_sd(net)))
    x_np = RNG.randn(1, 1024, 4, 6).astype(np.float32)
    with torch.no_grad():
        t_out, t_f2 = net(torch.from_numpy(x_np))
    o_out, o_f2 = SEGDF(n_cls=28).apply(
        vs, jnp.asarray(x_np.transpose(0, 2, 3, 1)), train=False)
    # second output is S[1] — the 512-ch first-up features feeding DEP/Dis0
    assert o_f2.shape == (1, 8, 12, 512)
    np.testing.assert_allclose(np.asarray(o_f2),
                               t_f2.numpy().transpose(0, 2, 3, 1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_out),
                               t_out.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_dep_df_matches_reference(ref_df):
    import torch

    torch.manual_seed(1)
    net = ref_df.DEP().eval()
    vs = jax.tree.map(jnp.asarray, import_dep_df(_sd(net)))
    x_np = RNG.randn(1, 512, 8, 12).astype(np.float32)
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        t_out = net(torch.from_numpy(x_np))
    o_out = DEPDF().apply(vs, jnp.asarray(x_np.transpose(0, 2, 3, 1)),
                          train=False)
    # dense prefix halves (transition), 4 ordimat deconvs ×16 → 8× input
    assert o_out.shape == (1, 64, 96, 1)
    np.testing.assert_allclose(np.asarray(o_out),
                               t_out.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_dis2seg_df_matches_reference(ref_df):
    import torch

    torch.manual_seed(2)
    net = ref_df.Discriminator2_seg().eval()
    vs = jax.tree.map(jnp.asarray, import_dis2seg_df(_sd(net)))
    x_np = RNG.randn(2, 512, 4, 6).astype(np.float32)
    with torch.no_grad():
        t_out = net(torch.from_numpy(x_np))
    o_out = Dis2SegDF().apply(vs, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    assert o_out.shape == (2, 4, 6)
    np.testing.assert_allclose(np.asarray(o_out), t_out.numpy(), atol=2e-6)


def test_real_dep_loss_matches_torch():
    """model3.py:472-483 at its batch-1 working point (the reference's NCHW
    (N,1,H,W)×(N,H,W) mask multiply only broadcasts per-sample at N=1)."""
    import torch

    h, w = 6, 9
    seg_p = RNG.randn(1, 28, h, w).astype(np.float32)
    seg_l = RNG.randint(0, 28, (1, h, w))
    # force some agreement so the mask is non-trivial
    seg_l[0, :3, :] = seg_p[0].argmax(0)[:3, :]
    dep_p = RNG.randn(1, 1, h, w).astype(np.float32)
    dep_l = RNG.randn(1, h, w).astype(np.float32)

    tp = torch.from_numpy(seg_p).detach()
    new_seg_p = tp.max(dim=1)[1].float()
    mask = torch.zeros(new_seg_p.shape)
    mask[new_seg_p == torch.from_numpy(seg_l).float()] = 1
    ref = torch.nn.L1Loss()(mask * torch.from_numpy(dep_p),
                            mask * torch.from_numpy(dep_l))

    ours = real_dep_loss(jnp.asarray(seg_p.transpose(0, 2, 3, 1)),
                         jnp.asarray(seg_l),
                         jnp.asarray(dep_p.transpose(0, 2, 3, 1)),
                         jnp.asarray(dep_l))
    assert np.isclose(float(ours), ref.item(), atol=1e-6)
    assert float(ours) > 0


def test_gram_and_style_match_reference():
    import torch

    mod = _load_ref(REF_ST, "networks5_ds_gram_test")
    x_np = RNG.randn(1, 5, 4, 6).astype(np.float32)
    t_np = RNG.randn(1, 5, 4, 6).astype(np.float32)
    ref_g = mod.GramMatrix(torch.from_numpy(x_np))
    ours_g = gram_matrix(jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours_g), ref_g.numpy(), atol=1e-6)
    ref_l = mod.StyleLoss(None, None)(torch.from_numpy(x_np),
                                      torch.from_numpy(t_np))
    ours_l = style_loss(jnp.asarray(x_np.transpose(0, 2, 3, 1)),
                        jnp.asarray(t_np.transpose(0, 2, 3, 1)))
    assert np.isclose(float(ours_l), ref_l.item(), atol=1e-6)


def _batch(h, w):
    return {
        "img_syn": jnp.asarray(RNG.randn(1, h, w, 3), jnp.float32),
        "img_real": jnp.asarray(RNG.randn(1, h, w, 3), jnp.float32),
        "seg_l_syn": jnp.asarray(RNG.randint(0, 28, (1, h, w)), jnp.int32),
        "seg_l_real": jnp.asarray(RNG.randint(0, 28, (1, h, w)), jnp.int32),
        "dep_l_syn": jnp.asarray(RNG.rand(1, h, w, 1) * 2 - 1, jnp.float32),
    }


def test_s2d_df_train_step():
    cfg = apply_model_defaults(Config(model="S2D_df", batch_size=1,
                                      dense_block_config=[2, 2, 2, 2]))
    model = create_model(cfg)
    h, w = 64, 96
    state = model.init_state_at(jax.random.key(0), h, w)
    batch = _batch(h, w)
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
    assert visuals["real_dep_pre"].shape == (1, h, w, 1)
    assert visuals["syn_seg_pre"].shape == (1, h, w)
    for k, v in m.items():
        assert np.isfinite(float(v)), k


def test_s2d_df_dilated_trymulti_flags():
    """--df_adv_w 5 --df_g1_adv (dilated/model3.py:468,509-517) and
    --df_d_real_w 0.2 (trymulti/model3.py:441) compile and step."""
    cfg = apply_model_defaults(Config(model="S2D_df", batch_size=1,
                                      dense_block_config=[1, 1, 1, 1],
                                      df_adv_w=5.0, df_g1_adv=True,
                                      df_d_real_w=0.2))
    model = create_model(cfg)
    h, w = 32, 48
    state = model.init_state_at(jax.random.key(0), h, w)
    state1, metrics = model.train_step(state, _batch(h, w),
                                       jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    # the dilated G_1 adversarial term must reach G_1's update
    l0 = jax.tree.leaves(state.params["G_1"])
    l1 = jax.tree.leaves(state1.params["G_1"])
    assert any(not np.allclose(a, b) for a, b in zip(l0, l1))
