"""semantic_trans_full — the trymulti/semantic_trans generation's own
pipeline (models/semantic_trans_full.py).

Oracle tests import the reference's OWN torch modules read-only from
/root/reference/my_seg_depth/trymulti/semantic_trans/networks5_ds.py and
check forward parity of the generation-specific heads (RDepST, SEG/DEP
decoders, StarGAN-style discriminators) through the matching checkpoint
importers. The train-step test runs the full 7-phase jitted step on a tiny
DenseNet config.
"""

import contextlib
import importlib.util
import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
from cycle_depth_estimation_tpu.models import create_model
from cycle_depth_estimation_tpu.models.s2d_networks import (
    DEP,
    RDepST,
    SEG,
    StarDiscriminator,
)
from cycle_depth_estimation_tpu.utils.torch_import import (
    import_dep_decoder,
    import_rdep_st,
    import_seg_decoder,
    import_star_discriminator,
)

REF = ("/root/reference/my_seg_depth/trymulti/semantic_trans/"
       "networks5_ds.py")


@pytest.fixture(scope="module")
def ref_nets():
    torch = pytest.importorskip("torch")
    # the reference's ordimat/GANLoss call .cuda() unconditionally; run the
    # CPU-only oracle by making .cuda a no-op (test-scope monkeypatch)
    torch.Tensor.cuda = lambda self, *a, **k: self
    spec = importlib.util.spec_from_file_location("networks5_ds_st_test", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _sd(net):
    return {k: v.numpy() for k, v in net.state_dict().items()}


def test_rdep_st_matches_reference(ref_nets):
    import torch

    torch.manual_seed(0)
    net = ref_nets.R_dep().eval()
    vs = jax.tree.map(jnp.asarray, import_rdep_st(_sd(net)))
    H, W = 64, 96
    rng = np.random.RandomState(1)
    sf_np = [rng.randn(1, c, H // 2 ** k, W // 2 ** k).astype(np.float32)
             for k, c in ((1, 256), (2, 512), (3, 1280), (4, 1664))]
    d_np = rng.randn(1, 1024, H // 16, W // 16).astype(np.float32)
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        t_seds, t_segs, t_deps = net(
            [torch.from_numpy(a) for a in sf_np], torch.from_numpy(d_np))
    seds, segs, deps = RDepST().apply(
        vs, [jnp.asarray(a.transpose(0, 2, 3, 1)) for a in sf_np],
        jnp.asarray(d_np.transpose(0, 2, 3, 1)), train=False)
    for ts, os_ in ((t_seds, seds), (t_segs, segs), (t_deps, deps)):
        for t, o in zip(ts, os_):
            np.testing.assert_allclose(
                np.asarray(o), t.numpy().transpose(0, 2, 3, 1), atol=2e-5)
    # every output lands at full resolution: (sed 2ch, seg 28ch, dep 4ch)
    assert [x.shape[-1] for x in (seds[0], segs[0], deps[0])] == [2, 28, 4]
    assert all(x.shape[1:3] == (H, W) for t in (seds, segs, deps) for x in t)


def test_seg_dep_decoders_match_reference(ref_nets):
    import torch

    torch.manual_seed(1)
    rng = np.random.RandomState(2)
    x_np = rng.randn(1, 1024, 6, 9).astype(np.float32)
    xt = torch.from_numpy(x_np)
    xj = jnp.asarray(x_np.transpose(0, 2, 3, 1))

    seg_t = ref_nets.SEG(n_cls=28).eval()
    vs = jax.tree.map(jnp.asarray, import_seg_decoder(_sd(seg_t)))
    with torch.no_grad():
        t_out, t_feat = seg_t(xt)
    o_out, o_feat = SEG(n_cls=28).apply(vs, xj, train=False)
    np.testing.assert_allclose(np.asarray(o_out),
                               t_out.numpy().transpose(0, 2, 3, 1), atol=2e-5)
    # SEG's second output is its INPUT (networks5_ds.py:889) — the quirk the
    # Dis0_en feature game relies on
    assert np.array_equal(np.asarray(o_feat), np.asarray(xj))

    dep_t = ref_nets.DEP().eval()
    vd = jax.tree.map(jnp.asarray, import_dep_decoder(_sd(dep_t)))
    with torch.no_grad():
        t_d = dep_t(xt)
    o_d = DEP().apply(vd, xj, train=False)
    np.testing.assert_allclose(np.asarray(o_d),
                               t_d.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_star_discriminator_matches_reference(ref_nets):
    import torch

    rng = np.random.RandomState(3)
    for rn, cd in ((5, 2), (4, 1), (3, 1)):
        torch.manual_seed(rn)
        d_t = ref_nets.Discriminator(curr_dim=cd, repeat_num=rn).eval()
        vs = jax.tree.map(jnp.asarray,
                          import_star_discriminator(_sd(d_t), repeat_num=rn))
        z = rng.randn(1, cd, 96, 96).astype(np.float32)
        with torch.no_grad():
            t_y = d_t(torch.from_numpy(z))
        o_y = StarDiscriminator(repeat_num=rn).apply(
            vs, jnp.asarray(z.transpose(0, 2, 3, 1)), train=False)
        assert np.asarray(o_y).shape == tuple(t_y.shape)
        np.testing.assert_allclose(np.asarray(o_y), t_y.numpy(), atol=1e-5)


def _batch(j, h, w):
    r = np.random.RandomState(j)
    return {
        "img_syn": jnp.asarray(r.randn(1, h, w, 3), jnp.float32) * 0.5,
        "img_real": jnp.asarray(r.randn(1, h, w, 3), jnp.float32) * 0.5,
        "seg_l_syn": jnp.asarray(r.randint(0, 28, (1, h, w)), jnp.int32),
        "seg_l_real": jnp.asarray(r.randint(0, 28, (1, h, w)), jnp.int32),
        "dep_l_syn": jnp.asarray(r.rand(1, h, w, 1) * 2 - 1, jnp.float32),
        "seg_e_syn": jnp.asarray(
            (r.rand(1, h, w, 1) > 0.9).astype(np.float32)),
        "seg_e_real": jnp.asarray(
            (r.rand(1, h, w, 1) > 0.9).astype(np.float32)),
    }


def test_semantic_trans_full_train_step():
    """Full 7-phase step on a tiny DenseNet config: finite metrics, every
    trained net's params move, Dis_80 stays untouched (constructed but never
    stepped — model5.py:253-283 vs 483-522)."""
    cfg = apply_model_defaults(Config(model="semantic_trans_full",
                                      batch_size=1,
                                      dense_block_config=[1, 1, 1, 1]))
    model = create_model(cfg)
    h, w = 64, 96
    state = model.init_state(jax.random.key(0), hw=(h, w))
    p0 = jax.tree.map(np.asarray, state.params)
    for i in range(2):
        state, metrics = model.train_step(state, _batch(i, h, w),
                                          jax.random.key(i))
    metrics = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in metrics.values()), metrics
    for name in ("G_1", "G_2", "Seg_de", "Dep_de", "R_D", "Dis0_en", "DIS",
                 "Dis_160", "Dis_320"):
        before = jax.tree.leaves(p0[name])
        after = jax.tree.leaves(jax.tree.map(np.asarray, state.params[name]))
        assert any(not np.array_equal(a, b)
                   for a, b in zip(before, after)), f"{name} never updated"
    # Dis_80 is allocated but never stepped in the reference loop
    assert all(np.array_equal(a, b) for a, b in zip(
        jax.tree.leaves(p0["Dis_80"]),
        jax.tree.leaves(jax.tree.map(np.asarray, state.params["Dis_80"]))))
    me, visuals = model.eval_step(state, _batch(9, h, w))
    assert all(np.isfinite(float(v)) for v in me.values())
    assert {"syn_dep_ref", "real_dep_ref", "syn_dep_pre"} <= set(visuals)
