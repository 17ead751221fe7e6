"""Base-generation alternate pipeline (my_seg_depth/networks.py) and
new_depseg additions: PSPModule torch-oracle parity, FeatureNet and
DiscriminatorSeg shape contracts."""

import numpy as np

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from cycle_depth_estimation_tpu.models.s2d_networks import (
    DiscriminatorSeg,
    FeatureNet,
    PSPModule,
    adaptive_avg_pool,
)

RNG = np.random.RandomState(13)


def test_adaptive_avg_pool_matches_torch():
    x = RNG.randn(2, 7, 11, 3).astype(np.float32)
    for size in ((1, 1), (2, 2), (3, 3), (6, 6), (3, 6)):
        ours = adaptive_avg_pool(jnp.asarray(x), size)
        ref = tF.adaptive_avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size)
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1), atol=1e-6)


class TPSP(tnn.Module):
    """reference PSPModule verbatim structure (my_seg_depth/networks.py:12-30)."""

    def __init__(self, features, out_features, sizes=(1, 2, 3, 6)):
        super().__init__()
        self.stages = tnn.ModuleList([
            tnn.Sequential(tnn.AdaptiveAvgPool2d(output_size=(s, s)),
                           tnn.Conv2d(features, features, 1, bias=False))
            for s in sizes])
        self.bottleneck = tnn.Conv2d(features * (len(sizes) + 1),
                                     out_features, 1)

    def forward(self, feats):
        h, w = feats.size(2), feats.size(3)
        priors = [tF.interpolate(stage(feats), size=(h, w), mode="bilinear",
                                 align_corners=False)
                  for stage in self.stages] + [feats]
        return tF.relu(self.bottleneck(torch.cat(priors, 1)))


def test_psp_module_matches_torch():
    tnet = TPSP(4, 8)
    tnet.eval()
    x = RNG.randn(1, 4, 12, 18).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    params = {}
    for i, stage in enumerate(tnet.stages):
        params[f"stage{i}_conv"] = {
            "kernel": stage[1].weight.detach().numpy().transpose(2, 3, 1, 0)}
    params["bottleneck"] = {
        "kernel": tnet.bottleneck.weight.detach().numpy().transpose(2, 3, 1, 0),
        "bias": tnet.bottleneck.bias.detach().numpy()}
    net = PSPModule(out_features=8)
    ours = net.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_feature_net_contract():
    """Channel plan (growth 48, blocks (6,8,8), networks.py:226-252):
    64→352 | /2→176 | →560 | /2→280 | →664 → PSP 1024."""
    net = FeatureNet()
    x = jnp.asarray(RNG.randn(1, 16, 24, 64), jnp.float32)
    vs = net.init(jax.random.key(0), x)
    feats, out = net.apply(vs, x)
    assert [f.shape for f in feats] == [(1, 16, 24, 352), (1, 8, 12, 560),
                                        (1, 4, 6, 664)]
    assert out.shape == (1, 4, 6, 1024)


def test_discriminator_seg_contract():
    """1024→512→256→128→28 per-pixel logits (new_depseg/networks2.py:462-494),
    finite WGAN-GP gradients through it (its reference training objective,
    new_depseg/model2.py:344-352)."""
    from cycle_depth_estimation_tpu.models.s2d_networks import (
        calc_gradient_penalty,
    )

    net = DiscriminatorSeg()
    x = jnp.asarray(RNG.randn(1, 6, 9, 1024), jnp.float32)
    vs = net.init(jax.random.key(0), x)
    y = net.apply(vs, x)
    assert y.shape == (1, 6, 9, 28)
    fake = jnp.asarray(RNG.randn(1, 6, 9, 1024), jnp.float32)

    def loss(p):
        return calc_gradient_penalty(
            lambda t: net.apply({"params": p}, t), x, fake, jax.random.key(1))

    val, grads = jax.value_and_grad(loss)(vs["params"])
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))


# ---------------------------------------------------------------------------
# base-generation Dis_en (networks2.py:331-353): StarGAN-style feature D
# with Dropout2d — torch-oracle import/forward parity
# ---------------------------------------------------------------------------


def test_drop_discriminator_import_parity():
    from tools.torch_oracles import build_torch_drop_discriminator
    from cycle_depth_estimation_tpu.models.s2d_networks import (
        DropDiscriminator,
    )
    from cycle_depth_estimation_tpu.utils.torch_import import (
        import_drop_discriminator,
    )

    torch.manual_seed(7)
    conv_dim, repeat_num = 8, 4
    tnet = build_torch_drop_discriminator(conv_dim, repeat_num)
    tnet.eval()  # dropout off for the deterministic comparison
    x = RNG.randn(2, 32, 48, conv_dim).astype(np.float32)
    with torch.no_grad():
        ref = tnet.fwd(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    variables = import_drop_discriminator(sd, repeat_num)
    ours = DropDiscriminator(conv_dim=conv_dim, repeat_num=repeat_num).apply(
        jax.tree.map(jnp.asarray, variables), jnp.asarray(x), train=False)
    assert ours.shape == ref.shape  # channel-squeezed NHW
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_drop_discriminator_dropout_active_in_train():
    from cycle_depth_estimation_tpu.models.s2d_networks import (
        DropDiscriminator,
    )

    d = DropDiscriminator(conv_dim=8, repeat_num=3)
    x = jnp.asarray(RNG.randn(1, 16, 16, 8), jnp.float32)
    vs = d.init(jax.random.key(0), x)
    y1 = d.apply(vs, x, train=True, rngs={"dropout": jax.random.key(1)})
    y2 = d.apply(vs, x, train=True, rngs={"dropout": jax.random.key(2)})
    y3 = d.apply(vs, x, train=False)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    assert np.isfinite(np.asarray(y3)).all()


# ---------------------------------------------------------------------------
# the full alternate pipeline (reference my_seg_depth/train.py:221-409)
# ---------------------------------------------------------------------------

def _ref_networks():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "networks_base_alt_test", "/root/reference/my_seg_depth/networks.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _sd(net):
    return {k: v.numpy() for k, v in net.state_dict().items()}


def test_alt_pipeline_matches_reference():
    """GBase → FeatureNet → SEGAlt/DEPAlt chained forward parity against the
    reference's own torch modules (networks.py:83-127, 226-351) through the
    matching importers."""
    from cycle_depth_estimation_tpu.models.s2d_networks import (
        DEPAlt,
        GBase,
        SEGAlt,
    )
    from cycle_depth_estimation_tpu.utils.torch_import import (
        import_feature_net,
        import_gbase,
        import_skip_decoder_alt,
    )

    ref = _ref_networks()
    torch.manual_seed(11)
    g_t = ref.G_1(input_nc=3, out_nc=128).eval()
    f_t = ref.Feature_net(input_nc=128, mid_nc=1024).eval()
    seg_t = ref.SEG(n_cls=28).eval()
    dep_t = ref.DEP().eval()

    x = RNG.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        tf1 = g_t(torch.from_numpy(x))
        tF_, tpsp = f_t(tf1)
        tseg = seg_t(list(tF_), tpsp)
        tdep = dep_t(list(tF_), tpsp)

    vg = jax.tree.map(jnp.asarray, import_gbase(_sd(g_t)))
    vf = jax.tree.map(jnp.asarray, import_feature_net(_sd(f_t)))
    vseg = jax.tree.map(jnp.asarray, import_skip_decoder_alt(_sd(seg_t)))
    vdep = jax.tree.map(jnp.asarray, import_skip_decoder_alt(_sd(dep_t)))

    of1 = GBase().apply(vg, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(of1),
                               tf1.numpy().transpose(0, 2, 3, 1), atol=2e-5)
    (oF, opsp) = FeatureNet().apply(vf, of1, train=False)
    np.testing.assert_allclose(np.asarray(opsp),
                               tpsp.numpy().transpose(0, 2, 3, 1), atol=2e-5)
    oseg = SEGAlt(n_cls=28).apply(vseg, oF, opsp, train=False)
    odep = DEPAlt().apply(vdep, oF, opsp, train=False)
    # full-resolution tanh class maps / leaky-relu depth (reference quirks)
    assert oseg.shape == (1, 64, 96, 28) and odep.shape == (1, 64, 96, 1)
    np.testing.assert_allclose(np.asarray(oseg),
                               tseg.numpy().transpose(0, 2, 3, 1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(odep),
                               tdep.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_s2d_alt_train_step():
    """The registered S2D_alt model: 5-phase step, finite metrics, every
    net's params move."""
    from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
    from cycle_depth_estimation_tpu.models import create_model

    cfg = apply_model_defaults(Config(model="S2D_alt", batch_size=1))
    model = create_model(cfg)
    h, w = 64, 96
    state = model.init_state(jax.random.key(0), hw=(h, w))
    p0 = jax.tree.map(np.asarray, state.params)

    def batch(j):
        r = np.random.RandomState(j)
        return {
            "img_syn": jnp.asarray(r.randn(1, h, w, 3), jnp.float32) * 0.5,
            "img_real": jnp.asarray(r.randn(1, h, w, 3), jnp.float32) * 0.5,
            "seg_l_syn": jnp.asarray(r.randint(0, 28, (1, h, w)), jnp.int32),
            "seg_l_real": jnp.asarray(r.randint(0, 28, (1, h, w)), jnp.int32),
            "dep_l_syn": jnp.asarray(r.rand(1, h, w, 1) * 2 - 1, jnp.float32),
        }

    for i in range(2):
        state, metrics = model.train_step(state, batch(i), jax.random.key(i))
    metrics = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in metrics.values()), metrics
    for name in model.model_names:
        before = jax.tree.leaves(p0[name])
        after = jax.tree.leaves(jax.tree.map(np.asarray, state.params[name]))
        assert any(not np.array_equal(a, b)
                   for a, b in zip(before, after)), f"{name} never updated"
    me, visuals = model.eval_step(state, batch(9))
    assert all(np.isfinite(float(v)) for v in me.values())
    assert {"syn_seg_pre", "syn_dep_pre"} <= set(visuals)


# ---------------------------------------------------------------------------
# dis_seg / G2Blocks: the seg-label-conditioned feature discriminator
# ---------------------------------------------------------------------------

def test_seg_conditioned_discriminator_matches_reference():
    """DropDiscriminator(sege=...) vs the reference dis_seg Discriminator
    (dis_seg/networks2.py:331-354: nearest x0.5 label downsample, concat in
    front) at matched init; also the G2Blocks repeat_num=3 shape."""
    import importlib.util

    from cycle_depth_estimation_tpu.models.s2d_networks import (
        DropDiscriminator,
    )
    from cycle_depth_estimation_tpu.utils.torch_import import (
        import_drop_discriminator,
    )

    spec = importlib.util.spec_from_file_location(
        "networks2_dis_seg_test",
        "/root/reference/my_seg_depth/dis_seg/networks2.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    for repeat_num in (4, 3):  # dis_seg default / G2Blocks delta
        torch.manual_seed(repeat_num)
        d_t = ref.Discriminator(conv_dim=16, repeat_num=repeat_num).eval()
        vs = jax.tree.map(jnp.asarray, import_drop_discriminator(
            {k: v.numpy() for k, v in d_t.state_dict().items()}, repeat_num))
        feats = RNG.randn(1, 16, 32, 48).astype(np.float32)
        sege = RNG.randint(0, 28, (1, 1, 64, 96)).astype(np.float32)
        with torch.no_grad():
            ty = d_t(torch.from_numpy(feats), torch.from_numpy(sege))
        oy = DropDiscriminator(conv_dim=16, repeat_num=repeat_num).apply(
            vs, jnp.asarray(feats.transpose(0, 2, 3, 1)),
            jnp.asarray(sege.transpose(0, 2, 3, 1)), train=False)
        assert np.asarray(oy).shape == tuple(ty.shape)
        np.testing.assert_allclose(np.asarray(oy), ty.numpy(), atol=2e-5,
                                   rtol=1e-4)


def test_s2d_base_dis_seg_train_step():
    """S2D_base with --dis_seg --d_repeat_num 3: the label-conditioned D
    threads through the G and D phases; finite metrics, D params move."""
    from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
    from cycle_depth_estimation_tpu.models import create_model

    cfg = apply_model_defaults(Config(model="S2D_base", batch_size=1,
                                      dis_seg=True, d_repeat_num=3,
                                      dense_block_config=[1, 1, 1, 1],
                                      g1_blocks=1, ndf=16))
    model = create_model(cfg)
    h, w = 64, 96
    state = model.init_state_at(jax.random.key(0), h, w)
    p0 = jax.tree.map(np.asarray, state.params["Dis_en"])
    # conditioned first conv: G_1's 64 feature channels + 1 label channel
    first = state.params["Dis_en"]["conv1"]["kernel"]
    assert first.shape[2] == 65

    def batch(j):
        r = np.random.RandomState(j)
        return {
            "img_syn": jnp.asarray(r.randn(1, h, w, 3), jnp.float32) * 0.5,
            "img_real": jnp.asarray(r.randn(1, h, w, 3), jnp.float32) * 0.5,
            "seg_l_syn": jnp.asarray(r.randint(0, 28, (1, h, w)), jnp.int32),
            "seg_l_real": jnp.asarray(r.randint(0, 28, (1, h, w)), jnp.int32),
            "dep_l_syn": jnp.asarray(r.rand(1, h, w, 1) * 2 - 1, jnp.float32),
        }

    for i in range(2):
        state, metrics = model.train_step(state, batch(i), jax.random.key(i))
    metrics = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in metrics.values()), metrics
    after = jax.tree.map(np.asarray, state.params["Dis_en"])
    assert any(not np.array_equal(a, b) for a, b in
               zip(jax.tree.leaves(p0), jax.tree.leaves(after)))
