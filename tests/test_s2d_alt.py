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
