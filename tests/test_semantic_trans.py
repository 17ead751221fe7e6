"""semantic_trans generation: WGAN-GP oracle parity, multi-res depth
discriminators, and the full extended train step (reference
my_seg_depth/trymulti/semantic_trans/model5.py)."""

import numpy as np

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
from cycle_depth_estimation_tpu.models import create_model
from cycle_depth_estimation_tpu.models.s2d_networks import (
    StarDiscriminator,
    calc_gradient_penalty,
)

RNG = np.random.RandomState(11)


def test_calc_gradient_penalty_matches_torch():
    """Oracle: the reference's calc_gradient_penalty verbatim (model5.py:
    354-382) on a small conv D, same alpha, same inputs."""
    tD = tnn.Sequential(tnn.Conv2d(2, 4, 3, 2, 1), tnn.LeakyReLU(0.01),
                        tnn.Conv2d(4, 1, 1, bias=False))
    real = RNG.randn(2, 2, 8, 8).astype(np.float32)
    fake = RNG.randn(2, 2, 8, 8).astype(np.float32)
    rng = jax.random.key(3)
    alpha = float(jax.random.uniform(rng, (), jnp.float32))

    # --- torch oracle (reference semantics) ---
    interp = torch.from_numpy(real.copy())
    interp[0] = alpha * torch.from_numpy(real[0]) + \
        (1 - alpha) * torch.from_numpy(fake[0])
    interp.requires_grad_(True)
    d_out = tD(interp)
    grads = torch.autograd.grad(d_out, interp,
                                grad_outputs=torch.ones_like(d_out),
                                create_graph=True)[0]
    ref = float(((grads.norm(2, dim=1) - 1) ** 2).mean() * 10)

    # --- ours, wrapping the same torch weights in a jax closure ---
    w0 = tD[0].weight.detach().numpy().transpose(2, 3, 1, 0)
    b0 = tD[0].bias.detach().numpy()
    w1 = tD[2].weight.detach().numpy().transpose(2, 3, 1, 0)

    def d_fn(x):  # NHWC
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(w0), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b0
        y = jax.nn.leaky_relu(y, 0.01)
        return jax.lax.conv_general_dilated(
            y, jnp.asarray(w1), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ours = calc_gradient_penalty(d_fn,
                                 jnp.asarray(real.transpose(0, 2, 3, 1)),
                                 jnp.asarray(fake.transpose(0, 2, 3, 1)),
                                 rng)
    assert np.isclose(float(ours), ref, rtol=1e-4), (float(ours), ref)


def test_gradient_penalty_finite_on_mesh():
    """GP gradients w.r.t. D params stay finite with the batch sharded over
    the 8-device CPU mesh (VERDICT round-2 item 5 acceptance)."""
    from cycle_depth_estimation_tpu.parallel import host_shard_batch, make_mesh

    mesh = make_mesh()
    d = StarDiscriminator(conv_dim=4, repeat_num=2)
    x = jnp.zeros((1, 16, 16, 1), jnp.float32)
    vs = d.init(jax.random.key(0), x)
    real = RNG.randn(8, 16, 16, 1).astype(np.float32)
    fake = RNG.randn(8, 16, 16, 1).astype(np.float32)
    sh = host_shard_batch(mesh, {"r": real, "f": fake})

    @jax.jit
    def gp_grads(params, r, f):
        def loss(p):
            return calc_gradient_penalty(
                lambda x: d.apply({"params": p}, x), r, f, jax.random.key(1))
        return jax.value_and_grad(loss)(params)

    val, grads = gp_grads(vs["params"], sh["r"], sh["f"])
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_semantic_trans_train_step():
    cfg = apply_model_defaults(Config(model="semantic_trans", batch_size=1,
                                      dense_block_config=[2, 2, 2, 2],
                                      g1_blocks=1))
    model = create_model(cfg)
    h, w = 192, 192
    state = model.init_state(jax.random.key(0), hw=(h, w))
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
    # the semantic_trans discriminators train; Dis_80 is constructed but
    # never stepped (reference quirk, model5.py — only 160/320 updated)
    for net in ("DIS", "Dis_160", "Dis_320", "R_D"):
        l0 = jax.tree.leaves(state.params[net])
        l1 = jax.tree.leaves(state1.params[net])
        assert any(not np.allclose(a, b) for a, b in zip(l0, l1)), net
    l0 = jax.tree.leaves(state.params["Dis_80"])
    l1 = jax.tree.leaves(state1.params["Dis_80"])
    assert all(np.array_equal(a, b) for a, b in zip(l0, l1))
