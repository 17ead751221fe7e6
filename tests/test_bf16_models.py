"""bf16 compute-dtype safety net: every trainable model family runs a tiny
train step in bfloat16 with finite metrics and moving params.

Locks in the mixed-precision contract after the `_bce` custom-VJP fix
(s2d_networks.py): bf16 tanh saturates to exact ±1 far earlier than fp32,
so any loss whose backward is not saturation-safe NaNs in one step. S2D and
rf_lw are exercised at chip scale by bench.py; here the CPU-sized families
cover the remaining train paths.
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
from cycle_depth_estimation_tpu.models import create_model

RNG = np.random.RandomState(99)


def _imgs(n, h, w, c=3):
    return jnp.asarray(RNG.rand(n, h, w, c) * 2 - 1, jnp.float32)


def _labels(n, h, w, n_cls=28):
    return jnp.asarray(RNG.randint(0, n_cls, (n, h, w)), jnp.int32)


def _check(model, state, batch):
    state1, metrics = model.train_step(state, batch, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    moved = False
    for net in model.model_names:
        l0 = jax.tree.leaves(state.params[net])
        l1 = jax.tree.leaves(state1.params[net])
        moved = moved or any(not np.allclose(a, b) for a, b in zip(l0, l1))
    assert moved
    return state1


def test_cycle_gan_bf16_step():
    cfg = apply_model_defaults(Config(
        model="cycle_gan", batch_size=1, fine_size=32, ngf=8, ndf=8,
        net_g="resnet_3blocks", no_dropout=True, dtype="bfloat16"))
    model = create_model(cfg)
    state = model.init_state(jax.random.key(0))
    _check(model, state, {"img_source": _imgs(1, 32, 32),
                          "img_target": _imgs(1, 32, 32)})


def test_pix2pix_bf16_step():
    cfg = apply_model_defaults(Config(
        model="pix2pix", batch_size=1, ngf=8, ndf=8, dtype="bfloat16"))
    cfg = cfg.replace(net_g="unet_128", fine_size=128)
    model = create_model(cfg)
    state = model.init_state(jax.random.key(0))
    _check(model, state, {"A": _imgs(1, 128, 128), "B": _imgs(1, 128, 128)})


def test_seg_model_bf16_step():
    cfg = apply_model_defaults(Config(
        model="seg", batch_size=1, ngf=8, net_g="resnet_3blocks",
        dtype="bfloat16"))
    model = create_model(cfg)
    h, w = 64, 96
    state = model.init_state(jax.random.key(0))
    batch = {"img_source": _imgs(1, h, w), "img_target": _imgs(1, h, w),
             "lab_source": _labels(1, h, w, 22),
             "lab_target": _labels(1, h, w)}
    state1, metrics = model.train_step(state, batch, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_s2d_base_bf16_step():
    cfg = apply_model_defaults(Config(
        model="S2D_base", batch_size=1, ndf=8,
        dense_block_config=[2, 2, 2, 2], g1_blocks=1, dtype="bfloat16"))
    model = create_model(cfg)
    h, w = 64, 96
    state = model.init_state_at(jax.random.key(0), h, w)
    batch = {
        "img_syn": _imgs(1, h, w), "img_real": _imgs(1, h, w),
        "seg_l_syn": _labels(1, h, w), "seg_l_real": _labels(1, h, w),
        "dep_l_syn": jnp.asarray(RNG.rand(1, h, w, 1) * 2 - 1, jnp.float32),
    }
    _check(model, state, batch)


def test_rf_lw_bf16_step():
    cfg = apply_model_defaults(Config(
        model="rf_lw", batch_size=1, resnet_layers=[1, 1, 1, 1],
        dtype="bfloat16"))
    model = create_model(cfg)
    h, w = 64, 96
    state = model.init_state_at(jax.random.key(0), h, w)
    batch = {
        "img_syn": _imgs(1, h, w), "img_real": _imgs(1, h, w),
        "seg_l_syn": _labels(1, h, w), "seg_l_real": _labels(1, h, w),
        "dep_l_syn": jnp.asarray(RNG.rand(1, h, w, 1) * 2 - 1, jnp.float32),
        "depth_l_s": jnp.asarray(np.sign(RNG.randn(1, h, w, 4)), jnp.float32),
    }
    _check(model, state, batch)


def test_seg_cycle_bf16_step():
    cfg = apply_model_defaults(Config(
        model="seg_cycle", ngf=8, ndf=8, net_g="resnet_3blocks",
        fine_size=32, batch_size=1, pool_size=2, dtype="bfloat16"))
    model = create_model(cfg)
    state = model.init_state(jax.random.key(0))
    h = w = 32
    batch = {"img_source": _imgs(1, h, w), "img_target": _imgs(1, h, w),
             "lab_source": _labels(1, h, w, 22),
             "lab_target": _labels(1, h, w)}
    _check(model, state, batch)
