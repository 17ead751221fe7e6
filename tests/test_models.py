"""Model-orchestration tests: ImagePool semantics, jitted train steps,
optimizer parity, data-parallel execution over the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
from cycle_depth_estimation_tpu.models import create_model
from cycle_depth_estimation_tpu.parallel import make_mesh, host_shard_batch
from cycle_depth_estimation_tpu.utils.image_pool import init_pool, pool_query


def small_cfg(**kw):
    base = dict(model="cycle_gan", fine_size=32, ngf=4, ndf=4,
                net_g="resnet_3blocks", batch_size=2, pool_size=4,
                d_steps_per_g=2)
    base.update(kw)
    return apply_model_defaults(Config(**base))


# ---------------------------------------------------------------------------
# ImagePool
# ---------------------------------------------------------------------------

def test_pool_underfill_returns_input_and_fills():
    pool = init_pool(4, (2, 2, 1))
    batch = jnp.arange(3 * 2 * 2 * 1, dtype=jnp.float32).reshape(3, 2, 2, 1)
    pool, out = pool_query(pool, batch, jax.random.key(0), 4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(batch))
    assert int(pool.count) == 3
    np.testing.assert_array_equal(np.asarray(pool.images[:3]), np.asarray(batch))


def test_pool_full_mixes_history():
    pool = init_pool(2, (1, 1, 1))
    b1 = jnp.ones((2, 1, 1, 1))
    pool, _ = pool_query(pool, b1, jax.random.key(0), 2)
    assert int(pool.count) == 2
    # query many batches of 2s; outputs must be drawn from {1 (history), 2}
    seen_history = False
    b2 = 2 * jnp.ones((4, 1, 1, 1))
    for i in range(8):
        pool, out = pool_query(pool, b2, jax.random.key(i + 1), 2)
        vals = set(np.asarray(out).flatten().tolist())
        assert vals <= {1.0, 2.0}
        if 1.0 in vals:
            seen_history = True
    assert seen_history


def test_pool_size_zero_identity():
    pool = init_pool(0, (1, 1, 1))
    b = jnp.ones((2, 1, 1, 1))
    pool2, out = pool_query(pool, b, jax.random.key(0), 0)
    assert out is b


# ---------------------------------------------------------------------------
# CycleGAN
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def cycle_setup():
    cfg = small_cfg()
    model = create_model(cfg)
    state = model.init_state(jax.random.key(0))
    rng = np.random.RandomState(0)
    batch = {
        "img_source": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
        "img_target": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
    }
    return cfg, model, state, batch


def test_cycle_gan_train_step_runs_and_updates(cycle_setup):
    cfg, model, state, batch = cycle_setup
    state1, metrics = model.train_step(state, batch, jax.random.key(1))
    assert set(metrics) == set(model.loss_names)
    assert all(np.isfinite(float(v)) for v in metrics.values())
    assert int(state1.step) == 1
    # params must change for all four nets
    for net in ("G_A", "G_B", "D_A", "D_B"):
        leaves0 = jax.tree.leaves(state.params[net])
        leaves1 = jax.tree.leaves(state1.params[net])
        assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))
    # pool must have filled (2 images per D step × 2 steps ≥ pool_size=4)
    assert int(state1.pools["fake_B"].count) == 4


def test_cycle_gan_losses_decrease(cycle_setup):
    cfg, model, state, batch = cycle_setup
    m0 = None
    for i in range(12):
        state, metrics = model.train_step(state, batch, jax.random.key(i))
        if m0 is None:
            m0 = metrics
    # cycle-consistency on a fixed batch must fall under repeated training
    assert float(metrics["cycle_A"]) < float(m0["cycle_A"])
    assert float(metrics["cycle_B"]) < float(m0["cycle_B"])


def test_cycle_gan_eval_step(cycle_setup):
    cfg, model, state, batch = cycle_setup
    metrics, visuals = model.eval_step(state, batch)
    assert set(metrics) == set(model.loss_names)
    assert visuals["fake_B"].shape == batch["img_source"].shape
    assert set(visuals) == set(model.visual_names)


def test_cycle_gan_lr_schedule_updates(cycle_setup):
    cfg, model, state, batch = cycle_setup
    state2 = model.update_learning_rate(state, epoch=20)
    lr = float(state2.opt_states["G"].hyperparams["learning_rate"])
    # lambda policy: lr·(1 − (20−10)/30)
    assert np.isclose(lr, cfg.lr * (1 - 10 / 30), rtol=1e-6)


def test_plateau_lr_policy():
    """ReduceLROnPlateau semantics (torch defaults: factor=0.2, rel
    threshold=0.01, patience=5 — reference models/networks.py:32-33)."""
    cfg = small_cfg(lr_policy="plateau")
    model = create_model(cfg)
    state = model.init_state(jax.random.key(0))

    def lr(s):
        return float(s.opt_states["G"].hyperparams["learning_rate"])

    # improving metric: LR holds
    state = model.update_learning_rate(state, epoch=1, metric=1.0)
    state = model.update_learning_rate(state, epoch=2, metric=0.5)
    assert np.isclose(lr(state), cfg.lr)
    # 5 bad epochs tolerated; the 6th triggers the 0.2 factor
    for e in range(3, 8):
        state = model.update_learning_rate(state, epoch=e, metric=0.5)
        assert np.isclose(lr(state), cfg.lr), e
    state = model.update_learning_rate(state, epoch=8, metric=0.5)
    assert np.isclose(lr(state), cfg.lr * 0.2)
    # no metric supplied (reference's stock loop): LR holds, no crash
    state = model.update_learning_rate(state, epoch=9)
    assert np.isclose(lr(state), cfg.lr * 0.2)


def test_cycle_gan_data_parallel_step():
    """Same train step, batch sharded over the 8-device mesh."""
    cfg = small_cfg(batch_size=8)
    model = create_model(cfg)
    state = model.init_state(jax.random.key(0))
    mesh = make_mesh()
    rng = np.random.RandomState(1)
    batch = {
        "img_source": rng.rand(8, 32, 32, 3).astype(np.float32),
        "img_target": rng.rand(8, 32, 32, 3).astype(np.float32),
    }
    sharded = host_shard_batch(mesh, batch)
    assert len(sharded["img_source"].sharding.device_set) == 8
    state1, metrics = model.train_step(state, sharded, jax.random.key(1))
    assert all(np.isfinite(float(v)) for v in metrics.values())


# ---------------------------------------------------------------------------
# pix2pix
# ---------------------------------------------------------------------------

def test_pix2pix_train_step():
    cfg = apply_model_defaults(Config(model="pix2pix", fine_size=64, ngf=4,
                                      ndf=4, batch_size=2))
    assert cfg.net_g == "unet_256" and cfg.norm == "batch" and cfg.pool_size == 0
    cfg = cfg.replace(net_g="unet_128", fine_size=128)
    model = create_model(cfg)
    state = model.init_state(jax.random.key(0))
    rng = np.random.RandomState(0)
    batch = {"A": jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32)),
             "B": jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))}
    state1, metrics = model.train_step(state, batch, jax.random.key(1))
    assert set(metrics) == {"G_GAN", "G_L1", "D_real", "D_fake"}
    assert all(np.isfinite(float(v)) for v in metrics.values())
    # batch stats must have moved (batchnorm nets)
    s0 = jax.tree.leaves(state.batch_stats["G"])
    s1 = jax.tree.leaves(state1.batch_stats["G"])
    assert any(not np.allclose(a, b) for a, b in zip(s0, s1))
    # L1 falls with training on a fixed batch
    for i in range(8):
        state1, metrics2 = model.train_step(state1, batch, jax.random.key(i + 2))
    assert float(metrics2["G_L1"]) < float(metrics["G_L1"])


# ---------------------------------------------------------------------------
# checkpointing
# ---------------------------------------------------------------------------

def test_save_and_load_roundtrip(tmp_path):
    cfg = small_cfg(checkpoints_dir=str(tmp_path), name="t")
    model = create_model(cfg)
    state = model.init_state(jax.random.key(0))
    rngs = np.random.RandomState(0)
    batch = {"img_source": jnp.asarray(rngs.rand(2, 32, 32, 3), jnp.float32),
             "img_target": jnp.asarray(rngs.rand(2, 32, 32, 3), jnp.float32)}
    state, _ = model.train_step(state, batch, jax.random.key(1))
    model.save_networks(state, "latest")
    fresh = model.init_state(jax.random.key(9))
    restored = model.load_networks(fresh, "latest")
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 1


def test_cycle_gan_remat_step():
    """cfg.remat wraps generator forwards in jax.checkpoint — same losses."""
    cfg = small_cfg(d_steps_per_g=1).replace(remat=True)
    model = create_model(cfg)
    state = model.init_state(jax.random.key(0))
    rng = np.random.RandomState(0)
    batch = {
        "img_source": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32)),
        "img_target": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32)),
    }
    state1, metrics = model.train_step(state, batch, jax.random.key(1))
    assert all(np.isfinite(float(v)) for v in metrics.values())
    # remat must not change the math: compare against the no-remat model
    cfg2 = small_cfg(d_steps_per_g=1)
    model2 = create_model(cfg2)
    state2 = model2.init_state(jax.random.key(0))
    state2b, metrics2 = model2.train_step(state2, batch, jax.random.key(1))
    for k in metrics:
        assert np.isclose(float(metrics[k]), float(metrics2[k]), rtol=1e-5), k


def test_cycle_gan_batchnorm_stats_thread():
    """--norm batch: G and D BatchNorm running stats advance every train
    step in reference forward order and feed eval (review fix — they were
    silently discarded, leaving eval on init stats)."""
    cfg = small_cfg(norm="batch", no_dropout=True)
    model = create_model(cfg)
    state = model.init_state(jax.random.key(0))
    rng = np.random.RandomState(1)
    batch = {
        "img_source": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
        "img_target": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
    }
    assert state.batch_stats["G_A"], "batch norm config must carry stats"
    state2, metrics = model.train_step(state, batch, jax.random.key(2))
    for net in ("G_A", "G_B", "D_A", "D_B"):
        before = jax.tree.leaves(state.batch_stats[net])
        after = jax.tree.leaves(state2.batch_stats[net])
        changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                      for a, b in zip(before, after))
        assert changed, f"{net} batch stats did not advance"
    for v in metrics.values():
        assert np.isfinite(float(v))
    m2, _ = model.eval_step(state2, batch)
    for v in m2.values():
        assert np.isfinite(float(v))


def test_d_lr_schedule_rebases_on_cfg_lr(cycle_setup):
    """D optimizers are built with cfg.lr, so the scheduler must rebase them
    on cfg.lr too (review fix — cfg.lr_d silently cut D's LR 2.5x)."""
    cfg, model, state, batch = cycle_setup
    state2 = model.update_learning_rate(state, epoch=20)
    lr_d = float(state2.opt_states["D"].hyperparams["learning_rate"])
    assert np.isclose(lr_d, cfg.lr * (1 - 10 / 30), rtol=1e-6)
