"""Parallelism tests on the 8-device CPU mesh: DP semantics and spatially
sharded convolution correctness (XLA halo exchange)."""

import numpy as np

import jax
import jax.numpy as jnp

from cycle_depth_estimation_tpu.models.networks import ResnetGenerator
from cycle_depth_estimation_tpu.parallel import (
    batch_sharding,
    host_shard_batch,
    make_mesh,
    replicated,
)
from cycle_depth_estimation_tpu.parallel.spatial import (
    make_2d_mesh,
    shard_spatial,
    spatial_sharding,
)


def test_mesh_and_batch_sharding():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8}
    batch = {"x": np.zeros((8, 4, 4, 3), np.float32)}
    sharded = host_shard_batch(mesh, batch)
    assert len(sharded["x"].sharding.device_set) == 8


def test_spatial_sharded_generator_matches():
    """Generator forward with H sharded over 4 devices == unsharded."""
    mesh = make_2d_mesh(data=2, model=4)
    g = ResnetGenerator(output_nc=3, ngf=4, n_blocks=2)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    params = g.init(jax.random.key(0), x)

    y_ref = np.asarray(jax.jit(g.apply)(params, x))

    xs = shard_spatial(mesh, x)
    ps = jax.device_put(params, replicated(mesh))
    y_sh = jax.jit(g.apply)(ps, xs)
    # output H must be distributed over the model axis
    assert len(y_sh.sharding.device_set) >= 4
    np.testing.assert_allclose(np.asarray(y_sh), y_ref, atol=2e-5, rtol=1e-4)


def test_dp_step_equals_single_device():
    """Sharded batch through a jitted loss/grad == unsharded (allreduce)."""
    mesh = make_mesh()
    g = ResnetGenerator(output_nc=3, ngf=4, n_blocks=1)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    t = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    params = g.init(jax.random.key(0), x)

    def loss(p, x, t):
        return jnp.mean(jnp.abs(g.apply(p, x) - t))

    grads_ref = jax.jit(jax.grad(loss))(params, x, t)
    sh = batch_sharding(mesh)
    grads_sh = jax.jit(jax.grad(loss))(
        jax.device_put(params, replicated(mesh)),
        jax.device_put(x, sh), jax.device_put(t, sh))
    for a, b in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   rtol=1e-5)


def test_tp_generator_forward_and_grads_match():
    """Megatron col/row channel sharding of the residual trunk: forward and
    param gradients over a ('data','model') 2x4 mesh match single-device."""
    from cycle_depth_estimation_tpu.parallel.tensor import (
        shard_params_tp, tp_shardings)

    mesh = make_2d_mesh(data=2, model=4)
    g = ResnetGenerator(output_nc=3, ngf=4, n_blocks=2)
    x = jnp.asarray(np.random.RandomState(1).rand(4, 32, 32, 3), jnp.float32)
    params = g.init(jax.random.key(0), x)

    def loss(p, xx):
        return jnp.mean(jax.jit(g.apply)(p, xx) ** 2)

    y_ref = np.asarray(jax.jit(g.apply)(params, x))
    grads_ref = jax.jit(jax.grad(loss))(params, x)

    # trunk block channels split over 'model', batch over 'data'
    p_tp = shard_params_tp(params, mesh)
    k1 = p_tp["params"]["block0"]["conv1"]["kernel"]
    assert len(k1.sharding.device_set) == 8  # genuinely distributed
    x_dp = jax.device_put(x, batch_sharding(mesh))
    y_tp = np.asarray(jax.jit(g.apply)(p_tp, x_dp))
    np.testing.assert_allclose(y_tp, y_ref, atol=2e-5)

    grads_tp = jax.jit(jax.grad(loss),
                       out_shardings=tp_shardings(params, mesh))(p_tp, x_dp)
    for ref, got in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads_tp)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_gpipe_trunk_matches_sequential():
    """8 residual blocks staged 4x2 over a 'stage' axis (GPipe schedule,
    shard_map + ppermute) == applying the blocks sequentially."""
    from cycle_depth_estimation_tpu.models.networks import ResnetBlock
    from cycle_depth_estimation_tpu.parallel.pipeline import (
        gpipe_apply, stack_stage_params)

    dim, L, S, M = 8, 8, 4, 4
    block = ResnetBlock(dim)
    x = jnp.asarray(np.random.RandomState(2).rand(8, 8, 8, dim), jnp.float32)
    blocks = [block.init(jax.random.key(i), x[:2])["params"]
              for i in range(L)]

    y_ref = x
    for p in blocks:
        y_ref = block.apply({"params": p}, y_ref)

    mesh = make_mesh([S], axis_names=("stage",),
                     devices=jax.devices()[:S])
    stacked = stack_stage_params(blocks, S)
    y_pp = gpipe_apply(
        lambda p, h: block.apply({"params": p}, h), stacked, x, mesh,
        n_microbatches=M)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-4)


def test_gpipe_bf16_blocks_over_f32_input():
    """Regression: bf16-compute blocks (the CLAUDE.md dtype convention) fed
    f32 activations used to crash lax.scan with a carry-dtype mismatch —
    the carry/buffers must follow the block OUTPUT dtype."""
    from cycle_depth_estimation_tpu.models.networks import ResnetBlock
    from cycle_depth_estimation_tpu.parallel.pipeline import (
        gpipe_apply, stack_stage_params)

    dim, L, S, M = 8, 4, 2, 2
    block = ResnetBlock(dim, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(5).rand(4, 8, 8, dim), jnp.float32)
    blocks = [block.init(jax.random.key(20 + i), x[:2])["params"]
              for i in range(L)]

    y_ref = x
    for p in blocks:
        y_ref = block.apply({"params": p}, y_ref)

    mesh = make_mesh([S], axis_names=("stage",), devices=jax.devices()[:S])
    y_pp = gpipe_apply(
        lambda p, h: block.apply({"params": p}, h),
        stack_stage_params(blocks, S), x, mesh, n_microbatches=M)
    assert y_pp.dtype == y_ref.dtype
    np.testing.assert_allclose(np.asarray(y_pp, np.float32),
                               np.asarray(y_ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_gpipe_dp_trunk_matches_sequential():
    """dp×pp: the same GPipe trunk on a ('data','stage') 2x4 mesh, with the
    microbatch batch dimension sharded over 'data' (each data slice runs its
    own pipeline replica) == sequential."""
    from cycle_depth_estimation_tpu.models.networks import ResnetBlock
    from cycle_depth_estimation_tpu.parallel.pipeline import (
        gpipe_apply, stack_stage_params)

    dim, L, S, M = 8, 8, 4, 4
    block = ResnetBlock(dim)
    x = jnp.asarray(np.random.RandomState(4).rand(8, 8, 8, dim), jnp.float32)
    blocks = [block.init(jax.random.key(10 + i), x[:2])["params"]
              for i in range(L)]

    y_ref = x
    for p in blocks:
        y_ref = block.apply({"params": p}, y_ref)

    mesh = make_mesh([2, S], axis_names=("data", "stage"))
    stacked = stack_stage_params(blocks, S)
    y_pp = gpipe_apply(
        lambda p, h: block.apply({"params": p}, h), stacked, x, mesh,
        n_microbatches=M, data_axis="data")
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-4)


def test_spatial_sharded_s2d_trunk_matches():
    """The flagship DenseNet trunk (GeneralNet, small config) with image
    height sharded over 'model' == unsharded — SP extends beyond the
    CycleGAN generator to the research model."""
    from cycle_depth_estimation_tpu.models.s2d_networks import GeneralNet

    mesh = make_2d_mesh(data=2, model=4)
    net = GeneralNet(mid_nc=64, num_init_features=16, growth_rate=8,
                     block_config=(2, 2, 2, 2))
    x = jnp.asarray(np.random.RandomState(3).rand(2, 64, 96, 3), jnp.float32)
    params = net.init(jax.random.key(0), x, "R")

    (psp_ref, feats_ref), = [net.apply(params, x, "R")]
    y_sh = jax.jit(lambda p, xx: net.apply(p, xx, "R"))(
        jax.device_put(params, replicated(mesh)),
        shard_spatial(mesh, x))
    psp_sh, feats_sh = y_sh
    np.testing.assert_allclose(np.asarray(psp_sh), np.asarray(psp_ref),
                               atol=3e-5, rtol=1e-4)
    for a, b in zip(feats_sh, feats_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-4)


def test_zero_sharding_layout():
    """leaf_zero_sharding: largest axis-divisible dim sharded, scalars and
    indivisible shapes replicated (parallel/zero.py)."""
    from jax.sharding import PartitionSpec as P

    from cycle_depth_estimation_tpu.parallel.zero import leaf_zero_sharding

    mesh = make_mesh()  # data=8
    a = np.zeros((16, 3, 3, 64), np.float32)
    assert leaf_zero_sharding(mesh, a).spec == P(None, None, None, "data")
    b = np.zeros((24, 3, 3, 7), np.float32)
    assert leaf_zero_sharding(mesh, b).spec == P("data", None, None, None)
    assert leaf_zero_sharding(mesh, np.zeros((), np.float32)).spec == P()
    assert leaf_zero_sharding(mesh, np.zeros((3, 3, 3, 7), np.float32)).spec == P()


def test_zero_fsdp_step_parity():
    """One Adam step with ZeRO-1 (moments sharded) and FSDP (params too)
    layouts == fully replicated, on a real conv net."""
    import optax

    from cycle_depth_estimation_tpu.models.base_model import ModelState
    from cycle_depth_estimation_tpu.parallel.zero import memory_report, zero_state

    mesh = make_mesh()
    g = ResnetGenerator(output_nc=3, ngf=8, n_blocks=1)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    t = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    params = g.init(jax.random.key(0), x)["params"]
    # eps=1e-2 keeps Adam smooth: at step 1 with eps→0 the update is
    # ~sign(g)·lr, and reduction-order noise on near-zero grads flips signs
    # (layout-independent; see tests/test_s2d.py::_assert_params_close)
    opt = optax.adam(1e-3, eps=1e-2)
    state = ModelState(params=params, batch_stats={},
                       opt_states=opt.init(params), pools={},
                       step=jnp.zeros((), jnp.int32))

    def step(s, x, t):
        def loss(p):
            return jnp.mean(jnp.abs(g.apply({"params": p}, x) - t))

        grads = jax.grad(loss)(s.params)
        upd, o = opt.update(grads, s.opt_states, s.params)
        return s.replace(params=optax.apply_updates(s.params, upd),
                         opt_states=o, step=s.step + 1)

    ref = jax.jit(step)(state, x, t)
    xs = host_shard_batch(mesh, {"x": x, "t": t})
    for shard_params in (False, True):
        sz = zero_state(mesh, state, shard_params=shard_params)
        out = jax.jit(step)(sz, xs["x"], xs["t"])
        for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(out.params)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-6, rtol=1e-5)
    rep = memory_report(state, mesh, shard_params=True)
    assert rep["zero_per_device_bytes"]["opt_states"] < (
        rep["replicated_per_device_bytes"]["opt_states"] / 4)
    assert rep["zero_per_device_bytes"]["params"] < (
        rep["replicated_per_device_bytes"]["params"] / 4)
