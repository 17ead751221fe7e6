"""2-process CPU-mesh validation of the multi-host path (VERDICT round-2
item 8): jax.distributed.initialize + global mesh + per-process local batch
slices through host_shard_batch → one DP train step; both processes must see
identical updated parameters (the all-reduce spans processes)."""

import os
import sys
import textwrap

from tools.launch_multihost import launch_local

_CHILD = textwrap.dedent("""
    import os
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(os.environ["COORDINATOR"],
                               num_processes=int(os.environ["NUM_PROCESSES"]),
                               process_id=int(os.environ["PROCESS_INDEX"]))
    import jax.numpy as jnp
    from cycle_depth_estimation_tpu.config import Config, apply_model_defaults
    from cycle_depth_estimation_tpu.models import create_model
    from cycle_depth_estimation_tpu.parallel import (host_shard_batch,
                                                     make_mesh, replicated)

    pc, pi = jax.process_count(), jax.process_index()
    assert pc == int(os.environ["NUM_PROCESSES"]), pc
    mesh = make_mesh()
    n_global = len(jax.devices())
    assert n_global == pc * int(os.environ["LOCAL_DEVICES"]), n_global

    cfg = apply_model_defaults(Config(
        model="cycle_gan", fine_size=32, ngf=8, ndf=8,
        net_g="resnet_3blocks", batch_size=n_global, pool_size=n_global,
        d_steps_per_g=2))
    model = create_model(cfg)
    state = model.init_state(jax.random.key(0))
    state = jax.device_put(state, replicated(mesh))

    rng = np.random.RandomState(0)  # same seed everywhere → same global batch
    g = {"img_source": rng.rand(n_global, 32, 32, 3).astype(np.float32) * 2 - 1,
         "img_target": rng.rand(n_global, 32, 32, 3).astype(np.float32) * 2 - 1}
    per = n_global // pc
    local = {k: v[pi * per:(pi + 1) * per] for k, v in g.items()}
    sharded = host_shard_batch(mesh, local)
    assert sharded["img_source"].shape[0] == n_global  # global view

    state, metrics = model.train_step(state, sharded, jax.random.key(1))
    for k, v in metrics.items():
        val = float(jax.device_get(v))
        assert np.isfinite(val), (k, val)
    # parameter digest must agree across processes (replicated update)
    digest = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                       for l in jax.tree.leaves(state.params)))
    print(f"DIGEST {digest:.6f} proc {pi} metrics "
          + ",".join(f"{k}={float(jax.device_get(v)):.4f}"
                     for k, v in sorted(metrics.items())))
""")


def test_two_process_cpu_mesh_train_step(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(_CHILD)
    env = {"PYTHONPATH": os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + os.environ.get("PYTHONPATH", "").split(os.pathsep)),
        "JAX_PLATFORMS": ""}
    results = launch_local([sys.executable, str(child)], nprocs=2,
                           local_devices=2, extra_env=env)
    digests = []
    for rc, out in results:
        assert rc == 0
        line = [ln for ln in out.splitlines() if ln.startswith("DIGEST")][0]
        digests.append(line.split()[1])
    assert digests[0] == digests[1], digests
