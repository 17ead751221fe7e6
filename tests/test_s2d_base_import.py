"""Base-generation (my_seg_depth) checkpoint importers: full forward parity
of G_1 (resnet blocks), General_net2, SEG/DEP skip decoders against
reference-shaped torch oracles (tools/torch_oracles.py), eval mode."""

import numpy as np

import jax
import jax.numpy as jnp
import torch

from cycle_depth_estimation_tpu.models.s2d_networks import (
    DEP2,
    G1,
    GeneralNet2,
    SEG2,
)
from cycle_depth_estimation_tpu.utils.torch_import import (
    import_dep2,
    import_g1_base,
    import_general_net2,
    import_seg2,
)
from tools.torch_oracles import (
    build_torch_dep2,
    build_torch_g1_base,
    build_torch_general_net2,
    build_torch_seg2,
)

RNG = np.random.RandomState(17)
BLOCKS = (2, 2, 2, 2)


def np_sd(net):
    return {k: v.numpy() for k, v in net.state_dict().items()}


def nhwc(t):
    return t.numpy().transpose(0, 2, 3, 1)


def skip_chans(block_config=BLOCKS):
    nf, skips = 64, [64]
    for i, n in enumerate(block_config):
        nf += 32 * n
        skips.append(nf)
        if i != len(block_config) - 1:
            nf //= 2
    return skips


def test_g1_base_import_parity():
    torch.manual_seed(21)
    tg = build_torch_g1_base(n_blocks=2)
    tg.eval()
    x = RNG.randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        ref = tg.fwd(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    variables = import_g1_base(np_sd(tg), n_blocks=2)
    g = G1(n_blocks=2, block_type="resnet")
    out = g.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x),
                  train=False)
    np.testing.assert_allclose(np.asarray(out), nhwc(ref), atol=5e-4,
                               rtol=1e-3)


def test_general_net2_import_parity_both_modes():
    torch.manual_seed(22)
    tg, _ = build_torch_general_net2(BLOCKS)
    tg.eval()
    variables = jax.tree.map(jnp.asarray, import_general_net2(np_sd(tg),
                                                              BLOCKS))
    g = GeneralNet2(block_config=BLOCKS)

    # 'R' mode: raw image through the stem
    x = RNG.randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        feats_t, psp_t = tg.fwd(torch.from_numpy(x.transpose(0, 3, 1, 2)), "R")
    feats_j, psp_j = g.apply(variables, jnp.asarray(x), "R", train=False)
    assert len(feats_j) == len(feats_t) == 5
    for a, b in zip(feats_j, feats_t):
        np.testing.assert_allclose(np.asarray(a), nhwc(b), atol=5e-4,
                                   rtol=1e-3)
    np.testing.assert_allclose(np.asarray(psp_j), nhwc(psp_t), atol=5e-4,
                               rtol=1e-3)

    # 'S' mode: 64-ch feature input, stem conv skipped
    f = RNG.randn(1, 32, 48, 64).astype(np.float32)
    with torch.no_grad():
        feats_t, psp_t = tg.fwd(torch.from_numpy(f.transpose(0, 3, 1, 2)), "S")
    feats_j, psp_j = g.apply(variables, jnp.asarray(f), "S", train=False)
    np.testing.assert_allclose(np.asarray(psp_j), nhwc(psp_t), atol=5e-4,
                               rtol=1e-3)


def test_seg2_dep2_import_parity():
    torch.manual_seed(23)
    chans = skip_chans()
    tseg = build_torch_seg2(chans)
    tdep = build_torch_dep2(chans)
    tseg.eval(), tdep.eval()

    # build a matching feature pyramid: stem@1/2, db1@1/2, db2@1/4, db3@1/8,
    # db4@1/16 for a 64×96 image, psp output 1024ch@1/16
    h, w = 64, 96
    scales = [2, 2, 4, 8, 16]
    feats = [RNG.randn(1, h // s, w // s, c).astype(np.float32)
             for s, c in zip(scales, chans)]
    psp = RNG.randn(1, h // 16, w // 16, 1024).astype(np.float32)
    tf = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats]
    tpsp = torch.from_numpy(psp.transpose(0, 3, 1, 2))

    with torch.no_grad():
        seg_ref = tseg.fwd(list(tf), tpsp)
        dep_ref = tdep.fwd(list(tf), tpsp)

    seg = SEG2(n_cls=28)
    vseg = jax.tree.map(jnp.asarray, import_seg2(np_sd(tseg)))
    out = seg.apply(vseg, [jnp.asarray(f) for f in feats], jnp.asarray(psp),
                    train=False)
    np.testing.assert_allclose(np.asarray(out), nhwc(seg_ref), atol=5e-4,
                               rtol=1e-3)

    dep = DEP2()
    vdep = jax.tree.map(jnp.asarray, import_dep2(np_sd(tdep)))
    out = dep.apply(vdep, [jnp.asarray(f) for f in feats], jnp.asarray(psp),
                    train=False)
    np.testing.assert_allclose(np.asarray(out), nhwc(dep_ref), atol=5e-4,
                               rtol=1e-3)
