"""List parameter names/shapes of a checkpoint (.pth or orbax dir).

Re-design of reference exper.py:1-10 (torch key lister), extended to our
orbax checkpoints.

    python tools/list_checkpoint.py path/to/iter_40000_net_G_A.pth
    python tools/list_checkpoint.py checkpoints/exp/ckpt_latest
"""

from __future__ import annotations

import sys


def list_pth(path: str):
    from cycle_depth_estimation_tpu.utils.torch_import import load_pth

    for k, v in load_pth(path).items():
        print(f"{k}\t{tuple(v.shape)}")


def list_orbax(path: str):
    import jax
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(path)
    flat = jax.tree_util.tree_flatten_with_path(restored)[0]
    for keypath, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        shape = getattr(leaf, "shape", ())
        print(f"{name}\t{tuple(shape)}")


def main():
    path = sys.argv[1]
    if path.endswith(".pth"):
        list_pth(path)
    else:
        list_orbax(path)


if __name__ == "__main__":
    main()
