"""Export NYUv2-style .mat archives to per-image label/depth/rgb PNGs.

Re-design of reference test_label.py:14-124 (NYU2/OpenGL .mat → png
exporter): reads the HDF5-backed ``nyu_depth_v2_labeled.mat`` (datasets
``images``, ``labels``, ``depths``) and writes ``rgb_%05d.png``,
``label_%05d.png`` (uint8/uint16 ids) and ``depth_%05d.png``
(uint16 millimetres).

    python tools/export_nyu.py --mat nyu_depth_v2_labeled.mat --out nyu/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def export(mat_path: str, out_dir: str, limit: int = None) -> int:
    import h5py
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    with h5py.File(mat_path, "r") as f:
        n = f["images"].shape[0]
        if limit:
            n = min(n, limit)
        for i in range(n):
            # matlab HWC order is transposed in the HDF5 layout
            rgb = np.transpose(np.asarray(f["images"][i]), (2, 1, 0))
            Image.fromarray(rgb.astype(np.uint8)).save(
                os.path.join(out_dir, f"rgb_{i:05d}.png"))
            if "labels" in f:
                lab = np.transpose(np.asarray(f["labels"][i]), (1, 0))
                mode = "I;16" if lab.max() > 255 else "L"
                Image.fromarray(lab.astype(
                    np.uint16 if mode == "I;16" else np.uint8), mode).save(
                    os.path.join(out_dir, f"label_{i:05d}.png"))
            if "depths" in f:
                dep = np.transpose(np.asarray(f["depths"][i]), (1, 0))
                dep_mm = np.clip(dep * 1000.0, 0, 65535).astype(np.uint16)
                Image.fromarray(dep_mm, "I;16").save(
                    os.path.join(out_dir, f"depth_{i:05d}.png"))
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mat", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=None)
    a = p.parse_args()
    n = export(a.mat, a.out, a.limit)
    print(f"exported {n} frames to {a.out}")


if __name__ == "__main__":
    main()
