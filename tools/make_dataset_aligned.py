"""Build pix2pix-aligned AB images from two parallel folders, resizing each
side to a fixed size first (reference datasets/make_dataset_aligned.py:20-63).

    python tools/make_dataset_aligned.py --dataset-path data/ \
        [--a-dir trainA --b-dir trainB --out train --size 256]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def make_aligned(a_dir: str, b_dir: str, out_dir: str, size: int = 256) -> int:
    os.makedirs(out_dir, exist_ok=True)
    names = sorted(set(os.listdir(a_dir)) & set(os.listdir(b_dir)))
    n = 0
    for name in names:
        a = Image.open(os.path.join(a_dir, name)).convert("RGB")
        b = Image.open(os.path.join(b_dir, name)).convert("RGB")
        a = a.resize((size, size), Image.BICUBIC)
        b = b.resize((size, size), Image.BICUBIC)
        ab = np.concatenate([np.asarray(a), np.asarray(b)], axis=1)
        Image.fromarray(ab).save(os.path.join(out_dir, name))
        n += 1
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset-path", required=True)
    p.add_argument("--a-dir", default="trainA")
    p.add_argument("--b-dir", default="trainB")
    p.add_argument("--out", default="train")
    p.add_argument("--size", type=int, default=256)
    a = p.parse_args()
    root = a.dataset_path
    n = make_aligned(os.path.join(root, a.a_dir), os.path.join(root, a.b_dir),
                     os.path.join(root, a.out), a.size)
    print(f"wrote {n} aligned images")


if __name__ == "__main__":
    main()
