"""Build aligned AB side-by-side images for pix2pix training.

Re-design of reference datasets/combine_A_and_B.py:19-48: for each split
subfolder present in --fold_A, pair same-named files from --fold_B and write
horizontal concatenations into --fold_AB.

    python tools/combine_a_and_b.py --fold_A a/ --fold_B b/ --fold_AB ab/
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def combine(fold_a: str, fold_b: str, fold_ab: str, num_imgs: int = 1_000_000,
            use_ab: bool = False) -> int:
    total = 0
    splits = [d for d in sorted(os.listdir(fold_a))
              if os.path.isdir(os.path.join(fold_a, d))] or [""]
    for sp in splits:
        dir_a = os.path.join(fold_a, sp)
        dir_b = os.path.join(fold_b, sp)
        dir_ab = os.path.join(fold_ab, sp)
        os.makedirs(dir_ab, exist_ok=True)
        names = sorted(os.listdir(dir_a))
        if use_ab:
            names = [n for n in names if "_A." in n]
        for name_a in names[:num_imgs]:
            name_b = name_a.replace("_A.", "_B.") if use_ab else name_a
            path_a = os.path.join(dir_a, name_a)
            path_b = os.path.join(dir_b, name_b)
            if not (os.path.isfile(path_a) and os.path.isfile(path_b)):
                continue
            im_a = np.asarray(Image.open(path_a).convert("RGB"))
            im_b = np.asarray(Image.open(path_b).convert("RGB"))
            ab = np.concatenate([im_a, im_b], axis=1)
            out_name = name_a.replace("_A.", ".") if use_ab else name_a
            Image.fromarray(ab).save(os.path.join(dir_ab, out_name))
            total += 1
    return total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fold_A", required=True)
    p.add_argument("--fold_B", required=True)
    p.add_argument("--fold_AB", required=True)
    p.add_argument("--num_imgs", type=int, default=1_000_000)
    p.add_argument("--use_AB", action="store_true")
    a = p.parse_args()
    n = combine(a.fold_A, a.fold_B, a.fold_AB, a.num_imgs, a.use_AB)
    print(f"wrote {n} AB images to {a.fold_AB}")


if __name__ == "__main__":
    main()
