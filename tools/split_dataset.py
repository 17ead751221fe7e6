"""Random train/test splitter for parallel image/label/depth folders.

Re-design of reference split.py:26-45 (vKITTI splitter): move a random
sample of co-indexed files from each input folder to its test folder,
keeping the triplets aligned.

    python tools/split_dataset.py --count 200 --seed 0 \
        --folders rgb depth seg --out rgb_test depth_test seg_test
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np


def split(folders, outs, count: int, seed: int = 0, move: bool = True):
    names = sorted(os.listdir(folders[0]))
    for f in folders[1:]:
        other = set(os.listdir(f))
        names = [n for n in names if n in other]
    rng = np.random.default_rng(seed)
    chosen = rng.choice(len(names), size=min(count, len(names)), replace=False)
    op = shutil.move if move else shutil.copy
    for o in outs:
        os.makedirs(o, exist_ok=True)
    for i in chosen:
        for src_dir, dst_dir in zip(folders, outs):
            op(os.path.join(src_dir, names[i]), os.path.join(dst_dir, names[i]))
    return [names[i] for i in chosen]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--folders", nargs="+", required=True)
    p.add_argument("--out", nargs="+", required=True)
    p.add_argument("--count", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--copy", action="store_true", help="copy instead of move")
    a = p.parse_args()
    assert len(a.folders) == len(a.out)
    moved = split(a.folders, a.out, a.count, a.seed, move=not a.copy)
    print(f"split {len(moved)} aligned files")


if __name__ == "__main__":
    main()
