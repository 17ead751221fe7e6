"""SegCycle training entry point (reference train_Segcycle.py:11-88).

Thin alias over the generic driver: ``python train_Segcycle.py ...`` ==
``python train.py --model seg_cycle ...``.
"""

import sys

from train import main

if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--model" not in argv:
        argv = ["--model", "seg_cycle"] + argv
    main(argv)
