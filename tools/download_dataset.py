"""Named-dataset downloader CLI (reference datasets/download_cyclegan_dataset.sh:1-14
and datasets/download_pix2pix_dataset.sh:1-14).

Python equivalent of the two wget/unzip shell scripts: validate the dataset
name against the task's published list, fetch ``<index>/<name>.zip`` (CycleGAN)
or ``<index>/<name>.tar.gz`` (pix2pix), extract into the datasets dir, and
delete the archive — all through :class:`GetData`, which streams to disk and
rejects path-traversal archive members.

    python tools/download_dataset.py cyclegan maps
    python tools/download_dataset.py pix2pix facades --save_path ./datasets

This container has no public egress, so against the real Berkeley URLs the
fetch only works outside it; ``--base_url`` points the flow at any mirror
(how the tests drive it, against a local HTTP server), and ``--archive``
extracts an already-downloaded file instead.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cycle_depth_estimation_tpu.utils.get_data import GetData

# download_cyclegan_dataset.sh:3-6 (the shell test repeats ae_photos; the
# printed list omits mini/mini_pix2pix exactly like the reference does)
CYCLEGAN_DATASETS = (
    "ae_photos", "apple2orange", "summer2winter_yosemite", "horse2zebra",
    "monet2photo", "cezanne2photo", "ukiyoe2photo", "vangogh2photo", "maps",
    "cityscapes", "facades", "iphone2dslr_flower", "mini", "mini_pix2pix",
)
# download_pix2pix_dataset.sh:3-6
PIX2PIX_DATASETS = (
    "cityscapes", "night2day", "edges2handbags", "edges2shoes", "facades",
    "maps",
)

TASKS = {
    # (valid names, index URL, archive suffix) per shell script
    "cyclegan": (CYCLEGAN_DATASETS,
                 "https://people.eecs.berkeley.edu/~taesung_park/CycleGAN/"
                 "datasets", ".zip"),
    "pix2pix": (PIX2PIX_DATASETS,
                "http://efrosgans.eecs.berkeley.edu/pix2pix/datasets",
                ".tar.gz"),
}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("task", choices=sorted(TASKS))
    p.add_argument("dataset", help="dataset name, e.g. maps, facades")
    p.add_argument("--save_path", default="./datasets")
    p.add_argument("--base_url", default=None,
                   help="override the dataset index URL (mirrors/tests)")
    p.add_argument("--archive", default=None,
                   help="extract this local archive instead of downloading")
    a = p.parse_args(argv)

    names, index_url, suffix = TASKS[a.task]
    if a.dataset not in names:
        # the shell scripts' exact failure mode: list the options, exit 1
        # (the cyclegan script's message moves ae_photos to the end, omits
        # mini/mini_pix2pix, and has a colon the pix2pix script lacks —
        # mirrored verbatim)
        if a.task == "cyclegan":
            shown = [n for n in names if n not in
                     ("ae_photos", "mini", "mini_pix2pix")] + ["ae_photos"]
            print(f"Available datasets are: {', '.join(shown)}")
        else:
            print(f"Available datasets are {', '.join(names)}")
        return 1

    print(f"Specified [{a.dataset}]")
    gd = GetData(technique=a.task, verbose=True, base_url=a.base_url or index_url)
    out = gd.get(a.save_path, dataset=a.dataset + suffix,
                 archive_path=a.archive)
    print(f"Dataset ready at {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
