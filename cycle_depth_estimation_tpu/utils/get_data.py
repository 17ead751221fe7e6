"""Dataset downloader (reference util/get_data.py:11-115).

The reference scrapes the Berkeley CycleGAN/pix2pix dataset index and
downloads+extracts archives. This environment is zero-egress, so `GetData`
performs the same *local* steps (extract + layout check) when given an
already-downloaded archive, and raises a clear error with the public URL
when asked to fetch over the network.
"""

from __future__ import annotations

import os
import tarfile
import zipfile

DATASET_INDEX = {
    "cyclegan": "http://efrosgans.eecs.berkeley.edu/cyclegan/datasets/",
    "pix2pix": "http://efrosgans.eecs.berkeley.edu/pix2pix/datasets/",
}


class GetData:
    def __init__(self, technique: str = "cyclegan", save_path: str = "./datasets"):
        self.technique = technique
        self.save_path = save_path

    def extract(self, archive_path: str, dest: str = None) -> str:
        dest = dest or self.save_path
        os.makedirs(dest, exist_ok=True)
        if archive_path.endswith(".zip"):
            with zipfile.ZipFile(archive_path) as zf:
                zf.extractall(dest)
        elif archive_path.endswith((".tar.gz", ".tgz", ".tar")):
            with tarfile.open(archive_path) as tf:
                tf.extractall(dest)
        else:
            raise ValueError(f"unsupported archive: {archive_path}")
        return dest

    def get(self, dataset: str = None, archive_path: str = None) -> str:
        if archive_path:
            return self.extract(archive_path)
        raise RuntimeError(
            "This environment has no network egress. Download the archive "
            f"manually from {DATASET_INDEX[self.technique]} and call "
            "GetData().get(archive_path='<file>') or use the extract() method."
        )
