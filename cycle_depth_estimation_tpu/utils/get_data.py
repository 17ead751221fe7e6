"""Dataset downloader (reference util/get_data.py:11-115).

Full reference behavior, stdlib-only: fetch the dataset index page, list the
``.zip``/``.tar.gz`` links, prompt (or take ``dataset=``), download, extract
into ``save_path``, delete the archive, and return the extracted directory.
Differences from the reference (both deliberate):

- ``urllib`` + a tiny ``html.parser`` anchor scraper replace the
  requests/BeautifulSoup dependency pair (neither is needed);
- the index URL is overridable (``base_url=``) so the whole flow is testable
  against a local HTTP server — this container has no public egress, so the
  Berkeley URLs (kept as the defaults) only work outside it.
"""

from __future__ import annotations

import os
import shutil
import tarfile
import zipfile
from html.parser import HTMLParser
from os.path import basename, join
from typing import List, Optional
from urllib.request import urlopen

DATASET_INDEX = {
    # reference util/get_data.py:30-34
    "pix2pix": ("https://people.eecs.berkeley.edu/~tinghuiz/projects/"
                "pix2pix/datasets"),
    "cyclegan": ("https://people.eecs.berkeley.edu/~taesung_park/"
                 "CycleGAN/datasets"),
}


class _AnchorScraper(HTMLParser):
    """Collect <a href> texts — the BeautifulSoup replacement."""

    def __init__(self):
        super().__init__()
        self._in_a = False
        self._has_href = False
        self._text: List[str] = []
        self.anchors: List[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._in_a = True
            self._has_href = any(k == "href" for k, _ in attrs)
            self._text = []

    def handle_data(self, data):
        if self._in_a:
            self._text.append(data)

    def handle_endtag(self, tag):
        if tag == "a":
            if self._has_href:
                self.anchors.append("".join(self._text).strip())
            self._in_a = False


class GetData:
    """Download CycleGAN or pix2pix datasets (reference GetData semantics).

    Example::

        gd = GetData(technique="cyclegan")
        path = gd.get(save_path="./datasets")       # interactive menu
        path = gd.get("./datasets", dataset="maps.zip")  # non-interactive
    """

    def __init__(self, technique: str = "cyclegan", verbose: bool = True,
                 base_url: Optional[str] = None):
        self.url = base_url or DATASET_INDEX[technique.lower()]
        self._verbose = verbose

    def _print(self, text):
        if self._verbose:
            print(text)

    @staticmethod
    def _get_options(html: str) -> List[str]:
        p = _AnchorScraper()
        p.feed(html)
        return [a for a in p.anchors if a.endswith((".zip", "tar.gz"))]

    def _present_options(self) -> str:
        with urlopen(self.url) as r:
            options = self._get_options(r.read().decode("utf-8", "replace"))
        print("Options:\n")
        for i, o in enumerate(options):
            print(f"{i}: {o}")
        choice = input("\nPlease enter the number of the dataset above you "
                       "wish to download:")
        return options[int(choice)]

    def _download_data(self, dataset_url: str, save_path: str) -> None:
        os.makedirs(save_path, exist_ok=True)
        base = basename(dataset_url)
        temp_save_path = join(save_path, base)
        with urlopen(dataset_url) as r, open(temp_save_path, "wb") as f:
            # stream to disk — archives run to GBs (review fix: r.read()
            # buffered the whole payload in RAM)
            shutil.copyfileobj(r, f)
        self.extract(temp_save_path, save_path)
        os.remove(temp_save_path)

    def extract(self, archive_path: str, dest: Optional[str] = None) -> str:
        """Unpack a local archive (also usable stand-alone for manually
        fetched files in egress-less environments)."""
        dest = dest or os.path.dirname(archive_path) or "."
        os.makedirs(dest, exist_ok=True)
        self._print("Unpacking Data...")
        if archive_path.endswith(".zip"):
            with zipfile.ZipFile(archive_path) as zf:
                zf.extractall(dest)
        elif archive_path.endswith((".tar.gz", ".tgz", ".tar")):
            with tarfile.open(archive_path) as tf:
                # filter='data' rejects path-traversal members and matches
                # the Python 3.14 default (review fix)
                tf.extractall(dest, filter="data")
        else:
            raise ValueError(f"Unknown File Type: {basename(archive_path)}.")
        return dest

    def get(self, save_path: str, dataset: Optional[str] = None,
            archive_path: Optional[str] = None) -> str:
        """Download (or just extract) a dataset; returns the dataset dir.

        Args:
          save_path: directory to save into.
          dataset: archive name on the index (skips the interactive menu).
          archive_path: pre-downloaded local archive — extract only.
        """
        if archive_path:
            self.extract(archive_path, save_path)
            base = basename(archive_path)
        else:
            if dataset is None:
                selected = self._present_options()
            else:
                selected = dataset
            self._download_data(f"{self.url}/{selected}", save_path)
            base = selected
        return join(save_path,
                    base.replace(".tar.gz", "").replace(".zip", ""))
