"""Dataset downloader end-to-end against a local HTTP server (the container
has no public egress; the flow itself — index scrape → download → extract →
cleanup — is the reference util/get_data.py:11-115 behavior)."""

import http.server
import io
import os
import tarfile
import threading
import zipfile

import numpy as np
import pytest

from cycle_depth_estimation_tpu.utils.get_data import GetData


@pytest.fixture()
def dataset_server(tmp_path):
    root = tmp_path / "www"
    root.mkdir()
    # a zip dataset
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("maps/trainA/a.txt", "A")
        zf.writestr("maps/trainB/b.txt", "B")
    (root / "maps.zip").write_bytes(zbuf.getvalue())
    # a tar.gz dataset
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as tf:
        data = b"hello"
        info = tarfile.TarInfo("horses/img.txt")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    (root / "horses.tar.gz").write_bytes(tbuf.getvalue())
    # a pix2pix-style tar.gz under a name on the published list
    fbuf = io.BytesIO()
    with tarfile.open(fileobj=fbuf, mode="w:gz") as tf:
        data = b"F"
        info = tarfile.TarInfo("facades/train/1.txt")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    (root / "facades.tar.gz").write_bytes(fbuf.getvalue())
    (root / "index.html").write_text(
        '<html><body><a href="maps.zip">maps.zip</a> '
        '<a href="horses.tar.gz">horses.tar.gz</a> '
        '<a href="README">README</a> <a>no-href.zip</a></body></html>')

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path in ("", "/"):
                self.path = "/index.html"
            return super().do_GET()

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_get_data_scrape_and_download(dataset_server, tmp_path):
    gd = GetData(base_url=dataset_server, verbose=False)
    out = gd.get(str(tmp_path / "datasets"), dataset="maps.zip")
    assert out.endswith("maps")
    assert os.path.exists(os.path.join(tmp_path, "datasets", "maps",
                                       "trainA", "a.txt"))
    # archive removed after extraction (reference behavior)
    assert not os.path.exists(os.path.join(tmp_path, "datasets", "maps.zip"))


def test_get_data_targz_and_menu(dataset_server, tmp_path, monkeypatch):
    gd = GetData(base_url=dataset_server, verbose=False)
    # interactive path: menu lists only archive anchors; pick index 1
    monkeypatch.setattr("builtins.input", lambda *_: "1")
    out = gd.get(str(tmp_path / "d2"))
    assert out.endswith("horses")
    assert os.path.exists(os.path.join(tmp_path, "d2", "horses", "img.txt"))


def test_get_data_local_archive(tmp_path):
    zpath = tmp_path / "x.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("x/f.txt", "1")
    gd = GetData(verbose=False)
    out = gd.get(str(tmp_path / "out"), archive_path=str(zpath))
    assert os.path.exists(os.path.join(tmp_path, "out", "x", "f.txt"))
    assert out.endswith("x")


def test_get_data_option_scrape():
    html = ('<a href="u">a.zip</a><a href="v">b.tar.gz</a>'
            '<a href="w">notes.txt</a><a>c.zip</a>')
    assert GetData._get_options(html) == ["a.zip", "b.tar.gz"]


# --- tools/download_dataset.py: the download_*.sh CLI equivalents ---------


def test_download_dataset_cyclegan_zip(dataset_server, tmp_path):
    from tools.download_dataset import main
    rc = main(["cyclegan", "maps", "--save_path", str(tmp_path / "ds"),
               "--base_url", dataset_server])
    assert rc == 0
    assert os.path.exists(os.path.join(tmp_path, "ds", "maps", "trainA",
                                       "a.txt"))
    assert not os.path.exists(os.path.join(tmp_path, "ds", "maps.zip"))


def test_download_dataset_pix2pix_targz(dataset_server, tmp_path):
    from tools.download_dataset import main
    rc = main(["pix2pix", "facades", "--save_path", str(tmp_path / "ds"),
               "--base_url", dataset_server])
    assert rc == 0
    assert os.path.exists(os.path.join(tmp_path, "ds", "facades", "train",
                                       "1.txt"))


def test_download_dataset_rejects_unknown_name(capsys, tmp_path):
    from tools.download_dataset import main
    # reference shell behavior: list the published names, exit 1, no fetch
    rc = main(["cyclegan", "nope", "--save_path", str(tmp_path / "ds")])
    assert rc == 1
    msg = capsys.readouterr().out
    assert msg.startswith("Available datasets are: apple2orange,")
    assert msg.strip().endswith("ae_photos")
    rc = main(["pix2pix", "horse2zebra", "--save_path", str(tmp_path / "ds")])
    assert rc == 1  # valid cyclegan name is still invalid for pix2pix
    assert "night2day" in capsys.readouterr().out


def test_download_dataset_local_archive(tmp_path):
    from tools.download_dataset import main
    zpath = tmp_path / "maps.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("maps/trainB/b.txt", "B")
    rc = main(["cyclegan", "maps", "--save_path", str(tmp_path / "ds"),
               "--archive", str(zpath)])
    assert rc == 0
    assert os.path.exists(os.path.join(tmp_path, "ds", "maps", "trainB",
                                       "b.txt"))
