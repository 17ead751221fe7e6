"""Training/inference visualization + loss logging.

Re-design of reference util/visualizer.py:17-169: console loss printer,
``loss_log.txt`` appender, HTML galleries of current visuals, and
``save_images`` for the test CLI. The visdom path of the reference is
constructor-disabled there (visualizer.py:50-53) and intentionally absent
here; scalar time-series go to a JSONL file instead (TPU-friendly: no
display server).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np

from .html import HTML
from .images import label2im, save_image, tensor2im


def save_images(webpage: HTML, visuals: Dict[str, np.ndarray], image_path: str,
                aspect_ratio: float = 1.0, width: int = 256):
    """Write one sample's visuals into a webpage gallery
    (reference util/visualizer.py:17-39)."""
    image_dir = webpage.get_image_dir()
    short_path = os.path.basename(image_path)
    name = os.path.splitext(short_path)[0]
    webpage.add_header(name)
    ims, txts, links = [], [], []
    for label, im_data in visuals.items():
        im = tensor2im(im_data)
        # reference stretches saved images by aspect_ratio with bicubic
        # (util/visualizer.py:30-34; review fix — the knob was ignored)
        h, w = im.shape[:2]
        if aspect_ratio > 1.0 or aspect_ratio < 1.0:
            from PIL import Image

            tw = int(w * aspect_ratio) if aspect_ratio > 1.0 else w
            th = h if aspect_ratio > 1.0 else int(h / aspect_ratio)
            im = np.asarray(
                Image.fromarray(im).resize((tw, th), Image.BICUBIC))
        image_name = f"{name}_{label}.png"
        save_image(im, os.path.join(image_dir, image_name))
        ims.append(image_name)
        txts.append(label)
        links.append(image_name)
    webpage.add_images(ims, txts, links, width=width)


class Visualizer:
    def __init__(self, cfg):
        self.cfg = cfg
        self.name = cfg.name
        self.web_dir = os.path.join(cfg.checkpoints_dir, cfg.name, "web")
        self.img_dir = os.path.join(self.web_dir, "images")
        os.makedirs(self.img_dir, exist_ok=True)
        self.log_name = os.path.join(cfg.checkpoints_dir, cfg.name, "loss_log.txt")
        self.scalar_log = os.path.join(cfg.checkpoints_dir, cfg.name, "scalars.jsonl")
        with open(self.log_name, "a") as fh:
            now = time.strftime("%c")
            fh.write(f"================ Training Loss ({now}) ================\n")

    def display_current_results(self, visuals: Dict[str, np.ndarray], epoch: int,
                                step: int = 0):
        for label, image in visuals.items():
            if "lab" in label or "seg" in label:
                im = label2im(image)
            else:
                im = tensor2im(image)
            save_image(im, os.path.join(
                self.img_dir, f"epoch{epoch:03d}_{label}.png"))

    def log_scalars(self, epoch: int, iters: int, losses: Dict[str, float]):
        rec = {"epoch": epoch, "iters": iters, "t": time.time()}
        rec.update({k: float(v) for k, v in losses.items()})
        with open(self.scalar_log, "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    def print_current_losses(self, epoch: int, iters: int,
                             losses: Dict[str, float], t: float, t_data: float):
        """Console + loss_log.txt (reference util/visualizer.py:156-169)."""
        message = (f"(epoch: {epoch}, iters: {iters}, time: {t:.3f}, "
                   f"data: {t_data:.3f}) ")
        message += " ".join(f"{k}: {float(v):.3f}" for k, v in losses.items())
        print(message)
        with open(self.log_name, "a") as fh:
            fh.write(message + "\n")

    def save_html(self, epoch: int):
        webpage = HTML(self.web_dir, f"Experiment name = {self.name}", refresh=0)
        for n in range(epoch, 0, -1):
            webpage.add_header(f"epoch [{n}]")
            ims, txts, links = [], [], []
            for fname in sorted(os.listdir(self.img_dir)):
                if fname.startswith(f"epoch{n:03d}_"):
                    label = fname[len(f"epoch{n:03d}_"):-4]
                    ims.append(fname)
                    txts.append(label)
                    links.append(fname)
            if ims:
                webpage.add_images(ims, txts, links)
        webpage.save()
