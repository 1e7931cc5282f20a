"""Hub-style model factories + input-robust inference wrapper.

reference hubconf.py:22-119 factories and models/common.py:605-765
(autoShape / Detections): accept filenames, PIL images, numpy arrays, or
batches; letterbox, infer, NMS, and unmap coordinates; return a
:class:`Detections` result object with print/show/save/pandas/tolist.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import numpy as np

from .data.letterbox import letterbox
from .engine import Engine
from .utils.boxes import xyxy2xywh
from .utils.general import increment_path


def create(name: str, pretrained: Optional[str] = None, channels: int = 3,
           classes: int = 80, autoshape: bool = True):
    """Build a model by zoo name; optionally load weights and wrap with
    AutoShape (reference hubconf.py:22-48: channels/classes reshape the
    model; pretrained weights are intersected into it)."""
    if channels == 3 and classes in (80, None):
        eng = Engine(pretrained if pretrained and os.path.exists(pretrained)
                     else None, cfg=name)
        return AutoShape(eng) if autoshape else eng
    from .models.config import load_spec
    from .models.model import init_model
    from .utils import checkpoint as ckpt_lib

    spec = load_spec(name, ch=channels, nc=classes or 80)
    params, state = init_model(spec)
    if pretrained and os.path.exists(pretrained):
        if pretrained.endswith(".pt"):
            p_new, s_new, _ = ckpt_lib.load_pt(pretrained)
        else:
            tree = ckpt_lib.load_npz(pretrained)
            p_new, s_new = (tree.get("ema_params") or tree["params"],
                            tree.get("ema_state") or tree["state"])
        params, _ = ckpt_lib.intersect_load(params, p_new)
        state, _ = ckpt_lib.intersect_load(state, s_new)
    eng = Engine(None, spec=spec, params=params, state=state)
    return AutoShape(eng) if autoshape else eng


def custom(path_or_model: str, autoshape: bool = True):
    """Load a custom checkpoint (reference hubconf.py custom())."""
    eng = Engine(path_or_model)
    return AutoShape(eng) if autoshape else eng


def _factory(name):
    def f(pretrained=None, channels=3, classes=None, autoshape=True):
        return create(name, pretrained, channels, classes or 80, autoshape)
    f.__name__ = name
    return f


yolov5s = _factory("yolov5s")
yolov5m = _factory("yolov5m")
yolov5l = _factory("yolov5l")
yolov5x = _factory("yolov5x")
yolov5s6 = _factory("yolov5s6")
yolov5m6 = _factory("yolov5m6")
yolov5l6 = _factory("yolov5l6")
yolov5x6 = _factory("yolov5x6")
yolov5s_city_seg = _factory("yolov5s_city_seg")
yolov5m_city_seg = _factory("yolov5m_city_seg")


class AutoShape:
    """Input-robust wrapper (reference models/common.py:605-672)."""

    conf = 0.25
    iou = 0.45
    classes = None

    def __init__(self, engine: Engine):
        self.engine = engine
        self.names = engine.names

    def __call__(self, imgs, size: int = 640, augment: bool = False):
        from PIL import Image

        n, items = (len(imgs), list(imgs)) if isinstance(imgs, list) else (1, [imgs])
        shape0, files, loaded = [], [], []
        for i, im in enumerate(items):
            f = f"image{i}"
            if isinstance(im, str):
                f = im
                im = np.asarray(Image.open(im).convert("RGB"))
            elif Image is not None and isinstance(im, Image.Image):
                f = getattr(im, "filename", f) or f
                im = np.asarray(im.convert("RGB"))
            im = np.asarray(im)
            if im.shape[0] < 5:  # CHW -> HWC
                im = im.transpose(1, 2, 0)
            im = im[:, :, :3] if im.ndim == 3 else np.tile(im[:, :, None], 3)
            files.append(Path(f).with_suffix(".jpg").name)
            shape0.append(im.shape[:2])
            loaded.append(im)
        stride = self.engine.stride
        g = [size / max(s) for s in shape0]
        shape1 = np.ceil(np.array(
            [[s[0] * gi, s[1] * gi] for s, gi in zip(shape0, g)]).max(0)
            / stride).astype(int) * stride
        batch = np.stack([
            letterbox(im, tuple(shape1), auto=False)[0] for im in loaded], 0)

        # group images by original size: each group runs ONE batched device
        # call (the coordinate unmap is per-orig-shape, so same-size images —
        # the common case — batch exactly; reference autoShape runs one
        # batched forward, common.py:649)
        dets_all: list = [None] * n
        masks_all: list = [None] * n
        groups: dict = {}
        for i, s in enumerate(shape0):
            groups.setdefault(tuple(s), []).append(i)
        for s, idxs in groups.items():
            d, m = self.engine(batch[idxs], s, conf=self.conf, iou=self.iou,
                               classes=self.classes, augment=augment)
            for j, i in enumerate(idxs):
                dets_all[i] = d[j]
                masks_all[i] = m[j]
        return Detections(loaded, dets_all, files, names=self.names,
                          masks=masks_all)


class Detections:
    """Result container (reference models/common.py:675-752)."""

    def __init__(self, imgs, pred, files, names=None, masks=None):
        self.imgs = imgs
        self.pred = pred
        self.files = files
        self.names = names or []
        self.masks = masks
        gn = [np.array([im.shape[1], im.shape[0], im.shape[1], im.shape[0],
                        1.0, 1.0]) for im in imgs]
        self.xyxy = pred
        self.xywh = [np.concatenate([np.asarray(xyxy2xywh(x[:, :4])), x[:, 4:]], 1)
                     if len(x) else x for x in pred]
        self.xyxyn = [x / g if len(x) else x for x, g in zip(self.xyxy, gn)]
        self.xywhn = [x / g if len(x) else x for x, g in zip(self.xywh, gn)]
        self.n = len(pred)

    def display(self, pprint=False, show=False, save=False, render=False,
                save_dir=""):
        from .utils.plots import color_list, plot_one_box

        colors = color_list()
        for i, (img, pred) in enumerate(zip(self.imgs, self.pred)):
            s = f"image {i + 1}/{self.n}: {img.shape[0]}x{img.shape[1]} "
            if pred is not None and len(pred):
                for c in np.unique(pred[:, -1]):
                    nc_ = int((pred[:, -1] == c).sum())
                    s += f"{nc_} {self.names[int(c)]}{'s' * (nc_ > 1)}, "
                if show or save or render:
                    img = np.ascontiguousarray(img)
                    for *box, conf, cls in pred:
                        label = f"{self.names[int(cls)]} {conf:.2f}"
                        plot_one_box(box, img, label=label,
                                     color=colors[int(cls) % 10])
                    self.imgs[i] = img
            if pprint:
                print(s.rstrip(", "))
            if save:
                from PIL import Image
                Path(save_dir).mkdir(parents=True, exist_ok=True)
                Image.fromarray(self.imgs[i].astype(np.uint8)).save(
                    Path(save_dir) / self.files[i])
            if show:
                from PIL import Image
                Image.fromarray(self.imgs[i].astype(np.uint8)).show(self.files[i])

    def print(self):
        self.display(pprint=True)

    def show(self):
        self.display(show=True)

    def save(self, save_dir="runs/hub/exp"):
        save_dir = increment_path(save_dir, exist_ok=save_dir != "runs/hub/exp")
        self.display(save=True, save_dir=save_dir)

    def render(self):
        self.display(render=True)
        return self.imgs

    def pandas(self):
        import copy
        import pandas as pd

        new = copy.copy(self)
        ca = "xmin", "ymin", "xmax", "ymax", "confidence", "class", "name"
        cb = "xcenter", "ycenter", "width", "height", "confidence", "class", "name"
        for k, c in zip(["xyxy", "xyxyn", "xywh", "xywhn"], [ca, ca, cb, cb]):
            a = [[list(x[:5]) + [int(x[5]), self.names[int(x[5])]]
                  for x in arr.tolist()] for arr in getattr(self, k)]
            setattr(new, k, [pd.DataFrame(x, columns=c) for x in a])
        return new

    def tolist(self):
        return [Detections([self.imgs[i]], [self.pred[i]], [self.files[i]],
                           self.names,
                           [self.masks[i]] if self.masks else None)
                for i in range(self.n)]

    def __len__(self):
        return self.n
