"""Detection dataset + host input pipeline (reference utils/datasets.py:347-991).

torch-free re-implementation: numpy/cv2 on host CPU worker threads feeding the
device with ready-to-jit batches — stacked uint8 NHWC images plus targets
padded to a static (B, T, 5) lattice (XLA needs static shapes; the reference's
variable-length collate_fn concat is replaced by pad+mask).

Faithful semantics: file/txt/glob discovery, label .cache (npz keyed by the
same size-hash), rect-batch aspect-ratio binning, RAM image cache, mosaic4/9,
mixup beta(8,8), random_perspective with box_candidates filtering, HSV LUT
augmentation, flips, cutout.
"""

from __future__ import annotations

import glob
import hashlib
import math
import os
import random
import threading
import queue as queue_mod
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..utils.boxes import xywhn2xyxy, xyxy2xywh
from .letterbox import letterbox

IMG_FORMATS = ("bmp", "jpg", "jpeg", "png", "tif", "tiff", "dng", "webp", "mpo")
CACHE_VERSION = "tpu-0.1"


def img2label_paths(img_paths: List[str]) -> List[str]:
    sa, sb = os.sep + "images" + os.sep, os.sep + "labels" + os.sep
    return [sb.join(x.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt" for x in img_paths]


def get_hash(files: List[str]) -> str:
    total = sum(os.path.getsize(f) for f in files if os.path.isfile(f))
    return hashlib.md5(f"{total}:{len(files)}".encode()).hexdigest()


def exif_size(img) -> Tuple[int, int]:
    """(w, h) corrected for EXIF rotation (reference utils/datasets.py:43-56)."""
    s = img.size
    try:
        rotation = dict(img.getexif()).get(274)
        if rotation in (6, 8):
            s = (s[1], s[0])
    except Exception:
        pass
    return s


class DetectionDataset:
    """reference LoadImagesAndLabels."""

    def __init__(self, path, img_size=640, batch_size=16, augment=False,
                 hyp=None, rect=False, image_weights=False, cache_images=False,
                 single_cls=False, stride=32, pad=0.0, prefix=""):
        self.img_size = img_size
        self.augment = augment
        self.hyp = hyp or {}
        self.image_weights = image_weights
        self.rect = False if image_weights else rect
        self.mosaic = self.augment and not self.rect
        self.mosaic_border = [-img_size // 2, -img_size // 2]
        self.stride = stride

        f: List[str] = []
        for p in (path if isinstance(path, list) else [path]):
            p = Path(p)
            if p.is_dir():
                f += glob.glob(str(p / "**" / "*.*"), recursive=True)
            elif p.is_file():
                with open(p) as t:
                    lines = t.read().strip().splitlines()
                parent = str(p.parent) + os.sep
                f += [x.replace("./", parent) if x.startswith("./") else x
                      for x in lines]
            else:
                raise FileNotFoundError(f"{prefix}{p} does not exist")
        self.img_files = sorted(
            x for x in f if x.rsplit(".", 1)[-1].lower() in IMG_FORMATS)
        assert self.img_files, f"{prefix}No images found in {path}"
        self.label_files = img2label_paths(self.img_files)

        p0 = Path(path if isinstance(path, str) else path[0])
        cache_path = (p0 if p0.is_file()
                      else Path(self.label_files[0]).parent).with_suffix(".tpucache.npz")
        cache = None
        if cache_path.is_file():
            try:
                z = np.load(cache_path, allow_pickle=True)
                if (str(z["hash"]) == get_hash(self.label_files + self.img_files)
                        and str(z["version"]) == CACHE_VERSION):
                    cache = {"files": list(z["files"]),
                             "labels": list(z["labels"]),
                             "shapes": z["shapes"]}
            except Exception:
                cache = None
        if cache is None:
            cache = self._cache_labels(cache_path, prefix)

        self.img_files = cache["files"]
        self.label_files = img2label_paths(self.img_files)
        self.labels = [np.asarray(l, np.float32).reshape(-1, 5)
                       for l in cache["labels"]]
        self.shapes = np.asarray(cache["shapes"], np.float64)
        if single_cls:
            for x in self.labels:
                x[:, 0] = 0

        n = len(self.img_files)
        bi = np.floor(np.arange(n) / batch_size).astype(int)
        nb = int(bi[-1]) + 1
        self.batch = bi
        self.n = n
        self.indices = list(range(n))

        if self.rect:
            s = self.shapes  # (w, h)
            ar = s[:, 1] / s[:, 0]
            irect = ar.argsort()
            self.img_files = [self.img_files[i] for i in irect]
            self.label_files = [self.label_files[i] for i in irect]
            self.labels = [self.labels[i] for i in irect]
            self.shapes = s[irect]
            ar = ar[irect]
            shapes = [[1.0, 1.0]] * nb
            for i in range(nb):
                ari = ar[bi == i]
                mini, maxi = ari.min(), ari.max()
                if maxi < 1:
                    shapes[i] = [maxi, 1]
                elif mini > 1:
                    shapes[i] = [1, 1 / mini]
            self.batch_shapes = (np.ceil(
                np.array(shapes) * img_size / stride + pad) * stride).astype(int)

        self.imgs = [None] * n
        self.img_hw0 = [None] * n
        self.img_hw = [None] * n
        if cache_images:
            for i in range(n):
                self.imgs[i], self.img_hw0[i], self.img_hw[i] = self.load_image(i)

    def _cache_labels(self, path: Path, prefix: str = ""):
        from PIL import Image

        files, labels, shapes = [], [], []
        nf = nm = ne = nc = 0
        for im_file, lb_file in zip(self.img_files, self.label_files):
            try:
                im = Image.open(im_file)
                im.verify()
                shape = exif_size(im)
                assert shape[0] > 9 and shape[1] > 9, f"image size {shape} <10px"
                if os.path.isfile(lb_file):
                    nf += 1
                    with open(lb_file) as fh:
                        rows = [x.split() for x in fh.read().strip().splitlines()]
                    if any(len(x) > 8 for x in rows):  # polygon segments -> boxes
                        cls = np.array([x[0] for x in rows], np.float32)
                        segs = [np.array(x[1:], np.float32).reshape(-1, 2)
                                for x in rows]
                        boxes = np.array([[s[:, 0].min(), s[:, 1].min(),
                                           s[:, 0].max(), s[:, 1].max()]
                                          for s in segs], np.float32)
                        l = np.concatenate(
                            [cls[:, None], np.asarray(xyxy2xywh(boxes))], 1)
                    else:
                        l = np.array(rows, np.float32)
                    if len(l):
                        assert l.shape[1] == 5, "labels require 5 columns"
                        assert (l >= 0).all(), "negative labels"
                        assert (l[:, 1:] <= 1).all(), "non-normalized coords"
                    else:
                        ne += 1
                        l = np.zeros((0, 5), np.float32)
                else:
                    nm += 1
                    l = np.zeros((0, 5), np.float32)
                files.append(im_file)
                labels.append(l)
                shapes.append(shape)
            except Exception as e:
                nc += 1
                print(f"{prefix}WARNING: ignoring corrupted {im_file}: {e}")
        print(f"{prefix}Scanned {len(files)} images: {nf} labels found, "
              f"{nm} missing, {ne} empty, {nc} corrupted")
        try:
            np.savez(path, files=np.array(files), shapes=np.array(shapes),
                     labels=np.array(labels, dtype=object),
                     hash=get_hash(self.label_files + self.img_files),
                     version=CACHE_VERSION)
        except Exception:
            pass
        return {"files": files, "labels": labels, "shapes": shapes}

    def __len__(self):
        return self.n

    # -- image/aug primitives ------------------------------------------------

    def load_image(self, index):
        img = self.imgs[index]
        if img is not None:
            return img, self.img_hw0[index], self.img_hw[index]
        path = self.img_files[index]
        img = cv2.imread(path)
        assert img is not None, "Image Not Found " + path
        h0, w0 = img.shape[:2]
        r = self.img_size / max(h0, w0)
        if r != 1:
            interp = cv2.INTER_AREA if r < 1 and not self.augment else cv2.INTER_LINEAR
            img = cv2.resize(img, (int(w0 * r), int(h0 * r)), interpolation=interp)
        return img, (h0, w0), img.shape[:2]

    def load_mosaic(self, index):
        labels4 = []
        s = self.img_size
        yc, xc = (int(random.uniform(-x, 2 * s + x)) for x in self.mosaic_border)
        indices = [index] + random.choices(self.indices, k=3)
        img4 = None
        for i, idx in enumerate(indices):
            img, _, (h, w) = self.load_image(idx)
            if i == 0:
                img4 = np.full((s * 2, s * 2, img.shape[2]), 114, np.uint8)
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
            elif i == 1:
                x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
                x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
            elif i == 2:
                x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
            else:
                x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
            img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            padw, padh = x1a - x1b, y1a - y1b
            labels = self.labels[idx].copy()
            if labels.size:
                labels[:, 1:] = np.asarray(
                    xywhn2xyxy(labels[:, 1:], w, h, padw, padh))
            labels4.append(labels)
        labels4 = np.concatenate(labels4, 0)
        np.clip(labels4[:, 1:], 0, 2 * s, out=labels4[:, 1:])
        return random_perspective(
            img4, labels4,
            degrees=self.hyp.get("degrees", 0), translate=self.hyp.get("translate", 0.1),
            scale=self.hyp.get("scale", 0.5), shear=self.hyp.get("shear", 0),
            perspective=self.hyp.get("perspective", 0.0), border=self.mosaic_border)

    def load_mosaic9(self, index):
        """9-image mosaic (reference utils/datasets.py:727-798)."""
        labels9 = []
        s = self.img_size
        indices = [index] + random.choices(self.indices, k=8)
        img9 = None
        hp = wp = -1
        for i, idx in enumerate(indices):
            img, _, (h, w) = self.load_image(idx)
            if i == 0:  # center
                img9 = np.full((s * 3, s * 3, img.shape[2]), 114, np.uint8)
                h0, w0 = h, w
                c = s, s, s + w, s + h
            elif i == 1:  # top
                c = s, s - h, s + w, s
            elif i == 2:  # top right
                c = s + wp, s - h, s + wp + w, s
            elif i == 3:  # right
                c = s + w0, s, s + w0 + w, s + h
            elif i == 4:  # bottom right
                c = s + w0, s + hp, s + w0 + w, s + hp + h
            elif i == 5:  # bottom
                c = s + w0 - w, s + h0, s + w0, s + h0 + h
            elif i == 6:  # bottom left
                c = s + w0 - wp - w, s + h0, s + w0 - wp, s + h0 + h
            elif i == 7:  # left
                c = s - w, s + h0 - h, s, s + h0
            else:  # top left
                c = s - w, s + h0 - hp - h, s, s + h0 - hp
            padx, pady = c[:2]
            x1, y1, x2, y2 = (max(x, 0) for x in c)
            labels = self.labels[idx].copy()
            if labels.size:
                labels[:, 1:] = np.asarray(
                    xywhn2xyxy(labels[:, 1:], w, h, padx, pady))
            labels9.append(labels)
            img9[y1:y2, x1:x2] = img[y1 - pady:, x1 - padx:][:y2 - y1, :x2 - x1]
            hp, wp = h, w
        yc, xc = (int(random.uniform(0, s)) for _ in self.mosaic_border)
        img9 = img9[yc:yc + 2 * s, xc:xc + 2 * s]
        labels9 = np.concatenate(labels9, 0)
        if len(labels9):
            labels9[:, [1, 3]] -= xc
            labels9[:, [2, 4]] -= yc
            np.clip(labels9[:, 1:], 0, 2 * s, out=labels9[:, 1:])
        return random_perspective(
            img9, labels9,
            degrees=self.hyp.get("degrees", 0), translate=self.hyp.get("translate", 0.1),
            scale=self.hyp.get("scale", 0.5), shear=self.hyp.get("shear", 0),
            perspective=self.hyp.get("perspective", 0.0), border=self.mosaic_border)

    def __getitem__(self, index):
        index = self.indices[index]
        hyp = self.hyp
        mosaic = self.mosaic and random.random() < hyp.get("mosaic", 0)
        shapes = None
        if mosaic:
            img, labels = self.load_mosaic(index)
            if random.random() < hyp.get("mixup", 0):
                img2, labels2 = self.load_mosaic(random.randint(0, self.n - 1))
                r = np.random.beta(8.0, 8.0)
                img = (img * r + img2 * (1 - r)).astype(np.uint8)
                labels = np.concatenate((labels, labels2), 0)
        else:
            img, (h0, w0), (h, w) = self.load_image(index)
            shape = self.batch_shapes[self.batch[index]] if self.rect else self.img_size
            img, ratio, pad = letterbox(img, shape, auto=False,
                                        scaleup=self.augment)
            shapes = (h0, w0), ((h / h0, w / w0), pad)
            labels = self.labels[index].copy()
            if labels.size:
                labels[:, 1:] = np.asarray(xywhn2xyxy(
                    labels[:, 1:], ratio[0] * w, ratio[1] * h,
                    padw=pad[0], padh=pad[1]))

        if self.augment:
            if not mosaic:
                img, labels = random_perspective(
                    img, labels, degrees=hyp.get("degrees", 0),
                    translate=hyp.get("translate", 0.1),
                    scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0),
                    perspective=hyp.get("perspective", 0.0))
            augment_hsv(img, hyp.get("hsv_h", 0.015), hyp.get("hsv_s", 0.7),
                        hyp.get("hsv_v", 0.4))

        nl = len(labels)
        if nl:
            labels[:, 1:5] = np.asarray(xyxy2xywh(labels[:, 1:5]))
            labels[:, [2, 4]] /= img.shape[0]
            labels[:, [1, 3]] /= img.shape[1]
        if self.augment:
            if random.random() < hyp.get("flipud", 0):
                img = np.flipud(img)
                if nl:
                    labels[:, 2] = 1 - labels[:, 2]
            if random.random() < hyp.get("fliplr", 0):
                img = np.fliplr(img)
                if nl:
                    labels[:, 1] = 1 - labels[:, 1]

        img = np.ascontiguousarray(img[:, :, ::-1])  # BGR->RGB, keep HWC
        return img, labels.astype(np.float32), self.img_files[index], shapes


def random_perspective(img, targets=(), degrees=10, translate=0.1, scale=0.1,
                       shear=10, perspective=0.0, border=(0, 0)):
    """reference utils/datasets.py:851-937 (box path; segments handled at
    cache time by converting polygons to boxes)."""
    height = img.shape[0] + border[0] * 2
    width = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2
    P = np.eye(3)
    P[2, 0] = random.uniform(-perspective, perspective)
    P[2, 1] = random.uniform(-perspective, perspective)
    R = np.eye(3)
    a = random.uniform(-degrees, degrees)
    s = random.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = math.tan(random.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(random.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = random.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = random.uniform(0.5 - translate, 0.5 + translate) * height
    M = T @ S @ R @ P @ C
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(width, height),
                                      borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(width, height),
                                 borderValue=(114, 114, 114))
    n = len(targets)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = targets[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.concatenate((x.min(1), y.min(1), x.max(1), y.max(1))).reshape(4, n).T
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        i = box_candidates(targets[:, 1:5].T * s, new.T)
        targets = targets[i]
        targets[:, 1:5] = new[i]
    return img, targets


def box_candidates(box1, box2, wh_thr=2, ar_thr=20, area_thr=0.1, eps=1e-16):
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & \
        (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def augment_hsv(img, hgain=0.5, sgain=0.5, vgain=0.5):
    """In-place HSV LUT jitter (reference utils/datasets.py:646-657)."""
    r = np.random.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
    x = np.arange(0, 256, dtype=np.int16)
    lut_hue = ((x * r[0]) % 180).astype(img.dtype)
    lut_sat = np.clip(x * r[1], 0, 255).astype(img.dtype)
    lut_val = np.clip(x * r[2], 0, 255).astype(img.dtype)
    img_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat),
                         cv2.LUT(val, lut_val))).astype(img.dtype)
    cv2.cvtColor(img_hsv, cv2.COLOR_HSV2BGR, dst=img)


def hist_equalize(img, clahe: bool = True, bgr: bool = False):
    """Histogram equalization on BGR/RGB uint8 (reference :647+ hist_equalize)."""
    yuv = cv2.cvtColor(img, cv2.COLOR_BGR2YUV if bgr else cv2.COLOR_RGB2YUV)
    if clahe:
        c = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
        yuv[:, :, 0] = c.apply(yuv[:, :, 0])
    else:
        yuv[:, :, 0] = cv2.equalizeHist(yuv[:, :, 0])
    return cv2.cvtColor(yuv, cv2.COLOR_YUV2BGR if bgr else cv2.COLOR_YUV2RGB)


def replicate(img, labels):
    """Replicate the smallest-half boxes into free corners (reference
    utils/datasets.py replicate())."""
    h, w = img.shape[:2]
    boxes = labels[:, 1:].astype(int)
    x1, y1, x2, y2 = boxes.T
    s = ((x2 - x1) + (y2 - y1)) / 2
    for i in s.argsort()[: round(s.size * 0.5)]:
        x1b, y1b, x2b, y2b = boxes[i]
        bh, bw = y2b - y1b, x2b - x1b
        yc, xc = int(random.uniform(0, h - bh)), int(random.uniform(0, w - bw))
        x1a, y1a, x2a, y2a = [xc, yc, xc + bw, yc + bh]
        img[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        labels = np.append(labels, [[labels[i, 0], x1a, y1a, x2a, y2a]], axis=0)
    return img, labels


def cutout(img, labels):
    """reference utils/datasets.py:948-991."""
    from ..utils.boxes import box_iou

    h, w = img.shape[:2]
    scales = [0.5] * 1 + [0.25] * 2 + [0.125] * 4 + [0.0625] * 8 + [0.03125] * 16
    for s in scales:
        mask_h = random.randint(1, int(h * s))
        mask_w = random.randint(1, int(w * s))
        xmin = max(0, random.randint(0, w) - mask_w // 2)
        ymin = max(0, random.randint(0, h) - mask_h // 2)
        xmax = min(w, xmin + mask_w)
        ymax = min(h, ymin + mask_h)
        img[ymin:ymax, xmin:xmax] = [random.randint(64, 191) for _ in range(3)]
        if len(labels) and s > 0.03:
            box = np.array([[xmin, ymin, xmax, ymax]], np.float32)
            ioa = _bbox_ioa(box[0], labels[:, 1:5])
            labels = labels[ioa < 0.60]
    return labels


def _bbox_ioa(box1, box2, eps=1e-9):
    b2x1, b2y1, b2x2, b2y2 = box2.T
    inter = (np.minimum(box1[2], b2x2) - np.maximum(box1[0], b2x1)).clip(0) * \
            (np.minimum(box1[3], b2y2) - np.maximum(box1[1], b2y1)).clip(0)
    return inter / ((b2x2 - b2x1) * (b2y2 - b2y1) + eps)


# ---------------------------------------------------------------------------
# Batched loader (replaces torch DataLoader + collate_fn)
# ---------------------------------------------------------------------------


class DetectionLoader:
    """Threaded prefetching loader yielding static-shape device-ready batches.

    Yields (imgs (B,H,W,3) uint8 RGB, targets (B,T,5), mask (B,T), paths,
    shapes).  ``shard`` / ``num_shards`` replace DistributedSampler for
    multi-host input (reference utils/datasets.py:76).
    """

    def __init__(self, dataset: DetectionDataset, batch_size: int,
                 max_targets: int = 128, shuffle: bool = False,
                 workers: int = 4, shard: int = 0, num_shards: int = 1,
                 drop_last: bool = True, seed: int = 0, quad: bool = False):
        self.ds = dataset
        self.bs = batch_size
        self.max_targets = max_targets
        self.quad = quad
        if quad and batch_size % 4:
            raise ValueError("quad=True requires batch_size divisible by 4")
        # rect mode letterboxes each image to its aspect-ratio bin's shape
        # (batch_shapes[ds.batch[i]]): batches must follow the dataset's
        # contiguous ar-sorted binning or np.stack gets mixed shapes.  The
        # reference never shuffles its DataLoader either (datasets.py:78-85
        # passes no shuffle; train-time randomness comes from mosaic).
        self.rect = bool(getattr(dataset, "rect", False))
        if self.rect and shuffle:
            shuffle = False
        self.shuffle = shuffle
        self.workers = max(1, workers)
        self.shard = shard
        self.num_shards = num_shards
        self.drop_last = drop_last
        self.epoch = 0
        self.seed = seed

    def _plan(self):
        """Per-epoch batch plan: list of index arrays, shard-local."""
        n = len(self.ds)
        idx = np.arange(n)
        if self.rect:
            # keep the dataset's bins intact (ds.batch maps index -> bin);
            # shard whole batches
            bins = np.asarray(self.ds.batch)
            nb = int(bins[-1]) + 1 if n else 0
            batches = [idx[bins == b] for b in range(nb)]
            if self.drop_last and nb > 1 and len(batches[-1]) < len(batches[0]):
                batches = batches[:-1]
            if self.num_shards > 1:
                # rect bins have variable sizes; whole-batch interleave is
                # only sound for independent per-host eval, not for a
                # lock-stepped global batch
                batches = batches[self.shard::self.num_shards]
            return batches
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        idx = idx[self.shard::self.num_shards]
        if self.num_shards > 1:
            # equal step counts on every host or collectives deadlock
            # (DistributedSampler pads instead, utils/datasets.py:76)
            idx = idx[: n // self.num_shards]
        nb = (len(idx) // self.bs if self.drop_last
              else math.ceil(len(idx) / self.bs))
        return [idx[i * self.bs:(i + 1) * self.bs] for i in range(nb)]

    def __len__(self):
        return len(self._plan())

    def set_image_weights(self, weights: np.ndarray):
        """reference train.py:303-316 image-weighted resampling."""
        n = len(self.ds)
        rng = np.random.RandomState(self.seed + self.epoch)
        self.ds.indices = list(rng.choice(n, size=n, p=weights / weights.sum()))

    def __iter__(self):
        batches = self._plan()
        self.epoch += 1
        # Batches are assigned round-robin (worker w owns batches w, w+W, …)
        # and each worker has its own small bounded queue, so the consumer
        # reads batch k from queue k%W — ordered by construction, with real
        # backpressure (a slow worker can't let the others run ahead
        # unbounded).  Producers use timeout-put so abandoning the iterator
        # mid-epoch can't leave threads blocked forever.
        W = min(self.workers, max(1, len(batches)))
        qs = [queue_mod.Queue(maxsize=2) for _ in range(W)]
        stop = threading.Event()

        def produce(w):
            for bi in range(w, len(batches), W):
                try:  # propagate errors instead of hanging the consumer
                    payload = self._collate([self.ds[i] for i in batches[bi]])
                except Exception as e:  # (the reference's workers died
                    payload = e         # silently, README.md:157)
                while not stop.is_set():
                    try:
                        qs[w].put(payload, timeout=0.2)
                        break
                    except queue_mod.Full:
                        continue
                if stop.is_set() or isinstance(payload, Exception):
                    return

        threads = [threading.Thread(target=produce, args=(w,), daemon=True)
                   for w in range(W)]
        for t in threads:
            t.start()
        try:
            for k in range(len(batches)):
                batch = qs[k % W].get()
                if isinstance(batch, Exception):
                    raise batch
                yield batch
        finally:
            stop.set()

    def _quad(self, items):
        """collate_fn4 semantics (reference utils/datasets.py:601-625):
        fold groups of 4 items into one 2x-resolution item — either one
        image bilinearly upscaled 2x (p=0.5) or a 2x2 stitch of all four
        with labels offset/halved.  Yields len(items)//4 items."""
        if len(items) < 4:  # ragged drop_last=False tail (bs%4==0 is
            return items    # enforced at init): pass through un-folded
        out = []
        # label columns here are [cls, x, y, w, h] (normalized, no image
        # index — the batch dim is explicit); the reference's ho/wo offsets
        # on columns 3/2 map to y/x = columns 2/1
        ho = np.array([[0., 0, 1, 0, 0]], np.float32)   # below: y += 1
        wo = np.array([[0., 1, 0, 0, 0]], np.float32)   # right: x += 1
        s = np.array([[1, .5, .5, .5, .5]], np.float32)
        for g in range(len(items) // 4):
            i = g * 4
            img, lbl, path, shapes = items[i]
            h, w = img.shape[:2]
            if random.random() < 0.5:
                im = cv2.resize(img, (w * 2, h * 2),
                                interpolation=cv2.INTER_LINEAR)
                l = items[i][1]
            else:
                im = np.empty((h * 2, w * 2, img.shape[2]), img.dtype)
                im[:h, :w] = img
                im[h:, :w] = items[i + 1][0]
                im[:h, w:] = items[i + 2][0]
                im[h:, w:] = items[i + 3][0]
                l = np.concatenate(
                    [items[i][1], items[i + 1][1] + ho,
                     items[i + 2][1] + wo, items[i + 3][1] + ho + wo],
                    0) * s
            out.append((im, l, path, shapes))
        return out

    def _collate(self, items):
        if self.quad:
            items = self._quad(items)
        imgs = np.stack([it[0] for it in items], 0)
        B = len(items)
        targets = np.zeros((B, self.max_targets, 5), np.float32)
        mask = np.zeros((B, self.max_targets), bool)
        for i, it in enumerate(items):
            l = it[1]
            n = min(len(l), self.max_targets)
            if n:
                targets[i, :n] = l[:n]
                mask[i, :n] = True
        paths = [it[2] for it in items]
        shapes = [it[3] for it in items]
        return imgs, targets, mask, paths, shapes
