"""Segmentation datasets + loaders (reference SegmentationDataset.py), torch-free.

Keeps the reference's exact transform semantics:
  * non-uniform long-side scale sampling — normal pdf over
    [low*base, high*base]/32 with mean base/32 - 4 (range_and_prob /
    get_long_size, reference :25-45)
  * train aug: flip + long-side resize + pad (img 0 / mask 255) + random crop
  * val: short-side resize + center crop; testval: long-side -> base_size
    /32-divisible, mask kept at original size
  * Cityscapes labelId -> trainId via the digitize key table; ignore = -1
  * ColorJitter(brightness/contrast/saturation/hue) with NO normalize
    (matches the detection /255 preprocessing, reference :458-480)

Outputs are numpy: img (H, W, 3) float32 in [0,1] RGB, mask (H, W) int32.
"""

from __future__ import annotations

import functools
import math
import os
import random
import threading
import queue as queue_mod
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

from ..ops.nn import make_divisible


@functools.lru_cache(128)
def range_and_prob(base_size: int, low: float = 0.5, high: float = 3.0,
                   std: int = 25):
    from scipy import stats

    lo = math.ceil((base_size * low) / 32)
    hi = math.ceil((base_size * high) / 32)
    mean = math.ceil(base_size / 32) - 4
    x = np.arange(lo, hi + 1)
    p = stats.norm.pdf(x, mean, std)
    p = p / p.sum()
    return x, np.cumsum(p)


def get_long_size(base_size: int, low: float = 0.5, high: float = 3.0,
                  std: int = 40) -> int:
    x, cum_p = range_and_prob(base_size, low, high, std)
    return random.choices(population=list(x), cum_weights=list(cum_p), k=1)[0] * 32


def color_jitter(img: Image.Image, brightness: float, contrast: float,
                 saturation: float, hue: float) -> Image.Image:
    """torchvision.transforms.ColorJitter semantics: each op applied in a
    random order with factor ~ U[max(0,1-v), 1+v] (hue ~ U[-h, h])."""
    ops = []
    if brightness > 0:
        f = random.uniform(max(0, 1 - brightness), 1 + brightness)
        ops.append(lambda im: ImageEnhance.Brightness(im).enhance(f))
    if contrast > 0:
        f2 = random.uniform(max(0, 1 - contrast), 1 + contrast)
        ops.append(lambda im: ImageEnhance.Contrast(im).enhance(f2))
    if saturation > 0:
        f3 = random.uniform(max(0, 1 - saturation), 1 + saturation)
        ops.append(lambda im: ImageEnhance.Color(im).enhance(f3))
    if hue > 0:
        h = random.uniform(-hue, hue)

        def hue_shift(im, h=h):
            hsv = np.array(im.convert("HSV"), np.uint8)
            hsv[..., 0] = (hsv[..., 0].astype(np.int16) + int(h * 255)) % 256
            return Image.fromarray(hsv, "HSV").convert("RGB")

        ops.append(hue_shift)
    random.shuffle(ops)
    for op in ops:
        img = op(img)
    return img


class BaseSegDataset:
    def __init__(self, root, split, mode=None, base_size=520, crop_size=480,
                 low=0.6, high=3.0, sample_std=25, jitter=None):
        self.root = root
        self.split = split
        self.mode = mode if mode is not None else split
        self.base_size = base_size
        self.crop_size = crop_size if isinstance(crop_size, tuple) else (crop_size, crop_size)
        self.low = low
        self.high = high
        self.sample_std = sample_std
        self.jitter = jitter  # (b, c, s, h) or None

    def _testval_img_transform(self, img: Image.Image) -> Image.Image:
        w, h = img.size
        outlong = make_divisible(self.base_size, 32)
        if w > h:
            ow = outlong
            oh = make_divisible(int(1.0 * h * ow / w), 32)
        else:
            oh = outlong
            ow = make_divisible(int(1.0 * w * oh / h), 32)
        return img.resize((ow, oh), Image.BILINEAR)

    def _val_sync_transform(self, img, mask):
        outsize = self.crop_size[0] if isinstance(self.crop_size, tuple) else self.crop_size
        if isinstance(self.crop_size, tuple) and self.crop_size[0] != self.crop_size[1]:
            outsize = self.crop_size[1]  # square center crop of the short side
        short_size = outsize
        w, h = img.size
        if w > h:
            oh = short_size
            ow = int(1.0 * w * oh / h)
        else:
            ow = short_size
            oh = int(1.0 * h * ow / w)
        img = img.resize((ow, oh), Image.BILINEAR)
        mask = mask.resize((ow, oh), Image.NEAREST)
        w, h = img.size
        x1 = int(round((w - outsize) / 2.0))
        y1 = int(round((h - outsize) / 2.0))
        img = img.crop((x1, y1, x1 + outsize, y1 + outsize))
        mask = mask.crop((x1, y1, x1 + outsize, y1 + outsize))
        return img, mask

    def _sync_transform(self, img, mask):
        if random.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
            mask = mask.transpose(Image.FLIP_LEFT_RIGHT)
        w_crop, h_crop = self.crop_size
        w, h = img.size
        long_size = get_long_size(self.base_size, self.low, self.high,
                                  self.sample_std)
        if h > w:
            oh = long_size
            ow = int(1.0 * w * long_size / h + 0.5)
        else:
            ow = long_size
            oh = int(1.0 * h * long_size / w + 0.5)
        img = img.resize((ow, oh), Image.BILINEAR)
        mask = mask.resize((ow, oh), Image.NEAREST)
        if ow < w_crop or oh < h_crop:
            padh = h_crop - oh if oh < h_crop else 0
            padw = w_crop - ow if ow < w_crop else 0
            img = ImageOps.expand(img, border=(0, 0, padw, padh), fill=0)
            mask = ImageOps.expand(mask, border=(0, 0, padw, padh), fill=255)
        w, h = img.size
        x1 = random.randint(0, w - w_crop)
        y1 = random.randint(0, h - h_crop)
        img = img.crop((x1, y1, x1 + w_crop, y1 + h_crop))
        mask = mask.crop((x1, y1, x1 + w_crop, y1 + h_crop))
        return img, mask

    def _finish_img(self, img: Image.Image) -> np.ndarray:
        if self.mode == "train" and self.jitter:
            img = color_jitter(img, *self.jitter)
        return np.asarray(img, np.float32) / 255.0

    def __len__(self):
        return len(self.images)


class CitySegmentation(BaseSegDataset):
    """Cityscapes gtFine (labelId annotations)."""

    NUM_CLASS = 19

    def __init__(self, root="data/citys/", split="train", mode=None, **kw):
        super().__init__(root, split, mode, **kw)
        self.images, self.mask_paths = get_city_pairs(self.root, self.split)
        assert len(self.images) == len(self.mask_paths)
        if not self.images:
            raise RuntimeError(f"Found 0 images in {self.root}")
        # labelId -> trainId (reference SegmentationDataset.py:174-182)
        self._key = np.array([-1, -1, -1, -1, -1, -1,
                              -1, -1, 0, 1, -1, -1,
                              2, 3, 4, -1, -1, -1,
                              5, -1, 6, 7, 8, 9,
                              10, 11, 12, 13, 14, 15,
                              -1, -1, 16, 17, 18])
        self._mapping = np.arange(-1, len(self._key) - 1).astype("int32")

    def _class_to_index(self, mask: np.ndarray) -> np.ndarray:
        mask[mask == 255] = 0  # pad fill -> id 0 -> trainId -1
        index = np.digitize(mask.ravel(), self._mapping, right=True)
        return self._key[index].reshape(mask.shape)

    def _mask_transform(self, mask: Image.Image) -> np.ndarray:
        return self._class_to_index(np.array(mask).astype("int32"))

    def __getitem__(self, index):
        img = Image.open(self.images[index]).convert("RGB")
        if self.mode == "test":
            return self._finish_img(self._testval_img_transform(img)), \
                os.path.basename(self.images[index])
        mask = Image.open(self.mask_paths[index])
        if self.mode == "train":
            img, mask = self._sync_transform(img, mask)
        elif self.mode == "val":
            img, mask = self._val_sync_transform(img, mask)
        else:
            assert self.mode == "testval"
            img = self._testval_img_transform(img)
        return self._finish_img(img), self._mask_transform(mask)


class CityBddSegmentation(CitySegmentation):
    """Cityscapes + BDD100k mix: BDD images are .jpg with trainId .png masks
    (255 -> -1 only); Cityscapes .png masks get the id->trainId conversion
    (reference SegmentationDataset.py:236-324)."""

    def __init__(self, root="data/citys/", split="train", mode=None,
                 NUM_CLASS=19, **kw):
        super().__init__(root, split, mode, **kw)
        self.NUM_CLASS = NUM_CLASS

    def __getitem__(self, index):
        img = Image.open(self.images[index]).convert("RGB")
        is_bdd = self.images[index].endswith(".jpg")
        mask = Image.open(self.mask_paths[index])
        if self.mode == "train":
            img, mask = self._sync_transform(img, mask)
        elif self.mode == "val":
            img, mask = self._val_sync_transform(img, mask)
        else:
            assert self.mode == "testval"
            img = self._testval_img_transform(img)
        m = np.array(mask).astype("int32")
        if is_bdd:
            m[m == 255] = -1  # already trainId
        else:
            m = self._class_to_index(m)
        return self._finish_img(img), m


class CustomSegmentation(BaseSegDataset):
    """User datasets already in trainId format; 255 -> -1
    (reference SegmentationDataset.py:327-373)."""

    def __init__(self, root="data/", split="train", mode=None, NUM_CLASS=2, **kw):
        super().__init__(root, split, mode, **kw)
        self.NUM_CLASS = NUM_CLASS
        self.images, self.mask_paths = get_custom_pairs(self.root, self.split)
        if not self.images:
            raise RuntimeError(f"Found 0 images in {self.root}")

    def __getitem__(self, index):
        img = Image.open(self.images[index]).convert("RGB")
        mask = Image.open(self.mask_paths[index])
        if self.mode == "train":
            img, mask = self._sync_transform(img, mask)
        elif self.mode == "val":
            img, mask = self._val_sync_transform(img, mask)
        else:
            assert self.mode == "testval"
            img = self._testval_img_transform(img)
        m = np.array(mask).astype("int32")
        m[m == 255] = -1
        return self._finish_img(img), m


def get_city_pairs(folder: str, split: str = "train"):
    def pairs(img_folder, mask_folder):
        img_paths, mask_paths = [], []
        for root, _, files in os.walk(img_folder):
            for filename in files:
                if filename.endswith((".png", ".jpg")):
                    imgpath = os.path.join(root, filename)
                    foldername = os.path.basename(os.path.dirname(imgpath))
                    maskname = filename.replace("leftImg8bit", "gtFine_labelIds")
                    if filename.endswith(".jpg"):
                        maskname = maskname.replace(".jpg", ".png")
                    maskpath = os.path.join(mask_folder, foldername, maskname)
                    if os.path.isfile(imgpath) and os.path.isfile(maskpath):
                        img_paths.append(imgpath)
                        mask_paths.append(maskpath)
                    else:
                        print("cannot find the mask or image:", imgpath, maskpath)
        return sorted(img_paths), sorted(mask_paths)

    if split in ("train", "val", "test"):
        return pairs(os.path.join(folder, "leftImg8bit", split),
                     os.path.join(folder, "gtFine", split))
    assert split == "trainval"
    a = pairs(os.path.join(folder, "leftImg8bit/train"), os.path.join(folder, "gtFine/train"))
    b = pairs(os.path.join(folder, "leftImg8bit/val"), os.path.join(folder, "gtFine/val"))
    return a[0] + b[0], a[1] + b[1]


def get_custom_pairs(folder: str, split: str = "train"):
    def pairs(img_folder, mask_folder):
        img_paths, mask_paths = [], []
        for root, _, files in os.walk(img_folder):
            for filename in files:
                if filename.endswith((".png", ".jpg")):
                    imgpath = os.path.join(root, filename)
                    maskname = filename.replace("segimages", "seglabels")
                    if filename.endswith(".jpg"):
                        maskname = maskname.replace(".jpg", ".png")
                    maskpath = os.path.join(mask_folder, maskname)
                    if os.path.isfile(imgpath) and os.path.isfile(maskpath):
                        img_paths.append(imgpath)
                        mask_paths.append(maskpath)
                    else:
                        print("cannot find the mask or image:", imgpath, maskpath)
        return sorted(img_paths), sorted(mask_paths)

    assert split in ("train", "val", "test")
    return pairs(os.path.join(folder, "segimages", split),
                 os.path.join(folder, "seglabels", split))


class SegLoader:
    """Threaded batch loader yielding (imgs (B,H,W,3) f32, masks (B,H,W) i32).

    In testval mode images keep per-image sizes; batch them only when shapes
    match (the reference hits the same constraint — train_citysbdd.py uses
    val mode because mixed sizes break testval batching)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 workers: int = 4, drop_last: bool = False, shard: int = 0,
                 num_shards: int = 1, seed: int = 0):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.workers = max(1, workers)
        self.drop_last = drop_last
        self.shard = shard
        self.num_shards = num_shards
        self.seed = seed
        self.epoch = 0

    def _plan(self):
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        idx = idx[self.shard::self.num_shards]
        if self.num_shards > 1:
            # equal per-host step counts (see DetectionLoader._plan)
            idx = idx[: len(self.ds) // self.num_shards]
        nb = (len(idx) // self.bs if self.drop_last
              else math.ceil(len(idx) / self.bs))
        return [idx[i * self.bs:(i + 1) * self.bs] for i in range(nb)]

    def __len__(self):
        return len(self._plan())

    def __iter__(self):
        batches = self._plan()
        self.epoch += 1
        # per-worker bounded queues, batches assigned round-robin: batch k
        # comes from queue k%W in order, giving real backpressure; producers
        # timeout-put so an abandoned iterator (cli/train.py re-creates
        # seg_iter each epoch) can't leave threads blocked in q.put forever
        W = min(self.workers, max(1, len(batches)))
        qs = [queue_mod.Queue(maxsize=2) for _ in range(W)]
        stop = threading.Event()

        def produce(w):
            for bi in range(w, len(batches), W):
                try:
                    items = [self.ds[i] for i in batches[bi]]
                    imgs = np.stack([it[0] for it in items], 0)
                    masks = np.stack([np.asarray(it[1]) for it in items], 0)
                    payload = (imgs, masks)
                except Exception as e:  # propagate, don't hang the consumer
                    payload = e
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


def get_citys_loader(root="data/citys/", split="train", mode="train",
                     base_size=1024, crop_size=(1024, 512), batch_size=32,
                     workers=4, **kw):
    jitter = (0.45, 0.45, 0.45, 0.15) if mode == "train" else None
    ds = CitySegmentation(root=root, split=split, mode=mode,
                          base_size=base_size, crop_size=crop_size,
                          low=0.65, high=3, sample_std=25, jitter=jitter)
    return SegLoader(ds, batch_size, shuffle=(mode == "train"), workers=workers, **kw)


def get_citysbdd_loader(root="data/citys/", split="train", mode="train",
                        base_size=1024, crop_size=(1024, 512), batch_size=32,
                        workers=4, **kw):
    jitter = (0.4, 0.4, 0.4, 0.05) if mode == "train" else None
    ds = CityBddSegmentation(root=root, split=split, mode=mode,
                             base_size=base_size, crop_size=crop_size,
                             low=0.65, high=2, sample_std=40, jitter=jitter)
    return SegLoader(ds, batch_size, shuffle=(mode == "train"),
                     drop_last=(mode == "train"), workers=workers, **kw)


def get_custom_loader(root="data/", split="train", mode="train",
                      base_size=1024, batch_size=32, workers=4, n_segcls=2, **kw):
    jitter = (0.4, 0.4, 0.4, 0.0) if mode == "train" else None
    ds = CustomSegmentation(root=root, split=split, mode=mode, NUM_CLASS=n_segcls,
                            base_size=base_size, crop_size=(base_size, base_size),
                            low=0.75, high=1.5, sample_std=35, jitter=jitter)
    return SegLoader(ds, batch_size, shuffle=(mode == "train"),
                     drop_last=(mode == "train"), workers=workers, **kw)
