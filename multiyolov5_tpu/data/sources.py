"""Inference input sources (reference utils/datasets.py:122-338).

LoadImages: image files / video files / globs / directories.
LoadWebcam: local camera.
LoadStreams: multi-source RTSP/HTTP with daemon reader threads.

Frames are letterboxed on host (uint8, cv2) and returned CHW-transposed-free:
we keep HWC RGB uint8; the device graph does /255 normalization.
"""

from __future__ import annotations

import glob
import os
import time
from pathlib import Path
from threading import Thread

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from .letterbox import letterbox
from ..utils.general import clean_str

IMG_FORMATS = ("bmp", "jpg", "jpeg", "png", "tif", "tiff", "dng", "webp", "mpo")
VID_FORMATS = ("mov", "avi", "mp4", "mpg", "mpeg", "m4v", "wmv", "mkv")


class LoadImages:
    """Yields (path, img_rgb_letterboxed HWC uint8, img0_bgr, vid_cap)."""

    def __init__(self, path: str, img_size=640, stride: int = 32,
                 auto: bool = False):
        p = str(Path(path).absolute())
        if "*" in p:
            files = sorted(glob.glob(p, recursive=True))
        elif os.path.isdir(p):
            files = sorted(glob.glob(os.path.join(p, "*.*")))
        elif os.path.isfile(p):
            files = [p]
        else:
            raise FileNotFoundError(f"{p} does not exist")
        images = [x for x in files if x.split(".")[-1].lower() in IMG_FORMATS]
        videos = [x for x in files if x.split(".")[-1].lower() in VID_FORMATS]
        self.img_size = img_size
        self.stride = stride
        self.auto = auto
        self.files = images + videos
        self.nf = len(self.files)
        self.video_flag = [False] * len(images) + [True] * len(videos)
        self.mode = "image"
        self.cap = None
        if videos:
            self._new_video(videos[0])
        assert self.nf > 0, f"no images or videos found in {p}"

    def __iter__(self):
        self.count = 0
        return self

    def __next__(self):
        if self.count == self.nf:
            raise StopIteration
        path = self.files[self.count]
        if self.video_flag[self.count]:
            self.mode = "video"
            ret, img0 = self.cap.read()
            if not ret:
                self.count += 1
                self.cap.release()
                if self.count == self.nf:
                    raise StopIteration
                path = self.files[self.count]
                self._new_video(path)
                ret, img0 = self.cap.read()
            self.frame += 1
        else:
            self.count += 1
            img0 = cv2.imread(path)  # BGR
            assert img0 is not None, f"image not found {path}"
        img = letterbox(img0, self.img_size, auto=self.auto, stride=self.stride)[0]
        img = img[:, :, ::-1]  # BGR -> RGB (stay HWC; device graph is NHWC)
        return path, np.ascontiguousarray(img), img0, self.cap

    def _new_video(self, path):
        self.frame = 0
        self.cap = cv2.VideoCapture(path)
        self.nframes = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def __len__(self):
        return self.nf


class LoadWebcam:
    """Local camera source (reference utils/datasets.py:157-195)."""

    def __init__(self, pipe="0", img_size=640, stride=32):
        self.img_size = img_size
        self.stride = stride
        self.pipe = eval(pipe) if pipe.isnumeric() else pipe
        self.cap = cv2.VideoCapture(self.pipe)
        self.cap.set(cv2.CAP_PROP_BUFFERSIZE, 3)
        self.mode = "stream"

    def __iter__(self):
        self.count = -1
        return self

    def __next__(self):
        self.count += 1
        if cv2.waitKey(1) == ord("q"):
            self.cap.release()
            cv2.destroyAllWindows()
            raise StopIteration
        if self.pipe == 0:  # local camera: mirror like the reference (:228)
            ret, img0 = self.cap.read()
            img0 = cv2.flip(img0, 1)
        else:  # IP camera: keep realtime by decoding every 30th grabbed
            n = 0  # frame (reference :231-237)
            while True:
                n += 1
                self.cap.grab()
                if n % 30 == 0:
                    ret, img0 = self.cap.retrieve()
                    if ret:
                        break
        assert img0 is not None, f"camera error {self.pipe}"
        img = letterbox(img0, self.img_size, auto=False, stride=self.stride)[0]
        img = np.ascontiguousarray(img[:, :, ::-1])
        return str(self.pipe), img, img0, None

    def __len__(self):
        return 0


class LoadStreams:
    """Multi-stream RTSP/HTTP reader with one daemon thread per source
    (reference utils/datasets.py:198-338)."""

    def __init__(self, sources="streams.txt", img_size=640, stride=32):
        self.mode = "stream"
        self.img_size = img_size
        self.stride = stride
        if os.path.isfile(sources):
            with open(sources) as f:
                sources = [x.strip() for x in f if x.strip()]
        else:
            sources = [sources]
        n = len(sources)
        self.imgs = [None] * n
        self.sources = [clean_str(s) for s in sources]
        for i, s in enumerate(sources):
            cap = cv2.VideoCapture(eval(s) if s.isnumeric() else s)
            assert cap.isOpened(), f"failed to open {s}"
            _, self.imgs[i] = cap.read()
            fps = cap.get(cv2.CAP_PROP_FPS) % 100 or 30
            thread = Thread(target=self._update, args=(i, cap, fps), daemon=True)
            thread.start()
        # all streams must be same-shape for a single compiled graph
        s = np.stack([letterbox(x, self.img_size, auto=False, stride=self.stride)[0].shape
                      for x in self.imgs], 0)
        self.rect = np.unique(s, axis=0).shape[0] == 1

    def _update(self, i, cap, fps):
        while cap.isOpened():
            cap.grab()
            ret, im = cap.retrieve()
            if ret:
                self.imgs[i] = im
            time.sleep(1 / fps)

    def __iter__(self):
        self.count = -1
        return self

    def __next__(self):
        self.count += 1
        if cv2.waitKey(1) == ord("q"):
            cv2.destroyAllWindows()
            raise StopIteration
        img0 = [x.copy() for x in self.imgs]
        img = np.stack([
            letterbox(x, self.img_size, auto=False, stride=self.stride)[0]
            for x in img0], 0)
        img = np.ascontiguousarray(img[..., ::-1])
        return self.sources, img, img0, None

    def __len__(self):
        return 0
