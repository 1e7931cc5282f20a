"""Letterbox resize/pad (reference utils/datasets.py:818-848), host-side.

Same rounding semantics as the reference (cv2 INTER_LINEAR resize, 0.1-biased
pad split, 114-gray fill).  ``auto=True`` pads only to the next stride
multiple (minimum rectangle); ``auto=False`` pads to the full target — the
TPU path prefers auto=False so every frame of a stream compiles once
(the XLA analog of the reference's cudnn.benchmark same-size rule,
reference detect.py:115-124).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _resize(img: np.ndarray, wh: Tuple[int, int]) -> np.ndarray:
    if cv2 is not None:
        return cv2.resize(img, wh, interpolation=cv2.INTER_LINEAR)
    from PIL import Image

    return np.asarray(Image.fromarray(img).resize(wh, Image.BILINEAR))


def letterbox(img: np.ndarray, new_shape=(640, 640), color=(114, 114, 114),
              auto: bool = True, scale_fill: bool = False, scaleup: bool = True,
              stride: int = 32):
    """Returns (padded_img, (rw, rh), (dw, dh))."""
    shape = img.shape[:2]  # h, w
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)

    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)

    ratio = (r, r)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))  # (w, h)
    dw = new_shape[1] - new_unpad[0]
    dh = new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    elif scale_fill:
        dw, dh = 0, 0
        new_unpad = (new_shape[1], new_shape[0])
        ratio = (new_shape[1] / shape[1], new_shape[0] / shape[0])

    dw /= 2
    dh /= 2

    if shape[::-1] != new_unpad:
        img = _resize(img, new_unpad)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    ch = img.shape[2] if img.ndim == 3 else 1
    fill = np.asarray(color, img.dtype)
    if fill.ndim and ch < fill.shape[0]:  # grayscale input, RGB color tuple
        fill = fill[:ch]
    out = np.full((img.shape[0] + top + bottom, img.shape[1] + left + right,
                   ch), fill, dtype=img.dtype)
    if img.ndim == 2:
        img = img[..., None]
    out[top:top + img.shape[0], left:left + img.shape[1]] = img
    if out.shape[2] == 1:
        out = out[..., 0]
    return out, ratio, (dw, dh)


def check_img_size(img_size: int, stride: int = 32) -> int:
    """Round up to a stride multiple (reference utils/general.py check_img_size)."""
    new = int(np.ceil(img_size / stride) * stride)
    return new
