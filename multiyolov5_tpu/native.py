"""ctypes bindings for the native preprocessing library (native/preprocess.cpp).

Builds lazily via ``make -C native`` on first use if the .so is missing;
every entry point has a numpy fallback so the framework works without a
compiler.  The native path matters on the serving hot loop: BGR->RGB +
space-to-depth of a 1024x512 frame is one fused OpenMP pass instead of four
strided numpy copies.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpreprocess.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(
            os.path.join(_NATIVE_DIR, "Makefile")):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            print(f"native build failed ({e}); using numpy fallbacks")
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64 = ctypes.c_int64
        lib.s2d_u8.argtypes = [u8p, u8p, i64, i64]
        lib.bgr2rgb_s2d_u8.argtypes = [u8p, u8p, i64, i64]
        lib.letterbox_fill.argtypes = [u8p, u8p, i64, i64, i64, i64, i64,
                                       i64, i64, ctypes.c_uint8]
        lib.normalize_f32.argtypes = [u8p, f32p, i64]
        try:
            lib.frame_to_stem96.argtypes = [u8p, u8p, i64, i64, i64]
        except AttributeError:  # stale .so from before the symbol existed
            pass
        _lib = lib
    except OSError as e:
        print(f"native lib load failed ({e}); using numpy fallbacks")
    return _lib


def available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def space_to_depth(img: np.ndarray, bgr2rgb: bool = False) -> np.ndarray:
    """(H, W, 3) uint8 -> (H/2, W/2, 12) uint8, phases [ee, oe, eo, oo]."""
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    lib = _load()
    h, w = img.shape[:2]
    if lib is not None and img.flags["C_CONTIGUOUS"]:
        out = np.empty((h // 2, w // 2, 12), np.uint8)
        fn = lib.bgr2rgb_s2d_u8 if bgr2rgb else lib.s2d_u8
        fn(_u8p(img), _u8p(out), h, w)
        return out
    x = img[:, :, ::-1] if bgr2rgb else img
    return np.concatenate([x[::2, ::2], x[1::2, ::2],
                           x[::2, 1::2], x[1::2, 1::2]], axis=-1)


def letterbox_fill(img: np.ndarray, out_hw, top: int, left: int,
                   fill: int = 114) -> np.ndarray:
    """Blit img into a fill-valued (oh, ow, c) canvas at (top, left)."""
    h, w, c = img.shape
    oh, ow = out_hw
    lib = _load()
    if lib is not None and img.flags["C_CONTIGUOUS"]:
        out = np.empty((oh, ow, c), np.uint8)
        lib.letterbox_fill(_u8p(img), _u8p(out), h, w, oh, ow, c, top, left,
                           fill)
        return out
    out = np.full((oh, ow, c), fill, np.uint8)
    out[top:top + h, left:left + w] = img
    return out


def frame_to_stem96(img: np.ndarray, cp: int) -> np.ndarray:
    """(H, W, 3) uint8 RGB frame -> (H/4+3, cp, 96) uint8 packed stem input
    (two nested 2x2 space-to-depths + pad + row-pair lane pack) in one
    fused pass — the host side of ops/pallas/stem_kernel.stem_apply_pallas_u8.
    Falls back to the numpy chain (s2d x2 + pack_stem96_host)."""
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    h, w = img.shape[:2]
    lib = _load()
    if (lib is not None and hasattr(lib, "frame_to_stem96")
            and img.flags["C_CONTIGUOUS"]):
        out = np.empty((h // 4 + 3, cp, 96), np.uint8)
        lib.frame_to_stem96(_u8p(img), _u8p(out), h, w, cp)
        return out
    # numpy fallback: the same chain engine.space_to_depth_host uses
    from .ops.pallas.stem_kernel import pack_stem96_host
    x = np.concatenate([img[::2, ::2], img[1::2, ::2],
                        img[::2, 1::2], img[1::2, 1::2]], axis=-1)
    x = np.concatenate([x[::2, ::2], x[1::2, ::2],
                        x[::2, 1::2], x[1::2, 1::2]], axis=-1)
    return pack_stem96_host(x[None], cp)[0]


def normalize(img: np.ndarray) -> np.ndarray:
    """uint8 -> float32 / 255 (contiguous)."""
    lib = _load()
    if lib is not None and img.flags["C_CONTIGUOUS"]:
        out = np.empty(img.shape, np.float32)
        lib.normalize_f32(_u8p(img),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          img.size)
        return out
    return img.astype(np.float32) / 255.0
