"""Native C++ preprocessing kernels: exactness vs numpy reference."""

import numpy as np
import pytest

from multiyolov5_tpu import native


def test_s2d_exact(rng):
    img = rng.randint(0, 255, (64, 96, 3)).astype(np.uint8)
    want = np.concatenate([img[::2, ::2], img[1::2, ::2],
                           img[::2, 1::2], img[1::2, 1::2]], -1)
    np.testing.assert_array_equal(native.space_to_depth(img), want)


def test_bgr2rgb_s2d_exact(rng):
    img = rng.randint(0, 255, (64, 96, 3)).astype(np.uint8)
    x = img[:, :, ::-1]
    want = np.concatenate([x[::2, ::2], x[1::2, ::2],
                           x[::2, 1::2], x[1::2, 1::2]], -1)
    np.testing.assert_array_equal(native.space_to_depth(img, bgr2rgb=True), want)


def test_letterbox_fill_exact(rng):
    img = np.ascontiguousarray(rng.randint(0, 255, (40, 90, 3)).astype(np.uint8))
    got = native.letterbox_fill(img, (64, 128), 12, 19)
    want = np.full((64, 128, 3), 114, np.uint8)
    want[12:52, 19:109] = img
    np.testing.assert_array_equal(got, want)


def test_normalize_exact(rng):
    img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
    np.testing.assert_allclose(native.normalize(img),
                               img.astype(np.float32) / 255.0)


def test_engine_batch_s2d_roundtrip(rng):
    from multiyolov5_tpu.engine import space_to_depth_host
    img = rng.randint(0, 255, (2, 64, 96, 3)).astype(np.uint8)
    want = np.concatenate([img[:, ::2, ::2], img[:, 1::2, ::2],
                           img[:, ::2, 1::2], img[:, 1::2, 1::2]], -1)
    np.testing.assert_array_equal(space_to_depth_host(img), want)


def test_frame_to_stem96_matches_numpy_chain(rng):
    """Fused native pass == s2d x2 + pack_stem96_host (the u8 stem kernel's
    host input contract)."""
    from multiyolov5_tpu import native
    from multiyolov5_tpu.ops.pallas.stem_kernel import (pack_stem96_host,
                                                        stem_pack_geometry)

    for h, w in [(64, 96), (128, 256)]:
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cp, hp = stem_pack_geometry(h // 4, w // 4)
        got = native.frame_to_stem96(img, cp)
        assert got.shape == (hp, cp, 96)
        x = np.concatenate([img[::2, ::2], img[1::2, ::2],
                            img[::2, 1::2], img[1::2, 1::2]], -1)
        x = np.concatenate([x[::2, ::2], x[1::2, ::2],
                            x[::2, 1::2], x[1::2, 1::2]], -1)
        want = pack_stem96_host(x[None], cp)[0]
        np.testing.assert_array_equal(got, want)
