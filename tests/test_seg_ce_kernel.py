"""Fused upsample+CE kernel vs resize_bilinear ∘ cross_entropy_seg
(interpret mode on CPU) — forward values AND custom-VJP gradients.

Reference semantics: the head's x8 bilinear upsample (reference
models/yolo.py:57) + SegmentationLosses CE (reference utils/loss.py:221-263),
as implemented by ops/resize.resize_bilinear + train/losses.cross_entropy_seg."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multiyolov5_tpu.ops.pallas.seg_ce_kernel import seg_ce_up8
from multiyolov5_tpu.ops.resize import resize_bilinear
from multiyolov5_tpu.train.losses import cross_entropy_seg


def _ref(z, y, weight=None, ignore_index=-1):
    return cross_entropy_seg(resize_bilinear(z, y.shape[1:]), y,
                             weight, ignore_index)


def _data(rng, b=2, h=8, w=16, c=7, k=8, ignore_frac=0.2):
    z = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    y = rng.randint(0, c, (b, k * h, k * w))
    y = np.where(rng.rand(*y.shape) < ignore_frac, -1, y)
    return z, jnp.asarray(y, jnp.int32)


def test_seg_ce_value(rng):
    z, y = _data(rng)
    want = float(_ref(z, y))
    got = float(seg_ce_up8(z, y))
    np.testing.assert_allclose(got, want, rtol=5e-5)


def test_seg_ce_value_weighted(rng):
    z, y = _data(rng, c=5)
    wv = jnp.asarray(rng.rand(5).astype(np.float32) + 0.5)
    want = float(_ref(z, y, weight=wv))
    got = float(seg_ce_up8(z, y, weight=wv))
    np.testing.assert_allclose(got, want, rtol=5e-5)


def test_seg_ce_all_ignored(rng):
    z, y = _data(rng, b=1, h=4, w=8, c=3)
    y = jnp.full_like(y, -1)
    got = float(seg_ce_up8(z, y))
    want = float(_ref(z, y))
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_seg_ce_grad(rng):
    z, y = _data(rng)
    gw = jax.grad(lambda zz: _ref(zz, y))(z)
    gg = jax.grad(lambda zz: seg_ce_up8(zz, y))(z)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                               rtol=2e-4, atol=1e-7)


def test_seg_ce_grad_weighted_scaled(rng):
    z, y = _data(rng, c=5)
    wv = jnp.asarray(rng.rand(5).astype(np.float32) + 0.5)
    # scaled loss: upstream cotangent != 1 exercises the scale plumbing
    gw = jax.grad(lambda zz: 3.5 * _ref(zz, y, weight=wv))(z)
    gg = jax.grad(lambda zz: 3.5 * seg_ce_up8(zz, y, weight=wv))(z)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                               rtol=2e-4, atol=1e-7)


def test_seg_ce_bf16(rng):
    z, y = _data(rng, b=1)
    zb = z.astype(jnp.bfloat16)
    want = float(_ref(zb, y))
    got = float(seg_ce_up8(zb, y))
    np.testing.assert_allclose(got, want, rtol=0.02)
    gw = jax.grad(lambda zz: _ref(zz, y))(zb)
    gg = jax.grad(lambda zz: seg_ce_up8(zz, y))(zb)
    np.testing.assert_allclose(np.asarray(gg, np.float32),
                               np.asarray(gw, np.float32),
                               rtol=0.1, atol=2e-4)


def test_seg_ce_nondivisible_pads(rng):
    # w=12 (cols pad to 128), h=6 (rows pad to 8), W=96 (pad to 128)
    z, y = _data(rng, b=1, h=6, w=12, c=4)
    want = float(_ref(z, y))
    got = float(seg_ce_up8(z, y))
    np.testing.assert_allclose(got, want, rtol=5e-5)
    gw = jax.grad(lambda zz: _ref(zz, y))(z)
    gg = jax.grad(lambda zz: seg_ce_up8(zz, y))(z)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                               rtol=2e-4, atol=1e-7)
