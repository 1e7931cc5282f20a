"""Folded 4x4-s2d stem (ops/stem.py) and fused upsample+argmax wrapper
(ops/pallas/upsample_argmax_kernel.py) — exactness vs the layer-by-layer
reference computation."""

import numpy as np
import jax.numpy as jnp
import pytest

from multiyolov5_tpu.engine import Engine, space_to_depth_host
from multiyolov5_tpu.models import model as M
from multiyolov5_tpu.ops.nn import Ctx
from multiyolov5_tpu.ops.stem import (can_fold_stem, fold_stem_from_params,
                                      stem_apply)
from multiyolov5_tpu.ops.pallas.upsample_argmax_kernel import (
    _compose_matrix, upsample_argmax)
from multiyolov5_tpu.ops.resize import resize_bilinear


@pytest.mark.parametrize("cfg", ["yolov5s_city_seg", "yolov5m_city_seg"])
def test_folded_stem_exact(cfg):
    eng = Engine(None, cfg=cfg, half=False)
    spec, params, state = eng.spec, eng.params, eng.state
    assert can_fold_stem(spec)

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (2, 64, 96, 3)).astype(np.uint8)

    x12 = space_to_depth_host(img).astype(np.float32) / 255.0
    ctx = Ctx(p=params, s=state, train=False, fused=True, pre_s2d=True)
    y = jnp.asarray(x12)
    for row in spec.rows[:2]:
        y = M._apply_row(ctx, row, y)
    ref = np.asarray(y)

    x48 = space_to_depth_host(space_to_depth_host(img)).astype(np.float32) / 255.0
    got = np.asarray(stem_apply(jnp.asarray(x48), *fold_stem_from_params(params)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_folded_stem_rejects_nonstandard():
    eng = Engine(None, cfg="yolov5s_city_seg", half=False)
    spec = eng.spec
    import copy
    bad = copy.deepcopy(spec)
    bad.save.add(1)  # intermediate consumed elsewhere -> cannot skip it
    assert not can_fold_stem(bad)


def test_engine_fold_matches_materialized_path():
    """Engine masks/boxes are unchanged by the folded-stem fast path."""
    eng = Engine(None, cfg="yolov5s_city_seg", half=False)
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (1, 64, 128, 3)).astype(np.uint8)
    dets_a, masks_a = eng(img, orig_hw=(128, 256))
    eng2 = Engine(None, cfg="yolov5s_city_seg", half=False,
                  spec=eng.spec, params=dict(eng.params), state=dict(eng.state))
    eng2.fold_stem = False  # force the pre_s2d path
    dets_b, masks_b = eng2(img, orig_hw=(128, 256))
    np.testing.assert_allclose(dets_a[0], dets_b[0], atol=1e-3)
    assert (masks_a[0] == masks_b[0]).mean() > 0.999


def test_compose_matrix_matches_chained():
    """float64 composition == chained f64 two-stage interpolation."""
    m = _compose_matrix(16, 128, 64, True)
    m1 = _compose_matrix(16, 64, None, True)
    m2 = _compose_matrix(64, 128, None, True)
    np.testing.assert_allclose(m, m2 @ m1, atol=1e-12)
    # rows are convex combinations (partition of unity)
    np.testing.assert_allclose(m.sum(1), 1.0, atol=1e-12)


def test_upsample_argmax_fallback_semantics():
    """CPU wrapper == argmax of the chained reference resizes."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    got = np.asarray(upsample_argmax(x, (32, 48), via_hw=(16, 24)))
    ref = np.asarray(jnp.argmax(
        resize_bilinear(resize_bilinear(x, (16, 24)), (32, 48)), -1))
    assert got.dtype == np.uint8
    assert (got == ref).all()


def test_upsample_argmax_planar_fallback():
    """Planar wrapper == NHWC wrapper on transposed input (CPU path)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    xp = jnp.transpose(x, (0, 3, 1, 2))
    from multiyolov5_tpu.ops.pallas.upsample_argmax_kernel import (
        upsample_argmax_planar)
    a = np.asarray(upsample_argmax(x, (32, 48), via_hw=(16, 24)))
    b = np.asarray(upsample_argmax_planar(xp, (32, 48), via_hw=(16, 24)))
    assert (a == b).all()


@pytest.mark.parametrize("cfg", ["yolov5s_city_seg"])
def test_seg_up_false_planar_logits_match(cfg):
    """seg_up=False returns planar (B,C,h,w) logits numerically equal to the
    pre-upsample NHWC logits of the default path."""
    import jax
    from multiyolov5_tpu.models.model import forward

    eng = Engine(None, cfg=cfg, half=False)
    spec, params, state = eng.spec, eng.params, eng.state
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    _, seg_up, _ = forward(spec, params, state, x, train=False, fused=True,
                           decode=True, seg_up=True)
    _, seg_pl, _ = forward(spec, params, state, x, train=False, fused=True,
                           decode=True, seg_up=False)
    assert seg_pl.shape == (1, spec.n_segcls, 8, 12)
    # the seg_up path upsamples 8x; downsampling is lossy, so instead
    # compare planar logits to an exact re-upsample
    up = resize_bilinear(jnp.transpose(seg_pl, (0, 2, 3, 1)),
                         (seg_up.shape[1], seg_up.shape[2]))
    np.testing.assert_allclose(np.asarray(up), np.asarray(seg_up),
                               atol=2e-5, rtol=1e-5)
