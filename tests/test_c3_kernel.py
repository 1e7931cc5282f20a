"""Fused packed-C3 Pallas kernel vs the plain blocks.c3 lowering.

Interpret mode on CPU, fp32.  Semantics target: the exact C3 dataflow of
reference models/common.py:117-126 as implemented by models/blocks.c3 on
BN-folded params (cv1 -> n Bottlenecks -> concat with cv2 branch -> cv3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multiyolov5_tpu.ops.pallas.c3_kernel import c3_packed_pallas


def _xla_c3(x, wcv1, bcv1, wcv2, bcv2, wcv3, bcv3, mws, shortcut):
    def cv(x, w, b, pad=0):
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + b.astype(y.dtype)
        return y * jax.nn.sigmoid(y)

    y1 = cv(x, wcv1, bcv1)
    for wb1, bb1, wb2, bb2 in mws:
        t = cv(cv(y1, wb1, bb1), wb2, bb2, pad=1)
        y1 = y1 + t if shortcut else t
    y2 = cv(x, wcv2, bcv2)
    return cv(jnp.concatenate([y1, y2], -1), wcv3, bcv3)


def _mk(rng, c1, c_, c2, n):
    def w(*s):
        fan = int(np.prod(s[:-1])) if len(s) > 1 else 1
        return jnp.asarray((rng.randn(*s) / np.sqrt(fan)).astype(np.float32))

    return (w(1, 1, c1, c_), w(c_), w(1, 1, c1, c_), w(c_),
            w(1, 1, 2 * c_, c2), w(c2),
            tuple((w(1, 1, c_, c_), w(c_), w(3, 3, c_, c_), w(c_))
                  for _ in range(n)))


@pytest.mark.parametrize("b,h,w,c1,c_,c2,n,q,shortcut", [
    (1, 32, 64, 64, 32, 64, 1, 4, True),    # s layer-2 shape family
    (2, 16, 32, 96, 48, 96, 2, 2, True),    # m layer-2 (q=2, n=2)
    (1, 24, 16, 128, 64, 128, 3, 2, True),  # s layer-4 (q=2, n=3)
    (1, 16, 32, 64, 32, 64, 1, 4, False),   # no-shortcut (neck) variant
])
def test_c3_packed_matches_xla(rng, b, h, w, c1, c_, c2, n, q, shortcut):
    x = jnp.asarray(rng.rand(b, h, w, c1).astype(np.float32))
    wcv1, bcv1, wcv2, bcv2, wcv3, bcv3, mws = _mk(rng, c1, c_, c2, n)
    want = np.asarray(_xla_c3(x, wcv1, bcv1, wcv2, bcv2, wcv3, bcv3, mws,
                              shortcut))
    got = np.asarray(c3_packed_pallas(x, wcv1, bcv1, wcv2, bcv2, wcv3, bcv3,
                                      mws, q=q, shortcut=shortcut))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


from multiyolov5_tpu.ops.pallas.c3_kernel import (conv3x3_packed_pallas,
                                                  packed_q_for)


@pytest.mark.parametrize("b,h,w,ci,co,q,d,act", [
    (1, 32, 64, 32, 64, 4, 1, True),
    (2, 16, 32, 64, 128, 2, 1, True),
    (1, 24, 48, 48, 48, 2, 1, False),
    (1, 16, 32, 64, 64, 2, 2, True),    # RFB2 branch1 (dilation 2)
    (1, 16, 32, 32, 32, 4, 3, True),    # dilation 3, q=4
])
def test_conv3x3_packed_matches_xla(rng, b, h, w, ci, co, q, d, act):
    x = jnp.asarray(rng.rand(b, h, w, ci).astype(np.float32))
    wt = jnp.asarray((rng.randn(3, 3, ci, co) / np.sqrt(9 * ci))
                     .astype(np.float32))
    bi = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)
    y = jax.lax.conv_general_dilated(
        x, wt, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bi
    want = np.asarray(y * jax.nn.sigmoid(y) if act else y)
    got = np.asarray(conv3x3_packed_pallas(x, wt, bi, q=q, d=d, act=act))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_packed_q_for():
    assert packed_q_for(32, 256) == 4
    assert packed_q_for(64, 128) == 2
    assert packed_q_for(128, 256) == 0   # already full-K
    assert packed_q_for(48, 250) == 0    # unpackable width
    assert packed_q_for(32, 144) == 2    # falls back to a legal q
    assert packed_q_for(64, 128, d=2) == 2   # dilation within reach
    assert packed_q_for(64, 128, d=3) == 0   # d > q -> plain kernel
    assert packed_q_for(32, 256, d=3) == 4


def test_c3_packed_fast_hook_dispatches(rng, monkeypatch):
    """The blocks.c3 hook routes an eligible fused-eval C3 through the
    kernel and matches the plain lowering on the same params."""
    from multiyolov5_tpu.models import blocks
    from multiyolov5_tpu.ops.nn import Ctx

    c1 = c2 = 64
    c_ = 32
    n = 1
    wcv1, bcv1, wcv2, bcv2, wcv3, bcv3, mws = _mk(rng, c1, c_, c2, n)
    p = {"m.cv1.conv.weight": wcv1, "m.cv1.conv.bias": bcv1,
         "m.cv2.conv.weight": wcv2, "m.cv2.conv.bias": bcv2,
         "m.cv3.conv.weight": wcv3, "m.cv3.conv.bias": bcv3}
    for j, (wb1, bb1, wb2, bb2) in enumerate(mws):
        p[f"m.m.{j}.cv1.conv.weight"] = wb1
        p[f"m.m.{j}.cv1.conv.bias"] = bb1
        p[f"m.m.{j}.cv2.conv.weight"] = wb2
        p[f"m.m.{j}.cv2.conv.bias"] = bb2
    x = jnp.asarray(rng.rand(1, 32, 64, c1).astype(np.float32))

    ctx = Ctx(p=p, s={}, train=False, fused=True)
    ctx.c3_packed = True
    want = np.asarray(_xla_c3(x, wcv1, bcv1, wcv2, bcv2, wcv3, bcv3, mws,
                              True))

    called = {}
    orig = blocks._c3_packed_fast

    def spy(*a, **k):
        y = orig(*a, **k)
        called["hit"] = y is not None
        return y

    monkeypatch.setattr(blocks, "_c3_packed_fast", spy)
    monkeypatch.setenv("MULTIYOLOV5_FORCE_C3PACK", "1")
    monkeypatch.setenv("MULTIYOLOV5_C3PACK", "1")  # batch-1 heuristic off
    got = np.asarray(blocks.c3(ctx, "m", x, c1, c2, n=n))
    assert called["hit"]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


from multiyolov5_tpu.ops.pallas.c3_kernel import c3_packed_pallas_hwbc


@pytest.mark.parametrize("b,h,w,c1,c_,c2,n,q,shortcut", [
    (8, 32, 64, 64, 32, 64, 1, 4, True),   # s layer-2 family at batch
    (2, 16, 32, 96, 48, 96, 2, 2, True),   # m widths, n=2
    (3, 16, 32, 64, 32, 64, 1, 4, False),  # no-shortcut, odd batch
    (4, 8, 32, 64, 32, 64, 1, 4, True),    # single row block (nri == 1)
])
def test_c3_hwbc_matches_packed(rng, b, h, w, c1, c_, c2, n, q, shortcut):
    """Batch-layout variant == BHWC packed kernel, elementwise exact
    (same dots in the same order; only the store layout differs)."""
    x = jnp.asarray(rng.rand(b, h, w, c1).astype(np.float32))
    wcv1, bcv1, wcv2, bcv2, wcv3, bcv3, mws = _mk(rng, c1, c_, c2, n)
    want = np.asarray(c3_packed_pallas(x, wcv1, bcv1, wcv2, bcv2, wcv3,
                                       bcv3, mws, q=q, shortcut=shortcut))
    got = np.asarray(c3_packed_pallas_hwbc(x, wcv1, bcv1, wcv2, bcv2, wcv3,
                                           bcv3, mws, q=q,
                                           shortcut=shortcut))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
