"""Interpret-mode coverage for BOTH Pallas NMS kernels (round-1 verdict
item 6: the kernels only run on real TPU in production, so the exact code
that decides TPU mAP/detect outputs had no CPU test).

Semantics target: sequential greedy NMS (reference utils/general.py:493-496
via torchvision.ops.nms), numpy-restated in tests/test_nms.greedy_nms_np.
"""

import numpy as np
import pytest

from test_nms import greedy_nms_np


def _rand_boxes(rng, n, n_valid, img=1024):
    xy = rng.rand(n, 2) * img
    wh = rng.rand(n, 2) * 120 + 4
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], 1).astype(np.float32)
    scores = np.sort(rng.rand(n).astype(np.float32))[::-1] + 1e-4
    scores[n_valid:] = 0.0  # padded invalid tail
    return boxes, scores.copy()


@pytest.mark.parametrize("n,n_valid", [(256, 256), (1024, 700), (128, 0)])
def test_fixpoint_kernel_matches_greedy(rng, n, n_valid):
    from multiyolov5_tpu.ops.pallas.nms_fixpoint_kernel import (
        nms_fixpoint_pallas)

    boxes, scores = _rand_boxes(rng, n, n_valid)
    keep = np.asarray(nms_fixpoint_pallas(boxes, scores, 0.45))
    want = greedy_nms_np(boxes[:n_valid], scores[:n_valid], 0.45)
    got = np.where(keep)[0]
    np.testing.assert_array_equal(got, np.sort(want))


@pytest.mark.parametrize("n,n_valid", [(256, 256), (4224, 4100), (8192, 6000)])
def test_sequential_kernel_matches_greedy(rng, n, n_valid):
    """Covers the eval path (max_nms=30000 -> N>4096 -> sequential kernel,
    evaluation.py:115) including padded invalid rows."""
    from multiyolov5_tpu.ops.pallas.nms_kernel import nms_pallas

    boxes, scores = _rand_boxes(rng, n, n_valid)
    max_det = 300
    idx, valid = nms_pallas(boxes, scores, 0.45, max_det)
    idx, valid = np.asarray(idx), np.asarray(valid)
    want = greedy_nms_np(boxes[:n_valid], scores[:n_valid], 0.45)[:max_det]
    got = idx[valid]
    np.testing.assert_array_equal(got, want)


def test_kernels_agree_with_each_other(rng):
    from multiyolov5_tpu.ops.pallas.nms_fixpoint_kernel import (
        nms_fixpoint_pallas)
    from multiyolov5_tpu.ops.pallas.nms_kernel import nms_pallas

    boxes, scores = _rand_boxes(rng, 512, 512)
    keep = np.asarray(nms_fixpoint_pallas(boxes, scores, 0.5))
    idx, valid = nms_pallas(boxes, scores, 0.5, 512)
    seq = np.zeros(512, bool)
    seq[np.asarray(idx)[np.asarray(valid)]] = True
    np.testing.assert_array_equal(keep, seq)


def test_nms_from_raw_matches_decoded_path(rng):
    """Decode-after-top-k == decode-everything + nms_batched (engine serving
    path vs the reference-shaped path) on random raw Detect maps."""
    import jax.numpy as jnp
    from multiyolov5_tpu.ops.nms import nms_batched, nms_from_raw

    nc, na, strides = 7, 3, (8, 16, 32)
    anchors = rng.rand(3, na, 2).astype(np.float32) * 4 + 1
    raw = []
    for s in strides:
        ny, nx = 64 // (s // 8), 64 // (s // 8)
        # logits biased so a moderate subset clears conf 0.25
        r = rng.randn(1, na, ny, nx, 5 + nc).astype(np.float32)
        r[..., 4] -= 1.0
        raw.append(jnp.asarray(r))
    # decoded path (reference models/yolo.py:216-225 formulas)
    zs = []
    for i, x in enumerate(raw):
        x = np.asarray(x)
        _, _, ny, nx, no = x.shape
        y = 1 / (1 + np.exp(-x))
        gy, gx = np.mgrid[0:ny, 0:nx].astype(np.float32)
        grid = np.stack([gx, gy], -1)
        xy = (y[..., :2] * 2 - 0.5 + grid) * strides[i]
        wh = (y[..., 2:4] * 2) ** 2 * (
            anchors[i] * strides[i]).reshape(1, na, 1, 1, 2)
        z = np.concatenate([xy, wh, y[..., 4:]], -1)
        zs.append(z.reshape(1, -1, no))
    z = jnp.asarray(np.concatenate(zs, 1))

    want_det, want_valid = nms_batched(z, conf_thres=0.25, iou_thres=0.45,
                                       max_nms=1024)
    got_det, got_valid = nms_from_raw(raw, jnp.asarray(anchors), strides,
                                      conf_thres=0.25, iou_thres=0.45,
                                      max_nms=1024)
    np.testing.assert_array_equal(np.asarray(want_valid),
                                  np.asarray(got_valid))
    w, g = np.asarray(want_det)[0], np.asarray(got_det)[0]
    m = np.asarray(want_valid)[0]
    np.testing.assert_allclose(g[m], w[m], rtol=1e-4, atol=1e-3)
