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
