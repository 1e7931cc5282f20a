"""NMS correctness vs a plain-numpy greedy reference."""

import numpy as np
import pytest

from multiyolov5_tpu.ops.nms import non_max_suppression, nms_batched
from multiyolov5_tpu.utils.boxes import xywh2xyxy


def greedy_nms_np(boxes, scores, iou_thres):
    """Classic sequential greedy NMS (semantics of torchvision.ops.nms)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / (areas[i] + areas - inter + 1e-9)
        suppressed |= iou > iou_thres
    return np.array(keep, int)


def reference_nms_pipeline(pred, conf_thres, iou_thres, multi_label=False):
    """Numpy re-statement of reference utils/general.py:421-509 (no torch)."""
    nc = pred.shape[1] - 5
    x = pred[pred[:, 4] > conf_thres]
    if not len(x):
        return np.zeros((0, 6), np.float32)
    x = x.copy()
    x[:, 5:] *= x[:, 4:5]
    box = xywh2xyxy(x[:, :4])
    if multi_label:
        i, j = np.nonzero(x[:, 5:] > conf_thres)
        x = np.concatenate([box[i], x[i, j + 5, None], j[:, None].astype(np.float32)], 1)
    else:
        conf = x[:, 5:].max(1, keepdims=True)
        j = x[:, 5:].argmax(1, keepdims=True).astype(np.float32)
        x = np.concatenate([box, conf, j], 1)[conf.ravel() > conf_thres]
    if not len(x):
        return np.zeros((0, 6), np.float32)
    c = x[:, 5:6] * 4096.0
    keep = greedy_nms_np(x[:, :4] + c, x[:, 4], iou_thres)[:300]
    return x[keep]


def _rand_pred(rng, n=400, nc=10, img=640):
    xy = rng.rand(n, 2) * img
    wh = rng.rand(n, 2) * 100 + 4
    obj = rng.rand(n, 1) ** 2
    cls = rng.rand(n, nc)
    cls /= cls.sum(1, keepdims=True)
    cls = cls * rng.rand(n, 1) + np.eye(nc)[rng.randint(0, nc, n)] * 0.5
    return np.concatenate([xy, wh, obj, cls], 1).astype(np.float32)


@pytest.mark.parametrize("multi_label", [False, True])
def test_nms_matches_reference_pipeline(rng, multi_label):
    pred = _rand_pred(rng)[None]
    got = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                              multi_label=multi_label)[0]
    want = reference_nms_pipeline(pred[0], 0.25, 0.45, multi_label)
    assert got.shape == want.shape
    # same boxes in same order (scores strictly ordered with prob 1)
    np.testing.assert_allclose(
        got[np.lexsort(got.T)], want[np.lexsort(want.T)], rtol=1e-4, atol=1e-3)


def test_nms_empty_and_classes_filter(rng):
    pred = _rand_pred(rng, n=50)[None]
    # impossible threshold -> empty
    out = non_max_suppression(pred, conf_thres=0.999)[0]
    assert out.shape == (0, 6)
    # classes filter restricts predicted class ids
    out = non_max_suppression(pred, conf_thres=0.1, classes=[2, 3])[0]
    assert set(np.unique(out[:, 5]).astype(int)) <= {2, 3}


def test_nms_max_det_cap(rng):
    # 500 spread-out boxes, all confident -> capped at max_det
    n = 500
    xy = np.stack(np.meshgrid(np.arange(25), np.arange(20)), -1).reshape(-1, 2) * 200.0 + 50
    wh = np.full((n, 2), 20.0)
    obj = np.full((n, 1), 0.9)
    cls = np.tile(np.eye(3)[0], (n, 1))
    pred = np.concatenate([xy, wh, obj, cls], 1).astype(np.float32)[None]
    out = non_max_suppression(pred, conf_thres=0.25, max_det=300)[0]
    assert out.shape[0] == 300


def test_agnostic_vs_batched(rng):
    # two perfectly-overlapping boxes of different classes: batched keeps both,
    # agnostic keeps one.
    pred = np.zeros((1, 2, 7), np.float32)
    pred[0, :, :4] = [100, 100, 50, 50]
    pred[0, :, 4] = 0.9
    pred[0, 0, 5] = 0.9
    pred[0, 1, 6] = 0.8
    assert len(non_max_suppression(pred, 0.25, 0.45)[0]) == 2
    assert len(non_max_suppression(pred, 0.25, 0.45, agnostic=True)[0]) == 1


def test_classes_filter_drops_box_not_reassigns():
    """reference utils/general.py:467-473: single-label mode picks the best
    class FIRST, then drops disallowed boxes — a box whose best class is
    filtered out must vanish, not be re-emitted as its best allowed class."""
    pred = np.zeros((1, 1, 7), np.float32)   # nc=2
    pred[0, 0, :4] = [100, 100, 50, 50]
    pred[0, 0, 4] = 1.0       # obj
    pred[0, 0, 5] = 0.9       # class 0 (best)
    pred[0, 0, 6] = 0.3       # class 1 (allowed, above thres)
    out = non_max_suppression(pred, conf_thres=0.25, classes=[1])[0]
    assert out.shape[0] == 0  # NOT a class-1 detection at conf 0.3
    # multi-label mode: the class-1 row stands on its own (reference :468)
    out = non_max_suppression(pred, conf_thres=0.25, classes=[1],
                              multi_label=True)[0]
    assert out.shape[0] == 1 and int(out[0, 5]) == 1


def test_fixpoint_matches_sequential_greedy(rng):
    """The Jacobi-fixpoint formulation (ops/nms._nms_fixpoint, the TPU
    small-N path) == the sequential pick/suppress scan, including the
    max_det truncation and validity mask."""
    from multiyolov5_tpu.ops.nms import _nms_fixed, _nms_fixpoint
    from multiyolov5_tpu.utils.boxes import xywh2xyxy
    import jax.numpy as jnp

    for trial in range(4):
        n = 512
        ctr = rng.rand(n, 2) * 600
        wh = rng.rand(n, 2) * 120 + 4
        boxes = np.asarray(xywh2xyxy(jnp.asarray(
            np.concatenate([ctr, wh], 1), jnp.float32)))
        scores = np.sort(rng.rand(n).astype(np.float32))[::-1].copy()
        scores[-64:] = 0.0  # invalid tail
        md = 100 if trial % 2 else 300
        i1, v1 = map(np.asarray, _nms_fixed(jnp.asarray(boxes),
                                            jnp.asarray(scores), 0.45, md))
        i2, v2 = map(np.asarray, _nms_fixpoint(jnp.asarray(boxes),
                                               jnp.asarray(scores), 0.45, md))
        k1 = i1[np.asarray(v1, bool)]
        k2 = i2[np.asarray(v2, bool)]
        np.testing.assert_array_equal(np.sort(k1), np.sort(k2))
        # greedy emits picks in descending-score order; so does the fixpoint
        np.testing.assert_array_equal(k1, k2)


def test_nms_planar_matches_batched(rng):
    """ops/nms.nms_planar over per-scale (no, na, B, H*W) planar candidates
    == nms_batched(multi_label=False) over the flattened (B, N, no) tensor
    (same candidate order, same top-k ties, same greedy fixpoint)."""
    import jax.numpy as jnp
    from multiyolov5_tpu.ops.nms import nms_batched, nms_planar

    B, na, no = 2, 3, 11
    shapes = [(8, 16), (4, 8), (2, 4)]
    zs, flats = [], []
    for ny, nx in shapes:
        conf = (rng.rand(no, na, B, ny * nx) ** 2).astype(np.float32)
        xy = rng.rand(2, na, B, ny * nx).astype(np.float32) * 600
        wh = rng.rand(2, na, B, ny * nx).astype(np.float32) * 120 + 4
        z = np.concatenate([xy, wh, conf[4:]], 0)
        zs.append(jnp.asarray(z))
        # the (B, N, no) path's candidate order: per scale (anchor, pixel)
        flats.append(z.transpose(2, 1, 3, 0).reshape(B, na * ny * nx, no))
    pred = jnp.asarray(np.concatenate(flats, 1))

    for cmask in (None, jnp.asarray(
            (rng.rand(no - 5) > 0.4).astype(np.float32))):
        d1, v1 = nms_batched(pred, conf_thres=0.25, iou_thres=0.45,
                             class_mask=cmask, max_nms=64, max_det=20)
        d2, v2 = nms_planar(zs, conf_thres=0.25, iou_thres=0.45,
                            class_mask=cmask, max_nms=64, max_det=20)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                                   rtol=1e-5, atol=1e-4)
