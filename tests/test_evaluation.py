"""Detection-eval matching logic and mAP sanity."""

import numpy as np
import pytest
import torch

from multiyolov5_tpu.evaluation import _match_predictions
from multiyolov5_tpu.utils.metrics import ap_per_class


def torch_reference_match(detections, labels, iouv):
    """Restatement of reference test.py:207-245 matching in torch."""
    from multiyolov5_tpu.utils.boxes import box_iou

    correct = torch.zeros(detections.shape[0], iouv.size, dtype=torch.bool)
    detected = []
    tcls_tensor = torch.from_numpy(labels[:, 0])
    tbox = torch.from_numpy(labels[:, 1:5])
    det_t = torch.from_numpy(detections)
    for cls in torch.unique(tcls_tensor):
        ti = (cls == tcls_tensor).nonzero(as_tuple=False).view(-1)
        pi = (cls == det_t[:, 5]).nonzero(as_tuple=False).view(-1)
        if pi.shape[0]:
            iou_m = torch.from_numpy(np.asarray(box_iou(
                detections[pi.numpy(), :4], labels[ti.numpy(), 1:5])))
            ious, i = iou_m.max(1)
            detected_set = set()
            for j in (ious > iouv[0]).nonzero(as_tuple=False):
                d = ti[i[j]]
                if d.item() not in detected_set:
                    detected_set.add(d.item())
                    detected.append(d)
                    correct[pi[j]] = torch.from_numpy(
                        (ious[j].numpy() > iouv))
                    if len(detected) == labels.shape[0]:
                        break
    return correct.numpy()


def test_matching_parity(rng):
    iouv = np.linspace(0.5, 0.95, 10)
    for trial in range(5):
        nl, nd = rng.randint(1, 8), rng.randint(0, 12)
        labels = np.zeros((nl, 5), np.float32)
        labels[:, 0] = rng.randint(0, 3, nl)
        xy = rng.rand(nl, 2) * 200
        wh = rng.rand(nl, 2) * 60 + 10
        labels[:, 1:3] = xy
        labels[:, 3:5] = xy + wh
        dets = np.zeros((nd, 6), np.float32)
        if nd:
            # half the detections jitter real labels, half are random
            for k in range(nd):
                if k < nl and rng.rand() < 0.7:
                    dets[k, :4] = labels[k, 1:5] + rng.randn(4) * 4
                    dets[k, 5] = labels[k, 0]
                else:
                    dxy = rng.rand(2) * 200
                    dets[k, :4] = [*dxy, *(dxy + rng.rand(2) * 60 + 5)]
                    dets[k, 5] = rng.randint(0, 3)
                dets[k, 4] = rng.rand()
        got = _match_predictions(dets, labels, iouv)
        want = torch_reference_match(dets, labels, iouv)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_perfect_predictions_give_map_1():
    iouv = np.linspace(0.5, 0.95, 10)
    stats = []
    rng = np.random.RandomState(0)
    for _ in range(10):
        nl = rng.randint(1, 5)
        labels = np.zeros((nl, 5), np.float32)
        labels[:, 0] = rng.randint(0, 3, nl)
        xy = rng.rand(nl, 2) * 300
        labels[:, 1:3] = xy
        labels[:, 3:5] = xy + rng.rand(nl, 2) * 50 + 20
        dets = np.concatenate([labels[:, 1:5],
                               np.full((nl, 1), 0.9, np.float32),
                               labels[:, :1]], 1)
        correct = _match_predictions(dets, labels, iouv)
        stats.append((correct, dets[:, 4], dets[:, 5], labels[:, 0].tolist()))
    stats_np = [np.concatenate([np.atleast_1d(np.asarray(x[i])) for x in stats], 0)
                for i in range(4)]
    p, r, ap, f1, cls = ap_per_class(*stats_np)
    assert ap[:, 0].mean() > 0.99   # mAP@0.5 == 1
    assert ap.mean() > 0.99         # mAP@0.5:0.95 == 1
