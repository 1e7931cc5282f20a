"""AutoAnchor: BPR check + k-means/genetic anchor evolution
(reference utils/autoanchor.py), torch-free."""

from __future__ import annotations

import random
from typing import Sequence

import numpy as np


def check_anchor_order(anchors: np.ndarray, strides: Sequence[int]) -> np.ndarray:
    """Reverse anchors if area order disagrees with stride order
    (reference utils/autoanchor.py:12-20).  anchors: (nl, na, 2)."""
    # flat per-anchor areas, first vs last — exactly the reference's
    # anchor_grid.prod(-1).view(-1) comparison (and the same rule as
    # models/config._check_anchor_order)
    a = anchors.reshape(-1, 2).prod(-1)
    da = a[-1] - a[0]
    ds = strides[-1] - strides[0]
    if np.sign(da) != np.sign(ds):
        return anchors[::-1].copy()
    return anchors


def metric_bpr(anchors_wh: np.ndarray, wh: np.ndarray, thr: float = 4.0):
    """Best-possible-recall + anchors-above-threshold
    (reference utils/autoanchor.py:30-37)."""
    r = wh[:, None] / anchors_wh[None]
    x = np.minimum(r, 1.0 / r).min(2)
    best = x.max(1)
    aat = (x > 1.0 / thr).sum(1).mean()
    bpr = (best > 1.0 / thr).mean()
    return bpr, aat


def check_anchors(dataset, spec, thr: float = 4.0, imgsz: int = 640):
    """BPR >= 0.98 gate; re-run kmeans otherwise (reference :23-59).
    Mutates spec.anchors in place (grid-unit anchors derive from them)."""
    shapes = imgsz * dataset.shapes / dataset.shapes.max(1, keepdims=True)
    scale = np.random.uniform(0.9, 1.1, size=(shapes.shape[0], 1))
    wh = np.concatenate([l[:, 3:5] * s for s, l in zip(shapes * scale,
                                                       dataset.labels) if len(l)])
    anchors = np.asarray(spec.anchors, np.float32).reshape(-1, 2)
    bpr, aat = metric_bpr(anchors, wh, thr)
    print(f"autoanchor: anchors/target = {aat:.2f}, BPR = {bpr:.4f}")
    if bpr < 0.98:
        print("autoanchor: attempting to improve anchors...")
        na = anchors.shape[0]
        new = kmean_anchors(dataset, n=na, img_size=imgsz, thr=thr, gen=1000,
                            verbose=False)
        new_bpr = metric_bpr(new, wh, thr)[0]
        if new_bpr > bpr:
            nl = spec.nl
            new = new.reshape(nl, -1, 2)
            new = check_anchor_order(new, spec.strides)
            spec.anchors = [list(a.reshape(-1)) for a in new]
            print("autoanchor: new anchors saved to spec")
        else:
            print("autoanchor: original anchors better, keeping")
    return spec.anchors


def kmean_anchors(dataset=None, n: int = 9, img_size: int = 640,
                  thr: float = 4.0, gen: int = 1000, verbose: bool = True,
                  wh: np.ndarray = None) -> np.ndarray:
    """k-means + 1000-generation genetic mutation on anchor wh
    (reference utils/autoanchor.py:62-160)."""
    from scipy.cluster.vq import kmeans

    thr = 1.0 / thr

    def metric(k, wh_):
        r = wh_[:, None] / k[None]
        x = np.minimum(r, 1.0 / r).min(2)
        return x, x.max(1)

    def anchor_fitness(k):
        _, best = metric(k, wh)
        return (best * (best > thr)).mean()

    if wh is None:
        shapes = img_size * dataset.shapes / dataset.shapes.max(1, keepdims=True)
        wh0 = np.concatenate([l[:, 3:5] * s for s, l in zip(shapes, dataset.labels)
                              if len(l)])
        i = (wh0 < 3.0).any(1).sum()
        if i:
            print(f"autoanchor: WARNING: {i} of {len(wh0)} labels are < 3 px")
        wh = wh0[(wh0 >= 2.0).any(1)]

    s = wh.std(0)
    k, _ = kmeans(wh / s, n, iter=30)
    assert len(k) == n, "kmeans returned fewer clusters than requested"
    k *= s
    k = k[np.argsort(k.prod(1))]

    # genetic evolution
    npr = np.random
    f = anchor_fitness(k)
    sh = k.shape
    mp, sigma = 0.9, 0.1
    for _ in range(gen):
        v = np.ones(sh)
        while (v == 1).all():
            v = ((npr.random(sh) < mp) * npr.random() *
                 npr.randn(*sh) * sigma + 1).clip(0.3, 3.0)
        kg = (k * v).clip(min=2.0)
        fg = anchor_fitness(kg)
        if fg > f:
            f, k = fg, kg.copy()
    k = k[np.argsort(k.prod(1))]
    if verbose:
        x, best = metric(k, wh)
        bpr = (best > thr).mean()
        print(f"autoanchor: fitness={f:.4f}, BPR={bpr:.4f}")
    return k
