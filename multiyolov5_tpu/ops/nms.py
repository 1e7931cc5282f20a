"""TPU-native non-maximum suppression.

Replaces the reference's host round-trip through ``torchvision.ops.nms``
(reference utils/general.py:421-509) with a fixed-shape, fully-jittable
pipeline that runs on device:

  1. conf = obj * cls; threshold; (optional) multi-label expansion
  2. top-k candidate selection (static ``max_nms`` cap)
  3. greedy NMS as a ``lax.scan`` of ``max_det`` argmax-pick/suppress steps —
     mathematically identical to sequential greedy NMS truncated at max_det
     (which is exactly what the reference does: torchvision nms then i[:max_det])
  4. class-offset trick for per-class batching (max_wh = 4096)

Everything is static-shaped: outputs are (B, max_det, 6) plus a validity mask,
so the kernel jits once per input geometry and pipelines cleanly.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.boxes import xywh2xyxy

MAX_WH = 4096.0   # class-offset magnitude (reference utils/general.py:434)


def _nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thres: float,
               max_det: int):
    """Greedy NMS over (N,4) xyxy + (N,) scores (score<=0 means invalid).

    Returns (idx (max_det,), valid (max_det,)) — indices into the input.
    On TPU this dispatches to the Pallas on-core kernel (the lax.scan
    formulation pays ~10us of while-loop overhead per pick); elsewhere it
    falls back to the scan.
    """
    n = boxes.shape[0]
    if jax.default_backend() == "tpu":
        from .pallas.nms_kernel import nms_pallas
        pad = (-n) % 128
        if pad:
            boxes = jnp.concatenate(
                [boxes, jnp.zeros((pad, 4), boxes.dtype)], 0)
            scores = jnp.concatenate(
                [scores, jnp.zeros((pad,), scores.dtype)], 0)
        return nms_pallas(boxes, scores, iou_thres, max_det)

    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    def body(carry, _):
        active = carry
        i = jnp.argmax(jnp.where(active, scores, -jnp.inf))
        ok = active[i] & (scores[i] > 0)
        # IoU of the pick vs all boxes computed on the fly: O(N) memory, so
        # large candidate caps (reference max_nms=30000) stay feasible
        bi = boxes[i]
        iw = jnp.clip(jnp.minimum(boxes[:, 2], bi[2])
                      - jnp.maximum(boxes[:, 0], bi[0]), 0.0, None)
        ih = jnp.clip(jnp.minimum(boxes[:, 3], bi[3])
                      - jnp.maximum(boxes[:, 1], bi[1]), 0.0, None)
        inter = iw * ih
        iou_row = inter / (area + area[i] - inter + 1e-9)
        overlap = iou_row > iou_thres
        active = active & jnp.where(ok, ~overlap, active)
        active = active.at[i].set(False)
        return active, (jnp.where(ok, i, -1), ok)

    active0 = scores > 0
    _, (idx, valid) = jax.lax.scan(body, active0, None, length=max_det)
    return idx, valid


@functools.partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "multi_label", "agnostic",
                     "max_nms", "max_det"))
def nms_batched(pred: jnp.ndarray, conf_thres: float = 0.25,
                iou_thres: float = 0.45, multi_label: bool = False,
                agnostic: bool = False, class_mask: Optional[jnp.ndarray] = None,
                max_nms: int = 4096, max_det: int = 300):
    """Device NMS over decoded predictions.

    Args:
      pred: (B, N, 5+nc) decoded boxes [xywh, obj, cls...] in pixels.
      class_mask: optional (nc,) float mask (1 keep / 0 drop) — the
        ``--classes`` filter.
    Returns:
      det: (B, max_det, 6) [xyxy, conf, cls];  valid: (B, max_det) bool.
    """
    b, n, no = pred.shape
    nc = no - 5
    multi_label = multi_label and nc > 1
    pred = pred.astype(jnp.float32)

    def per_image(p):
        obj = p[:, 4]
        cls_conf = p[:, 5:] * obj[:, None]          # (N, nc)
        box = xywh2xyxy(p[:, :4])                    # (N, 4)
        if multi_label:
            # per-(box, class) rows: masking before the threshold is
            # equivalent to the reference's post-hoc class filter
            if class_mask is not None:
                cls_conf = cls_conf * class_mask[None, :]
            flat = jnp.where(cls_conf > conf_thres, cls_conf, 0.0).reshape(-1)
            k = min(max_nms, flat.shape[0])
            scores, flat_idx = jax.lax.top_k(flat, k)
            bi = flat_idx // nc
            ci = (flat_idx % nc).astype(jnp.float32)
            cand_box = box[bi]
        else:
            # reference utils/general.py:467-473: argmax over ALL classes
            # first, THEN drop boxes whose best class isn't allowed — masking
            # before the argmax would wrongly re-assign the box to its best
            # allowed class
            conf = jnp.max(cls_conf, axis=1)
            ci_all = jnp.argmax(cls_conf, axis=1)
            keep = (obj > conf_thres) & (conf > conf_thres)
            if class_mask is not None:
                keep = keep & (class_mask[ci_all] > 0)
            conf = jnp.where(keep, conf, 0.0)
            k = min(max_nms, n)
            scores, bi = jax.lax.top_k(conf, k)
            ci = ci_all[bi].astype(jnp.float32)
            cand_box = box[bi]
        offset = jnp.where(agnostic, 0.0, ci * MAX_WH)
        idx, valid = _nms_fixed(cand_box + offset[:, None], scores, iou_thres, max_det)
        safe = jnp.clip(idx, 0, k - 1)
        out = jnp.concatenate([cand_box[safe], scores[safe, None], ci[safe, None]], -1)
        return jnp.where(valid[:, None], out, 0.0), valid

    if jax.default_backend() == "tpu":
        # the Pallas kernel's SMEM outputs don't vmap; unroll the (static,
        # small) batch dimension instead
        outs = [per_image(pred[i]) for i in range(b)]
        return (jnp.stack([o[0] for o in outs], 0),
                jnp.stack([o[1] for o in outs], 0))
    return jax.vmap(per_image)(pred)


def non_max_suppression(pred, conf_thres: float = 0.25, iou_thres: float = 0.45,
                        classes: Optional[Sequence[int]] = None,
                        agnostic: bool = False, multi_label: bool = False,
                        labels=(), max_nms: int = 4096,
                        max_det: int = 300) -> List[np.ndarray]:
    """Host-facing wrapper with the reference's public API
    (utils/general.py:421): returns a list of (n, 6) [xyxy, conf, cls]
    numpy arrays, one per image.

    ``labels`` (autolabelling, used by test.py --save-hybrid) are injected as
    conf-1.0 candidates like reference :448-455.
    """
    pred = jnp.asarray(pred)
    nc = pred.shape[2] - 5
    if labels:
        rows = []
        for xi in range(pred.shape[0]):
            l = np.asarray(labels[xi]) if len(labels) > xi else np.zeros((0, 5))
            v = np.zeros((len(l), nc + 5), np.float32)
            if len(l):
                v[:, :4] = l[:, 1:5]
                v[:, 4] = 1.0
                v[np.arange(len(l)), l[:, 0].astype(int) + 5] = 1.0
            rows.append(v)
        m = max(len(r) for r in rows)
        if m:
            padded = np.zeros((pred.shape[0], m, nc + 5), np.float32)
            for xi, r in enumerate(rows):
                padded[xi, : len(r)] = r
            pred = jnp.concatenate([pred, jnp.asarray(padded)], axis=1)

    cmask = None
    if classes is not None:
        cm = np.zeros((nc,), np.float32)
        cm[np.asarray(classes, int)] = 1.0
        cmask = jnp.asarray(cm)
    det, valid = nms_batched(pred, conf_thres=conf_thres, iou_thres=iou_thres,
                             multi_label=multi_label, agnostic=agnostic,
                             class_mask=cmask, max_nms=max_nms, max_det=max_det)
    det = np.asarray(det)
    valid = np.asarray(valid)
    return [det[i][valid[i]] for i in range(det.shape[0])]
