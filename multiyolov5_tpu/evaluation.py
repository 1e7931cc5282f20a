"""Evaluation: detection mAP + segmentation mIoU (reference test.py).

``evaluate_detection`` reproduces test.test() (test.py:77-340): rect loader,
conf 0.001 / iou 0.6 multi-label NMS, IoU-vector matching over
iouv=linspace(.5,.95,10), ap_per_class.

``seg_validation`` reproduces test.seg_validation (test.py:31-65): forward,
bilinear (align_corners) logits upsample to the ORIGINAL label size, streaming
intersection/union accumulation.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from .models.config import ModelSpec
from .models.model import forward
from .ops.nms import non_max_suppression
from .ops.resize import resize_bilinear
from .utils.boxes import box_iou, scale_coords, xywh2xyxy
from .utils.metrics import SegMetric, ap_per_class, ConfusionMatrix


def _match_predictions(detections: np.ndarray, labels: np.ndarray,
                       iouv: np.ndarray) -> np.ndarray:
    """Per-image TP matrix (n_pred, n_iou) — reference test.py:207-245."""
    correct = np.zeros((detections.shape[0], iouv.size), bool)
    if len(labels) == 0 or len(detections) == 0:
        return correct
    detected: set = set()
    tcls = labels[:, 0]
    tbox = labels[:, 1:5]
    for cls in np.unique(tcls):
        ti = np.where(cls == tcls)[0]
        pi = np.where(cls == detections[:, 5])[0]
        if len(pi):
            iou_m = np.asarray(box_iou(detections[pi, :4], tbox[ti]))
            ious = iou_m.max(1)
            idx = iou_m.argmax(1)
            for j in np.where(ious > iouv[0])[0]:
                d = ti[idx[j]]
                if d not in detected:
                    detected.add(d)
                    correct[pi[j]] = ious[j] > iouv
                    if len(detected) == len(labels):
                        break
    return correct


def evaluate_detection(spec: ModelSpec, params, state, loader, names=None,
                       conf_thres: float = 0.001, iou_thres: float = 0.6,
                       fused: bool = False, compute_dtype=None,
                       plots: bool = False, save_dir: str = ".",
                       verbose: bool = False, single_cls: bool = False,
                       loss_hyp: Optional[Dict] = None,
                       save_txt: bool = False, save_conf: bool = False,
                       save_json: bool = False,
                       anno_json: Optional[str] = None,
                       wandb_logger=None):
    """Returns ((P, R, mAP50, mAP, vbox, vobj, vcls), maps_per_class, times)."""
    import jax
    import jax.numpy as jnp

    iouv = np.linspace(0.5, 0.95, 10)
    stats: List = []
    seen = 0
    # NOTE: t_inf/t_nms are host wall-clock around async dispatches — on a
    # tunneled dev TPU they measure the tunnel RTT, not the chip (they can
    # overstate device time 10x+).  They mirror the reference test.py's
    # printed speeds; for trustworthy numbers use bench.py (in-graph
    # repetition) or tools/trace_report.py (device-lane trace).
    t_inf = t_nms = 0.0
    confusion = ConfusionMatrix(nc=spec.nc) if plots else None
    loss_items = np.zeros(3)

    jdict: List[Dict] = []
    txt_dir = Path(save_dir) / "labels"
    if save_txt:
        txt_dir.mkdir(parents=True, exist_ok=True)

    det_loss = None
    if loss_hyp is not None:
        from .train.losses import DetectionLoss
        det_loss = DetectionLoss(
            nc=spec.nc, na=spec.na,
            anchors=np.asarray(spec.anchors, np.float32).reshape(
                spec.nl, spec.na, 2) / np.asarray(spec.strides, np.float32)[:, None, None],
            strides=spec.strides, hyp=loss_hyp)

    fwd_cache = {}

    def run_model(imgs):
        key = imgs.shape
        if key not in fwd_cache:
            def f(p, s, x):
                det, _, _ = forward(spec, p, s, x, train=False, fused=fused,
                                    decode=True,
                                    compute_dtype=compute_dtype)
                return det
            fwd_cache[key] = jax.jit(f)
        return fwd_cache[key](params, state, jnp.asarray(imgs))

    n_batches = 0
    for imgs, targets, tmask, paths, shapes in loader:
        n_batches += 1
        x = imgs.astype(np.float32) / 255.0
        t0 = time.time()
        z, raw = run_model(x)  # stays on device: NMS consumes it directly
        t_inf += time.time() - t0
        if det_loss is not None:
            import jax.numpy as jnp
            _, items = det_loss([jnp.asarray(r) for r in raw],
                                jnp.asarray(targets), jnp.asarray(tmask))
            loss_items += np.asarray(items)[:3]
        t0 = time.time()
        preds = non_max_suppression(z, conf_thres=conf_thres,
                                    iou_thres=iou_thres, multi_label=True,
                                    max_nms=30000)  # reference cap (:439)
        t_nms += time.time() - t0

        h, w = imgs.shape[1:3]
        for si, pred in enumerate(preds):
            lmask = tmask[si]
            l = targets[si][lmask]
            tcls = l[:, 0].tolist() if len(l) else []
            seen += 1
            if len(pred) == 0:
                if len(l):
                    stats.append((np.zeros((0, iouv.size), bool),
                                  np.zeros(0), np.zeros(0), tcls))
                continue
            if single_cls:
                pred = pred.copy()
                pred[:, 5] = 0
            predn = pred.copy()
            if shapes[si] is not None:
                (h0, w0), ratio_pad = shapes[si]
                predn[:, :4] = np.asarray(scale_coords(
                    (h, w), predn[:, :4], (h0, w0), ratio_pad))[:, :4]
            if wandb_logger is not None and wandb_logger.val_table_map \
                    and seen <= wandb_logger.log_imgs:
                # per-image bbox debug panel (reference test.py:220-221)
                wandb_logger.log_training_progress(
                    predn, paths[si],
                    dict(enumerate(names or map(str, range(spec.nc)))))
            if save_txt and shapes[si] is not None:
                from .utils.boxes import xyxy2xywh
                (h0, w0), _ = shapes[si]
                gn = np.array([w0, h0, w0, h0])
                stem = Path(paths[si]).stem
                with open(txt_dir / f"{stem}.txt", "a") as fh:
                    for *xyxy, pconf, pcls in predn:
                        xywh = (np.asarray(xyxy2xywh(np.array(xyxy)[None]))
                                / gn).ravel()
                        line = (pcls, *xywh, pconf) if save_conf else (pcls, *xywh)
                        fh.write(("%g " * len(line)).rstrip() % line + "\n")
            if save_json:  # pycocotools-style records (reference :300-330)
                from .utils.boxes import xyxy2xywh
                stem = Path(paths[si]).stem
                image_id = int(stem) if stem.isnumeric() else stem
                box = np.asarray(xyxy2xywh(predn[:, :4]))
                box[:, :2] -= box[:, 2:] / 2  # center -> top-left
                for p, b in zip(predn.tolist(), box.tolist()):
                    jdict.append({"image_id": image_id,
                                  "category_id": int(p[5]),
                                  "bbox": [round(x, 3) for x in b],
                                  "score": round(p[4], 5)})
            if len(l):
                tbox = np.asarray(xywh2xyxy(l[:, 1:5])) * [w, h, w, h]
                if shapes[si] is not None:
                    (h0, w0), ratio_pad = shapes[si]
                    tbox = np.asarray(scale_coords((h, w), tbox, (h0, w0),
                                                   ratio_pad))[:, :4]
                labelsn = np.concatenate([l[:, 0:1], tbox], 1)
                correct = _match_predictions(predn, labelsn, iouv)
                if confusion is not None:
                    confusion.process_batch(predn, labelsn)
            else:
                correct = np.zeros((pred.shape[0], iouv.size), bool)
            stats.append((correct, pred[:, 4], pred[:, 5], tcls))

    stats_np = [np.concatenate([np.atleast_1d(np.asarray(x[i])) if len(x[i])
                                else np.zeros((0, iouv.size) if i == 0 else 0)
                                for x in stats], 0) for i in range(4)]
    if len(stats_np[0]) and stats_np[0].any():
        p, r, ap, f1, ap_class = ap_per_class(
            *stats_np, plot=plots, save_dir=save_dir, names=names or [])
        ap50, ap_m = ap[:, 0], ap.mean(1)
        mp, mr, map50, map_ = p.mean(), r.mean(), ap50.mean(), ap_m.mean()
        nt = np.bincount(stats_np[3].astype(np.int64), minlength=spec.nc)
    else:
        mp = mr = map50 = map_ = 0.0
        ap_m, ap_class = np.zeros(0), np.zeros(0, int)
        nt = np.zeros(spec.nc)

    maps = np.zeros(spec.nc) + map_
    for i, c in enumerate(ap_class):
        maps[int(c)] = ap_m[i]
    if verbose and len(ap_class) and names:
        # per-class table (reference test.py:287-290)
        print(f"{'class':>20s}{'labels':>9s}{'P':>10s}{'R':>10s}"
              f"{'mAP@.5':>10s}{'mAP@.5:.95':>11s}")
        for i, c in enumerate(ap_class):
            print(f"{names[int(c)]:>20s}{int(nt[int(c)]):>9d}{p[i]:>10.3g}"
                  f"{r[i]:>10.3g}{ap50[i]:>10.3g}{ap_m[i]:>11.3g}")
    if confusion is not None:
        confusion.plot(save_dir=save_dir, names=names or [])
    # per-batch mean like reference test.py (loss divided by len(dataloader))
    loss_avg = loss_items / max(n_batches, 1)
    if save_json and jdict:
        import json as json_lib
        pred_json = Path(save_dir) / "predictions.json"
        with open(pred_json, "w") as fh:
            json_lib.dump(jdict, fh)
        print(f"saved {len(jdict)} COCO-format predictions to {pred_json}")
        # Official COCOeval on the dump (reference test.py:308-330).
        # Import-guarded: the package isn't in this image; the JSON is
        # always saved so the eval can also run offline elsewhere.
        if anno_json is not None:
            try:
                from pycocotools.coco import COCO
                from pycocotools.cocoeval import COCOeval

                anno = COCO(str(anno_json))
                pred = anno.loadRes(str(pred_json))
                ce = COCOeval(anno, pred, "bbox")
                img_ids = [j["image_id"] for j in jdict]
                if all(isinstance(i, int) for i in img_ids):
                    ce.params.imgIds = sorted(set(img_ids))
                ce.evaluate()
                ce.accumulate()
                ce.summarize()
                map_, map50 = float(ce.stats[0]), float(ce.stats[1])
            except ImportError:
                print("pycocotools not installed — skipping official "
                      "COCOeval (predictions.json saved for offline eval)")
            except Exception as e:  # malformed annotations etc., ref:328
                print(f"COCOeval failed: {e}")
    print(f"Detection: {seen} images, {int(nt.sum())} labels | "
          f"P {mp:.4g} R {mr:.4g} mAP@.5 {map50:.4g} mAP@.5:.95 {map_:.4g}")
    return (mp, mr, map50, map_, *loss_avg.tolist()), maps, (t_inf, t_nms, seen)


def seg_validation(spec: ModelSpec, params, state, loader, nclass: int,
                   fused: bool = False, compute_dtype=None,
                   exact: bool = True) -> Tuple[float, float]:
    """Streaming (pixAcc, mIoU) — reference test.py:31-65."""
    import jax
    import jax.numpy as jnp

    metric = SegMetric(nclass)
    cache = {}

    def run(imgs, out_hw):
        key = (imgs.shape, out_hw)
        if key not in cache:
            def f(p, s, x):
                _, seg, _ = forward(spec, p, s, x, train=False, fused=fused,
                                    decode=False, compute_dtype=compute_dtype)
                if isinstance(seg, (list, tuple)):
                    seg = seg[0]
                seg = seg.astype(jnp.float32) if exact else seg
                seg = resize_bilinear(seg, out_hw, align_corners=True)
                return jnp.argmax(seg, -1).astype(jnp.int32)
            cache[key] = jax.jit(f)
        return cache[key](params, state, jnp.asarray(imgs))

    for imgs, masks in loader:
        pred = np.asarray(run(imgs, tuple(masks.shape[1:3])))
        metric.update(pred, masks)
    print(f"Segmentation: pixAcc {metric.pix_acc:.4f}, mIoU {metric.miou:.4f}")
    return metric.pix_acc, metric.miou
