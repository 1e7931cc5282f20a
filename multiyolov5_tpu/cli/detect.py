"""Inference app — CLI-compatible with reference detect.py:242-263.

Outputs per frame (reference detect.py:191-233): annotated image, colorized
mask (``*_mask``), 0.4/0.6 overlay (``*_dst``), optional yolo-format txt,
optional per-video writer, ``--save-as-video`` stitcher, and ``--submit``
trainId->labelId Cityscapes server export under ``results/``.

Run: ``python -m multiyolov5_tpu.cli.detect --weights pspv5s.pt --source dir``.
"""

from __future__ import annotations

import argparse
import os
import time
from pathlib import Path

import numpy as np

from ..data.cityscapes import (CITYSCAPES_COLORMAP, CITYSCAPES_IDMAP,
                               label2image, trainid2id)
from ..data.letterbox import check_img_size
from ..data.sources import LoadImages, LoadStreams
from ..engine import Engine
from ..utils.boxes import xyxy2xywh
from ..utils.general import increment_path, set_logging
from ..utils.plots import plot_one_box


def detect(opt):
    import cv2

    source, weights, save_txt = opt.source, opt.weights, opt.save_txt
    save_img = not opt.nosave and not source.endswith(".txt")
    webcam = source.isnumeric() or source.endswith(".txt") or \
        source.lower().startswith(("rtsp://", "rtmp://", "http://", "https://"))

    save_dir = Path(increment_path(Path(opt.project) / opt.name,
                                   exist_ok=opt.exist_ok))
    (save_dir / "labels" if save_txt else save_dir).mkdir(parents=True, exist_ok=True)
    sub_dir = None
    if opt.submit:
        sub_dir = str(save_dir) + "/results/"
        os.makedirs(sub_dir, exist_ok=True)

    set_logging()
    # a list of weights builds an NMS ensemble (reference attempt_load)
    w = weights if isinstance(weights, list) and len(weights) > 1 else (
        weights[0] if isinstance(weights, list) else weights)
    engine = Engine(w, cfg=opt.cfg, half=not opt.no_half)
    imgsz = check_img_size(opt.img_size, engine.stride)

    if webcam:
        dataset = LoadStreams(source, img_size=imgsz, stride=engine.stride)
    else:
        dataset = LoadImages(source, img_size=imgsz, stride=engine.stride,
                             auto=not (opt.submit or opt.save_as_video))

    names = engine.names
    rng = np.random.RandomState(0)
    colors = [[int(rng.randint(0, 255)) for _ in range(3)] for _ in names]

    vid_path, vid_writer, s_writer = None, None, None
    t0 = time.time()
    for path, img, im0s, vid_cap in dataset:
        im_batch = img if img.ndim == 4 else img[None]
        im0_list = im0s if isinstance(im0s, list) else [im0s]
        t1 = time.time()
        # per-original-shape groups: the coordinate unmap and mask resize are
        # baked per orig_hw, so multi-stream batches with differing source
        # resolutions must not share one shape
        dets = [None] * len(im0_list)
        masks = [None] * len(im0_list)
        shape_groups: dict = {}
        for i, im0 in enumerate(im0_list):
            shape_groups.setdefault(tuple(im0.shape[:2]), []).append(i)
        for orig_hw, idxs in shape_groups.items():
            d, m = engine(
                im_batch[idxs], orig_hw, conf=opt.conf_thres,
                iou=opt.iou_thres, classes=opt.classes,
                agnostic=opt.agnostic_nms, augment=opt.augment)
            for j, i in enumerate(idxs):
                dets[i] = d[j]
                masks[i] = m[j]
        t2 = time.time()

        for i, det in enumerate(dets):
            if webcam:
                p, s, im0 = path[i], f"{i}: ", im0_list[i].copy()
                frame = dataset.count
            else:
                p, s, im0 = path, "", im0_list[0]
                frame = getattr(dataset, "frame", 0)
            p = Path(p)
            save_path = str(save_dir / p.name)
            txt_path = str(save_dir / "labels" / p.stem) + (
                "" if dataset.mode == "image" else f"_{frame}")
            s += "%gx%g " % im_batch.shape[1:3]
            gn = np.array(im0.shape)[[1, 0, 1, 0]]
            if len(det):
                for c in np.unique(det[:, -1]):
                    n = int((det[:, -1] == c).sum())
                    s += f"{n} {names[int(c)]}{'s' * (n > 1)}, "
                for *xyxy, conf, cls in reversed(det):
                    if save_txt:
                        xywh = (xyxy2xywh(np.array(xyxy)[None]) / gn).ravel().tolist()
                        line = (cls, *xywh, conf) if opt.save_conf else (cls, *xywh)
                        with open(txt_path + ".txt", "a") as f:
                            f.write(("%g " * len(line)).rstrip() % line + "\n")
                    if save_img or opt.view_img:
                        label = f"{names[int(cls)]} {conf:.2f}"
                        plot_one_box(xyxy, im0, label=label,
                                     color=colors[int(cls)], line_thickness=3)
            print(f"{s}Done. ({t2 - t1:.5f}s)")

            mask_map = masks[i]
            mask = dst = None
            if mask_map is not None:
                mask = label2image(mask_map, CITYSCAPES_COLORMAP)[:, :, ::-1]  # BGR
                dst = cv2.addWeighted(mask, 0.4, im0, 0.6, 0)
            if opt.view_img:
                cv2.imshow(str(p), im0)
                if mask is not None:
                    cv2.imshow("segmentation", mask)
                    cv2.imshow("mix", dst)
                # reference detect.py:182 uses waitKey(1); blocking per-frame
                # would freeze webcam/stream sources
                cv2.waitKey(0 if dataset.mode == "image" else 1)
            if opt.submit and mask_map is not None:
                sub_path = sub_dir + str(p.name)
                sub_path = sub_path[:-4] + "_pred.png"
                cv2.imwrite(sub_path, trainid2id(mask_map, CITYSCAPES_IDMAP))
            if save_img:
                if dataset.mode == "image":
                    cv2.imwrite(save_path, im0)
                    if mask is not None:
                        cv2.imwrite(save_path[:-4] + "_mask" + save_path[-4:], mask)
                        cv2.imwrite(save_path[:-4] + "_dst" + save_path[-4:], dst)
                else:
                    out_frame = dst if dst is not None else im0
                    if vid_path != save_path:
                        vid_path = save_path
                        if isinstance(vid_writer, cv2.VideoWriter):
                            vid_writer.release()
                        if vid_cap:
                            fps = vid_cap.get(cv2.CAP_PROP_FPS)
                            wv = int(vid_cap.get(cv2.CAP_PROP_FRAME_WIDTH))
                            hv = int(vid_cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
                        else:
                            fps, wv, hv = 30, out_frame.shape[1], out_frame.shape[0]
                            save_path += ".mp4"
                        vid_writer = cv2.VideoWriter(
                            save_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (wv, hv))
                    vid_writer.write(out_frame)
            if opt.save_as_video:
                out_frame = dst if dst is not None else im0
                if not s_writer:
                    fps, wv, hv = 30, out_frame.shape[1], out_frame.shape[0]
                    s_writer = cv2.VideoWriter(
                        str(save_dir / "out.mp4"),
                        cv2.VideoWriter_fourcc(*"mp4v"), fps, (wv, hv))
                s_writer.write(out_frame)

    if save_txt or save_img:
        print(f"Results saved to {save_dir}")
    if s_writer is not None:
        s_writer.release()
    if isinstance(vid_writer, cv2.VideoWriter):
        vid_writer.release()
    print(f"Done. ({time.time() - t0:.3f}s)")
    return str(save_dir)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", nargs="+", type=str, default="yolov5s.pt",
                        help="model .pt/.npz path(s)")
    parser.add_argument("--cfg", type=str, default=None,
                        help="model config (zoo name or yaml) if weights lack one")
    parser.add_argument("--source", type=str, default="data/images")
    parser.add_argument("--img-size", type=int, default=640)
    parser.add_argument("--conf-thres", type=float, default=0.25)
    parser.add_argument("--iou-thres", type=float, default=0.45)
    parser.add_argument("--device", default="", help="unused (TPU auto)")
    parser.add_argument("--view-img", action="store_true")
    parser.add_argument("--save-txt", action="store_true")
    parser.add_argument("--save-conf", action="store_true")
    parser.add_argument("--nosave", action="store_true")
    parser.add_argument("--classes", nargs="+", type=int)
    parser.add_argument("--agnostic-nms", action="store_true")
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--update", action="store_true", help="no-op (parity)")
    parser.add_argument("--project", default="runs/detect")
    parser.add_argument("--name", default="exp")
    parser.add_argument("--exist-ok", action="store_true")
    parser.add_argument("--save-as-video", action="store_true")
    parser.add_argument("--submit", action="store_true")
    parser.add_argument("--no-half", action="store_true",
                        help="disable bf16 inference (fp32 exactness)")
    return parser


def main(argv=None):
    opt = build_parser().parse_args(argv)
    print(opt)
    return detect(opt)


if __name__ == "__main__":
    main()
