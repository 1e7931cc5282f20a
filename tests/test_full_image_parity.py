"""Full-corpus e2e parity at the reference's 1024 operating point.

Round-1 verdict item 3: trained `pspv5s.pt` weights are unreachable (zero
network egress — see ACCURACY.md), so the accuracy story is pinned by
adversarial structural parity instead: the actual reference torch model
(random init, fp32) vs our engine on ALL 9 bundled reference images
(`/root/reference/data/images`) at img-size 1024, plus a quantified
bf16-vs-fp32 drift report.

Square (auto=False) letterboxing keeps every image at one (1024, 1024)
device shape so the whole corpus shares a single XLA compile per dtype.

Reference path restated: detect.py:134-193 (forward -> NMS -> scale_coords)
+ seg bilinear upsample/argmax (detect.py:176-183).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

IMG_SIZE = 1024
# Detection operating point (reference detect.py default).  Plain random
# init never exceeds conf≈0.0013 (obj bias init, heads.py:38-50), which
# would make box parity vacuous — and near the noise floor every score is
# a ~1e-4 tie, so NMS keep-sets are degenerate.  The staged fixture instead
# inflates the Detect obj/cls biases to produce hundreds of confident,
# well-separated boxes per image.
CONF = 0.25


@pytest.fixture(scope="module")
def staged(tmp_path_factory):
    import torch

    from test_e2e_app_parity import _greedy_nms_torch

    for name in ("onnx", "onnx.external_data_helper", "torchvision",
                 "torchvision.ops"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].ops = sys.modules["torchvision.ops"]
    sys.modules["torchvision.ops"].nms = _greedy_nms_torch
    sys.path.insert(0, REF)
    cwd = os.getcwd()
    os.chdir(REF)
    import importlib
    yolo = importlib.import_module("models.yolo")
    torch.manual_seed(3)
    model = yolo.Model(os.path.join(REF, "models", "yolov5s_city_seg.yaml"))
    model.eval()
    os.chdir(cwd)
    # Confident sparse random detector.  Plain random init compresses every
    # obj logit into ~[-6.7, -3.9] (spatial term w·x has std ~0.5): at any
    # conf threshold the candidates are near-ties and NMS keep-sets are
    # degenerate.  Fix: amplify the obj conv weights 8x (spreads the
    # spatially-VARYING term; a bias alone is spatially uniform), then
    # calibrate each detect level's obj bias on one real image so its 98th
    # pct logit sits at +1 → ~1-2% of the 64512 anchors pass conf=0.25
    # with scores spread over decades.  Class biases randomized for class
    # diversity.
    import cv2
    det = [m for m in model.model if m.__class__.__name__ == "Detect"][0]
    with torch.no_grad():
        no = det.no  # 5 + nc per anchor
        for conv in det.m:
            for a in range(det.na):
                conv.bias[a * no + 5: (a + 1) * no] = \
                    torch.randn(no - 5) * 2.0
        im0 = np.ascontiguousarray(
            cv2.imread(os.path.join(REF, "data/images/bus.jpg"))[:, :, ::-1])
        img = _letterbox_square(im0)
        x = torch.from_numpy(
            np.ascontiguousarray(img.transpose(2, 0, 1))).float() / 255.0

        # One forward with hooks captures the RAW detect conv outputs (the
        # sigmoid saturates, so post-activation measurement can't see the
        # logit scale).  Per level: w·x = raw - bias; rescale the obj row so
        # the top-3% tail of s·(w·x) spans ~4 logits, then set the bias so
        # the 97th percentile sits just under the threshold.  Result: ~1-2%
        # of anchors pass conf=0.25 with scores spread over decades.
        raws = []
        hooks = [conv.register_forward_hook(
            lambda mod, inp, out: raws.append(out.detach()))
            for conv in det.m]
        n_img = 0
        for path in _images():
            im0_i = np.ascontiguousarray(cv2.imread(path)[:, :, ::-1])
            xi = torch.from_numpy(np.ascontiguousarray(
                _letterbox_square(im0_i).transpose(2, 0, 1))).float() / 255.0
            model(xi[None])
            n_img += 1
        for h in hooks:
            h.remove()
        # per-conv raw outputs pooled over ALL images (image statistics vary
        # wildly — bus.jpg-only calibration left the ID_*.jpg images with
        # thousands of candidates, which saturates max_det and makes
        # keep-sets truncation-order-sensitive); q99.5 of the pooled w·x
        # keeps candidates moderate on every image
        pooled = [torch.cat([raws[k * len(det.m) + ci].flatten(2)
                             for k in range(n_img)], -1)
                  for ci in range(len(det.m))]
        for conv, raw in zip(det.m, pooled):
            for a in range(det.na):
                oc = a * no + 4
                wx = raw[0, oc] - conv.bias[oc]
                spread = float(wx.max() - wx.quantile(0.995)) or 1e-3
                s = 4.0 / spread
                conv.weight[oc] *= s
                conv.bias[oc] = -1.1 - s * float(wx.quantile(0.995))
    root = tmp_path_factory.mktemp("full_parity")
    ckpt = root / "w.pt"
    torch.save({"model": model, "ema": None}, str(ckpt))
    yield {"ckpt": str(ckpt), "model": model}
    sys.path.remove(REF)


def _images():
    d = os.path.join(REF, "data/images")
    return sorted(os.path.join(d, f) for f in os.listdir(d)
                  if f.lower().endswith((".jpg", ".png")))


def _letterbox_square(im0, size=IMG_SIZE):
    from multiyolov5_tpu.data.letterbox import letterbox
    img, _, _ = letterbox(im0, (size, size), auto=False)
    return img


@pytest.fixture(scope="module")
def ref_results(staged):
    """Reference torch fp32 on all 9 images @1024 square letterbox."""
    import cv2
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, REF)
    from utils.general import non_max_suppression, scale_coords
    sys.path.remove(REF)

    model = staged["model"].float().fuse().eval()
    out = {}
    with torch.no_grad():
        for path in _images():
            im0 = np.ascontiguousarray(
                cv2.imread(path)[:, :, ::-1])  # BGR->RGB like our engine
            img = _letterbox_square(im0)
            x = torch.from_numpy(
                np.ascontiguousarray(img.transpose(2, 0, 1))).float() / 255.0
            y = model(x[None])
            pred = non_max_suppression(y[0][0], CONF, 0.45)
            det = pred[0]
            if len(det):
                det[:, :4] = scale_coords(x.shape[1:], det[:, :4],
                                          im0.shape).round()
            seg = F.interpolate(y[1], (im0.shape[0], im0.shape[1]),
                                mode="bilinear", align_corners=True)[0]
            cls_map = seg.max(axis=0)[1].numpy().astype(np.uint8)
            out[os.path.basename(path)] = {"det": det.numpy(),
                                           "cls_map": cls_map,
                                           "im0_shape": im0.shape,
                                           "img": img}
    return out


def _run_ours(staged, ref_results, half):
    from multiyolov5_tpu.engine import Engine

    eng = Engine(staged["ckpt"], half=half)
    out = {}
    for name, want in ref_results.items():
        dets, masks = eng(want["img"][None], tuple(want["im0_shape"][:2]),
                          conf=CONF, iou=0.45)
        out[name] = {"det": dets[0], "cls_map": masks[0]}
    return out


def _greedy_match(a, b, iou_thr=0.5):
    """#boxes in `a` having an IoU>iou_thr same-class partner in `b`."""
    if not len(a) or not len(b):
        return 0
    ax1, ay1, ax2, ay2 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    bx1, by1, bx2, by2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    iw = np.clip(np.minimum(ax2, bx2) - np.maximum(ax1, bx1), 0, None)
    ih = np.clip(np.minimum(ay2, by2) - np.maximum(ay1, by1), 0, None)
    inter = iw * ih
    union = ((ax2 - ax1) * (ay2 - ay1)
             + (bx2 - bx1) * (by2 - by1) - inter + 1e-9)
    iou = inter / union
    same = a[:, 5:6] == b[None, :, 5]
    return int(((iou > iou_thr) & same).any(1).sum())


def test_fp32_parity_all_images(staged, ref_results):
    """fp32: per-image box sets + class maps match the reference.

    Counts must agree within ±2 (fp32 convolution rounding differs between
    XLA and torch by ~1 ulp, so candidates exactly AT conf=0.25 can flip),
    ≥97% of boxes must pair up at IoU>0.75 with the same class, and class
    maps must be ≥99.9% pixel-identical.
    """
    ours = _run_ours(staged, ref_results, half=False)
    for name, want in ref_results.items():
        got = ours[name]
        a, b = want["det"], got["det"]
        if len(a) == 300 or len(b) == 300:
            # max_det truncation: the rank-300 boundary is tie-sensitive
            # (and our max_nms=4096 pre-cap vs the reference's 30000 can
            # shift the deep tail); compare the unambiguous top half
            a, b = a[:150], b[:150]
        else:
            assert abs(len(b) - len(a)) <= 2, \
                f"{name}: {len(b)} vs {len(a)} boxes"
        if len(a):
            matched = _greedy_match(a, b, iou_thr=0.75)
            assert matched >= 0.97 * min(len(a), len(b)), \
                f"{name}: {matched}/{len(a)} matched"
        mismatch = (got["cls_map"] != want["cls_map"]).mean()
        assert mismatch < 1e-3, f"{name}: {mismatch:.4%} mask mismatch"


def test_fp32_parity_832_geometry(staged):
    """832: the reference's TRAIN img-size (README.md:91, check_img_size
    stride rule detect.py:101) and — unlike 1024 — not /128-divisible, so
    the Pallas packed-conv kernels compile their q=2 shapes instead of q=4
    (round-3 kernels gate on column geometry).  Same parity bars as @1024
    on a 3-image subset."""
    import cv2
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, REF)
    from utils.general import non_max_suppression, scale_coords
    sys.path.remove(REF)

    from multiyolov5_tpu.engine import Engine

    size = 832
    model = staged["model"].float().fuse().eval()
    eng = Engine(staged["ckpt"], half=False)
    with torch.no_grad():
        for path in _images()[:3]:
            im0 = np.ascontiguousarray(cv2.imread(path)[:, :, ::-1])
            img = _letterbox_square(im0, size)
            x = torch.from_numpy(
                np.ascontiguousarray(img.transpose(2, 0, 1))).float() / 255.0
            y = model(x[None])
            det = non_max_suppression(y[0][0], CONF, 0.45)[0]
            if len(det):
                det[:, :4] = scale_coords(x.shape[1:], det[:, :4],
                                          im0.shape).round()
            seg = F.interpolate(y[1], (im0.shape[0], im0.shape[1]),
                                mode="bilinear", align_corners=True)[0]
            want_map = seg.max(axis=0)[1].numpy().astype(np.uint8)
            a = det.numpy()

            dets, masks = eng(img[None], tuple(im0.shape[:2]),
                              conf=CONF, iou=0.45)
            b = dets[0]
            name = os.path.basename(path)
            if len(a) == 300 or len(b) == 300:
                a, b = a[:150], b[:150]
            else:
                assert abs(len(b) - len(a)) <= 2, \
                    f"{name}@832: {len(b)} vs {len(a)} boxes"
            if len(a):
                matched = _greedy_match(a, b, iou_thr=0.75)
                assert matched >= 0.97 * min(len(a), len(b)), \
                    f"{name}@832: {matched}/{len(a)}"
            mm = (masks[0] != want_map).mean()
            assert mm < 1e-3, f"{name}@832: {mm:.4%} mask mismatch"


def test_fp32_parity_batched_engine(staged, ref_results):
    """bs=2 through Engine: batched serving must reproduce the per-image
    results (the batch dimension hits different kernel block shapes)."""
    from multiyolov5_tpu.engine import Engine

    by_shape = {}
    for name, want in ref_results.items():
        by_shape.setdefault(tuple(want["im0_shape"][:2]), []).append(name)
    shape, names = max(by_shape.items(), key=lambda kv: len(kv[1]))
    assert len(names) >= 2, "fixture images all have distinct shapes"
    names = names[:2]
    eng = Engine(staged["ckpt"], half=False)
    batch = np.stack([ref_results[n]["img"] for n in names])
    dets, masks = eng(batch, shape, conf=CONF, iou=0.45)
    for k, n in enumerate(names):
        a, b = ref_results[n]["det"], dets[k]
        if len(a) == 300 or len(b) == 300:
            a, b = a[:150], b[:150]
        else:
            assert abs(len(b) - len(a)) <= 2, f"{n} bs2: {len(b)} vs {len(a)}"
        if len(a):
            matched = _greedy_match(a, b, iou_thr=0.75)
            assert matched >= 0.97 * min(len(a), len(b)), f"{n} bs2"
        mm = (masks[k] != ref_results[n]["cls_map"]).mean()
        assert mm < 1e-3, f"{n} bs2: {mm:.4%}"


def test_pallas_gate_predicates_cover_both_geometries():
    """The serving kernels gate on geometry (packed q by column count,
    dilation d<=q, stride-2 pairing, stem width); assert via the kernels'
    own eligibility predicates that the parity geometries above exercise
    every gate, including DIFFERENT packing factors at 1024 vs 832."""
    from multiyolov5_tpu.models.config import load_spec
    from multiyolov5_tpu.ops.pallas.c3_kernel import packed_q_for
    from multiyolov5_tpu.ops.stem import can_fold_stem

    spec = load_spec("yolov5s_city_seg")
    assert can_fold_stem(spec)              # u8 stem kernel gate
    for size in (1024, 832):
        # layer-2 C3 (32ch @ 1/4 res) rides the column-packed form at both
        # geometries
        assert packed_q_for(32, size // 4) > 1, size
        # stride-2 pairing gate: even H/W at every downsample level
        for s in (4, 8, 16):
            assert (size // s) % 2 == 0, (size, s)
        # seg-head dilated 3x3s (RFB2 d=2,3 @ 128ch) exceed the packed
        # kernel's 64-channel bound -> the plain dilated kernel runs
        assert packed_q_for(128, size // 8, d=2) == 0
    # 1024 and 832 compile different packed shapes (q=4 vs q=2): both
    # kernel variants are exercised by the parity sweep
    assert packed_q_for(32, 1024 // 4) == 4
    assert packed_q_for(32, 832 // 4) == 2
    # P3 64ch convs: packed @1024, but 104 columns don't pack (52 % 8 != 0)
    # -> the plain im2col kernel runs @832: both forms covered
    assert packed_q_for(64, 1024 // 8) == 2
    assert packed_q_for(64, 832 // 8) == 0
    # dilation fits the packed halo only for d <= q
    assert packed_q_for(32, 1024 // 4, d=3) > 0
    assert packed_q_for(64, 1024 // 8, d=3) == 0


def test_bf16_drift_report(staged, ref_results):
    """bf16 vs reference fp32: quantified drift (the serving configuration).

    Prints a per-image drift table (captured in ACCURACY.md) and asserts
    the drift stays within serving tolerances: ≥99% mask pixel agreement
    and ≥95% of fp32 boxes with conf>0.30 recovered at IoU>0.5 with
    matching class.  The 0.05 conf margin is deliberate: the calibrated
    fixture stacks most candidates just above the 0.25 threshold, where
    bf16's ~0.5% score error flips inclusion — that's threshold flicker,
    not detection drift, and a production conf threshold measures the same
    way (boxes near the cut are unstable under ANY reduced precision).
    """
    ours = _run_ours(staged, ref_results, half=True)
    rows = []
    for name, want in ref_results.items():
        got = ours[name]
        a, b = want["det"], got["det"]
        if len(a) == 300 or len(b) == 300:  # truncation boundary (see fp32)
            a, b = a[:150], b[:150]
        a_full = a                      # every fp32 box that survived NMS
        a = a[a[:, 4] > 0.30]
        n_ref, n_bf = len(a), len(b)
        matched = _greedy_match(a, b)
        # precision side (round-2 verdict item 3): bf16 boxes confidently
        # above the symmetric margin (conf > 0.30+0.05) with NO fp32
        # partner at IoU 0.5 are genuine false positives, not threshold
        # flicker — fp32 candidates anywhere >= 0.25 count as partners.
        b_hi = b[b[:, 4] > 0.35]
        extra = len(b_hi) - _greedy_match(b_hi, a_full)
        mask_mm = float((got["cls_map"] != want["cls_map"]).mean())
        rows.append((name, n_ref, n_bf, matched, len(b_hi), extra, mask_mm))
    print("\nbf16 drift vs reference fp32 @1024 (name, ref_boxes(conf>0.3), "
          "bf16_boxes, matched@iou0.5, bf16_boxes(conf>0.35), "
          "extra_beyond_margin, mask_mismatch):")
    for r in rows:
        print(f"  {r[0]:45s} {r[1]:3d} {r[2]:3d} {r[3]:3d} {r[4]:3d} "
              f"{r[5]:3d} {r[6]:.4%}")
    tot_ref = sum(r[1] for r in rows)
    tot_match = sum(r[3] for r in rows)
    tot_hi = sum(r[4] for r in rows)
    tot_extra = sum(r[5] for r in rows)
    worst_mask = max(r[6] for r in rows)
    print(f"  TOTAL boxes ref={tot_ref} matched={tot_match} "
          f"bf16_hi={tot_hi} extra_beyond_margin={tot_extra} "
          f"worst_mask_mismatch={worst_mask:.4%}")
    if tot_ref:
        assert tot_match >= 0.95 * tot_ref, (tot_match, tot_ref)
    # precision bound: <=5% of confident bf16 boxes may lack an fp32
    # partner (symmetric with the 95% recall bound)
    if tot_hi:
        assert tot_extra <= max(2, 0.05 * tot_hi), (tot_extra, tot_hi)
    assert worst_mask < 0.01, worst_mask
