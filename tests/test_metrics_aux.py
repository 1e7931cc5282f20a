"""Metrics + aux utilities parity vs the reference implementations."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_metrics():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvo = types.ModuleType("torchvision.ops")
        tvo.nms = None
        tv.ops = tvo
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tvo
    sys.path.insert(0, REF)
    cwd = os.getcwd()
    os.chdir(REF)
    try:
        import importlib
        importlib.import_module("utils.general")  # break the circular import
        m = importlib.import_module("utils.metrics")
    finally:
        os.chdir(cwd)
    yield m
    sys.path.remove(REF)


def test_ap_per_class_matches_reference(ref_metrics, rng):
    from multiyolov5_tpu.utils.metrics import ap_per_class

    n = 200
    tp = (rng.rand(n, 10) > 0.5)
    tp = np.sort(tp, 1)[:, ::-1]  # monotone over IoU thresholds like real TPs
    conf = rng.rand(n)
    pred_cls = rng.randint(0, 5, n).astype(float)
    target_cls = rng.randint(0, 5, 300).astype(float)
    got = ap_per_class(tp.copy(), conf.copy(), pred_cls.copy(), target_cls.copy())
    want = ref_metrics.ap_per_class(tp.copy(), conf.copy(), pred_cls.copy(),
                                    target_cls.copy())
    for g, w, name in zip(got, want, ("p", "r", "ap", "f1", "cls")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6,
                                   err_msg=name)


def test_fitness_formulae(ref_metrics):
    from multiyolov5_tpu.utils.metrics import fitness, fitness2

    x = np.array([[0.5, 0.6, 0.7, 0.4]])
    np.testing.assert_allclose(fitness(x), ref_metrics.fitness(x))
    np.testing.assert_allclose(fitness2(x, 0.73), ref_metrics.fitness2(x, 0.73))


def test_seg_iou_matches_reference(ref_metrics, rng):
    import torch
    from multiyolov5_tpu.utils.metrics import (batch_intersection_union,
                                               batch_pix_accuracy)

    logits = rng.randn(2, 19, 32, 48).astype(np.float32)  # NCHW for reference
    target = rng.randint(-1, 19, (2, 32, 48))
    t_out = torch.from_numpy(logits)
    t_tgt = torch.from_numpy(target)
    want_i, want_u = ref_metrics.batch_intersection_union(t_out, t_tgt, 19)
    want_c, want_l = ref_metrics.batch_pix_accuracy(t_out, t_tgt)
    nhwc = np.transpose(logits, (0, 2, 3, 1))
    got_i, got_u = batch_intersection_union(nhwc, target, 19)
    got_c, got_l = batch_pix_accuracy(nhwc, target)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_array_equal(got_u, want_u)
    assert (got_c, got_l) == (int(want_c), int(want_l))


def test_seg_confusion_device_matches_host(rng):
    import jax.numpy as jnp
    from multiyolov5_tpu.utils.metrics import (batch_intersection_union,
                                               seg_confusion_device)

    logits = rng.randn(2, 16, 24, 19).astype(np.float32)
    target = rng.randint(-1, 19, (2, 16, 24))
    di, du = seg_confusion_device(jnp.asarray(logits), jnp.asarray(target), 19)
    hi, hu = batch_intersection_union(logits, target, 19)
    np.testing.assert_allclose(np.asarray(di), hi)
    np.testing.assert_allclose(np.asarray(du), hu)


def test_param_count_matches_reference_model():
    """Our init must produce exactly the reference's parameter count."""
    import torch

    for name in ("onnx", "onnx.external_data_helper"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvo = types.ModuleType("torchvision.ops")
        tvo.nms = None
        tv.ops = tvo
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tvo
    sys.path.insert(0, REF)
    cwd = os.getcwd()
    os.chdir(REF)
    try:
        import importlib
        yolo = importlib.import_module("models.yolo")
        tmodel = yolo.Model(os.path.join(REF, "models", "yolov5s_city_seg.yaml"))
        want = sum(p.numel() for p in tmodel.parameters())
    finally:
        os.chdir(cwd)
        sys.path.remove(REF)

    from multiyolov5_tpu.models.config import load_spec
    from multiyolov5_tpu.models.model import init_model

    spec = load_spec(os.path.join(REF, "models", "yolov5s_city_seg.yaml"))
    params, _ = init_model(spec)
    got = sum(int(np.prod(v.shape)) for v in params.values())
    assert got == want, f"{got} vs reference {want} parameters"


def test_autoanchor_kmeans_improves_bpr(rng):
    from multiyolov5_tpu.utils.autoanchor import kmean_anchors, metric_bpr

    # synthetic wh distribution: two clusters
    wh = np.concatenate([rng.rand(300, 2) * 20 + 10,
                         rng.rand(300, 2) * 100 + 150]).astype(np.float32)
    bad_anchors = np.tile([[5.0, 5.0]], (9, 1)) * np.arange(1, 10)[:, None] * 0.2
    bpr0 = metric_bpr(bad_anchors, wh)[0]
    k = kmean_anchors(wh=wh, n=9, gen=100, verbose=False)
    bpr1 = metric_bpr(k, wh)[0]
    assert bpr1 > bpr0
    assert bpr1 > 0.98


def test_fitness2_multirow():
    """fitness2 must be row-wise (used on evolve.txt matrices; the
    reference's np.append flattens >1 row and crashes)."""
    from multiyolov5_tpu.utils.metrics import fitness2

    x = np.array([[0.1, 0.2, 0.5, 0.4], [0.3, 0.1, 0.2, 0.1]])
    out = fitness2(x, 0.6)
    assert out.shape == (2,)
    np.testing.assert_allclose(out[0], 0.1 * 0.5 + 0.2 * 0.4 + 0.7 * 0.6)
    np.testing.assert_allclose(out[1], 0.1 * 0.2 + 0.2 * 0.1 + 0.7 * 0.6)
    # single row + scalar still works (train loop call)
    assert fitness2(x[:1], 0.5).shape == (1,)


def test_seg_confusion_device_matches_host():
    from multiyolov5_tpu.utils.metrics import (SegMetric,
                                               seg_confusion_device)
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    logits = rng.randn(2, 17, 23, 5).astype(np.float32)
    target = rng.randint(-1, 5, (2, 17, 23))
    inter, union = seg_confusion_device(jnp.asarray(logits),
                                        jnp.asarray(target), 5)
    m = SegMetric(5)
    m.update(np.argmax(logits, -1), target)
    np.testing.assert_array_equal(np.asarray(inter), m.total_inter)
    np.testing.assert_array_equal(np.asarray(union), m.total_union)


def test_anchor_order_flip_consistent():
    """When anchors are listed largest-first, compile_spec must flip BOTH
    spec.anchors and the Detect row's args (which feed the decode buffers) —
    and agree with utils.autoanchor.check_anchor_order."""
    from multiyolov5_tpu.models import zoo
    from multiyolov5_tpu.models.config import compile_spec
    from multiyolov5_tpu.utils.autoanchor import check_anchor_order

    d = zoo.get("yolov5s")
    d["anchors"] = d["anchors"][::-1]  # largest (P5) anchors first
    spec = compile_spec(d)
    assert spec.anchors[0][0] < spec.anchors[-1][0]  # flipped back
    det_row = spec.rows[spec.detect_index]
    assert det_row.args[1] == spec.anchors  # decode buffers agree
    a = np.asarray(spec.anchors, np.float32).reshape(3, 3, 2)
    np.testing.assert_array_equal(
        check_anchor_order(a, spec.strides), a)  # already ordered


def test_stride_inference_maxpool_default_and_stride4():
    """nn.MaxPool2d default stride=k and stride>2 convs must propagate into
    spec strides (they feed anchor scaling and decode grids)."""
    from multiyolov5_tpu.models.config import compile_spec

    d = {"nc": 2, "depth_multiple": 1.0, "width_multiple": 1.0,
         "anchors": [[10, 13, 16, 30, 33, 23]],
         "backbone": [
             [-1, 1, "Conv", [32, 3, 4]],        # stride 4
             [-1, 1, "nn.MaxPool2d", [2]],       # default stride=k=2 -> 8
         ],
         "head": [[[1], 1, "Detect", ["nc", "anchors"]]]}
    spec = compile_spec(d)
    assert spec.strides == [8]
