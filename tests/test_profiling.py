"""Regression tests for the shape-traced GFLOPs counter.

``estimate_gflops`` is the denominator of the MFU number in the driver
bench artifact (bench.py), so a counter regression would silently corrupt
every future utilization claim.  Anchors: the reference's thop-based
model_info (reference utils/torch_utils.py:205-226) reports 17.0 GFLOPs
for detection-only yolov5s @640; an exact hand count on a 2-conv config;
and monotonicity (adding the seg head must add FLOPs).
"""

import numpy as np
import pytest

from multiyolov5_tpu.models.config import load_spec
from multiyolov5_tpu.models.model import init_model
from multiyolov5_tpu.utils.profiling import estimate_gflops


def _gflops(cfg, size):
    spec = load_spec(cfg) if isinstance(cfg, (str, dict)) else cfg
    params, state = init_model(spec)
    return estimate_gflops(spec, params, size, state=state)


def test_tiny_config_exact_hand_count():
    """2 convs + 1-level Detect on a 64x64 input, counted by hand.

    conv1 3x3x3->8 @64x64:   3*3*3*8  * 64*64 =   884,736 MACs
    conv2 3x3x8->16 s2 @32x32: 3*3*8*16 * 32*32 = 1,179,648 MACs
    detect 1x1 16->3*(5+2) @32x32: 16*21 * 32*32 =  344,064 MACs
    total 2,408,448 MACs -> 2*MACs/1e9 GFLOPs.
    """
    tiny = {
        "nc": 2,
        "depth_multiple": 1.0,
        "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [[-1, 1, "Conv", [8, 3, 1]],
                     [-1, 1, "Conv", [16, 3, 2]]],
        "head": [[[1], 1, "Detect", ["nc", "anchors"]]],
    }
    got = _gflops(tiny, 64)
    np.testing.assert_allclose(got, 2 * 2_408_448 / 1e9, rtol=1e-12)


def test_yolov5s_det_only_matches_thop():
    """Reference thop cross-check: det-only yolov5s = 17 +- 1 GFLOPs @640
    (reference model_info prints 17.0; our conv-only count is 16.25 —
    thop additionally prices BN/elementwise)."""
    got = _gflops("yolov5s", 640)
    assert 16.0 <= got <= 18.0, got


def test_seg_head_adds_flops():
    det = _gflops("yolov5s", 640)
    seg = _gflops("yolov5s_city_seg", 640)
    assert seg > det + 1.0, (det, seg)


def test_bench_geometry_value_pinned():
    """The exact number the bench artifact divides by (28.8 GF/frame at
    1024x512).  A counter change that moves this silently rescales MFU."""
    got = _gflops("yolov5s_city_seg", (512, 1024))
    np.testing.assert_allclose(got, 28.79, rtol=0.01)
