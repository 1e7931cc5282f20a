"""On-device equivalence of the batch>1 hybrid serving path.

Runs ONLY on real TPU (``MULTIYOLOV5_TPU_TESTS=1``).  The engine's
batch-scan regime (unrolled per-image trunk in the batch-1 custom-kernel
layout regime + batched head rows + batched NMS/mask kernels,
engine._compiled) must produce bit-identical detections and masks to the
straight batched pipeline.  Round-5 motivation: at serving batch sizes the
straight pipeline pays ~170us/frame of relayout copies at the Pallas
custom-call boundaries; the hybrid keeps batch-1 layouts per image
(bs8 A/B: 1585 -> 1704 FPS) and must stay exact.
"""

import os

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="real TPU only")


@pytest.mark.parametrize("bs", [1, 2, 8])
def test_batch_scan_matches_straight(bs):
    from multiyolov5_tpu.engine import Engine

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (bs, 512, 1024, 3), np.uint8)

    os.environ["MULTIYOLOV5_BATCH_SCAN"] = "0"
    try:
        eng = Engine(None, cfg="yolov5s_city_seg", half=True)
        det0, mask0 = eng(img, (1024, 2048), conf=1e-4)
        os.environ["MULTIYOLOV5_BATCH_SCAN"] = "1"
        det1, mask1 = eng(img, (1024, 2048), conf=1e-4)
    finally:
        os.environ.pop("MULTIYOLOV5_BATCH_SCAN", None)

    assert any(np.asarray(d).size for d in det0), "degenerate: no boxes"
    # bs1 exercises the chunked-stem + normal-path branch
    for a, b in zip(det0, det1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(mask0), np.asarray(mask1))
