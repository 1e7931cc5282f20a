"""Dynamic-batching server behavior."""

import threading

import numpy as np
import pytest

from multiyolov5_tpu.serving import InferenceServer


@pytest.fixture(scope="module")
def server():
    s = InferenceServer(None, cfg="yolov5s_city_seg", img_size=128,
                        max_batch=4, max_wait_ms=20, half=False)
    yield s
    s.close()


def test_single_and_concurrent(server):
    frame = np.zeros((96, 192, 3), np.uint8)
    boxes, cls_map = server.infer(frame, timeout=300)
    assert boxes.shape[1] == 6
    assert cls_map.shape == (96, 192)

    # concurrent submits coalesce into batches
    futs = [server.submit(frame) for _ in range(8)]
    outs = [f.result(timeout=300) for f in futs]
    assert len(outs) == 8
    st = server.stats()
    assert st["frames"] >= 9
    assert st["mean_batch"] > 1.0  # at least some batching happened


def test_mixed_geometries(server):
    f1 = np.zeros((96, 192, 3), np.uint8)
    f2 = np.zeros((64, 128, 3), np.uint8)
    futs = [server.submit(f1), server.submit(f2), server.submit(f1)]
    outs = [f.result(timeout=300) for f in futs]
    assert outs[0][1].shape == (96, 192)
    assert outs[1][1].shape == (64, 128)


def test_close_rejects(server):
    s2 = InferenceServer(None, cfg="yolov5s", img_size=64, half=False)
    s2.close()
    with pytest.raises(RuntimeError):
        s2.submit(np.zeros((32, 32, 3), np.uint8))
