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


def test_close_cancels_queued():
    """close() must resolve (cancel) queued futures so clients don't hang."""
    from concurrent.futures import CancelledError

    s = InferenceServer(None, cfg="yolov5s", img_size=64, half=False,
                        max_wait_ms=0.1)
    # stall the dispatcher by submitting during close
    futs = [s.submit(np.zeros((32, 32, 3), np.uint8)) for _ in range(4)]
    s.close()
    for f in futs:
        try:
            f.result(timeout=300)  # either served before close...
        except CancelledError:
            pass                  # ...or cancelled — never hangs


def test_batch_bucket_padding():
    """Arbitrary collected batch sizes pad to a warmed bucket: submitting 3
    frames must not compile a bs-3 graph (buckets are 1,2,4)."""
    s = InferenceServer(None, cfg="yolov5s", img_size=64, half=False,
                        max_batch=4, max_wait_ms=50.0)
    assert s._buckets == [1, 2, 4]
    futs = [s.submit(np.zeros((32, 32, 3), np.uint8)) for _ in range(3)]
    outs = [f.result(timeout=300) for f in futs]
    assert len(outs) == 3 and all(o[0].shape[1] == 6 for o in outs)
    geoms = {k[0][0] for k in s.engine._cache}  # cache key leads with shape
    assert 3 not in geoms
    s.close()
