"""Dynamic-batching inference server.

Production-serving layer on top of :class:`Engine`: requests enqueue frames;
a dispatcher thread coalesces them into batches (up to ``max_batch``, waiting
at most ``max_wait_ms``) and runs one fused device call per batch, so
single-frame latency stays low while concurrent load rides batched
throughput (device per-frame cost drops ~25% at bs4, see bench).

The reference has no serving layer (detect.py is a file/stream loop); this is
a TPU-framework addition.

    server = InferenceServer("pspv5s.pt", img_size=1024)
    fut = server.submit(frame_bgr)          # from any thread
    boxes, class_map = fut.result()
    server.stats() / server.close()
"""

from __future__ import annotations

import threading
import time
import queue as queue_mod
from concurrent.futures import Future
from typing import Any, List, Optional, Tuple

import numpy as np

from .data.letterbox import check_img_size, letterbox
from .engine import Engine


class InferenceServer:
    def __init__(self, weights: Any = None, cfg: Any = None,
                 img_size: int = 1024, max_batch: int = 8,
                 max_wait_ms: float = 2.0, conf: float = 0.25,
                 iou: float = 0.45, half: bool = True,
                 engine: Optional[Engine] = None):
        self.engine = engine or Engine(weights, cfg=cfg, half=half)
        self.img_size = check_img_size(img_size, self.engine.stride)
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.conf = conf
        self.iou = iou
        self._q: queue_mod.Queue = queue_mod.Queue()
        self._closed = threading.Event()
        self._n_frames = 0
        self._n_batches = 0
        self._t_device = 0.0
        # batch-size buckets: arbitrary collected sizes are padded up to the
        # nearest bucket so only these (batch, geometry) graphs ever compile
        self._buckets = sorted({1, max_batch} | {
            b for b in (2, 4, 8, 16, 32, 64) if b < max_batch})
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- client API -----------------------------------------------------------

    def submit(self, frame_bgr: np.ndarray) -> Future:
        """Enqueue one BGR uint8 frame; resolves to (boxes (n,6), class_map)."""
        if self._closed.is_set():
            raise RuntimeError("server closed")
        fut: Future = Future()
        self._q.put((frame_bgr, fut))
        if self._closed.is_set() and fut.cancel():  # raced with close()
            raise RuntimeError("server closed")
        return fut

    def infer(self, frame_bgr: np.ndarray, timeout: float = 30.0):
        return self.submit(frame_bgr).result(timeout)

    def stats(self) -> dict:
        return {"frames": self._n_frames, "batches": self._n_batches,
                "mean_batch": self._n_frames / max(self._n_batches, 1),
                "device_s": round(self._t_device, 3)}

    def close(self) -> None:
        self._closed.set()
        self._q.put(None)
        self._thread.join(timeout=5)
        # cancel anything still queued so waiting clients don't hang forever
        while True:
            try:
                item = self._q.get_nowait()
            except queue_mod.Empty:
                break
            if item is not None and not item[1].done():
                item[1].cancel()

    # -- dispatcher -----------------------------------------------------------

    def _collect(self) -> Optional[List[Tuple[np.ndarray, Future]]]:
        item = self._q.get()
        if item is None:
            return None
        batch = [item]
        deadline = time.perf_counter() + self.max_wait
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue_mod.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-post sentinel for shutdown
                break
            batch.append(nxt)
        return batch

    def _loop(self) -> None:
        while not self._closed.is_set():
            batch = self._collect()
            if batch is None:
                return
            # group by original frame geometry (one compiled graph each)
            by_shape = {}
            for frame, fut in batch:
                by_shape.setdefault(frame.shape[:2], []).append((frame, fut))
            for orig_hw, items in by_shape.items():
                try:
                    letterboxed = np.stack(
                        [letterbox(f, self.img_size, auto=False,
                                   stride=self.engine.stride)[0][:, :, ::-1]
                         for f, _ in items], 0)
                    # pad to the nearest batch bucket: one compiled graph per
                    # (bucket, geometry) instead of per arbitrary batch size
                    n = len(items)
                    b = next(x for x in self._buckets if x >= n)
                    if b > n:
                        letterboxed = np.concatenate(
                            [letterboxed,
                             np.repeat(letterboxed[-1:], b - n, 0)], 0)
                    t0 = time.perf_counter()
                    dets, masks = self.engine(
                        np.ascontiguousarray(letterboxed), orig_hw,
                        conf=self.conf, iou=self.iou)
                    self._t_device += time.perf_counter() - t0
                    self._n_batches += 1
                    self._n_frames += n
                    for (_, fut), d, m in zip(items, dets, masks):
                        fut.set_result((d, m))
                except Exception as e:
                    for _, fut in items:
                        if not fut.done():
                            fut.set_exception(e)

    def warmup(self, orig_hw: Tuple[int, int]) -> None:
        """Pre-compile every batch-bucket graph for a frame geometry (all
        runtime batches are padded to one of these buckets)."""
        frame = np.zeros((*orig_hw, 3), np.uint8)
        for b in self._buckets:
            futs = [self.submit(frame) for _ in range(b)]
            for f in futs:
                f.result(timeout=600)
