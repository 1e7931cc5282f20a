"""Device-trace op-time report (the TPU profiling workflow).

Runs a callable under ``jax.profiler.trace`` and aggregates *device-lane*
op durations from the perfetto trace — the only timing the tunneled axon
dev setup can be trusted on (wall clocks measure the tunnel; see
.claude/skills/verify).  Replaces the reference's nvprof/autotune-log
reading habits (SURVEY.md §5 tracing).

Usage:
    from multiyolov5_tpu.tools.trace_report import trace_and_report
    rows = trace_and_report(lambda: float(jitted(x)[0]), top=30)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import shutil
import tempfile
from collections import defaultdict
from typing import Callable, List, Tuple


def _load_trace(log_dir: str) -> dict:
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as fh:
        return json.load(fh)


def device_op_times(trace: dict) -> List[Tuple[str, float, int]]:
    """[(op_name, total_us, count)] for events on TPU device op lanes.

    Device op events live on track/thread lanes whose process is the TPU
    device and which are NOT the ``jit_<fn>`` parent lane: the parents span
    whole executables; the op lane carries the per-fusion events.
    """
    events = [e for e in trace.get("traceEvents", []) if e.get("ph") == "X"]
    # identify process ids labeled like TPU devices
    tpu_pids = set()
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if re.search(r"TPU|/device:|Device", name, re.I):
                tpu_pids.add(e.get("pid"))
    agg = defaultdict(lambda: [0.0, 0])
    for e in events:
        if tpu_pids and e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or name in ("Steal", "idle"):
            continue
        dur = float(e.get("dur", 0.0))
        if dur <= 0:
            continue
        agg[name][0] += dur
        agg[name][1] += 1
        # XLA op events usually carry the full HLO text (shape + operands)
        # in args — keep one sample per op for shape attribution
        if len(agg[name]) == 2:
            a = e.get("args", {}) or {}
            agg[name].append(str(a.get("long_name") or a.get("hlo_op")
                                 or a.get("name") or "")[:220])
    rows = [(k, v[0], v[1], v[2] if len(v) > 2 else "")
            for k, v in agg.items()]
    rows.sort(key=lambda r: -r[1])
    return rows


def classify(name: str) -> str:
    n = name.lower()
    if "copy" in n or "transpose" in n or "bitcast-convert" in n:
        return "copy/layout"
    if "convolution" in n or "conv" in n:
        return "conv"
    if "dot" in n or "matmul" in n:
        return "matmul"
    if "custom-call" in n or "pallas" in n or "tpu_custom_call" in n:
        return "custom(pallas)"
    if "sort" in n or "top-k" in n or "topk" in n:
        return "topk/sort"
    if "while" in n:
        return "while"
    if "fusion" in n:
        return "fusion"
    if "reduce" in n:
        return "reduce"
    return "other"


def trace_and_report(fn: Callable[[], None], top: int = 30,
                     log_dir: str = "") -> List[Tuple[str, float, int]]:
    import jax

    d = log_dir or tempfile.mkdtemp(prefix="jax_trace_")
    jax.profiler.start_trace(d)
    try:
        fn()
    finally:
        jax.profiler.stop_trace()
    rows = device_op_times(_load_trace(d))
    by_class = defaultdict(float)
    for name, us, *_ in rows:
        by_class[classify(name)] += us
    total = sum(by_class.values())
    print(f"{'class':>16} {'us':>12} {'%':>6}")
    for k, v in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"{k:>16} {v:>12.1f} {100 * v / max(total, 1e-9):>6.1f}")
    print(f"{'TOTAL':>16} {total:>12.1f}")
    print(f"\ntop {top} ops:")
    for name, us, cnt, *meta in rows[:top]:
        detail = f"  | {meta[0]}" if meta and meta[0] else ""
        print(f"  {us:>10.1f} us x{cnt:<5} {name[:110]}{detail}")
    if not log_dir:
        shutil.rmtree(d, ignore_errors=True)
    return rows
