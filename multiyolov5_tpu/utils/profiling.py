"""Tracing / profiling utilities.

TPU-native equivalents of the reference's aux tracing subsystem
(SURVEY.md §5): per-layer timing + FLOPs (reference Model.forward(profile=True),
models/yolo.py:301-314), the standalone op profiler
(utils/torch_utils.py:97-133), model_info param/GFLOPs summary (:205-226),
and a jax.profiler trace context replacing nvprof/cuDNN timing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


def model_info(spec, params, img_size: int = 640, verbose: bool = False) -> dict:
    """Param count + analytic GFLOPs summary (reference model_info)."""
    n_p = sum(int(np.prod(v.shape)) for v in params.values())
    if verbose:
        print(f"{'layer':>5} {'name':>45} {'shape':>20} {'params':>12}")
        for i, (k, v) in enumerate(params.items()):
            print(f"{i:5} {k:>45} {str(v.shape):>20} {int(np.prod(v.shape)):12}")
    flops = estimate_gflops(spec, params, img_size)
    n_layers = len(spec.rows)
    print(f"Model Summary: {n_layers} layers, {n_p} parameters, "
          f"{flops:.1f} GFLOPS @ {img_size}x{img_size}")
    return {"layers": n_layers, "parameters": n_p, "gflops": flops}


def estimate_gflops(spec, params, img_size=640, state=None) -> float:
    """Analytic conv GFLOPs for one forward at ``img_size`` (int or (H, W)).

    Traces the real forward under ``jax.eval_shape`` with a MAC counter
    installed (ops/nn.count_macs): every conv records kh*kw*cin*cout times
    its *actual* output spatial size at that point in the graph.  The
    previous heuristic priced each conv at its row's output stride, which
    over-counted seg heads ~10x (their convs run at stride 8 but the row
    output is stride 1 after the x8 upsample).  Matches the reference's
    thop-based numbers (utils/torch_utils.py:205-226): det-only yolov5s
    ~17 GFLOPs @640 (thop reports 17.0).  eval_shape runs no device
    compute — this is free even through the TPU tunnel.
    """
    import jax
    import jax.numpy as jnp

    from ..models.model import forward, init_model
    from ..ops import nn as nn_lib

    hw = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
    fused = not any(k.endswith(".bn.weight") for k in params)
    if state is None:
        state = init_model(spec)[1]
        if fused:  # fused params pair with a stripped state (Engine/fuse())
            state = {k: v for k, v in state.items()
                     if "running_" not in k
                     or k.rsplit(".running_", 1)[0] + ".weight" in params}
    sds = lambda t: jax.ShapeDtypeStruct(t.shape, jnp.float32)
    p_s = {k: sds(v) for k, v in params.items()}
    s_s = {k: sds(v) for k, v in state.items()}
    x_s = jax.ShapeDtypeStruct((1, hw[0], hw[1], spec.ch_in), jnp.float32)
    with nn_lib.count_macs() as c:
        jax.eval_shape(
            lambda p, s, x: forward(spec, p, s, x, train=False, fused=fused,
                                    decode=False, sever=False)[:2],
            p_s, s_s, x_s)
    return 2 * c[0] / 1e9


def profile_layers(spec, params, state, img_hw=(256, 256), fused: bool = False,
                   repeats: int = 10, batch: int = 1):
    """Per-layer device timing (analog of forward(profile=True)).

    Times cumulative prefixes of the layer graph (each jitted separately) and
    reports per-layer deltas — on TPU individual layers fuse, so prefix deltas
    are the honest per-layer attribution.
    """
    import jax
    import jax.numpy as jnp

    from ..models.model import forward
    from ..models.config import ModelSpec

    x = jnp.zeros((batch, *img_hw, 3), jnp.float32)
    times = []
    prev = 0.0
    print(f"{'idx':>4} {'module':>16} {'cum ms':>10} {'delta ms':>10}")
    for n_rows in range(1, len(spec.rows) + 1):
        sub = ModelSpec(
            rows=spec.rows[:n_rows], nc=spec.nc, n_segcls=spec.n_segcls,
            anchors=spec.anchors, strides=spec.strides, save=spec.save,
            detect_index=spec.detect_index if n_rows - 1 >= spec.detect_index >= 0 else -1,
            seg_index=spec.seg_index if (spec.seg_index is not None and
                                         n_rows - 1 >= spec.seg_index) else None)

        def f(p, s, xx):
            det, seg, _ = forward(sub, p, s, xx, train=False, fused=fused,
                                  decode=False)
            leaves = jax.tree.leaves((det, seg))
            return sum(t.astype(jnp.float32).sum() for t in leaves)

        jf = jax.jit(f)
        jax.block_until_ready(jf(params, state, x))
        t0 = time.perf_counter()
        for _ in range(repeats):
            r = jf(params, state, x)
        float(r)  # sync
        cum = (time.perf_counter() - t0) / repeats * 1000
        row = spec.rows[n_rows - 1]
        times.append((row.i, row.module, cum, cum - prev))
        print(f"{row.i:>4} {row.module:>16} {cum:>10.2f} {max(cum - prev, 0):>10.2f}")
        prev = cum
    return times


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace context — view in TensorBoard's profile plugin or
    parse the xplane.pb (see tests/tools)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        print(f"profile trace written to {log_dir}")


def profile_op(fn, *args, n: int = 100, name: str = "op") -> float:
    """Standalone op profiler (reference utils/torch_utils.profile).

    On the tunneled TPU dev setup block_until_ready can lie; we chain the op
    inside one jitted fori_loop and fetch a scalar (see .claude/skills/verify).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def rep(*a):
        def body(i, acc):
            out = fn(*a)
            leaves = jax.tree.leaves(out)
            return acc + sum(t.astype(jnp.float32).sum() for t in leaves) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    r = rep(*args)
    float(r)
    t0 = time.perf_counter()
    r = rep(*args)
    float(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1e3:.3f} ms/iter")
    return dt
