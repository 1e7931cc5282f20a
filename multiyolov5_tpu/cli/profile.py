"""Profiling CLI — TPU-native analog of the reference's tracing hooks
(Model.forward(profile=True) per-layer timing, utils/torch_utils.profile,
model_info; SURVEY.md §5).

    python -m multiyolov5_tpu.cli.profile --cfg yolov5s_city_seg \
        --img-size 512 1024 [--layers] [--trace /tmp/trace]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--cfg", type=str, default="yolov5s_city_seg")
    p.add_argument("--img-size", nargs="+", type=int, default=[512, 1024])
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--layers", action="store_true",
                   help="per-layer prefix timing (slow: one jit per prefix)")
    p.add_argument("--trace", type=str, default="",
                   help="write a jax.profiler trace to this directory")
    p.add_argument("--iters", type=int, default=30)
    opt = p.parse_args(argv)
    h, w = (opt.img_size * 2)[:2]

    from ..engine import Engine
    from ..models.model import forward
    from ..utils import profiling

    eng = Engine(opt.weights or None, cfg=opt.cfg, half=True)
    spec, params, state = eng.spec, eng.params, eng.state
    profiling.model_info(spec, params, img_size=max(h, w))

    import jax.numpy as jnp

    def fwd(x):
        det, seg, _ = forward(spec, params, state, x.astype(jnp.bfloat16),
                              train=False, fused=True, decode=True)
        return det, seg

    import numpy as np
    x = jnp.asarray(np.zeros((opt.batch_size, h, w, 3), np.float32))
    profiling.profile_op(lambda t: fwd(t)[0][0].astype(jnp.float32).sum(),
                         x, n=opt.iters, name=f"forward {h}x{w} bs{opt.batch_size}")
    if opt.layers:
        profiling.profile_layers(spec, params, state, img_hw=(h, w),
                                 fused=True, batch=opt.batch_size)
    if opt.trace:
        with profiling.trace(opt.trace):
            for _ in range(10):
                r = fwd(x)
            np.asarray(r[0][0])


if __name__ == "__main__":
    main()
