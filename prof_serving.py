"""Trace the fused serving pipeline at a given batch size; per-frame op report."""
import os
import sys

import numpy as np

bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

import jax
import jax.lax as lax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multiyolov5_tpu.engine import (Engine, run_batched_pipeline,
                                    space_to_depth_host)
from multiyolov5_tpu.models.model import forward, stack_feats
from multiyolov5_tpu.ops import stem as stem_lib
from multiyolov5_tpu.ops.nms import nms_batched, nms_planar
from multiyolov5_tpu.ops.pallas.upsample_argmax_kernel import upsample_argmax_planar
from multiyolov5_tpu.tools.trace_report import trace_and_report

cfg = os.environ.get("BENCH_CFG", "yolov5s_city_seg")
eng = Engine(None, cfg=cfg, half=True)
spec, params, state = eng.spec, eng.params, eng.state
in_hw = (512, 1024)
orig_hw = (1024, 2048)
frame = np.random.randint(0, 255, (bs, *in_hw, 3), np.uint8)
stem_fw = tuple(jnp.asarray(a) for a in stem_lib.fold_stem_from_params(params))
from multiyolov5_tpu.ops.pallas.stem_kernel import (
    pack_stem96_chunked_host, pack_stem96_host, stem_apply_pallas_u8,
    stem_apply_pallas_u8_multi, stem_pack_geometry)

cp, _ = stem_pack_geometry(in_hw[0] // 4, in_hw[1] // 4)
x48 = space_to_depth_host(space_to_depth_host(frame))
BATCH_SCAN_EARLY = os.environ.get("MULTIYOLOV5_BATCH_SCAN") == "1"
x0 = jnp.asarray(pack_stem96_chunked_host(
    x48, cp, 16 if stem_fw[0].shape[-1] > 128 else 32) if BATCH_SCAN_EARLY
                 else pack_stem96_host(x48, cp))


PLANAR = os.environ.get("MULTIYOLOV5_NMS_PLANAR") != "0"


BATCH_SCAN = os.environ.get("MULTIYOLOV5_BATCH_SCAN") == "1"


def body(x, fw):
    if BATCH_SCAN and bs > 1:
        y1s = stem_apply_pallas_u8_multi(x, *fw, cols=in_hw[1] // 4)
        boxes, valid, seg = run_batched_pipeline(spec, params, state, y1s)
        out = boxes.sum() + valid.sum()
        cm = upsample_argmax_planar(seg, orig_hw,
                                    via_hw=(seg.shape[2] * 8, seg.shape[3] * 8))
        return out + cm[:, :8, :].astype(jnp.float32).sum()
    if BATCH_SCAN:
        y1 = stem_apply_pallas_u8_multi(x, *fw, cols=in_hw[1] // 4)[0]
    else:
        y1 = stem_apply_pallas_u8(x, *fw, cols=in_hw[1] // 4)
    det, seg, _ = forward(spec, params, state, y1, train=False, fused=True,
                          decode="planar" if PLANAR else True,
                          start_layer=2, seg_up=False)
    if PLANAR:
        boxes, valid = nms_planar(det[0], conf_thres=0.25, iou_thres=0.45,
                                  max_nms=1024)
    else:
        boxes, valid = nms_batched(det[0], conf_thres=0.25, iou_thres=0.45,
                                   max_nms=1024)
    out = boxes.sum() + valid.sum()
    cm = upsample_argmax_planar(seg, orig_hw,
                                via_hw=(seg.shape[2] * 8, seg.shape[3] * 8))
    # sparse-slice dependence (see bench.py): the full-mask convert+sum is
    # bench harness, not pipeline, and XLA materializes it unfused at bs>1
    return out + cm[:, :8, :].astype(jnp.float32).sum()


@jax.jit
def rep(x):
    def f(i, acc):
        w1p, b1p, w2p, b2p = stem_fw
        return acc + body(x, (w1p, b1p + acc * 1e-30, w2p, b2p))
    return lax.fori_loop(0, iters, f, jnp.float32(0))


float(rep(x0))  # compile + warm
rows = trace_and_report(lambda: float(rep(x0)), top=40)
tot = sum(r[1] for r in rows)
print(f"\nper-frame device time: {tot / iters / bs:.1f} us "
      f"(bs={bs}, {iters} iters)")
