"""Trace the dual-task train step; per-step op report.

Usage: python prof_train.py [iters] (env: BENCH_TRAIN_BS, BENCH_TRAIN_REMAT,
MULTIYOLOV5_TRAIN_DOT1X1_MAXC, ...)
"""
import os
import sys

import numpy as np

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10

import jax
import jax.lax as lax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multiyolov5_tpu.data.hyps import load_hyp
from multiyolov5_tpu.models.config import load_spec
from multiyolov5_tpu.train.losses import pad_targets
from multiyolov5_tpu.train.trainer import (TrainConfig, create_train_state,
                                           make_train_step)
from multiyolov5_tpu.ops.stem import can_fold_stem, pack_stem_host
from multiyolov5_tpu.tools.trace_report import trace_and_report

B = int(os.environ.get("BENCH_TRAIN_BS", 8))
hyp = load_hyp("scratch")
spec = load_spec(os.environ.get("BENCH_CFG", "yolov5s_city_seg"))
pack = can_fold_stem(spec) and not os.environ.get("BENCH_NO_PACK_STEM")
cfg = TrainConfig(hyp=hyp, batch_size=B, seg_batch_size=B, max_targets=128,
                  pack_stem=pack,
                  remat=bool(os.environ.get("BENCH_TRAIN_REMAT")))
ts, groups = create_train_state(spec, cfg, seed=0)
step = make_train_step(spec, cfg, groups, donate=False)

rng = np.random.RandomState(0)
imgs = (rng.rand(B, 832, 832, 3) * 255).astype(np.uint8)
labels = []
for _ in range(B):
    l = np.zeros((20, 5), np.float32)
    l[:, 0] = rng.randint(0, spec.nc, 20)
    l[:, 1:3] = rng.rand(20, 2) * 0.6 + 0.2
    l[:, 3:5] = rng.rand(20, 2) * 0.2 + 0.05
    labels.append(l)
tgts, mask = pad_targets(labels, cfg.max_targets)
seg_imgs = rng.rand(B, 512, 1024, 3).astype(np.float32)
seg_lbls = rng.randint(-1, spec.n_segcls, (B, 512, 1024))
if pack:
    imgs = pack_stem_host(imgs)
    seg_imgs = pack_stem_host(seg_imgs)
args = tuple(jnp.asarray(a) for a in (imgs, tgts, mask, seg_imgs, seg_lbls))
key = jax.random.PRNGKey(0)


@jax.jit
def rep(ts0):
    def body(i, carry):
        ts_c, acc = carry
        ts_n, m = step(ts_c, *args, key, jnp.float32(0.01), jnp.float32(0.01),
                       jnp.float32(0.9), jnp.asarray(True))
        return (ts_n, acc + m["total"])
    return lax.fori_loop(0, iters, body, (ts0, jnp.float32(0)))


float(rep(ts)[1])  # compile + warm
rows = trace_and_report(lambda: float(rep(ts)[1]), top=45)
tot = sum(r[1] for r in rows)
print(f"\nper-step device time: {tot / iters:.1f} us (bs={B}, {iters} iters)")
