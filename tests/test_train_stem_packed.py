"""Packed-stem training path (ops/stem.stem_train_apply).

The trainer can feed 4x4-s2d host-packed images and run rows 0-1 as
quarter-grid convs with live BN (TrainConfig.pack_stem) — the TPU answer to
the reference's 3-channel stem convs dominating the train step.  Must be
numerically equivalent to the raw path: same loss, same gradients, same BN
running stats (reference semantics: models/common.py Focus + Conv rows).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiyolov5_tpu.data.hyps import load_hyp
from multiyolov5_tpu.models.config import load_spec
from multiyolov5_tpu.models.model import forward, init_model
from multiyolov5_tpu.ops.stem import can_fold_stem, pack_stem_host
from multiyolov5_tpu.train.losses import pad_targets
from multiyolov5_tpu.train.trainer import (TrainConfig, create_train_state,
                                           make_train_step)


def _batch(spec, B=2, seed=0):
    rng = np.random.RandomState(seed)
    imgs = (rng.rand(B, 128, 128, 3) * 255).astype(np.uint8)
    labels = []
    for _ in range(B):
        l = np.zeros((5, 5), np.float32)
        l[:, 0] = rng.randint(0, spec.nc, 5)
        l[:, 1:3] = rng.rand(5, 2) * 0.6 + 0.2
        l[:, 3:5] = rng.rand(5, 2) * 0.2 + 0.05
        labels.append(l)
    tgts, mask = pad_targets(labels, 16)
    seg_imgs = rng.rand(B, 64, 128, 3).astype(np.float32)
    seg_lbls = rng.randint(-1, spec.n_segcls, (B, 64, 128))
    return imgs, tgts, mask, seg_imgs, seg_lbls


def test_packed_step_matches_raw():
    spec = load_spec("yolov5s_city_seg")
    assert can_fold_stem(spec)
    imgs, tgts, mask, seg_imgs, seg_lbls = _batch(spec)
    hyp = load_hyp("scratch")
    key = jax.random.PRNGKey(0)
    results = {}
    for pack in (False, True):
        cfg = TrainConfig(hyp=hyp, batch_size=2, seg_batch_size=2,
                          max_targets=16, compute_dtype=jnp.float32,
                          pack_stem=pack)
        ts, groups = create_train_state(spec, cfg, seed=0)
        step = make_train_step(spec, cfg, groups, donate=False)
        di = pack_stem_host(imgs) if pack else imgs
        si = pack_stem_host(seg_imgs) if pack else seg_imgs
        ts2, m = step(ts, jnp.asarray(di), jnp.asarray(tgts),
                      jnp.asarray(mask), jnp.asarray(si),
                      jnp.asarray(seg_lbls), key, jnp.float32(0.01),
                      jnp.float32(0.01), jnp.float32(0.9), jnp.asarray(True))
        results[pack] = (float(m["total"]), ts2)
    t_raw, ts_raw = results[False]
    t_pk, ts_pk = results[True]
    assert abs(t_raw - t_pk) < 1e-4 * max(1.0, abs(t_raw))
    for k in ts_raw["params"]:
        np.testing.assert_allclose(np.asarray(ts_pk["params"][k]),
                                   np.asarray(ts_raw["params"][k]),
                                   atol=2e-5, rtol=2e-5, err_msg=k)
    for k in ts_raw["state"]:
        np.testing.assert_allclose(np.asarray(ts_pk["state"][k]),
                                   np.asarray(ts_raw["state"][k]),
                                   atol=2e-5, rtol=2e-5, err_msg=k)


def test_packed_forward_matches_raw_eval_mode():
    """pre_s2d2 must also be exact in eval mode (running-stats BN)."""
    spec = load_spec("yolov5s")
    params, state = init_model(spec, seed=1)
    x = np.random.RandomState(3).rand(1, 96, 96, 3).astype(np.float32)
    (dec, _), _, _ = forward(spec, params, state, x, train=False, decode=True)
    xp = pack_stem_host(x)
    (dec2, _), _, _ = forward(spec, params, state, jnp.asarray(xp),
                              train=False, decode=True, pre_s2d2=True)
    np.testing.assert_allclose(np.asarray(dec2), np.asarray(dec),
                               atol=1e-4, rtol=1e-4)


def test_pre_s2d2_rejects_unfoldable_stem():
    spec = load_spec("yolov5s")
    bad = spec._replace(save=spec.save | {0}) if hasattr(spec, "_replace") \
        else None
    if bad is None:
        import dataclasses
        bad = dataclasses.replace(spec, save=spec.save | {0})
    params, state = init_model(spec, seed=0)
    x = np.zeros((1, 16, 16, 48), np.float32)
    with pytest.raises(AssertionError):
        forward(bad, params, state, x, train=True, decode=False,
                pre_s2d2=True)
