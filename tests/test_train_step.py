"""Train-step behavior: loss decreases, accumulation gates updates, EMA moves,
BN stats advance, and the multi-chip sharded step runs on a virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multiyolov5_tpu.models.config import load_spec
from multiyolov5_tpu.train.losses import pad_targets
from multiyolov5_tpu.train.trainer import (TrainConfig, create_train_state,
                                           make_train_step)

HYP = {"box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0, "obj_pw": 1.0,
       "anchor_t": 4.0, "fl_gamma": 0.0, "label_smoothing": 0.0,
       "weight_decay": 0.0005}

TINY = {
    "nc": 3, "n_segcls": 4, "depth_multiple": 0.33, "width_multiple": 0.125,
    "anchors": [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119],
                [116, 90, 156, 198, 373, 326]],
    "backbone": [
        [-1, 1, "Focus", [64, 3]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],
        [-1, 1, "C3", [256]],
        [-1, 1, "Conv", [512, 3, 2]],
        [-1, 1, "C3", [512]],
        [-1, 1, "Conv", [1024, 3, 2]],
        [-1, 1, "SPP", [1024, [5, 9, 13]]],
        [-1, 1, "C3", [1024, False]],
    ],
    "head": [
        [-1, 1, "Conv", [512, 1, 1]],
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
        [[-1, 6], 1, "Concat", [1]],
        [-1, 1, "C3", [512, False]],
        [-1, 1, "Conv", [256, 1, 1]],
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
        [[-1, 4], 1, "Concat", [1]],
        [-1, 1, "C3", [256, False]],
        [-1, 1, "Conv", [256, 3, 2]],
        [[-1, 14], 1, "Concat", [1]],
        [-1, 1, "C3", [512, False]],
        [-1, 1, "Conv", [512, 3, 2]],
        [[-1, 10], 1, "Concat", [1]],
        [-1, 1, "C3", [1024, False]],
        [[16, 19, 22], 1, "SegMaskPSP", ["n_segcls", 3, 256, False]],
        [[17, 20, 23], 1, "Detect", ["nc", "anchors"]],
    ],
}


def _batch(rng, B=2, sz=64, nseg=4, max_t=8):
    imgs = (rng.rand(B, sz, sz, 3) * 255).astype(np.uint8)
    labels = []
    for _ in range(B):
        n = rng.randint(1, 4)
        l = np.zeros((n, 5), np.float32)
        l[:, 0] = rng.randint(0, 3, n)
        l[:, 1:3] = rng.rand(n, 2) * 0.6 + 0.2
        l[:, 3:5] = rng.rand(n, 2) * 0.3 + 0.1
        labels.append(l)
    tgts, mask = pad_targets(labels, max_t)
    seg_imgs = rng.rand(B, sz, sz, 3).astype(np.float32)
    seg_lbls = rng.randint(-1, nseg, (B, sz, sz))
    return imgs, tgts, mask, seg_imgs, seg_lbls


@pytest.fixture(scope="module")
def setup():
    spec = load_spec(TINY)
    cfg = TrainConfig(hyp=HYP, batch_size=2, seg_batch_size=2,
                      compute_dtype=jnp.float32)
    ts, groups = create_train_state(spec, cfg, seed=0)
    step = make_train_step(spec, cfg, groups, donate=False)
    return spec, cfg, ts, step


def test_loss_decreases_and_state_updates(rng, setup):
    spec, cfg, ts, step = setup
    batch = _batch(rng)
    args = [jnp.asarray(a) for a in batch]
    key = jax.random.PRNGKey(0)
    p0 = ts["params"]["model.0.conv.conv.weight"]
    bn0 = ts["state"]["model.0.conv.bn.running_mean"]
    losses = []
    for i in range(8):
        ts, m = step(ts, *args, key, jnp.float32(0.01), jnp.float32(0.01),
                     jnp.float32(0.9), jnp.asarray(True))
        losses.append(float(m["total"]))
    assert losses[-1] < losses[0], losses
    assert not np.allclose(np.asarray(ts["params"]["model.0.conv.conv.weight"]),
                           np.asarray(p0))
    assert not np.allclose(np.asarray(ts["state"]["model.0.conv.bn.running_mean"]),
                           np.asarray(bn0))
    # EMA should have moved but stay close to params
    assert not np.allclose(np.asarray(ts["ema_params"]["model.0.conv.conv.weight"]),
                           np.asarray(p0))


def test_accumulation_gates_update(rng, setup):
    spec, cfg, ts, step = setup
    batch = _batch(rng)
    args = [jnp.asarray(a) for a in batch]
    key = jax.random.PRNGKey(1)
    p0 = np.asarray(ts["params"]["model.0.conv.conv.weight"])
    ts2, _ = step(ts, *args, key, jnp.float32(0.01), jnp.float32(0.01),
                  jnp.float32(0.9), jnp.asarray(False))
    # params unchanged, grads accumulated, updates not incremented
    np.testing.assert_array_equal(
        np.asarray(ts2["params"]["model.0.conv.conv.weight"]), p0)
    assert float(ts2["updates"]) == float(ts["updates"])
    assert np.abs(np.asarray(ts2["accum"]["model.0.conv.conv.weight"])).sum() > 0


def test_multichip_sharded_step():
    """The dryrun_multichip contract: full train step over an 8-device mesh
    must be numerically EQUIVALENT to the unsharded step at the same global
    batch — the reference's DDP all-reduce semantics
    (reference train.py:242-245,366-367), not just finite."""
    from multiyolov5_tpu.parallel.mesh import make_mesh, shard_batch, replicate

    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(8)
    spec = load_spec(TINY)
    cfg = TrainConfig(hyp=HYP, batch_size=8, seg_batch_size=8,
                      compute_dtype=jnp.float32)
    ts, groups = create_train_state(spec, cfg, seed=0)
    ts_single = jax.tree.map(np.asarray, ts)  # independent copy
    step = make_train_step(spec, cfg, groups, mesh=mesh, donate=False)
    rng = np.random.RandomState(0)
    imgs, tgts, mask, seg_imgs, seg_lbls = _batch(rng, B=8)
    ts = replicate(mesh, ts)
    raw = tuple(jnp.asarray(a) for a in (imgs, tgts, mask, seg_imgs, seg_lbls))
    args = shard_batch(mesh, raw)
    key = replicate(mesh, jax.random.PRNGKey(0))
    lr, wd, mom = jnp.float32(0.01), jnp.float32(0.01), jnp.float32(0.9)
    ts, m = step(ts, *args, key, lr, wd, mom, jnp.asarray(True))
    assert np.isfinite(float(m["total"]))

    # identical global batch through the unsharded step
    step0 = make_train_step(spec, cfg, groups, mesh=None, donate=False)
    ts0, m0 = step0(ts_single, *raw, jax.random.PRNGKey(0), lr, wd, mom,
                    jnp.asarray(True))
    np.testing.assert_allclose(float(m["total"]), float(m0["total"]),
                               rtol=1e-5)
    for part in ("params", "ema_params", "state"):
        for k in ts0[part]:
            # tolerances cover fp32 psum reduction-order noise on the
            # gradients (~1e-7 rel) amplified through the SGD update
            np.testing.assert_allclose(
                np.asarray(ts[part][k]), np.asarray(ts0[part][k]),
                rtol=2e-4, atol=5e-6,
                err_msg=f"{part}[{k}] diverges between 8-device and "
                        f"single-device step")
