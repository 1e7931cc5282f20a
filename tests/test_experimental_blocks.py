"""Parity of experimental blocks (CrossConv/MixConv2d/GhostBottleneck/
GhostConv) vs the reference models/experimental.py modules."""

import os
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from multiyolov5_tpu.models import blocks as B
from multiyolov5_tpu.ops.nn import Ctx
from multiyolov5_tpu.utils.checkpoint import from_torch_state_dict

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_exp():
    for name in ("onnx", "onnx.external_data_helper"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvo = types.ModuleType("torchvision.ops")
        tvo.nms = None
        tv.ops = tvo
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tvo
    sys.path.insert(0, REF)
    cwd = os.getcwd()
    os.chdir(REF)
    import importlib
    mod = importlib.import_module("models.experimental")
    os.chdir(cwd)
    yield mod
    sys.path.remove(REF)


def _check(tmod, apply_fn, x, atol=1e-5):
    torch.manual_seed(0)
    for m in tmod.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.eps = 1e-3  # initialize_weights eps (models built in-situ)
    tmod.eval()
    params, state = from_torch_state_dict(
        {f"m.{k}": v for k, v in tmod.state_dict().items()})
    ctx = Ctx(p=params, s=state, train=False)
    with torch.no_grad():
        want = tmod(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(apply_fn(ctx))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               rtol=1e-4, atol=atol)


def test_cross_conv(ref_exp, rng):
    x = rng.randn(2, 16, 16, 8).astype(np.float32)
    xj = jnp.asarray(x)
    _check(ref_exp.CrossConv(8, 8, 3, 1, 1, 1.0, True),
           lambda ctx: B.cross_conv(ctx, "m", xj, 8, 8, 3, 1, 1, 1.0, True), x)


def test_mixconv2d(ref_exp, rng):
    x = rng.randn(2, 16, 16, 8).astype(np.float32)
    xj = jnp.asarray(x)
    _check(ref_exp.MixConv2d(8, 8, (1, 3), 1),
           lambda ctx: B.mixconv2d(ctx, "m", xj, (1, 3), 1), x)


@pytest.mark.parametrize("c2,s", [(8, 1), (16, 2)])
def test_ghost_bottleneck(ref_exp, rng, c2, s):
    x = rng.randn(2, 16, 16, 8).astype(np.float32)
    xj = jnp.asarray(x)
    _check(ref_exp.GhostBottleneck(8, c2, 3, s),
           lambda ctx: B.ghost_bottleneck(ctx, "m", xj, 8, c2, 3, s), x)


@pytest.fixture(scope="module")
def ref_common(ref_exp):
    import importlib
    sys.path.insert(0, REF)
    cwd = os.getcwd()
    os.chdir(REF)
    mod = importlib.import_module("models.common")
    os.chdir(cwd)
    sys.path.remove(REF)
    return mod


def test_dappm(ref_common, rng):
    """DAPPM (reference models/common.py:327-412) — pre-activation BNs are
    NOT conv-foldable; exercised both unfused and after fuse_conv_bn."""
    x = rng.randn(2, 32, 32, 16).astype(np.float32) * 0.5
    tmod = ref_common.DAPPM(16, 8, 24)
    _check(tmod, lambda ctx: B.dappm(ctx, "m", jnp.asarray(x)), x, atol=1e-4)
    # fused path: standalone BNs survive fuse and still apply
    from multiyolov5_tpu.ops.nn import fuse_conv_bn
    params, state = from_torch_state_dict(
        {f"m.{k}": v for k, v in tmod.state_dict().items()})
    pf = fuse_conv_bn(params, state)
    ctxf = Ctx(p=pf, s=state, train=False, fused=True)
    got_f = np.asarray(B.dappm(ctxf, "m", jnp.asarray(x)))
    ctx = Ctx(p=params, s=state, train=False)
    got = np.asarray(B.dappm(ctx, "m", jnp.asarray(x)))
    np.testing.assert_allclose(got_f, got, rtol=1e-4, atol=1e-4)


def test_rfb1_and_aspps(ref_common, rng):
    x = rng.randn(1, 16, 16, 32).astype(np.float32) * 0.5
    _check(ref_common.RFB1(32, 16), 
           lambda ctx: B.rfb1(ctx, "m", jnp.asarray(x)), x, atol=1e-4)
    _check(ref_common.ASPPs(32, 16),
           lambda ctx: B.aspps(ctx, "m", jnp.asarray(x)), x, atol=1e-4)


def test_bottleneck_csp_fused_engine(rng):
    """BottleneckCSP/MixConv2d through the fused Engine (their post-concat
    BNs have no conv to fold into — fuse must skip, forward must apply)."""
    from multiyolov5_tpu.engine import Engine

    d = {"nc": 2, "depth_multiple": 1.0, "width_multiple": 1.0,
         "anchors": [[10, 13, 16, 30, 33, 23]],
         "backbone": [[-1, 1, "Focus", [16, 3]],
                      [-1, 1, "Conv", [32, 3, 2]],
                      [-1, 1, "BottleneckCSP", [32]],
                      [-1, 1, "MixConv2d", [32, [1, 3], 1]]],
         "head": [[[3], 1, "Detect", ["nc", "anchors"]]]}
    e = Engine(None, cfg=d, half=False)
    dets, _ = e(np.zeros((1, 64, 64, 3), np.uint8), (64, 64), conf=0.001)
    assert dets[0].shape[1] == 6
