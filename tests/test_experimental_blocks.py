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
