"""End-to-end .pt checkpoint flow with a REAL reference-format pickle.

Builds the reference torch Model, saves the reference train.py:482-489
checkpoint dict (whole pickled modules incl. an EMA copy), then:
  * loads it via the Engine in a subprocess-like clean import state,
  * verifies EMA is preferred,
  * converts with tools/convert_pt and reloads the npz,
  * checks decoded outputs agree across all three load paths.
"""

import os
import subprocess
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


@pytest.fixture(scope="module")
def pt_file(tmp_path_factory):
    import torch

    for name in ("onnx", "onnx.external_data_helper", "torchvision",
                 "torchvision.ops"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].ops = sys.modules["torchvision.ops"]
    sys.modules["torchvision.ops"].nms = None
    sys.path.insert(0, REF)
    cwd = os.getcwd()
    os.chdir(REF)
    try:
        import importlib
        yolo = importlib.import_module("models.yolo")
        torch.manual_seed(7)
        model = yolo.Model(os.path.join(REF, "models", "yolov5s_city_seg.yaml"))
        model.eval()
        import copy
        ema = copy.deepcopy(model)
        with torch.no_grad():  # make EMA weights distinguishable
            for p in ema.parameters():
                p.add_(0.001)
        ckpt = {"epoch": 42, "best_fitness": np.array([0.5]),
                "training_results": "x", "model": model.half(),
                "ema": ema.half(), "updates": 100, "optimizer": None,
                "wandb_id": None}
        p = tmp_path_factory.mktemp("ckpt") / "ref_style.pt"
        torch.save(ckpt, str(p))
        return str(p)
    finally:
        os.chdir(cwd)
        sys.path.remove(REF)


def test_pt_load_prefers_ema_and_embeds_cfg(pt_file):
    from multiyolov5_tpu.utils.checkpoint import load_pt

    params, state, meta = load_pt(pt_file)
    assert meta.get("epoch") == 42
    assert meta.get("yaml") is not None and meta["yaml"]["nc"] == 10
    p_model, _, _ = load_pt(pt_file, prefer_ema=False)
    k = "model.0.conv.conv.weight"
    # EMA weights were shifted by +0.001
    d = float(np.abs(np.asarray(params[k]) - np.asarray(p_model[k])).mean())
    assert 0.0005 < d < 0.002


def test_engine_pt_npz_agree(pt_file, tmp_path):
    from multiyolov5_tpu.engine import Engine
    from multiyolov5_tpu.tools.convert_pt import convert

    img = (np.random.RandomState(3).rand(1, 128, 256, 3) * 255).astype(np.uint8)
    e1 = Engine(pt_file, half=False)
    d1, m1 = e1(img, (256, 512), conf=0.001)

    npz = convert(pt_file, str(tmp_path / "conv.npz"))
    e2 = Engine(npz, half=False)
    d2, m2 = e2(img, (256, 512), conf=0.001)

    np.testing.assert_allclose(d1[0], d2[0], rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(m1[0], m2[0])


def test_orbax_roundtrip(tmp_path):
    """save_orbax/load_orbax: the multi-host/sharded-ckpt path (the npz
    format is single-host-only)."""
    from multiyolov5_tpu.utils import checkpoint as ck

    tree = {"params": {"w": np.arange(12, dtype=np.float32).reshape(3, 4),
                       "b": np.zeros((4,), np.float32)},
            "step": np.asarray(7, np.int64)}
    path = str(tmp_path / "ock")
    ck.save_orbax(path, tree)
    out = ck.load_orbax(path, target=tree)
    np.testing.assert_array_equal(out["params"]["w"], tree["params"]["w"])
    assert int(out["step"]) == 7


def test_strip_optimizer_keeps_updates(tmp_path):
    """strip_optimizer must carry the trainer's EMA update counter
    ('updates') so resumed EMAs don't restart the 2000-step decay ramp."""
    from multiyolov5_tpu.utils import checkpoint as ck

    path = str(tmp_path / "train.npz")
    ck.save_npz(path, {"params": {"w": np.ones(3, np.float32)},
                       "state": {"s": np.zeros(1, np.float32)},
                       "ema_params": {"w": np.full(3, 2.0, np.float32)},
                       "ema_state": {"s": np.ones(1, np.float32)},
                       "opt": {"m": {"w": np.zeros(3, np.float32)}},
                       "updates": np.asarray(1234, np.int32),
                       "epoch": np.asarray(7)})
    ck.strip_optimizer(path)
    out = ck.load_npz(path)
    assert int(out["updates"]) == 1234
    assert "opt" not in out or not out.get("opt")
    np.testing.assert_array_equal(out["params"]["w"], np.full(3, 2.0))
