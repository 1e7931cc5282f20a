"""End-to-end numerical parity against the reference PyTorch implementation.

These tests build the actual reference ``Model`` (mounted read-only at
/root/reference), pull its ``state_dict`` through the checkpoint bridge, run
both frameworks on the same input, and compare detection raw maps, decoded
boxes, and segmentation logits.  Skipped automatically when the reference
checkout isn't present (e.g. in CI elsewhere).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_modules():
    """Import reference models.yolo with heavyweight deps stubbed out."""
    # reference models/yolo.py imports onnx at module scope and
    # utils/general.py imports torchvision (only used for its nms); stub both.
    for name in ("onnx", "onnx.external_data_helper"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")
        tv_ops.nms = None
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
    sys.path.insert(0, REF)
    cwd = os.getcwd()
    os.chdir(REF)
    try:
        import importlib
        yolo = importlib.import_module("models.yolo")
        yield yolo
    finally:
        os.chdir(cwd)
        sys.path.remove(REF)


def _build_pair(ref_modules, cfg_name, seed=0):
    import torch

    torch.manual_seed(seed)
    tmodel = ref_modules.Model(os.path.join(REF, "models", cfg_name))
    tmodel.eval()

    from multiyolov5_tpu.models.config import load_spec
    from multiyolov5_tpu.models import model as M
    from multiyolov5_tpu.utils.checkpoint import from_torch_state_dict

    spec = load_spec(os.path.join(REF, "models", cfg_name))
    params, state = from_torch_state_dict(tmodel.state_dict())
    return tmodel, spec, params, state


@pytest.mark.parametrize("cfg", ["yolov5s_city_seg.yaml"])
def test_full_model_eval_parity(ref_modules, cfg):
    import torch
    import jax.numpy as jnp
    from multiyolov5_tpu.models.model import forward

    tmodel, spec, params, state = _build_pair(ref_modules, cfg)

    rng = np.random.RandomState(1)
    x = rng.rand(1, 3, 128, 192).astype(np.float32)  # NCHW for torch
    with torch.no_grad():
        (tz, traw), tseg = tmodel(torch.from_numpy(x))

    det, seg, _ = forward(spec, params, state,
                          jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    z, raw = det

    # raw per-level maps (B, na, ny, nx, no)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(raw[i]), traw[i].numpy(),
                                   rtol=1e-3, atol=2e-4,
                                   err_msg=f"raw level {i}")
    # decoded boxes
    np.testing.assert_allclose(np.asarray(z), tz.numpy(), rtol=1e-3, atol=5e-3)
    # seg logits: torch NCHW -> NHWC
    np.testing.assert_allclose(np.asarray(seg),
                               np.transpose(tseg.numpy(), (0, 2, 3, 1)),
                               rtol=1e-3, atol=5e-4)


@pytest.mark.parametrize("cfg,seg_rows", [
    ("yolov5m_city_seg.yaml", None),
])
def test_medium_model_parity(ref_modules, cfg, seg_rows):
    import torch
    import jax.numpy as jnp
    from multiyolov5_tpu.models.model import forward

    tmodel, spec, params, state = _build_pair(ref_modules, cfg)
    rng = np.random.RandomState(2)
    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        (tz, traw), tseg = tmodel(torch.from_numpy(x))
    det, seg, _ = forward(spec, params, state,
                          jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    z, raw = det
    np.testing.assert_allclose(np.asarray(z), tz.numpy(), rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(seg),
                               np.transpose(tseg.numpy(), (0, 2, 3, 1)),
                               rtol=1e-3, atol=5e-4)


def test_seg_head_variants_parity(ref_modules):
    """Exercise SegMaskBase / SegMaskBiSe / SegMaskLab through the reference
    modules directly (they are selected by editing the yaml in the reference;
    here we construct config dicts per variant)."""
    import io
    import torch
    import yaml as pyyaml
    import jax.numpy as jnp
    from multiyolov5_tpu.models.config import load_spec
    from multiyolov5_tpu.models.model import forward
    from multiyolov5_tpu.utils.checkpoint import from_torch_state_dict

    with open(os.path.join(REF, "models", "yolov5s_city_seg.yaml")) as fh:
        base_cfg = pyyaml.safe_load(fh)

    variants = {
        "SegMaskBase": [[16], 1, "SegMaskBase", ["n_segcls", 3, 512, False]],
        "SegMaskBiSe": [[16, 19, 22], 1, "SegMaskBiSe", ["n_segcls", 3, 256, False]],
        "SegMaskLab": [[4, 19], 1, "SegMaskLab", ["n_segcls", 3, 256, False]],
    }
    rng = np.random.RandomState(3)
    x = rng.rand(2, 3, 64, 96).astype(np.float32)
    for name, row in variants.items():
        cfg = {k: (v.copy() if isinstance(v, list) else v) for k, v in base_cfg.items()}
        cfg["head"] = [r for r in base_cfg["head"]]
        cfg["head"][-2] = row
        torch.manual_seed(0)
        import copy
        tmodel = ref_modules.Model(copy.deepcopy(cfg))
        tmodel.eval()
        spec = load_spec(copy.deepcopy(cfg))
        params, state = from_torch_state_dict(tmodel.state_dict())
        with torch.no_grad():
            (tz, traw), tseg = tmodel(torch.from_numpy(x))
        det, seg, _ = forward(spec, params, state,
                              jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
        np.testing.assert_allclose(np.asarray(det[0]), tz.numpy(), rtol=1e-3,
                                   atol=5e-3, err_msg=name)
        np.testing.assert_allclose(np.asarray(seg),
                                   np.transpose(tseg.numpy(), (0, 2, 3, 1)),
                                   rtol=1e-3, atol=5e-4, err_msg=name)


def test_zoo_p6_matches_reference_yaml():
    """Built-in yolov5{s,m,l,x}6 zoo entries produce the identical param
    tree as the reference models/hub/*6.yaml configs (4-level P6 Detect)."""
    import numpy as np
    from multiyolov5_tpu.models.config import load_spec
    from multiyolov5_tpu.models.model import init_model

    for size in "smlx":
        name = f"yolov5{size}6"
        ref_yaml = os.path.join(REF, "models", "hub", f"{name}.yaml")
        if not os.path.exists(ref_yaml):
            continue
        s1, s2 = load_spec(name), load_spec(ref_yaml)
        p1, _ = init_model(s1, 0)
        p2, _ = init_model(s2, 0)
        assert {k: v.shape for k, v in p1.items()} == \
               {k: v.shape for k, v in p2.items()}
        assert s1.nl == 4 and list(s1.strides) == [8, 16, 32, 64]
        assert np.allclose(np.asarray(s1.anchors, np.float32),
                           np.asarray(s2.anchors, np.float32))
