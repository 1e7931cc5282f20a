"""Engine behaviors: TTA, ensemble, det-only configs, geometry caching."""

import numpy as np
import pytest

from multiyolov5_tpu.engine import Engine


@pytest.fixture(scope="module")
def eng():
    return Engine(None, cfg="yolov5s_city_seg", half=False)


def test_basic_and_cache(eng):
    img = np.zeros((1, 128, 256, 3), np.uint8)
    dets, masks = eng(img, (256, 512))
    assert masks[0].shape == (256, 512) and masks[0].dtype == np.uint8
    n0 = len(eng._cache)
    eng(img, (256, 512))
    assert len(eng._cache) == n0  # same geometry -> no recompile
    eng(img, (300, 600))
    assert len(eng._cache) == n0 + 1


def test_tta_augment(eng):
    img = (np.random.RandomState(0).rand(1, 128, 256, 3) * 255).astype(np.uint8)
    dets, masks = eng(img, (128, 256), conf=0.001, augment=True)
    assert dets[0].shape[1] == 6
    assert masks[0].shape == (128, 256)


def test_ensemble_concat(eng):
    e2 = Engine(None, cfg="yolov5s_city_seg", half=False)
    eng2 = Engine(None, cfg="yolov5s_city_seg", half=False)
    eng2.ensemble = [e2]
    img = (np.random.RandomState(1).rand(1, 128, 256, 3) * 255).astype(np.uint8)
    dets, masks = eng2(img, (128, 256), conf=0.001)
    assert dets[0].shape[1] == 6
    assert masks[0] is not None


def test_det_only_engine():
    e = Engine(None, cfg="yolov5s", half=False)
    dets, masks = e(np.zeros((1, 128, 128, 3), np.uint8), (128, 128))
    assert masks[0] is None


def test_batched_call(eng):
    img = np.zeros((2, 128, 256, 3), np.uint8)
    dets, masks = eng(img, (256, 512))
    assert len(dets) == 2 and len(masks) == 2


def test_p6_engine():
    """4-level P6 family through the full pipeline (decode at stride 64 +
    NMS); zoo entry is exact vs reference models/hub/yolov5s6.yaml."""
    e = Engine(None, cfg="yolov5s6", half=False)
    assert e.spec.nl == 4 and e.spec.strides[-1] == 64
    img = (np.random.RandomState(1).rand(1, 128, 256, 3) * 255).astype(np.uint8)
    dets, masks = e(img, (128, 256), conf=0.001)
    assert dets[0].shape[1] == 6
    assert masks[0] is None  # detection-only config


def test_ensemble_tta(eng):
    """--augment must propagate to every ensemble member (reference
    Ensemble.forward passes augment through, experimental.py:26): TTA
    concatenates 3 scales, so the candidate pool triples."""
    e2 = Engine(None, cfg="yolov5s_city_seg", half=False)
    eng2 = Engine(None, cfg="yolov5s_city_seg", half=False)
    eng2.ensemble = [e2]
    img = (np.random.RandomState(2).rand(1, 128, 256, 3) * 255).astype(np.uint8)
    x = np.asarray(img)
    import jax.numpy as jnp
    z_plain = eng2._decoded(jnp.asarray(x))
    z_tta = eng2._decoded(jnp.asarray(x), augment=True)
    assert z_tta.shape[1] > z_plain.shape[1]  # 3-scale concat
    dets, masks = eng2(img, (128, 256), conf=0.001, augment=True)
    assert dets[0].shape[1] == 6 and masks[0] is not None


def test_engine_npz_uses_ema_state(tmp_path):
    """EMA params must pair with EMA BN stats at load (fusing EMA gamma/beta
    against raw running moments skews the folded conv weights)."""
    from multiyolov5_tpu.utils import checkpoint as ck

    base = Engine(None, cfg="yolov5s", half=False)
    tree = {"params": base.params, "state": base.state}
    # make raw state poisonous: huge running_var would visibly change fusion
    bad_state = {k: (v * 0 + 1e6 if "running_var" in k else v)
                 for k, v in base.state.items()}
    path = str(tmp_path / "ck.npz")
    ck.save_npz(path, {"params": {k: np.asarray(v) * 0 for k, v in base.params.items()},
                       "state": {k: np.asarray(v) for k, v in bad_state.items()},
                       "ema_params": {k: np.asarray(v) for k, v in base.params.items()},
                       "ema_state": {k: np.asarray(v) for k, v in base.state.items()}})
    e = Engine(path, cfg="yolov5s", half=False)
    ref = Engine(None, cfg="yolov5s", half=False,
                 spec=base.spec, params=base.params, state=base.state)
    k = next(k for k in e.params if k.endswith("conv.weight"))
    np.testing.assert_allclose(np.asarray(e.params[k]),
                               np.asarray(ref.params[k]), rtol=1e-5)


def test_hub_create_classes_channels():
    """hub.create must honor classes/channels (reference hubconf.create
    passes them to Model(cfg, channels, classes))."""
    from multiyolov5_tpu.hub import create

    m = create("yolov5s", classes=20, autoshape=False)
    assert m.spec.nc == 20
    # decode output width = 5 + nc
    dets, _ = m(np.zeros((1, 64, 64, 3), np.uint8), (64, 64), conf=0.001)
    assert dets[0].shape[1] == 6
    m1 = create("yolov5s", channels=1, classes=20, autoshape=False)
    k = "model.0.conv.conv.weight"  # Focus stem: 4*ch input channels
    assert m1.params[k].shape[2] == 4


def test_planar_decode_matches_raw_decode():
    """detect_decode_planar (dot_general serving decode) must equal the
    reference-shaped detect_decode(raw) bit-for-bit in fp32 — it is the
    same math on the same features, only the layout/severing differs."""
    import jax.numpy as jnp
    from multiyolov5_tpu.models import heads as H
    from multiyolov5_tpu.models.config import load_spec
    from multiyolov5_tpu.models.model import forward, init_model
    from multiyolov5_tpu.ops.nn import Ctx

    spec = load_spec("yolov5s_city_seg")
    params, state = init_model(spec, seed=3)
    x = np.random.RandomState(7).rand(2, 128, 192, 3).astype(np.float32)
    (dec, raw), _, _ = forward(spec, params, state, x, train=False,
                               decode=True)
    ctx = Ctx(p=params, s=state, train=False, fused=False)
    dec_raw = H.detect_decode(ctx, f"model.{spec.detect_index}", raw,
                              spec.strides, spec.nc)
    assert dec.shape == dec_raw.shape
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(dec_raw))


def test_planar_out_decode_matches_flat():
    """decode="planar" (per-scale (no, na, B, H*W) rows for nms_planar)
    flattened back == decode=True's (B, N, no): same values, (scale,
    anchor, pixel) candidate order preserved."""
    import jax.numpy as jnp
    from multiyolov5_tpu.models.config import load_spec
    from multiyolov5_tpu.models.model import forward, init_model

    spec = load_spec("yolov5s_city_seg")
    params, state = init_model(spec, seed=3)
    x = np.random.RandomState(7).rand(2, 128, 192, 3).astype(np.float32)
    (dec, _), _, _ = forward(spec, params, state, x, train=False,
                             decode=True)
    (zs, _), _, _ = forward(spec, params, state, x, train=False,
                            decode="planar")
    no = dec.shape[-1]
    flat = np.concatenate(
        [np.asarray(z).transpose(2, 1, 3, 0).reshape(dec.shape[0], -1, no)
         for z in zs], 1)
    np.testing.assert_allclose(flat, np.asarray(dec), rtol=1e-6, atol=1e-6)


def test_engine_planar_nms_matches_batched(eng):
    """Engine end-to-end with the planar NMS frontend on vs off — same
    boxes, same masks (the planar path is a layout change only)."""
    import os
    img = (np.random.RandomState(1).rand(1, 128, 256, 3) * 255).astype(
        np.uint8)
    os.environ["MULTIYOLOV5_NMS_PLANAR"] = "1"
    try:
        d1, m1 = eng(img, (128, 256), conf=0.001)
    finally:
        os.environ["MULTIYOLOV5_NMS_PLANAR"] = "0"
    try:
        eng._cache.clear()
        d2, m2 = eng(img, (128, 256), conf=0.001)
    finally:
        del os.environ["MULTIYOLOV5_NMS_PLANAR"]
        eng._cache.clear()
    np.testing.assert_array_equal(m1[0], m2[0])
    assert d1[0].shape == d2[0].shape
    np.testing.assert_allclose(d1[0], d2[0], rtol=1e-5, atol=1e-4)
