"""Export path end-to-end (round-2 verdict item 5).

The reference's CI smoke-exported ONNX (reference
.github/workflows/ci-testing.yml:75-79); the TPU-native equivalents are
StableHLO (jax.export), TF SavedModel and TFLite (jax2tf) —
multiyolov5_tpu/cli/export.py.  Each artifact is exported on a tiny config,
loaded back through its own runtime, and checked numerically against the
live jitted forward.
"""

import argparse

import numpy as np
import pytest

import jax
import jax.numpy as jnp

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
        [[16, 19, 22], 1, "SegMaskPSP", [4, 3, 256, False]],
        [[17, 20, 23], 1, "Detect", ["nc", "anchors"]],
    ],
}


def _opt(tmp_path, include, raw=False):
    return argparse.Namespace(
        weights="", cfg=TINY, img_size=64, batch_size=1, include=include,
        raw=raw, output=str(tmp_path))


def _reference_outputs(x):
    """Live jitted forward on the same (seed-0, BN-fused) engine params."""
    from multiyolov5_tpu.engine import Engine
    from multiyolov5_tpu.models.model import forward

    eng = Engine(None, cfg=TINY, half=False)

    def fn(xx):
        det, seg, _ = forward(eng.spec, eng.params, eng.state, xx,
                              train=False, fused=True, decode=True,
                              sever=False)
        return det[0], seg
    return jax.jit(fn)(x)


@pytest.fixture(scope="module")
def x():
    rng = np.random.RandomState(3)
    return jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))


def test_export_stablehlo_roundtrip(tmp_path, x):
    from jax import export as jexport

    from multiyolov5_tpu.cli.export import export

    made = export(_opt(tmp_path, ["stablehlo"]))
    assert len(made) == 1 and made[0].endswith(".stablehlo")
    exp = jexport.deserialize(open(made[0], "rb").read())
    out = exp.call(x)
    z_want, seg_want = _reference_outputs(x)
    assert len(out) == 2
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(z_want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(seg_want),
                               rtol=1e-5, atol=1e-5)


def test_export_stablehlo_raw(tmp_path, x):
    """--raw strips the grid decode (reference Detect.export flag)."""
    from jax import export as jexport

    from multiyolov5_tpu.cli.export import export

    made = export(_opt(tmp_path, ["stablehlo"], raw=True))
    out = jexport.deserialize(open(made[0], "rb").read()).call(x)
    # 3 raw per-level maps + seg logits
    assert len(out) == 4
    assert out[0].shape[1] == 3  # (B, na, ny, nx, no)
    assert out[3].shape == (1, 64, 64, 4)


def test_export_saved_model_and_tflite(tmp_path, x):
    tf = pytest.importorskip("tensorflow")

    from multiyolov5_tpu.cli.export import export

    made = export(_opt(tmp_path, ["saved_model", "tflite"]))
    assert len(made) == 2
    z_want, seg_want = (np.asarray(a) for a in _reference_outputs(x))

    # SavedModel through the TF runtime
    mod = tf.saved_model.load(made[0])
    out = mod.f(tf.constant(np.asarray(x)))
    np.testing.assert_allclose(out[0].numpy(), z_want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out[1].numpy(), seg_want, rtol=1e-4, atol=1e-4)

    # TFLite through the interpreter
    interp = tf.lite.Interpreter(model_path=made[1])
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    interp.set_tensor(inp["index"], np.asarray(x))
    interp.invoke()
    outs = [interp.get_tensor(d["index"])
            for d in interp.get_output_details()]
    by_shape = {tuple(o.shape): o for o in outs}
    np.testing.assert_allclose(by_shape[z_want.shape], z_want,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(by_shape[seg_want.shape], seg_want,
                               rtol=1e-3, atol=1e-3)
