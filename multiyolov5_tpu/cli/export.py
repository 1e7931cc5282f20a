"""Model export — TPU-native analog of reference models/export.py.

The reference exports TorchScript / ONNX / CoreML (models/export.py:58-101).
The equivalents here:

  * ``stablehlo`` — jax.export serialized StableHLO (the portable compiled-
    graph format; plays the role TorchScript plays for torch)
  * ``saved_model`` — jax2tf -> TF SavedModel (servable)
  * ``tflite``     — jax2tf -> TFLite flatbuffer (edge deployment; the analog
    of the reference's CoreML/ONNX mobile targets)

Like the reference's ``Detect.export`` flag (models/yolo.py:209), ``--raw``
strips the grid decode and exports per-level raw maps.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def export(opt):
    import jax
    import jax.numpy as jnp

    from ..engine import Engine
    from ..models.model import forward

    w = opt.weights[0] if isinstance(opt.weights, list) else opt.weights
    eng = Engine(w or None, cfg=opt.cfg, half=False)
    spec, params, state = eng.spec, eng.params, eng.state
    h, wd = (opt.img_size, opt.img_size) if isinstance(opt.img_size, int) \
        else opt.img_size
    x_spec = jnp.zeros((opt.batch_size, h, wd, 3), jnp.float32)

    def fn(x):
        # sever=False: exported graphs must be portable — plain XLA convs,
        # no Pallas custom calls or layout-severing reshaped dots (TFLite's
        # converter rejects the rank-4 batch_matmul they produce)
        det, seg, _ = forward(spec, params, state, x, train=False,
                              fused=eng.fused, decode=not opt.raw,
                              sever=False)
        if opt.raw:
            out = tuple(det)
        else:
            out = (det[0],)
        if seg is not None:
            out = out + (seg,)
        return out

    out_dir = Path(opt.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = Path(w).stem if w else (opt.cfg if isinstance(opt.cfg, str) else "model")
    made = []

    if "stablehlo" in opt.include:
        from jax import export as jexport
        exp = jexport.export(jax.jit(fn))(
            jax.ShapeDtypeStruct(x_spec.shape, x_spec.dtype))
        p = out_dir / f"{stem}.stablehlo"
        p.write_bytes(exp.serialize())
        made.append(str(p))
        print(f"stablehlo export success: {p} "
              f"({p.stat().st_size / 1e6:.1f} MB)")

    if "saved_model" in opt.include or "tflite" in opt.include:
        import tensorflow as tf
        from jax.experimental import jax2tf

        tf_fn = tf.function(
            jax2tf.convert(fn, with_gradient=False),
            input_signature=[tf.TensorSpec(list(x_spec.shape), tf.float32)],
            autograph=False)
        if "saved_model" in opt.include:
            module = tf.Module()
            module.f = tf_fn
            p = out_dir / f"{stem}_saved_model"
            tf.saved_model.save(module, str(p))
            made.append(str(p))
            print(f"saved_model export success: {p}")
        if "tflite" in opt.include:
            converter = tf.lite.TFLiteConverter.from_concrete_functions(
                [tf_fn.get_concrete_function()])
            converter.target_spec.supported_ops = [
                tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS]
            tfl = converter.convert()
            p = out_dir / f"{stem}.tflite"
            p.write_bytes(tfl)
            made.append(str(p))
            print(f"tflite export success: {p} ({len(tfl) / 1e6:.1f} MB)")

    print(f"Export complete ({len(made)} artifacts). "
          f"Visualize StableHLO with jax.export.deserialize.")
    return made


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", nargs="+", type=str, default="",
                   help=".pt/.npz weights (empty = random init from --cfg)")
    p.add_argument("--cfg", type=str, default="yolov5s_city_seg")
    p.add_argument("--img-size", nargs="+", type=int, default=[512, 1024])
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--include", nargs="+",
                   default=["stablehlo", "saved_model", "tflite"])
    p.add_argument("--raw", action="store_true",
                   help="export raw per-level maps (Detect.export analog)")
    p.add_argument("--output", default="runs/export")
    return p


def main(argv=None):
    opt = build_parser().parse_args(argv)
    if isinstance(opt.img_size, list) and len(opt.img_size) == 1:
        opt.img_size = opt.img_size[0]
    print(opt)
    return export(opt)


if __name__ == "__main__":
    main()
