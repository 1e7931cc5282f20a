"""Fused TPU inference engine.

One jit-compiled graph per (input-geometry, output-geometry) pair covering:
    uint8 -> normalize -> backbone/neck/heads (bf16, BN-folded) -> detect
    decode -> device NMS -> letterbox coordinate unmap -> seg logits
    upsample (align_corners, fp32-exact) -> argmax class map

The reference pipeline (detect.py:134-233) crosses the host boundary three
times per frame (model out, NMS in torchvision, interpolate+argmax on CPU);
here a frame costs one H2D (letterboxed uint8) and two tiny D2H (boxes,
class-map bytes).  Static shapes make each geometry compile once — the XLA
analog of cudnn.benchmark's same-size rule (reference detect.py:115-124).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.config import ModelSpec, load_spec
from .models.model import forward, init_model, stack_feats
from .ops import stem as stem_lib
from .ops.nms import nms_batched, nms_from_raw, nms_planar
from .ops.pallas.upsample_argmax_kernel import upsample_argmax_planar
from .ops.resize import resize_bilinear
from .ops.nn import fuse_conv_bn
from .utils import checkpoint as ckpt_lib


def space_to_depth_host(img: np.ndarray) -> np.ndarray:
    """(B, H, W, C) uint8 -> (B, H/2, W/2, 4C) with torch Focus phase order
    [ee, oe, eo, oo] (H-offset first).  Runs on host overlapped with device
    compute so the stem conv gets MXU-friendly 4C channels.  Uses the native
    C++ kernel (native/preprocess.cpp, ~8x numpy) when built."""
    if img.shape[-1] == 3 and img.dtype == np.uint8:
        from . import native
        if native.available():
            return np.stack([native.space_to_depth(
                np.ascontiguousarray(im)) for im in img], 0)
    return np.concatenate([
        img[:, ::2, ::2], img[:, 1::2, ::2],
        img[:, ::2, 1::2], img[:, 1::2, 1::2]], axis=-1)


def supports_det_per_image(spec) -> bool:
    """True when the head rows are [seg, detect] reading only explicit
    cache refs — the structure the per-image detect split of
    :func:`run_batched_pipeline` needs."""
    if not (spec.seg_index is not None and spec.seg_index >= 0
            and spec.detect_index is not None and spec.detect_index >= 0
            and spec.detect_index == spec.seg_index + 1):
        return False
    det_f = spec.rows[spec.detect_index].f
    seg_f = spec.rows[spec.seg_index].f
    return (isinstance(det_f, (list, tuple))
            and all(j != -1 for j in det_f)
            and isinstance(seg_f, (list, tuple))
            and all(j != -1 for j in seg_f))


def run_batched_pipeline(spec, params, state, y1s, *, decode_mode="planar",
                         conf=0.25, iou=0.45, agnostic=False, cmask=None,
                         max_det=300, det_per_image=None):
    """Batch>1 serving body shared by Engine, bench.py, and prof_serving.

    ``y1s``: per-image stem outputs (the multi-output u8 stem kernel's
    tuple).  Runs the trunk per image in a STATIC unrolled loop (the
    batch-1 custom-kernel layout regime — at batch>1 a single batched
    graph pays ~171us/frame of relayout copies at every Pallas boundary,
    and a lax.scan gives the carried stem output an exotic layout), then
    detect decode + planar NMS per image off the per-image feature dicts
    and the seg head BATCHED on lazily-stacked neck feats (where XLA's
    batch conv emitters win).  Returns (boxes, valid, seg_planar);
    bit-identical to the straight batched pipeline
    (tests/test_batch_scan_tpu.py).  bs8: 1585 -> 1795 FPS vs bs1 ~1715.
    """
    heads = [i for i in (spec.seg_index, spec.detect_index)
             if i is not None and i >= 0]
    head_stop = min(heads)
    if det_per_image is None:
        import os as _os
        det_per_image = (supports_det_per_image(spec) and
                         _os.environ.get("MULTIYOLOV5_DET_PER_IMAGE") != "0")
    per_img = []
    for y1_i in y1s:
        feats_i, y_i, _ = forward(spec, params, state, y1_i, train=False,
                                  fused=True, decode=decode_mode,
                                  start_layer=2, seg_up=False,
                                  stop_before=head_stop)
        per_img.append((feats_i, y_i))
    if det_per_image:
        bv = []
        for feats_i, y_i in per_img:
            det_i, _, _ = forward(spec, params, state, y_i, train=False,
                                  fused=True, decode=decode_mode,
                                  seg_up=False,
                                  start_layer=spec.detect_index,
                                  feats_in=feats_i)
            bv.append(nms_planar(det_i[0], conf_thres=conf, iou_thres=iou,
                                 agnostic=agnostic, class_mask=cmask,
                                 max_nms=1024, max_det=max_det))
        boxes = jnp.concatenate([b for b, _ in bv], 0)
        valid = jnp.concatenate([v for _, v in bv], 0)
        seg_need = {j for j in spec.rows[spec.seg_index].f if j != -1}
        feats = stack_feats([{j: f[j] for j in seg_need}
                             for f, _ in per_img])
        # the seg row reads only explicit cache refs — x is just
        # batch-size/dtype context, so no y concat at all
        y_s = jnp.zeros((len(per_img), 1, 1, 1), per_img[0][1].dtype)
        _, seg, _ = forward(spec, params, state, y_s, train=False,
                            fused=True, decode=False,
                            start_layer=spec.seg_index, seg_up=False,
                            feats_in=feats, stop_before=spec.detect_index)
    else:
        feats = stack_feats([f for f, _ in per_img])
        y_s = jnp.concatenate([y for _, y in per_img], 0)
        det, seg, _ = forward(spec, params, state, y_s, train=False,
                              fused=True, decode=decode_mode,
                              start_layer=head_stop, seg_up=False,
                              feats_in=feats)
        boxes, valid = nms_planar(det[0], conf_thres=conf, iou_thres=iou,
                                  agnostic=agnostic, class_mask=cmask,
                                  max_nms=1024, max_det=max_det)
    return boxes, valid, seg


def scale_img_pad(x: jnp.ndarray, ratio: float, gs: int = 32) -> jnp.ndarray:
    """TTA helper (reference utils/torch_utils.py:248-258): bilinear
    (align_corners=False, like F.interpolate default) scale + 0.447 pad."""
    if ratio == 1.0:
        return x
    b, h, w, c = x.shape
    nh, nw = int(h * ratio), int(w * ratio)
    x = resize_bilinear(x, (nh, nw), align_corners=False)
    ph, pw = int(np.ceil(nh / gs) * gs) - nh, int(np.ceil(nw / gs) * gs) - nw
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                   constant_values=0.447)


class Engine:
    """Loads weights, folds BN, and serves fused jitted inference."""

    def __init__(self, weights: Any = None, cfg: Any = None,
                 half: bool = True, spec: Optional[ModelSpec] = None,
                 params=None, state=None):
        # multi-checkpoint ensemble (reference models/experimental.py
        # Ensemble: decoded outputs concatenated before NMS)
        self.ensemble: list = []
        if isinstance(weights, (list, tuple)) and len(weights) > 1:
            for w in weights[1:]:
                self.ensemble.append(Engine(w, cfg=cfg, half=half))
            weights = weights[0]
        elif isinstance(weights, (list, tuple)):
            weights = weights[0] if weights else None
        if spec is not None:
            self.spec, self.params, self.state = spec, params, state
        else:
            self.spec, self.params, self.state = self._load(weights, cfg)
        # fold BN (reference attempt_load: .float().fuse().eval())
        self.params = fuse_conv_bn(self.params, self.state)
        # drop running stats only for folded BNs; unfoldable standalone BNs
        # (BottleneckCSP/MixConv2d/DAPPM) keep theirs and stay functional
        self.state = {
            k: v for k, v in self.state.items()
            if "running_" not in k
            or k.rsplit(".running_", 1)[0] + ".weight" in self.params}
        self.fused = True
        if half:  # bf16 weights: fp32 master copies are pointless at inference
            self.params = jax.tree.map(
                lambda t: np.asarray(t).astype(jnp.bfloat16)
                if t.dtype == jnp.float32 else t, self.params)
        # everything above runs in host numpy (init / fuse / cast as eager
        # device ops would pay one tunnel round-trip + tiny compile per
        # parameter — ~19 min of Engine construction); one batched transfer
        # puts the finished tree on device
        self.params = jax.device_put(self.params)
        self.state = jax.device_put(self.state)
        self.compute_dtype = jnp.bfloat16 if half else jnp.float32
        self._cache: Dict[Any, Any] = {}
        # folded 4x4-s2d stem (ops/stem.py): Focus + first stride-2 conv as
        # two MXU-friendly convs on the quarter-res grid — exact, ~10x faster
        self.fold_stem = stem_lib.can_fold_stem(self.spec)
        self._stem_fw = None
        # u8 Pallas stem: eats the host-packed raw frame bytes directly
        # (normalize folded into conv1, row-pair packing host-side).  The
        # device-side normalize+pack fusions it replaces cost ~100us/frame
        # at serving batch sizes.  c_mid cap 256 covers s/m/l.
        import os as _os
        self._stem_u8_ok = (
            self.fold_stem and jax.default_backend() == "tpu"
            and not _os.environ.get("MULTIYOLOV5_XLA_STEM"))

    def _stem_weights(self):
        if self._stem_fw is None:
            self._stem_fw = tuple(
                jnp.asarray(a) for a in
                stem_lib.fold_stem_from_params(self.params))
        return self._stem_fw

    # -- weight loading -----------------------------------------------------

    @staticmethod
    def _load(weights, cfg) -> Tuple[ModelSpec, dict, dict]:
        import os
        if isinstance(weights, str) and not weights:
            weights = None
        if isinstance(weights, str) and not os.path.exists(weights):
            if cfg is None:
                raise FileNotFoundError(f"weights not found: {weights} (and no --cfg given)")
            print(f"WARNING: weights {weights!r} not found — "
                  f"random init from cfg {cfg!r}")
            weights = None
        if isinstance(weights, str) and weights.endswith(".pt"):
            params, state, meta = ckpt_lib.load_pt(weights)
            spec = load_spec(meta.get("yaml") or cfg)
            return spec, params, state
        if isinstance(weights, str):  # native npz
            tree = ckpt_lib.load_npz(weights)
            ema = tree.get("ema_params")
            params = ema or tree["params"]
            # EMA params must pair with EMA BN stats — fusing EMA gamma/beta
            # against raw running moments silently skews the folded weights
            state = (tree.get("ema_state") or tree["state"]) if ema \
                else tree["state"]
            spec_yaml = tree.get("spec_yaml")
            spec = load_spec(json.loads(spec_yaml) if isinstance(spec_yaml, str)
                             else (spec_yaml or cfg))
            return spec, params, state
        # fresh init from cfg (random weights; for tests/smoke)
        spec = load_spec(cfg or "yolov5s_city_seg")
        params, state = init_model(spec)
        return spec, params, state

    @property
    def stride(self) -> int:
        return max(self.spec.strides)

    @property
    def names(self):
        return self.spec.names

    # -- fused pipeline -----------------------------------------------------

    def _compiled(self, in_hw, orig_hw, conf, iou, classes, agnostic,
                  multi_label, max_det, augment):
        # env-derived compile-time flags are part of the cache key (advisor
        # round 4): flipping a gate on a live Engine must not alias onto a
        # stale compiled pipeline
        import os as _os
        env_key = tuple(_os.environ.get(k) for k in (
            "MULTIYOLOV5_EXACT_MASK", "MULTIYOLOV5_NMS_PLANAR",
            "MULTIYOLOV5_LAYOUT_OPT", "MULTIYOLOV5_BATCH_SCAN",
            "MULTIYOLOV5_DET_PER_IMAGE"))
        key = (in_hw, orig_hw, conf, iou, classes, agnostic, multi_label,
               max_det, augment, env_key)
        if key in self._cache:
            return self._cache[key]

        spec = self.spec
        gain = min(in_hw[0] / orig_hw[0], in_hw[1] / orig_hw[1])
        pad = ((in_hw[1] - orig_hw[1] * gain) / 2,
               (in_hw[0] - orig_hw[0] * gain) / 2)
        cmask = None
        if classes is not None:
            cm = np.zeros((spec.nc,), np.float32)
            cm[list(classes)] = 1.0
            cmask = jnp.asarray(cm)
        cdt = self.compute_dtype
        params, state = self.params, self.state

        # host s2d only applies when the model has a Focus stem and no TTA
        # (TTA rescales the raw image, which doesn't commute with s2d)
        use_s2d = (not augment and spec.rows and spec.rows[0].module == "Focus")
        fold = (use_s2d and self.fold_stem
                and in_hw[0] % 4 == 0 and in_hw[1] % 4 == 0)
        stem_fw = self._stem_weights() if fold else None
        u8_stem = fold and self._use_u8_stem(in_hw)

        # fused mask path: the seg head returns its 1/8-res logits and one
        # Pallas kernel computes argmax(up8 -> up-to-frame) straight from
        # them (ops/pallas/upsample_argmax_kernel.py) — the full-res logits
        # never touch HBM.  TTA keeps the reference's materialized path.
        # MULTIYOLOV5_EXACT_MASK=1 opts out of the packed-key fused mask
        # kernel.  Its running argmax quantizes the comparison keys: with
        # the default-on offset key (MULTIYOLOV5_MASK_OFFSET_KEY=1) the tie
        # band is ~2.4e-4 *absolute* on the interpolated logits (low key
        # bits carry the class id; logits ride shifted to [+1, +128] so the
        # ulp is fixed), and all-classes-below -63 clamp to a tie; with
        # MULTIYOLOV5_MASK_OFFSET_KEY=0 (the intermediate opt-out) the band
        # is relative ~2^-18.  Ties resolve to the smaller class id, same
        # as jnp.argmax.  The eval/mIoU path (evaluation.seg_validation)
        # never uses the kernel and is always exact; EXACT_MASK=1 makes
        # serving bit-exact too at ~6% mask-path cost.
        import os as _os
        fuse_mask = not augment and not _os.environ.get("MULTIYOLOV5_EXACT_MASK")

        # decode-after-top-k (ops/nms.nms_from_raw) was A/B'd and REJECTED
        # on TPU: the row gathers for the top-k candidates cost more than
        # densely decoding all ~42k anchors (1005 vs 1040 FPS e2e, 200-iter
        # device-true) — TPU gathers are slow, dense elementwise is nearly
        # free.  Serving keeps the decoded path.
        from_raw = False
        # planar NMS frontend: candidates stay (no, na, B, H*W) lane-major
        # through conf/threshold/top-k (ops/nms.nms_planar) — the (B, N, 15)
        # T(1,128) tensor and its pad/copy chain never materialize.
        # Single-label serving only; MULTIYOLOV5_NMS_PLANAR=0 opts out.
        _pl_env = _os.environ.get("MULTIYOLOV5_NMS_PLANAR")
        planar_nms = (not augment and not from_raw and not multi_label
                      and (_pl_env == "1"        # force-on (CPU parity tests)
                           or (_pl_env != "0"
                               and jax.default_backend() == "tpu")))
        dec_mode = "planar" if planar_nms else True

        # batch>1 serving regime (round-5 bs8 fix): at batch>1, XLA's layout
        # assignment swings the whole graph to batch-in-sublanes layouts
        # ({3,0,2,1}) and every Pallas custom-call boundary pays a relayout
        # copy — ~171us/frame at bs8 vs ~17 at bs1 (traced).  Instead:
        #   * the multi-output u8 stem kernel (host-CHUNKED input) emits
        #     per-image arrays directly — no batch slicing of the stem
        #     output (XLA materialized the slices as a full copy);
        #   * the trunk runs per image in a STATIC unrolled loop (the
        #     batch-1 custom-kernel layout regime; lax.scan instead makes
        #     XLA give the carried stem output an exotic layout — A/B 1627
        #     vs 1704 FPS);
        #   * detect decode + planar NMS run per image off the per-image
        #     feature dicts (their trunk inputs then never concat);
        #   * the seg head runs BATCHED on the stacked (lazy) neck feats —
        #     XLA's batch conv emitters win there — and one batched mask
        #     kernel finishes.  bs8: 1585 -> 1793 FPS (bs1 1727).
        # MULTIYOLOV5_BATCH_SCAN=0 opts out (A/B knob).
        _heads = [i for i in (spec.seg_index, spec.detect_index)
                  if i is not None and i >= 0]
        head_stop = min(_heads) if _heads else None
        batch_scan = (u8_stem and planar_nms and fuse_mask
                      and head_stop is not None
                      and _os.environ.get("MULTIYOLOV5_BATCH_SCAN") != "0")
        det_per_image = (supports_det_per_image(spec) and
                         _os.environ.get("MULTIYOLOV5_DET_PER_IMAGE") != "0")

        def run(p, img_u8):
            z = None
            scan_done = False
            if batch_scan and img_u8.ndim == 5:
                from .ops.pallas.stem_kernel import stem_apply_pallas_u8_multi
                y1s = stem_apply_pallas_u8_multi(img_u8, *stem_fw,
                                                 cols=in_hw[1] // 4,
                                                 out_dtype=cdt)
                if img_u8.shape[1] > 1:
                    boxes, valid, seg = run_batched_pipeline(
                        spec, p, state, y1s, decode_mode=dec_mode, conf=conf,
                        iou=iou, agnostic=agnostic, cmask=cmask,
                        max_det=max_det, det_per_image=det_per_image)
                    scan_done = True
                else:
                    # batch 1 rides the chunked-input stem too (the input
                    # DMA pipelines under the row-block compute: 79.3 ->
                    # 73.5 us standalone) and then the normal bs1 path
                    det, seg, _ = forward(spec, p, state, y1s[0],
                                          train=False, fused=True,
                                          decode=dec_mode, start_layer=2,
                                          seg_up=not fuse_mask)
            elif u8_stem:
                # img_u8 is the host-packed uint8 x96 (pack_stem96_host):
                # the Pallas kernel converts + normalizes on-core (scale
                # folded into conv1) and runs both folded convs in VMEM —
                # the raw frame bytes are the only device-resident input,
                # no normalize/pack pass at all (that prep cost ~100us/frame
                # at bs8).  MULTIYOLOV5_XLA_STEM=1 opts back out.
                from .ops.pallas.stem_kernel import stem_apply_pallas_u8
                y1 = stem_apply_pallas_u8(img_u8, *stem_fw,
                                          cols=in_hw[1] // 4, out_dtype=cdt)
                det, seg, _ = forward(spec, p, state, y1, train=False,
                                      fused=True, decode=dec_mode,
                                      start_layer=2, seg_up=not fuse_mask)
                x = None
            elif fold:
                # 4x4-s2d grid through the folded stem in XLA (wide stems
                # 4*c2 > 256, i.e. yolov5x, or non-TPU backends)
                x = img_u8.astype(cdt) / 255.0
                y1 = stem_lib.stem_apply(x, *stem_fw)
                det, seg, _ = forward(spec, p, state, y1, train=False,
                                      fused=True, decode=dec_mode,
                                      start_layer=2, seg_up=not fuse_mask)
            elif use_s2d:
                x = img_u8.astype(cdt) / 255.0
                det, seg, _ = forward(spec, p, state, x, train=False,
                                      fused=True, decode=dec_mode,
                                      pre_s2d=True, seg_up=not fuse_mask)
            elif augment:  # TTA (reference models/yolo.py:273-291)
                x = img_u8.astype(cdt) / 255.0
                zs = []
                for si, fi in zip((1.0, 0.83, 0.67), (None, 3, None)):
                    xi = jnp.flip(x, 2) if fi == 3 else x
                    xi = scale_img_pad(xi, si, gs=max(spec.strides))
                    det, _, _ = forward(spec, p, state, xi, train=False,
                                        fused=True, decode=True)
                    zi = det[0]
                    zi = zi.at[..., :4].divide(si)
                    if fi == 3:
                        zi = zi.at[..., 0].set(x.shape[2] - zi[..., 0])
                    zs.append(zi)
                z = jnp.concatenate(zs, 1)
                _, seg, _ = forward(spec, p, state, x, train=False,
                                    fused=True, decode=False)
            else:
                x = img_u8.astype(cdt) / 255.0
                det, seg, _ = forward(spec, p, state, x, train=False,
                                      fused=True, decode=dec_mode,
                                      seg_up=not fuse_mask)
            # serving candidate cap 1024: at detect conf=0.25 real scenes
            # yield far fewer candidates, and <=1024 rides the on-core
            # Pallas fixpoint kernel (ops/pallas/nms_fixpoint_kernel.py);
            # eval keeps the reference's 30000 cap (evaluation.py:115)
            if scan_done:
                pass  # boxes/valid/seg already produced by the batch branch
            elif from_raw:
                anchors = state[f"model.{spec.detect_index}.anchors"]
                boxes, valid = nms_from_raw(
                    det, anchors, tuple(int(s) for s in spec.strides),
                    conf_thres=conf, iou_thres=iou, agnostic=agnostic,
                    class_mask=cmask, max_nms=1024, max_det=max_det)
            elif planar_nms:
                boxes, valid = nms_planar(det[0], conf_thres=conf,
                                          iou_thres=iou, agnostic=agnostic,
                                          class_mask=cmask,
                                          max_nms=1024, max_det=max_det)
            else:
                z = det[0] if not augment else z
                boxes, valid = nms_batched(z, conf_thres=conf, iou_thres=iou,
                                           agnostic=agnostic, class_mask=cmask,
                                           multi_label=multi_label,
                                           max_nms=1024, max_det=max_det)
            # letterbox unmap + clip + round (reference detect.py:169)
            xy = boxes[..., :4]
            xy = (xy - jnp.asarray([pad[0], pad[1], pad[0], pad[1]])) / gain
            xy = jnp.clip(xy, 0.0, jnp.asarray(
                [orig_hw[1], orig_hw[0], orig_hw[1], orig_hw[0]], jnp.float32))
            boxes = jnp.concatenate([jnp.round(xy), boxes[..., 4:]], -1)
            cls_map = None
            if seg is not None:
                if fuse_mask:
                    # seg = planar (B,C,h,w) 1/8-res logits; the kernel
                    # composes the head's x8 upsample with the frame resize
                    # (float64 matrices) and argmaxes on-core from the
                    # per-class planes.  (The earlier XLA-level fusion
                    # attempt, ops/resize.resize2x_argmax, LOST in-pipeline —
                    # 1.66 vs 1.56 ms/frame — this kernel wins.)
                    via = (seg.shape[2] * 8, seg.shape[3] * 8)
                    cls_map = upsample_argmax_planar(seg, orig_hw, via_hw=via,
                                                     align_corners=True)
                else:
                    segf = resize_bilinear(seg, orig_hw, align_corners=True)
                    cls_map = jnp.argmax(segf, -1).astype(jnp.uint8)
            return boxes, valid, cls_map

        # Optional (MULTIYOLOV5_LAYOUT_OPT=1): compile with AUTO parameter
        # layouts and keep the weights stored in the conv-preferred layouts
        # XLA picks — default row-major params get relaid per call (~0.12 ms
        # of pure copies at 1024x512).  Off by default: the axon tunnel
        # backend ignores custom device_put layouts, so the layout-pinned
        # executable re-copies every parameter at entry and loses ~0.2 ms
        # (A/B traced); on direct-attached TPUs this path removes the
        # per-call weight relayouts.
        try:
            import os as _os
            if not _os.environ.get("MULTIYOLOV5_LAYOUT_OPT"):
                raise RuntimeError("layout opt disabled")
            from jax.experimental.layout import Format, Layout

            auto = jax.tree.map(lambda _: Format(Layout.AUTO), params)
            jf = jax.jit(run, in_shardings=(auto, Format()))
            img_sds = jax.ShapeDtypeStruct(
                self._input_shape(in_hw, fold), jnp.uint8)
            p_sds = jax.tree.map(
                lambda t: jax.ShapeDtypeStruct(t.shape, t.dtype), params)
            fmts = jf.lower(p_sds, img_sds).compile().input_formats[0]
            p_opt = jax.device_put(params, fmts[0])
            # a jit with AUTO layouts only accepts ShapeDtypeStructs; the
            # executable callable is a second jit pinned to the resolved
            # layouts (it also serves other batch sizes under the same
            # constraints)
            jf2 = jax.jit(run, in_shardings=(fmts[0], fmts[1]))

            def fn(img_u8, _jf=jf2, _p=p_opt):
                return _jf(_p, img_u8)
        except Exception:  # CPU backend / older API: closure jit
            base = jax.jit(lambda img_u8: run(params, img_u8))

            def fn(img_u8, _f=base):
                return _f(img_u8)
        self._cache[key] = fn
        return fn

    def _input_shape(self, in_hw, fold):
        """Device input shape for a letterboxed (H, W) frame batch of 1
        (s2d'd on host once/twice when the stem allows it).

        Layout note (advisor round 1): the LAYOUT_OPT path resolves XLA
        parameter layouts against this batch-1 shape; other batch sizes run
        through the same pinned-layout jit and recompile under the same
        layout constraints.  Channel count follows the spec's input channels
        (16*ch after two space-to-depths, 4*ch after one)."""
        h, w = in_hw
        ch = self.spec.ch_in
        if fold and self._use_u8_stem(in_hw):
            from .ops.pallas.stem_kernel import stem_pack_geometry
            cp, hp = stem_pack_geometry(h // 4, w // 4)
            return (1, hp, cp, 32 * ch)
        if fold:
            return (1, h // 4, w // 4, 16 * ch)
        if self.spec.rows and self.spec.rows[0].module == "Focus":
            return (1, h // 2, w // 2, 4 * ch)
        return (1, h, w, ch)

    def _scan_rpb(self, in_hw, augment, multi_label, batch) -> int:
        """Row-block size for the chunked-input stem packing, or 0 when
        it doesn't apply (then the host packs the plain batched layout).
        Batch>1 uses it for the per-image serving regime; batch 1 for the
        input-DMA-pipelined stem.  Must mirror _compiled's batch_scan
        gate — the jitted run() dispatches on the input rank."""
        import os as _os
        has_head = any(i is not None and i >= 0
                       for i in (self.spec.seg_index, self.spec.detect_index))
        if (augment or multi_label or not has_head
                or not self._use_u8_stem(in_hw)
                or _os.environ.get("MULTIYOLOV5_EXACT_MASK")
                or _os.environ.get("MULTIYOLOV5_NMS_PLANAR") == "0"
                or _os.environ.get("MULTIYOLOV5_BATCH_SCAN") == "0"):
            return 0
        h = in_hw[0] // 4
        # wide stems (c_mid > 128, m+) run best at 16-row blocks (same
        # rule as the batched kernel; m bs1 A/B: 877 -> 884 FPS)
        c_mid = self._stem_weights()[0].shape[-1]
        for cand in ((16, 8) if c_mid > 128 else (32, 16, 8)):
            if h % cand == 0:
                return cand
        return 0

    def _use_u8_stem(self, in_hw) -> bool:
        if not (self._stem_u8_ok and in_hw[0] % 4 == 0 and in_hw[1] % 4 == 0):
            return False
        return self._stem_weights()[0].shape[-1] <= 256

    def __call__(self, img: np.ndarray, orig_hw: Tuple[int, int],
                 conf: float = 0.25, iou: float = 0.45,
                 classes: Optional[Sequence[int]] = None,
                 agnostic: bool = False, multi_label: bool = False,
                 max_det: int = 300, augment: bool = False):
        """img: (H, W, 3) or (B, H, W, 3) RGB uint8 (letterboxed).

        Returns (list of (n,6) float arrays in original-frame xyxy coords,
        list of (H0, W0) uint8 class maps or None).
        """
        if img.ndim == 3:
            img = img[None]
        if self.ensemble:
            return self._call_ensemble(img, orig_hw, conf, iou, classes,
                                       agnostic, multi_label, max_det, augment)
        fn = self._compiled(tuple(img.shape[1:3]), tuple(orig_hw), conf, iou,
                            tuple(classes) if classes is not None else None,
                            agnostic, multi_label, max_det, augment)
        if (not augment and self.spec.rows
                and self.spec.rows[0].module == "Focus"):
            if (self.fold_stem and img.shape[1] % 4 == 0
                    and img.shape[2] % 4 == 0):
                hw = tuple(img.shape[1:3])
                if self._use_u8_stem(hw):
                    # one fused native pass per frame (s2d x2 + pad + row-
                    # pair pack); numpy chain fallback inside
                    from . import native
                    from .ops.pallas.stem_kernel import (chunk_stem96_host,
                                                         stem_pack_geometry)
                    cp, _ = stem_pack_geometry(hw[0] // 4, hw[1] // 4)
                    img = np.stack([native.frame_to_stem96(
                        np.ascontiguousarray(im), cp) for im in img])
                    rpb = self._scan_rpb(hw, augment, multi_label,
                                         img.shape[0])
                    if rpb:
                        # batch>1 per-image regime: row-block-chunked input
                        # for the multi-output stem kernel (run() dispatches
                        # on the 5D rank)
                        img = chunk_stem96_host(img, rpb)
                else:
                    img = space_to_depth_host(space_to_depth_host(img))
            else:
                img = space_to_depth_host(img)
        boxes, valid, cls_map = fn(jnp.asarray(img))
        boxes = np.asarray(boxes)
        valid = np.asarray(valid)
        dets = [boxes[i][valid[i]] for i in range(boxes.shape[0])]
        masks = (list(np.asarray(cls_map)) if cls_map is not None
                 else [None] * len(dets))
        return dets, masks

    def _decoded(self, img_u8: jnp.ndarray, augment: bool = False,
                 want_seg: bool = False):
        """Decoded (B, N, no) predictions (+ optional seg logits) — the
        ensemble building block.  Weights are closed over like the fused
        path (re-flattening the param pytree per call costs more host time
        than the device compute)."""
        key = ("decode", img_u8.shape, augment, want_seg)
        if key not in self._cache:
            spec, cdt = self.spec, self.compute_dtype
            params, state = self.params, self.state

            def f(x):
                xn = x.astype(cdt) / 255.0
                if augment:  # TTA per member (reference Ensemble.forward
                    zs = []  # passes augment through, experimental.py:26)
                    for si, fi in zip((1.0, 0.83, 0.67), (None, 3, None)):
                        xi = jnp.flip(xn, 2) if fi == 3 else xn
                        xi = scale_img_pad(xi, si, gs=max(spec.strides))
                        det, _, _ = forward(spec, params, state, xi,
                                            train=False, fused=True,
                                            decode=True)
                        zi = det[0]
                        zi = zi.at[..., :4].divide(si)
                        if fi == 3:
                            zi = zi.at[..., 0].set(xn.shape[2] - zi[..., 0])
                        zs.append(zi)
                    z = jnp.concatenate(zs, 1)
                    if not want_seg:
                        return z
                    _, seg, _ = forward(spec, params, state, xn, train=False,
                                        fused=True, decode=False)
                    return z, seg
                det, seg, _ = forward(spec, params, state, xn, train=False,
                                      fused=True, decode=True)
                return (det[0], seg) if want_seg else det[0]
            self._cache[key] = jax.jit(f)
        return self._cache[key](img_u8)

    def _call_ensemble(self, img, orig_hw, conf, iou, classes, agnostic,
                       multi_label, max_det, augment):
        """Multi-model NMS ensemble (reference Ensemble.forward: cat + NMS)."""
        from .ops.nms import nms_batched
        from .ops.resize import resize_bilinear
        from .utils.boxes import scale_coords

        x = jnp.asarray(img)
        # seg comes from the primary model (reference forward_once returns
        # the last member's seg; ours is the first/primary — documented)
        z0, seg = self._decoded(x, augment=augment, want_seg=True)
        zs = [z0] + [e._decoded(x, augment=augment) for e in self.ensemble]
        z = jnp.concatenate(zs, axis=1)
        cmask = None
        if classes is not None:
            cm = np.zeros((self.spec.nc,), np.float32)
            cm[list(classes)] = 1.0
            cmask = jnp.asarray(cm)
        boxes, valid = nms_batched(z, conf_thres=conf, iou_thres=iou,
                                   agnostic=agnostic, class_mask=cmask,
                                   multi_label=multi_label, max_det=max_det)
        boxes = np.asarray(boxes)
        valid = np.asarray(valid)
        dets = []
        for i in range(boxes.shape[0]):
            d = boxes[i][valid[i]]
            if len(d):
                d = np.asarray(scale_coords(img.shape[1:3], d, orig_hw))
                d[:, :4] = np.round(d[:, :4])
            dets.append(d)
        masks = [None] * len(dets)
        if seg is not None:
            segf = resize_bilinear(seg, orig_hw, align_corners=True)
            masks = list(np.asarray(
                jnp.argmax(segf, -1).astype(jnp.uint8)))
        return dets, masks

    def warmup(self, in_hw, orig_hw, **kw):
        self(np.zeros((1, *in_hw, 3), np.uint8), orig_hw, **kw)
