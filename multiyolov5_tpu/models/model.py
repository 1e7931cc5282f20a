"""Model assembly: init + functional forward over a compiled ModelSpec.

The forward is a static Python walk over the spec rows (reference
Model.forward_once, models/yolo.py:293-316, was a runtime interpreter); under
``jax.jit`` the walk disappears and XLA sees one flat graph it can fuse and
tile onto the MXU.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.nn import Ctx, Initializer, LazyCat, Params, concrete, fuse_conv_bn
from ..ops.resize import resize_bilinear, upsample_nearest
from . import blocks as B
from . import heads as H
from .config import ModelSpec, load_spec


def init_model(spec: ModelSpec, seed: int = 0) -> Tuple[Params, Params]:
    """Build (params, state) flat dicts with torch-style initialization."""
    ini = Initializer(seed)
    for row in spec.rows:
        name = f"model.{row.i}"
        m, a = row.module, row.args
        if m == "Conv":
            g = a[5] if len(a) > 5 else 1
            for rep in range(row.n):
                B.init_conv(ini, name if row.n == 1 else f"{name}.{rep}",
                            a[0], a[1], a[2] if len(a) > 2 else 1, g=g)
        elif m == "Bottleneck":
            for rep in range(row.n):
                B.init_bottleneck(ini, name if row.n == 1 else f"{name}.{rep}",
                                  a[0], a[1])
        elif m == "DWConv":
            B.init_conv(ini, name, a[0], a[1], a[2] if len(a) > 2 else 1,
                        g=B.dw_groups(a[0], a[1]))
        elif m == "Focus":
            B.init_focus(ini, name, a[0], a[1], a[2] if len(a) > 2 else 1)
        elif m == "BottleneckCSP":
            B.init_bottleneck_csp(ini, name, a[0], a[1], n=a[2])
        elif m == "C3":
            B.init_c3(ini, name, a[0], a[1], n=a[2])
        elif m == "C3TR":
            B.init_c3tr(ini, name, a[0], a[1], n=a[2])
        elif m == "SPP":
            B.init_spp(ini, name, a[0], a[1], tuple(a[2]) if len(a) > 2 else (5, 9, 13))
        elif m == "ASPP":
            B.init_aspp(ini, name, a[0], a[1])
        elif m == "GhostConv":
            B.init_ghost_conv(ini, name, a[0], a[1], a[2] if len(a) > 2 else 1)
        elif m == "GhostBottleneck":
            B.init_ghost_bottleneck(ini, name, a[0], a[1],
                                    a[2] if len(a) > 2 else 3,
                                    a[3] if len(a) > 3 else 1)
        elif m == "CrossConv":
            B.init_cross_conv(ini, name, a[0], a[1], a[2] if len(a) > 2 else 3)
        elif m == "MixConv2d":
            B.init_mixconv2d(ini, name, a[0], a[1],
                             tuple(a[2]) if len(a) > 2 else (1, 3),
                             a[3] if len(a) > 3 else 1)
        elif m == "Sum":
            B.init_sum(ini, name, len(row.f), a[1] if len(a) > 1 else False)
        elif m == "Classify":
            B.init_classify(ini, name, a[0], a[1], a[2] if len(a) > 2 else 1)
        elif m == "nn.BatchNorm2d":
            ini.bn(name, a[0])
        elif m in ("Concat", "nn.Upsample", "Contract", "Expand",
                   "nn.MaxPool2d", "nn.ZeroPad2d"):
            pass
        elif m == "SegMaskPSP":
            H.init_seg_psp(ini, name, a[0], a[2], a[4])
        elif m == "SegMaskBase":
            H.init_seg_base(ini, name, a[0], a[1], a[2], a[4])
        elif m == "SegMaskBiSe":
            H.init_seg_bise(ini, name, a[0], a[4])
        elif m == "SegMaskLab":
            H.init_seg_lab(ini, name, a[0], a[1], a[2], a[4])
        elif m == "Detect":
            H.init_detect(ini, name, a[0], a[1], a[2], spec.strides)
        else:
            raise NotImplementedError(f"module {m!r} (layer {row.i})")
    params = ini.params
    if spec.detect_index >= 0:
        params = H.initialize_detect_biases(
            params, f"model.{spec.detect_index}", spec.nc, spec.na, spec.strides)
    return params, ini.state


def _apply_row(ctx: Ctx, row, x):
    name = f"model.{row.i}"
    m, a = row.module, row.args
    if m not in ("C3", "Concat", "SegMaskPSP", "SegMaskBase", "SegMaskBiSe",
                 "SegMaskLab"):
        # C3 and the seg heads reach their LazyCat inputs through 1x1 entry
        # convs (models/yolov5s_city_seg.yaml:49 routes the seg head from
        # the Concat rows 16/19/22); every other module sees the
        # materialized concat
        x = concrete(x)
    if m == "Conv":
        y = x
        for rep in range(row.n):  # n>1 repeats the module itself
            y = B.conv(ctx, name if row.n == 1 else f"{name}.{rep}", y,
                       k=a[2] if len(a) > 2 else 1,
                       s=a[3] if len(a) > 3 else 1,
                       g=a[5] if len(a) > 5 else 1)
        return y
    if m == "DWConv":
        return B.conv(ctx, name, x, k=a[2] if len(a) > 2 else 1,
                      s=a[3] if len(a) > 3 else 1, g=B.dw_groups(a[0], a[1]))
    if m == "Focus":
        return B.focus(ctx, name, x, k=a[2] if len(a) > 2 else 1)
    if m == "Bottleneck":
        y = x
        for rep in range(row.n):
            y = B.bottleneck(ctx, name if row.n == 1 else f"{name}.{rep}", y,
                             a[0], a[1], shortcut=a[2] if len(a) > 2 else True)
        return y
    if m == "BottleneckCSP":
        return B.bottleneck_csp(ctx, name, x, a[0], a[1], n=a[2],
                                shortcut=a[3] if len(a) > 3 else True)
    if m == "C3":
        return B.c3(ctx, name, x, a[0], a[1], n=a[2],
                    shortcut=a[3] if len(a) > 3 else True)
    if m == "C3TR":
        return B.c3tr(ctx, name, x, a[0], a[1], n=a[2])
    if m == "SPP":
        return B.spp(ctx, name, x, tuple(a[2]) if len(a) > 2 else (5, 9, 13))
    if m == "ASPP":
        return B.aspp(ctx, name, x)
    if m == "GhostConv":
        return B.ghost_conv(ctx, name, x, k=a[2] if len(a) > 2 else 1,
                            s=a[3] if len(a) > 3 else 1, c2=a[1])
    if m == "GhostBottleneck":
        return B.ghost_bottleneck(ctx, name, x, a[0], a[1],
                                  k=a[2] if len(a) > 2 else 3,
                                  s=a[3] if len(a) > 3 else 1)
    if m == "CrossConv":
        return B.cross_conv(ctx, name, x, a[0], a[1],
                            k=a[2] if len(a) > 2 else 3,
                            s=a[3] if len(a) > 3 else 1,
                            g=a[4] if len(a) > 4 else 1,
                            e=a[5] if len(a) > 5 else 1.0,
                            shortcut=a[6] if len(a) > 6 else False)
    if m == "MixConv2d":
        return B.mixconv2d(ctx, name, x, k=tuple(a[2]) if len(a) > 2 else (1, 3),
                           s=a[3] if len(a) > 3 else 1)
    if m == "Sum":
        return B.sum_layer(ctx, name, x, weight=a[1] if len(a) > 1 else False)
    if m == "Classify":
        return B.classify(ctx, name, x, k=a[2] if len(a) > 2 else 1)
    if m == "nn.BatchNorm2d":
        return ctx.batch_norm(name, x)
    if m == "Concat":
        if any(isinstance(t, LazyCat) for t in x):
            # virtual concat: parts stay at native res; the consumer's 1x1
            # convs split per part (upsample-after — see ops/nn.LazyCat)
            lazies = [t for t in x if isinstance(t, LazyCat)]
            out_hw = lazies[0].out_hw
            # merging takes mode/align_corners from the first LazyCat; a
            # config mixing resize modes in one concat must not be merged
            # silently with the wrong mode
            if any((t.mode, t.align_corners)
                   != (lazies[0].mode, lazies[0].align_corners)
                   for t in lazies[1:]):
                raise ValueError(
                    "Concat over LazyCat parts with mixed resize modes: "
                    + str([(t.mode, t.align_corners) for t in lazies]))
            parts = []
            for t in x:
                parts.extend(t.parts if isinstance(t, LazyCat) else [t])
            return LazyCat(parts, out_hw, lazies[0].mode,
                           lazies[0].align_corners)
        return jnp.concatenate(x, axis=-1)
    if m == "nn.Upsample":
        scale, mode = a[1], a[2]
        out_hw = (x.shape[1] * int(scale), x.shape[2] * int(scale))
        if getattr(ctx, "lazy_cat", False):
            return LazyCat([x], out_hw, mode)
        if mode == "nearest":
            return upsample_nearest(x, int(scale))
        return resize_bilinear(x, out_hw)
    if m == "nn.MaxPool2d":
        import jax.lax as lax
        k = a[0]
        s = a[1] if len(a) > 1 and a[1] else k
        p = a[2] if len(a) > 2 else 0
        return lax.reduce_window(
            x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
            lax.max, (1, k, k, 1), (1, s, s, 1),
            ((0, 0), (p, p), (p, p), (0, 0)))
    if m == "nn.ZeroPad2d":
        # torch padding tuple (left, right, top, bottom)
        pl_, pr_, pt_, pb_ = (a[0] if isinstance(a[0], (list, tuple))
                              else (a[0],) * 4)
        return jnp.pad(x, ((0, 0), (pt_, pb_), (pl_, pr_), (0, 0)))
    if m == "Contract":
        return B.contract(x, a[0])
    if m == "Expand":
        return B.expand(x, a[0])
    if m == "SegMaskPSP":
        return H.seg_psp(ctx, name, x)
    if m == "SegMaskBase":
        return H.seg_base(ctx, name, x, n=a[1], c_hid=a[2], shortcut=a[3], ch=a[4])
    if m == "SegMaskBiSe":
        return H.seg_bise(ctx, name, x)
    if m == "SegMaskLab":
        return H.seg_lab(ctx, name, x, c_hid=a[2])
    raise NotImplementedError(m)


def stack_feats(per_img: list) -> Dict[int, Any]:
    """Batch per-image ``forward(stop_before=...)`` feature dicts.

    Plain tensors are concatenated on the batch dim; LazyCat entries are
    re-built from their batch-concatenated PARTS at native resolution, so
    the virtual neck concat (and its upsamples) stays lazy across the
    engine's per-image/batched-heads split and the heads' 1x1s keep the
    linear-commute split (ops/nn.LazyCat)."""
    out: Dict[int, Any] = {}
    for j, v0 in per_img[0].items():
        if isinstance(v0, LazyCat):
            parts = [jnp.concatenate([f[j].parts[k] for f in per_img], 0)
                     for k in range(len(v0.parts))]
            out[j] = LazyCat(parts, v0.out_hw, v0.mode, v0.align_corners)
        else:
            out[j] = jnp.concatenate([f[j] for f in per_img], 0)
    return out


def forward(spec: ModelSpec, params: Params, state: Params, x: jnp.ndarray,
            train: bool = False, fused: bool = False,
            rng: Optional[jax.Array] = None, decode: Optional[bool] = None,
            compute_dtype=None, pre_s2d: bool = False, seg_up: bool = True,
            start_layer: int = 0, pre_s2d2: bool = False,
            sever: Optional[bool] = None, det_hwna: bool = False,
            stop_before: Optional[int] = None,
            feats_in: Optional[Dict[int, Any]] = None):
    """Run the network.

    Args:
      x: NHWC image batch in [0, 1] — or, with ``start_layer=k``, the output
        of row k-1 (the engine's folded stem computes rows 0-1 externally;
        callers must ensure no skipped row is in the save list).
    Returns:
      ``(det, seg, new_state)`` where
        * train: ``det`` = list of raw per-level maps (B,na,ny,nx,no)
          ((B,ny,nx,na,no) with ``det_hwna=True`` — the train step's
          transpose-free layout, losses.DetectionLoss(hwna=True)),
          ``seg`` = logits (or [main, aux16, aux32] for BiSe).
        * eval:  ``det`` = (decoded (B,N,no), raw list), ``seg`` = logits.
      Seg logits are NHWC at 8x input resolution, except with
      ``seg_up=False``: PLANAR (B, C, h/8, w/8) head-res logits for the
      fused upsample+argmax kernel.
      ``new_state`` contains updated BN running stats (train mode only).
    """
    if decode is None:
        decode = not train
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    ctx = Ctx(p=params, s=state, train=train, fused=fused, rng=rng,
              pre_s2d=pre_s2d, seg_up=seg_up)
    cache: Dict[int, Any] = {}
    if feats_in:
        # resume mode (engine hybrid batch-scan): cache pre-seeded with the
        # trunk feature maps; the walk starts at start_layer (the first
        # head row), which reads ONLY explicit cache indices
        cache.update(feats_in)
    y = x
    det_raw = None
    seg_out = None
    if pre_s2d2:
        # x is the host-packed 4x4 s2d grid (B, H/4, W/4, 16*ch): rows 0-1
        # run as phase-packed quarter-grid convs with live BN — same math,
        # same params, ~6x faster in training (ops/stem.stem_train_apply).
        # can_fold_stem(spec) guarantees rows 0/1 are the standard stem and
        # are not in the save list.
        assert start_layer == 0
        from ..ops import stem as _stem
        assert _stem.can_fold_stem(spec), "pre_s2d2 needs a foldable stem"
        y = _stem.stem_train_apply(ctx, x)
        start_layer = 2
    # region-scoped layout severing (inference only): from the neck on,
    # route 1x1 convs via dot_general and eligible 3x3/s1 convs through the
    # Pallas conv kernel.  A/B'd on the chip (PROGRESS round 2, pspv5s
    # 1024x512): baseline 1301 FPS; dot1x1-from-neck 1372; BOTH from neck
    # 1449; Pallas-3x3 alone 1172 (custom calls pay relayouts at every
    # boundary unless the 1x1s between them are dot-severed); severing the
    # backbone too 1255 (batch-1 backbone convs want XLA's
    # spatial-in-sublanes conv emitters).  Env knobs re-scope for
    # experiments; correctness is backend-independent (exact same math).
    # batch-1 only: at serving batch sizes XLA's batched conv emitters keep
    # clean layouts and the severing costs more than it saves (bs8 A/B:
    # 1310 unsevered vs 1269 severed; bs1: 1301 -> 1449).  ``sever=False``
    # forces the pure-XLA lowering — required under spatial (GSPMD)
    # sharding, where custom calls cannot be partitioned.
    # sever=False explicitly disables ALL layout-severing custom paths,
    # including the seg heads' scoped dot1x1 (export / GSPMD require the
    # plain lowering); None/True only control the neck region below.
    ctx.sever_heads = sever is not False
    if sever is None:
        env = os.environ.get("MULTIYOLOV5_SEVER")
        if env is not None:
            sever = (fused and not train and bool(int(env))
                     and jax.default_backend() == "tpu")
        else:
            sever = (fused and not train and x.shape[0] == 1
                     and jax.default_backend() == "tpu")
    # lazy upsample/concat restructuring (pure-XLA linear commute, batch-
    # independent — unlike the custom-call severing it also runs at serving
    # batch sizes); off for export/GSPMD (sever=False) and via env for A/Bs
    ctx.lazy_cat = (fused and not train and ctx.sever_heads
                    and not os.environ.get("MULTIYOLOV5_NO_LAZYCAT"))
    neck_start = len(spec.yaml.get("backbone", [])) if spec.yaml else 9999
    dot_from = int(os.environ.get("MULTIYOLOV5_DOT1X1_FROM", neck_start))
    p3_from = int(os.environ.get("MULTIYOLOV5_PALLAS3X3_FROM", neck_start))
    sever_to = int(os.environ.get("MULTIYOLOV5_SEVER_TO", 1 << 30))
    for row in spec.rows[start_layer:]:
        if stop_before is not None and row.i >= stop_before:
            # feature mode (engine hybrid batch-scan): return the cached
            # trunk maps the remaining (head) rows will read, plus the
            # running y.  LazyCat entries stay LAZY — the caller's python
            # loop stacks their parts at native resolution (stack_feats),
            # so the wide neck concats never materialize per image
            need = sorted({j for r in spec.rows[row.i:]
                           for j in (r.f if isinstance(r.f, (list, tuple))
                                     else [r.f]) if j != -1 and j < row.i})
            feats = {j: cache[j] for j in need if j in cache}
            return feats, concrete(y), ctx.new_state
        ctx.dot1x1 = sever and dot_from <= row.i < sever_to
        ctx.pallas3x3 = sever and p3_from <= row.i < sever_to
        # fused packed-C3 kernel region: the narrow backbone C3s (1/4 and
        # 1/8 res) — batch-independent, so gated on fused/eval/sever_heads
        # only, not on the batch-1 ``sever`` flag (blocks._c3_packed_fast)
        ctx.c3_packed = (fused and not train and ctx.sever_heads
                         and row.i < neck_start
                         and not os.environ.get("MULTIYOLOV5_NO_C3PACKED"))
        # at serving batch sizes, chain the backbone downsample convs
        # through the Pallas s2 kernel so the packed-C3 custom call's
        # output feeds another custom call (default layout) instead of an
        # XLA conv wanting a {3,0,2,1} relayout copy (26us/frame at bs8)
        # routing ALL backbone downsamples through the s2 kernel A/B'd
        # 1483 -> 1433 FPS at bs8; env "1"/"all" = every backbone s2 conv,
        # "3,5" = those rows only (for scoping A/Bs to the conv that
        # consumes the packed C3's custom-call output)
        s2_env = os.environ.get("MULTIYOLOV5_PALLAS_S2", "")
        ctx.pallas_s2 = (fused and not train and ctx.sever_heads
                         and x.shape[0] > 1 and row.i < neck_start
                         and (s2_env in ("1", "all")
                              or str(row.i) in s2_env.split(",")))
        if row.module == "Detect":
            xs = [concrete(cache[j] if j != -1 else y) for j in row.f]
            det_xs = xs
            det_raw = H.detect_raw(ctx, f"model.{row.i}", xs, spec.nc,
                                   spec.na, hwna=det_hwna)
            y = det_raw
        else:
            if isinstance(row.f, int):
                inp = y if row.f == -1 else cache[row.f]
            else:
                inp = [y if j == -1 else cache[j] for j in row.f]
            y = _apply_row(ctx, row, inp)
            if row.i == spec.seg_index:
                seg_out = y
        if row.i in spec.save:
            cache[row.i] = y
    det = det_raw
    if decode and det_raw is not None:
        # planar decode: when the caller drops det_raw (the serving engine
        # uses only the decoded tensor), detect_raw's layout-poisoning
        # reshape+transpose is dead code and the neck keeps clean layouts.
        # decode="planar" keeps even the candidate list planar (a list of
        # per-scale (no, na, B, H*W) tensors for ops/nms.nms_planar) — the
        # (B, N, no) tensor and its T(1,128) relayout chain never exist.
        decoded = H.detect_decode_planar(ctx, f"model.{spec.detect_index}",
                                         det_xs, spec.strides, spec.nc,
                                         spec.na,
                                         planar_out=(decode == "planar"))
        det = (decoded, det_raw)
    return det, seg_out, ctx.new_state


class Model:
    """Convenience OO wrapper bundling spec + params + state.

    Mirrors the reference ``Model`` public surface (models/yolo.py:233-370):
    construction from a cfg (dict / yaml path / zoo name), ``__call__`` forward,
    ``fuse()`` for BN folding.
    """

    def __init__(self, cfg="yolov5s_city_seg", ch: int = 3,
                 nc: Optional[int] = None, anchors=None, seed: int = 0):
        self.spec = load_spec(cfg, ch, nc, anchors)
        params, state = init_model(self.spec, seed)  # host numpy
        # one batched transfer (per-param eager jnp ops through the axon
        # tunnel cost ~seconds each; see ops/nn.Initializer)
        self.params = jax.device_put(params)
        self.state = jax.device_put(state)
        self.fused = False
        self.names = list(self.spec.names)

    @property
    def stride(self):
        return self.spec.strides

    @property
    def nc(self):
        return self.spec.nc

    def fuse(self) -> "Model":
        if not self.fused:
            self.params = jax.device_put(fuse_conv_bn(self.params, self.state))
            # drop running stats only for folded BNs — unfoldable standalone
            # BNs (BottleneckCSP/MixConv2d/DAPPM/nn.BatchNorm2d rows) still
            # read theirs in fused eval (same filter as Engine)
            self.state = {
                k: v for k, v in self.state.items()
                if "running_" not in k
                or k.rsplit(".running_", 1)[0] + ".weight" in self.params}
            self.fused = True
        return self

    def half(self) -> "Model":
        self.params = jax.tree.map(
            lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t,
            self.params)
        self._compute_dtype = jnp.bfloat16
        return self

    def __call__(self, x, train: bool = False, rng=None, decode=None):
        return forward(self.spec, self.params, self.state, x,
                       train=train, fused=self.fused, rng=rng, decode=decode,
                       compute_dtype=getattr(self, "_compute_dtype", None))

    def info(self, verbose: bool = False, img_size: int = 640):
        """Param/GFLOPs summary (reference Model.info)."""
        from ..utils.profiling import model_info
        return model_info(self.spec, self.params, img_size, verbose)

    def autoshape(self):
        """Wrap in the any-input inference API (reference Model.autoshape)."""
        from ..engine import Engine
        from ..hub import AutoShape
        eng = Engine(spec=self.spec, params=dict(self.params),
                     state=dict(self.state), half=False)
        return AutoShape(eng)
