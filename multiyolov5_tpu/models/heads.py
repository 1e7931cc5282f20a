"""Detection + segmentation heads (reference models/yolo.py:30-230).

All heads are pure functions over the flat param dict; activations NHWC.
The Detect decode is fully vectorized over levels so XLA fuses the sigmoid /
scale / grid-offset math into a single elementwise kernel per level.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nn import Ctx, Initializer, LazyCat
from ..ops.resize import resize_bilinear
from . import blocks as B

# ---------------------------------------------------------------------------
# Detect head, reference models/yolo.py:189-230
# ---------------------------------------------------------------------------


def init_detect(ini: Initializer, name: str, nc: int, anchors, ch: Sequence[int],
                strides: Sequence[int]) -> None:
    na = len(anchors[0]) // 2
    no = nc + 5
    for i, c in enumerate(ch):
        ini.conv(f"{name}.m.{i}", c, no * na, 1, bias=True)
    a = np.asarray(anchors, np.float32).reshape(len(anchors), -1, 2)
    # reference Model.__init__ divides anchors by stride (models/yolo.py:262)
    ini.buffer(name + ".anchors", a / np.asarray(strides, np.float32)[:, None, None])
    ini.buffer(name + ".anchor_grid", a.reshape(len(anchors), 1, -1, 1, 1, 2))


def initialize_detect_biases(params, name: str, nc: int, na: int,
                             strides: Sequence[int], cf=None):
    """Focal-loss prior init, reference models/yolo.py:318-326."""
    out = dict(params)
    for i, s in enumerate(strides):
        b = np.asarray(out[f"{name}.m.{i}.bias"]).reshape(na, -1).copy()
        b[:, 4] += math.log(8 / (640 / s) ** 2)
        if cf is None:
            b[:, 5:] += math.log(0.6 / (nc - 0.99))
        else:
            b[:, 5:] += np.log(cf / cf.sum())
        out[f"{name}.m.{i}.bias"] = np.asarray(b.reshape(-1), np.float32)
    return out


def detect_raw(ctx: Ctx, name: str, xs: List[jnp.ndarray], nc: int, na: int,
               hwna: bool = False):
    """Per-level 1x1 conv + reshape to (B, na, ny, nx, no) (training output).

    ``hwna=True`` skips the (0,3,1,2,4) transpose and returns the conv's
    native (B, ny, nx, na, no) order — the train step's DetectionLoss
    consumes it directly (losses.py ``hwna``), removing the transpose and
    its cotangent from the graph (device-lane savings; e2e step time is
    scheduler-overlapped)."""
    no = nc + 5
    outs = []
    for i, x in enumerate(xs):
        y = ctx.conv2d(f"{name}.m.{i}", x, 1)  # (B, ny, nx, na*no)
        b, ny, nx, _ = y.shape
        # torch layout: channels = na*no with (anchor, output) nesting; NHWC
        # conv output preserves channel order so the reshape below matches
        # reference models/yolo.py:214 view+permute.
        y = y.reshape(b, ny, nx, na, no)
        outs.append(y if hwna else y.transpose(0, 3, 1, 2, 4))
    return outs


def detect_decode_planar(ctx: Ctx, name: str, xs: List[jnp.ndarray],
                         strides: Sequence[int], nc: int, na: int,
                         planar_out: bool = False):
    """Inference decode straight from the head's input feature maps.

    Same math as ``detect_decode`` (reference models/yolo.py:216-225), but
    the 1x1 head conv runs as a dot_general over (B*H*W, C)-flattened
    features and the sigmoid/grid/anchor transform stays planar
    ((na*no, B*H*W) rows) until one final transpose.  detect_raw's
    (B,ny,nx,na,no) reshape+transpose makes XLA assign a T(2,128) tiling
    to the head conv's output and propagate it backward through every neck
    conv at that scale (same mechanism the seg head hit, see seg_psp); the
    H*W-merging reshape here is free only in the default layout, which
    anchors the trunk to clean T(8,128) tilings.  Serving path only —
    detect_raw still defines the training/eval raw maps.
    """
    no = nc + 5
    anchors = ctx.s[name + ".anchors"]  # (nl, na, 2), in grid units
    zs = []
    for i, x in enumerate(xs):
        b, ny, nx, cc = x.shape
        wl = ctx.p[f"{name}.m.{i}.weight"].reshape(cc, na, no)
        bl = ctx.p[f"{name}.m.{i}.bias"].reshape(na, no)
        if planar_out:
            # (output, anchor) row nesting instead of (anchor, output): the
            # per-image flat candidate view z[:, :, b, :].reshape(no, -1)
            # then matches the (B, N, no) path's (anchor, pixel) candidate
            # order with NO transpose — ops/nms.nms_planar consumes these
            # rows directly and the (B, N, 15) T(1,128) materialization
            # (pad/reshape/copy chain, ~20us/frame in the round-4 trace)
            # never exists.  Weight reordering is trace-time only.
            wl = wl.transpose(0, 2, 1)
            bl = bl.T
        wl = wl.reshape(cc, na * no)
        bl = bl.reshape(na * no)
        y2d = x.reshape(b * ny * nx, cc)
        lg = jax.lax.dot_general(wl.astype(x.dtype), y2d,
                                 (((0,), (1,)), ((), ())),
                                 preferred_element_type=x.dtype)
        lg = lg + bl.astype(lg.dtype)[:, None]              # (na*no, B*H*W)
        y = jax.nn.sigmoid(lg.astype(jnp.float32))
        gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1).reshape(-1)
        gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0).reshape(-1)
        s = float(strides[i])
        anc = anchors[i] * s                                # (na, 2)
        if planar_out:
            y = y.reshape(no, na, b, ny * nx)
            px = (y[0] * 2.0 - 0.5 + gx) * s                # (na, B, H*W)
            py = (y[1] * 2.0 - 0.5 + gy) * s
            pw = jnp.square(y[2] * 2.0) * anc[:, 0, None, None]
            ph = jnp.square(y[3] * 2.0) * anc[:, 1, None, None]
            z = jnp.concatenate([jnp.stack([px, py, pw, ph], 0), y[4:]], 0)
            zs.append(z)                                    # (no, na, B, H*W)
            continue
        y = y.reshape(na, no, b, ny * nx)
        px = (y[:, 0] * 2.0 - 0.5 + gx) * s                 # (na, B, H*W)
        py = (y[:, 1] * 2.0 - 0.5 + gy) * s
        pw = jnp.square(y[:, 2] * 2.0) * anc[:, 0:1, None]
        ph = jnp.square(y[:, 3] * 2.0) * anc[:, 1:2, None]
        z = jnp.concatenate([jnp.stack([px, py, pw, ph], 1), y[:, 4:]], 1)
        zs.append(z.transpose(2, 0, 3, 1).reshape(b, na * ny * nx, no))
    if planar_out:
        return zs
    return jnp.concatenate(zs, 1)


def detect_decode(ctx: Ctx, name: str, raw: List[jnp.ndarray],
                  strides: Sequence[int], nc: int):
    """Inference decode: sigmoid + grid/anchor transform + flatten+concat.

    Matches reference models/yolo.py:216-225:
        y = sigmoid(x)
        xy = (2y-0.5+grid) * stride ;  wh = (2y)^2 * anchor_grid
    Returns (B, sum(na*ny*nx), no) in input-pixel coordinates.
    """
    zs = []
    anchors = ctx.s[name + ".anchors"]  # (nl, na, 2), in grid units
    for i, x in enumerate(raw):
        b, na, ny, nx, no = x.shape
        y = jax.nn.sigmoid(x.astype(jnp.float32))
        gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
        grid = jnp.stack([gx, gy], -1)  # (ny, nx, 2) — (x, y) order
        xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * float(strides[i])
        anc = (anchors[i] * float(strides[i])).reshape(1, na, 1, 1, 2)
        wh = jnp.square(y[..., 2:4] * 2.0) * anc
        z = jnp.concatenate([xy, wh, y[..., 4:]], -1)
        zs.append(z.reshape(b, na * ny * nx, no))
    return jnp.concatenate(zs, 1)


# ---------------------------------------------------------------------------
# SegMaskPSP — shipped default head, reference models/yolo.py:149-186
# ---------------------------------------------------------------------------


def init_seg_psp(ini: Initializer, name: str, n_segcls: int, c_hid: int,
                 ch: Sequence[int]) -> None:
    c8, c16, c32 = ch
    B.init_conv(ini, name + ".m8.0", c8, c_hid, 1)
    B.init_conv(ini, name + ".m16.0", c16, c_hid, 1)
    B.init_conv(ini, name + ".m32.0", c32, c_hid, 1)
    B.init_rfb2(ini, name + ".out.0", c_hid * 3, c_hid, map_reduce=6)
    B.init_pyramid_pooling(ini, name + ".out.1", c_hid)
    B.init_ffm(ini, name + ".out.2", c_hid * 2, c_hid, k=3)
    ini.conv(name + ".out.3", c_hid, n_segcls, 1, bias=True)


def seg_psp(ctx: Ctx, name: str, xs: List[jnp.ndarray]):
    x8, x16, x32 = xs
    h, w = x8.shape[1], x8.shape[2]
    # layout-sever the head's 1x1 convs (dot_general over flattened
    # pixels) — scoped to this head: globally it breaks the backbone's
    # conv fusions (A/B: 987 vs 1264 FPS), here it starves the T(2,128)
    # tiling that otherwise leaks into the neck
    # sever_heads=False (forward(sever=False)) keeps the head on plain
    # convs — required for export (TFLite can't take the rank-4 reshaped
    # dots) and under GSPMD spatial sharding.  MULTIYOLOV5_XLA_SEGDOT=1
    # keeps the head 1x1s on XLA convs (batched-serving A/Bs: at bs>1 the
    # default-layout dots force relayout copies of the XLA-batch-layout
    # neck outputs at every head boundary).
    import os as _os
    ctx.dot1x1 = (not ctx.train and getattr(ctx, "sever_heads", True)
                  and not _os.environ.get("MULTIYOLOV5_XLA_SEGDOT"))
    f8 = B.conv(ctx, name + ".m8.0", x8, 1)
    f16 = B.conv(ctx, name + ".m16.0", x16, 1)
    f32 = B.conv(ctx, name + ".m32.0", x32, 1)
    if getattr(ctx, "lazy_cat", False):
        # virtual 3-scale concat: RFB2's entry 1x1s split per scale and the
        # x2/x4 bilinear upsamples move to the (narrower) dot outputs — the
        # c_hid*3-channel concat and the upsampled c_hid maps never
        # materialize (exact linear commute; ops/nn.LazyCat)
        feat = LazyCat([f8, f16, f32], (h, w), "bilinear")
    else:
        feat = jnp.concatenate([f8, resize_bilinear(f16, (h, w)),
                                resize_bilinear(f32, (h, w))], -1)
    y = B.rfb2(ctx, name + ".out.0", feat, d=(2, 3))
    feats = B.pyramid_pooling_feats(ctx, name + ".out.1", y, k=(1, 2, 3, 6))
    y = B.ffm(ctx, name + ".out.2", feats, k=3, split=True)
    if not ctx.train and not ctx.seg_up:
        # Planar (B, S, h, w) logits for the fused mask kernel, expressed
        # as a dot_general over the (H*W, C)-reshaped features.  The
        # out_nchw conv made XLA propagate a T(2,128) tiling backward
        # through the FFM convs (~50us over the MXU floor, plus relayout
        # copies); the H*W-merging reshape is free only in the default
        # layout, which anchors the head to clean layouts.  (A bare
        # transpose after the conv gets folded back — no change; opt
        # barriers before the conv / around the transposed logits lose
        # 15-35 FPS.)
        bsz, hh, ww, cc = y.shape
        # conv weights are HWIO (1,1,C,S): reshape -> (C, S)
        wl = ctx.p[name + ".out.3.weight"].reshape(cc, -1)
        bl = ctx.p[name + ".out.3.bias"]
        y2d = y.reshape(bsz * hh * ww, cc)
        lg = jax.lax.dot_general(wl.astype(y.dtype), y2d,
                                 (((0,), (1,)), ((), ())),
                                 preferred_element_type=y.dtype)
        lg = lg + bl.astype(lg.dtype)[:, None]              # (S, B*H*W)
        lg = lg.reshape(-1, bsz, hh, ww)
        ctx.dot1x1 = False
        return lg[:, 0][None] if bsz == 1 else jnp.moveaxis(lg, 1, 0)
    ctx.dot1x1 = False
    y = ctx.conv2d(name + ".out.3", y, 1)
    if ctx.train and not ctx.seg_up:
        return y    # (B, h, w, S) pre-upsample NHWC for the fused-CE loss
    return resize_bilinear(y, (h * 8, w * 8))


# ---------------------------------------------------------------------------
# SegMaskBase, reference models/yolo.py:129-146
# ---------------------------------------------------------------------------


def init_seg_base(ini: Initializer, name: str, n_segcls: int, n: int,
                  c_hid: int, ch: Sequence[int]) -> None:
    B.init_c3(ini, name + ".m.0", ch[0], c_hid, n=n)
    B.init_c3spp(ini, name + ".m.1", c_hid, int(c_hid * 1.5))
    ini.conv(name + ".m.3", int(c_hid * 1.5), n_segcls, 3, bias=False)


def seg_base(ctx: Ctx, name: str, xs, n: int, c_hid: int, shortcut: bool,
             ch: Sequence[int]):
    y = B.c3(ctx, name + ".m.0", xs[0], ch[0], c_hid, n=n, shortcut=shortcut)
    y = B.c3spp(ctx, name + ".m.1", y, c_hid, int(c_hid * 1.5))
    y = ctx.dropout(y, 0.1)
    if not ctx.train and not ctx.seg_up:
        return ctx.conv2d(name + ".m.3", y, 3, out_nchw=True)
    y = ctx.conv2d(name + ".m.3", y, 3)
    if ctx.train and not ctx.seg_up:
        return y    # (B, h, w, S) pre-upsample NHWC for the fused-CE loss
    return resize_bilinear(y, (y.shape[1] * 8, y.shape[2] * 8))


# ---------------------------------------------------------------------------
# SegMaskBiSe, reference models/yolo.py:30-86 (two aux heads in training)
# ---------------------------------------------------------------------------


def init_seg_bise(ini: Initializer, name: str, n_segcls: int,
                  ch: Sequence[int]) -> None:
    c8, c16, c32 = ch
    B.init_conv(ini, name + ".m8.0", c8, 128, 1)
    B.init_rfb2(ini, name + ".m16.0", c16, 128, map_reduce=4)
    B.init_rfb2(ini, name + ".m32.0", c32, 128, map_reduce=8, has_globel=True)
    B.init_conv(ini, name + ".up16.0", 128, 128, 3)
    B.init_conv(ini, name + ".up32.0", 128, 128, 3)
    B.init_ffm(ini, name + ".out.0", 256, 256, k=3)
    ini.conv(name + ".out.2", 256, n_segcls, 1, bias=True)
    B.init_conv(ini, name + ".aux16.0", 128, 128, 3)
    ini.conv(name + ".aux16.1", 128, n_segcls, 1, bias=True)
    B.init_conv(ini, name + ".aux32.0", 128, 128, 3)
    ini.conv(name + ".aux32.1", 128, n_segcls, 1, bias=True)


def seg_bise(ctx: Ctx, name: str, xs: List[jnp.ndarray]):
    x8, x16, x32 = xs
    f32 = B.rfb2(ctx, name + ".m32.0", x32, d=(2, 3), has_globel=True)
    f32 = B.conv(ctx, name + ".up32.0", f32, 3)
    feat3 = resize_bilinear(f32, (f32.shape[1] * 2, f32.shape[2] * 2))
    f16 = B.rfb2(ctx, name + ".m16.0", x16, d=(2, 3)) + feat3
    f16 = B.conv(ctx, name + ".up16.0", f16, 3)
    feat2 = resize_bilinear(f16, (f16.shape[1] * 2, f16.shape[2] * 2))
    f8 = B.conv(ctx, name + ".m8.0", x8, 1)
    y = B.ffm(ctx, name + ".out.0", [f8, feat2], is_cat=True, k=3)
    y = ctx.dropout(y, 0.1)
    if not ctx.train and not ctx.seg_up:
        return ctx.conv2d(name + ".out.2", y, 1, out_nchw=True)
    y = ctx.conv2d(name + ".out.2", y, 1)
    if not ctx.train:
        return resize_bilinear(y, (y.shape[1] * 8, y.shape[2] * 8))
    main = resize_bilinear(y, (y.shape[1] * 8, y.shape[2] * 8))
    a16 = ctx.conv2d(name + ".aux16.1", B.conv(ctx, name + ".aux16.0", feat2, 3), 1)
    a16 = resize_bilinear(a16, (a16.shape[1] * 8, a16.shape[2] * 8))
    a32 = ctx.conv2d(name + ".aux32.1", B.conv(ctx, name + ".aux32.0", feat3, 3), 1)
    a32 = resize_bilinear(a32, (a32.shape[1] * 16, a32.shape[2] * 16))
    return [main, a16, a32]


# ---------------------------------------------------------------------------
# SegMaskLab, reference models/yolo.py:93-124
# ---------------------------------------------------------------------------


def init_seg_lab(ini: Initializer, name: str, n_segcls: int, n: int,
                 c_hid: int, ch: Sequence[int]) -> None:
    c_detail, c16 = ch
    B.init_conv(ini, name + ".detail.0", c_detail, 48, 1)
    B.init_conv(ini, name + ".detail.1", 48, 48, 3)
    B.init_conv(ini, name + ".encoder.0", c16, c_hid * 2, 1)
    B.init_aspp(ini, name + ".encoder.1", c_hid * 2, 256, has_globel=False,
                map_reduce=5 - n)
    B.init_ffm(ini, name + ".decoder.0", 256 + 48, 256, k=1)
    B.init_conv(ini, name + ".decoder.1", 256, c_hid, 3)
    ini.conv(name + ".decoder.2", c_hid, n_segcls, 1, bias=True)


def seg_lab(ctx: Ctx, name: str, xs: List[jnp.ndarray], c_hid: int):
    x_detail, x16 = xs
    e = B.conv(ctx, name + ".encoder.0", x16, 1)
    e = B.aspp(ctx, name + ".encoder.1", e, d=(3, 6, 9), has_globel=False)
    e = resize_bilinear(e, (e.shape[1] * 2, e.shape[2] * 2))
    d = B.conv(ctx, name + ".detail.1", B.conv(ctx, name + ".detail.0", x_detail, 1), 3)
    y = B.ffm(ctx, name + ".decoder.0", [d, e], is_cat=True, k=1)
    y = B.conv(ctx, name + ".decoder.1", y, 3)
    if not ctx.train and not ctx.seg_up:
        return ctx.conv2d(name + ".decoder.2", y, 1, out_nchw=True)
    y = ctx.conv2d(name + ".decoder.2", y, 1)
    if ctx.train and not ctx.seg_up:
        return y    # (B, h, w, S) pre-upsample NHWC for the fused-CE loss
    return resize_bilinear(y, (y.shape[1] * 8, y.shape[2] * 8))
