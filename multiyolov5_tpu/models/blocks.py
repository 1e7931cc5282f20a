"""YOLOv5 / multiyolov5 building blocks as pure functions (NHWC, TPU-first).

Every block here reproduces the math of the same-named reference module
(reference models/common.py, models/experimental.py) but as a pair of
functions over flat param dicts:

    init_<block>(ini, name, ...)   -> registers params under torch-style names
    <block>(ctx, name, x, ...)     -> functional forward

Param key layout mirrors the reference ``state_dict`` exactly so the ``.pt``
checkpoint bridge is a pure transpose (see utils/checkpoint.py).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nn import Ctx, Initializer
from ..ops.resize import (
    adaptive_avg_pool,
    adaptive_avg_pool_multi,
    avg_pool,
    global_avg_pool,
    max_pool_same,
    resize_bilinear,
)

# ---------------------------------------------------------------------------
# Conv (conv + BN + SiLU), reference models/common.py:34-46
# ---------------------------------------------------------------------------


def init_conv(ini: Initializer, name: str, c1: int, c2: int, k: int = 1,
              g: int = 1) -> None:
    ini.conv(name + ".conv", c1, c2, k, groups=g, bias=False)
    ini.bn(name + ".bn", c2)


def conv(ctx: Ctx, name: str, x, k: int = 1, s: int = 1, p: Optional[int] = None,
         g: int = 1, d: int = 1, act: bool = True):
    return ctx.conv_bn_act(name, x, k, s, p, g, d, act)


def _conv3x3_fused_fast(ctx: Ctx, cname: str, x, d: int = 1,
                        act: bool = True):
    """Fused-inference 3x3/stride-1 conv + SiLU via the on-core Pallas
    kernel (ops/pallas/conv3x3_kernel.py) when eligible, else None.

    Eligible = TPU backend, BN already folded (engine fuse), eval mode,
    c_in a sublane multiple, and the padded input block fits VMEM.  Used
    by the seg head's low-res convs where XLA's layout choices run 2-5x
    off the MXU floor; as a custom call it also pins its operands to the
    default layout, severing T(2,128) back-propagation into the trunk.
    MULTIYOLOV5_XLA_SEGCONV=1 opts back into the XLA lowering."""
    import os
    # batch-1 only (round-5 bs8 A/B: 1545 vs 1582 FPS with the kernels
    # off): at serving batch sizes XLA's batch conv emitters beat the
    # kernel AND the custom-call boundary forces ~40us/frame of relayout
    # copies of the batch-layout neck outputs.  The head's 1x1 dot route
    # stays on at every batch (disabling it A/B'd 1437).
    # MULTIYOLOV5_FORCE_SEGCONV=1 re-enables for batched A/Bs.
    if (not ctx.fused or ctx.train or x.ndim != 4 or x.shape[-1] % 8
            or x.shape[1] * x.shape[2] * x.shape[-1] > (1 << 22)
            or jax.default_backend() != "tpu"
            or (x.shape[0] > 1
                and not os.environ.get("MULTIYOLOV5_FORCE_SEGCONV"))
            or not getattr(ctx, "sever_heads", True)
            or os.environ.get("MULTIYOLOV5_XLA_SEGCONV")):
        return None
    w = ctx.p.get(cname + ".weight")
    if w is None or w.shape[0] != 3 or w.shape[1] != 3:
        return None
    b = ctx.p.get(cname + ".bias")
    if b is None:
        b = jnp.zeros((w.shape[-1],), jnp.float32)
    from ..ops.nn import _add_macs
    from ..ops.pallas.c3_kernel import conv3x3_packed_pallas, packed_q_for
    from ..ops.pallas.conv3x3_kernel import conv3x3_silu_pallas
    _add_macs(x.shape[0] * x.shape[1] * x.shape[2] * int(np.prod(w.shape)))
    q = packed_q_for(x.shape[-1], x.shape[2], d)
    if q > 1:
        return conv3x3_packed_pallas(x, w, b, q=q, d=d, act=act)
    return conv3x3_silu_pallas(x, w, b, d=d, act=act)


def dw_groups(c1: int, c2: int) -> int:
    """DWConv groups = gcd(c1, c2), reference models/common.py:29-31."""
    return math.gcd(c1, c2)


# ---------------------------------------------------------------------------
# Bottleneck / C3 family, reference models/common.py:95-160
# ---------------------------------------------------------------------------


def init_bottleneck(ini: Initializer, name: str, c1: int, c2: int,
                    g: int = 1, e: float = 0.5) -> None:
    c_ = int(c2 * e)
    init_conv(ini, name + ".cv1", c1, c_, 1)
    init_conv(ini, name + ".cv2", c_, c2, 3, g=g)


def bottleneck(ctx: Ctx, name: str, x, c1: int, c2: int, shortcut: bool = True,
               g: int = 1, e: float = 0.5):
    y = conv(ctx, name + ".cv1", x, 1, 1)
    y = conv(ctx, name + ".cv2", y, 3, 1, g=g)
    return x + y if (shortcut and c1 == c2) else y


def init_c3(ini: Initializer, name: str, c1: int, c2: int, n: int = 1,
            g: int = 1, e: float = 0.5) -> None:
    c_ = int(c2 * e)
    init_conv(ini, name + ".cv1", c1, c_, 1)
    init_conv(ini, name + ".cv2", c1, c_, 1)
    init_conv(ini, name + ".cv3", 2 * c_, c2, 1)
    for j in range(n):
        init_bottleneck(ini, f"{name}.m.{j}", c_, c_, g=g, e=1.0)


def _c3_packed_fast(ctx: Ctx, name: str, x, c1: int, c2: int, n: int,
                    shortcut: bool, g: int, e: float):
    """Whole-C3 fused Pallas kernel on a column-packed layout when eligible
    (narrow hidden width, packable geometry), else None.  Batch-independent
    — unlike the neck's batch-1 layout severing it also wins at serving
    batch sizes, where XLA's batch-in-sublanes emitters run the layer-2
    C3 at ~2x its batch-1 per-frame cost (see ops/pallas/c3_kernel.py)."""
    import os
    if (not ctx.fused or ctx.train or not getattr(ctx, "c3_packed", False)
            or not getattr(ctx, "sever_heads", True) or g != 1
            or not isinstance(x, jnp.ndarray) or x.ndim != 4
            or (jax.default_backend() != "tpu"
                and not os.environ.get("MULTIYOLOV5_FORCE_C3PACK"))
            or os.environ.get("MULTIYOLOV5_NO_C3PACK")):
        return None
    c_ = int(c2 * e)
    # measured on v5e (1024x512 serving shapes, round 3): standalone the
    # kernel wins widely (c_=32 q=4: 69.5us vs XLA 172.9 at bs1), but
    # in-model XLA's batch-1 emitters + fusion context run the same C3 at
    # ~53us (s) — the kernel only wins in-model at batch>1, where XLA's
    # batch-in-sublanes emitters pay ~2x per frame (bs8: 41 vs 122
    # us/frame in-model).  c_=48 (m) at bs1 A/B'd 823 -> 747 FPS in-model
    # despite a 182-vs-297 standalone win; c_=64 q=2 loses even
    # standalone (73.7 vs 42.2) -> excluded.
    if c_ < 8 or c_ > 48 or c_ % 8:
        return None
    force = os.environ.get("MULTIYOLOV5_C3PACK")
    if force != "1" and x.shape[0] == 1:
        return None
    q = 128 // c_
    bsz, h, w_, _ = x.shape
    if w_ % q or (w_ // q) % 8 or h % 8:
        return None
    cpp = -(-(w_ // q + 2) // 8) * 8
    if (h + 2 * n) * cpp * q * c1 > (1 << 23):
        return None
    p = ctx.p
    try:
        wcv1 = p[name + ".cv1.conv.weight"]
        wcv2 = p[name + ".cv2.conv.weight"]
        wcv3 = p[name + ".cv3.conv.weight"]
        mws = tuple((p[f"{name}.m.{j}.cv1.conv.weight"],
                     p[f"{name}.m.{j}.cv1.conv.bias"],
                     p[f"{name}.m.{j}.cv2.conv.weight"],
                     p[f"{name}.m.{j}.cv2.conv.bias"]) for j in range(n))
    except KeyError:
        return None
    if wcv1.shape[-1] != c_ or any(m[2].shape[:2] != (3, 3) for m in mws):
        return None
    from ..ops.nn import _add_macs
    from ..ops.pallas.c3_kernel import c3_packed_pallas, c3_packed_pallas_hwbc
    px = bsz * h * w_
    _add_macs(px * (2 * c1 * c_ + 2 * c_ * c2
                    + n * (c_ * c_ + 9 * c_ * c_)))
    # MULTIYOLOV5_C3_HWBC=1 opts into the batch-layout variant on the
    # (non-default) full-batch serving path: its boundaries avoid the
    # BHWC kernel's pack/unpack relayouts, but XLA still brackets the
    # free reshapes with copies (TPU tiled layouts make the 3D->4D
    # reinterpretation non-bitcastable), so the A/B was a wash (1575 vs
    # 1585 FPS at bs8) — the default serving path at batch>1 is the
    # engine's unrolled per-image regime, which never calls this kernel
    fn = (c3_packed_pallas_hwbc
          if bsz > 1 and os.environ.get("MULTIYOLOV5_C3_HWBC") == "1"
          else c3_packed_pallas)
    return fn(x, wcv1, p[name + ".cv1.conv.bias"],
              wcv2, p[name + ".cv2.conv.bias"],
              wcv3, p[name + ".cv3.conv.bias"],
              mws, q=q, shortcut=shortcut)


def c3(ctx: Ctx, name: str, x, c1: int, c2: int, n: int = 1,
       shortcut: bool = True, g: int = 1, e: float = 0.5):
    y = _c3_packed_fast(ctx, name, x, c1, c2, n, shortcut, g, e)
    if y is not None:
        return y
    c_ = int(c2 * e)
    y1 = conv(ctx, name + ".cv1", x, 1, 1)
    for j in range(n):
        y1 = bottleneck(ctx, f"{name}.m.{j}", y1, c_, c_, shortcut, g, e=1.0)
    y2 = conv(ctx, name + ".cv2", x, 1, 1)
    # NOTE: conv(concat)->summed-partial-convs (conv_bn_act_split) was A/B
    # traced here and LOST (+21us device-true across the net): XLA already
    # fuses these narrow 2-way concats into the consumer conv.  The split
    # only wins for the PSP head's wide 5-way concat (models/heads.py).
    return conv(ctx, name + ".cv3", jnp.concatenate([y1, y2], -1), 1)


def init_bottleneck_csp(ini: Initializer, name: str, c1: int, c2: int,
                        n: int = 1, g: int = 1, e: float = 0.5) -> None:
    c_ = int(c2 * e)
    init_conv(ini, name + ".cv1", c1, c_, 1)
    ini.conv(name + ".cv2", c1, c_, 1, bias=False)
    ini.conv(name + ".cv3", c_, c_, 1, bias=False)
    init_conv(ini, name + ".cv4", 2 * c_, c2, 1)
    ini.bn(name + ".bn", 2 * c_)
    for j in range(n):
        init_bottleneck(ini, f"{name}.m.{j}", c_, c_, g=g, e=1.0)


def bottleneck_csp(ctx: Ctx, name: str, x, c1: int, c2: int, n: int = 1,
                   shortcut: bool = True, g: int = 1, e: float = 0.5):
    c_ = int(c2 * e)
    y1 = conv(ctx, name + ".cv1", x, 1, 1)
    for j in range(n):
        y1 = bottleneck(ctx, f"{name}.m.{j}", y1, c_, c_, shortcut, g, e=1.0)
    y1 = ctx.conv2d(name + ".cv3", y1, 1)
    y2 = ctx.conv2d(name + ".cv2", x, 1)
    y = jnp.concatenate([y1, y2], -1)
    # post-concat BN has no conv to fold into — applied in fused mode too
    # (fuse_conv_bn leaves its params/stats in place)
    if name + ".bn.weight" in ctx.p:
        y = ctx.batch_norm(name + ".bn", y)
    y = jax.nn.leaky_relu(y, 0.1)
    return conv(ctx, name + ".cv4", y, 1, 1)


def init_spp(ini: Initializer, name: str, c1: int, c2: int,
             k: Sequence[int] = (5, 9, 13)) -> None:
    c_ = c1 // 2
    init_conv(ini, name + ".cv1", c1, c_, 1)
    init_conv(ini, name + ".cv2", c_ * (len(k) + 1), c2, 1)


def spp(ctx: Ctx, name: str, x, k: Sequence[int] = (5, 9, 13)):
    x = conv(ctx, name + ".cv1", x, 1, 1)
    ys = [x] + [max_pool_same(x, kk) for kk in k]
    return conv(ctx, name + ".cv2", jnp.concatenate(ys, -1), 1, 1)


def init_c3spp(ini: Initializer, name: str, c1: int, c2: int,
               k: Sequence[int] = (5, 9, 13), e: float = 0.5) -> None:
    c_ = int(c1 * e)
    init_conv(ini, name + ".cv1", c1, c_, 1)
    init_conv(ini, name + ".cv2", c1, c_, 1)
    init_conv(ini, name + ".cv3", c_ + int(c_ * 1.5), c2, 1)
    init_spp(ini, name + ".m", c_, int(c_ * 1.5), k)


def c3spp(ctx: Ctx, name: str, x, c1: int, c2: int,
          k: Sequence[int] = (5, 9, 13), e: float = 0.5):
    y1 = conv(ctx, name + ".cv1", x, 1, 1)
    y1 = spp(ctx, name + ".m", y1, k)
    y2 = conv(ctx, name + ".cv2", x, 1, 1)
    return conv(ctx, name + ".cv3", jnp.concatenate([y1, y2], -1), 1)


# ---------------------------------------------------------------------------
# Transformer (C3TR), reference models/common.py:49-92,155-160 — available in
# the DSL though unused by the shipped seg configs.
# ---------------------------------------------------------------------------


def init_linear(ini: Initializer, name: str, c_in: int, c_out: int,
                bias: bool = True) -> None:
    bound = math.sqrt(2.0 / 6.0) * math.sqrt(3.0 / c_in)
    w = ini._rng.uniform(-bound, bound, size=(c_out, c_in))
    ini.params[name + ".weight"] = np.asarray(w, np.float32)
    if bias:
        b_bound = 1.0 / math.sqrt(c_in)
        ini.params[name + ".bias"] = np.asarray(
            ini._rng.uniform(-b_bound, b_bound, size=(c_out,)), np.float32)


def linear(ctx: Ctx, name: str, x):
    w = ctx.p[name + ".weight"].astype(x.dtype)
    y = x @ w.T
    b = ctx.p.get(name + ".bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def init_transformer_layer(ini: Initializer, name: str, c: int) -> None:
    for q in ("q", "k", "v"):
        init_linear(ini, f"{name}.{q}", c, c, bias=False)
    # torch nn.MultiheadAttention params
    bound = math.sqrt(6.0 / (2 * c))  # xavier_uniform on (3c, c)
    ini.params[name + ".ma.in_proj_weight"] = np.asarray(
        ini._rng.uniform(-bound, bound, size=(3 * c, c)), np.float32)
    ini.params[name + ".ma.in_proj_bias"] = np.zeros((3 * c,), np.float32)
    init_linear(ini, name + ".ma.out_proj", c, c, bias=True)
    init_linear(ini, f"{name}.fc1", c, c, bias=False)
    init_linear(ini, f"{name}.fc2", c, c, bias=False)


def transformer_layer(ctx: Ctx, name: str, x, c: int, num_heads: int):
    """x: (L, B, C) like torch MultiheadAttention default."""
    q = linear(ctx, name + ".q", x)
    k = linear(ctx, name + ".k", x)
    v = linear(ctx, name + ".v", x)
    win = ctx.p[name + ".ma.in_proj_weight"].astype(x.dtype)
    bin_ = ctx.p[name + ".ma.in_proj_bias"].astype(x.dtype)
    wq, wk, wv = jnp.split(win, 3, axis=0)
    bq, bk, bv = jnp.split(bin_, 3)
    q = q @ wq.T + bq
    k = k @ wk.T + bk
    v = v @ wv.T + bv
    L, B, C = q.shape
    hd = C // num_heads

    def heads(t):  # (L,B,C) -> (B*h, L, hd)
        return t.reshape(L, B * num_heads, hd).transpose(1, 0, 2)

    qh, kh, vh = heads(q), heads(k), heads(v)
    attn = jax.nn.softmax(qh @ kh.transpose(0, 2, 1) / math.sqrt(hd), axis=-1)
    o = (attn @ vh).transpose(1, 0, 2).reshape(L, B, C)
    o = linear(ctx, name + ".ma.out_proj", o)
    x = o + x
    return linear(ctx, name + ".fc2", linear(ctx, name + ".fc1", x)) + x


def init_transformer_block(ini: Initializer, name: str, c1: int, c2: int,
                           num_heads: int, num_layers: int) -> None:
    if c1 != c2:
        init_conv(ini, name + ".conv", c1, c2, 1)
    init_linear(ini, name + ".linear", c2, c2, bias=True)
    for j in range(num_layers):
        init_transformer_layer(ini, f"{name}.tr.{j}", c2)


def transformer_block(ctx: Ctx, name: str, x, c1: int, c2: int,
                      num_heads: int, num_layers: int):
    if c1 != c2:
        x = conv(ctx, name + ".conv", x, 1, 1)
    b, h, w, c = x.shape
    p = x.reshape(b, h * w, c).transpose(1, 0, 2)  # (L, B, C)
    e = linear(ctx, name + ".linear", p)
    x = p + e
    for j in range(num_layers):
        x = transformer_layer(ctx, f"{name}.tr.{j}", x, c2, num_heads)
    return x.transpose(1, 0, 2).reshape(b, h, w, c2)


def init_c3tr(ini: Initializer, name: str, c1: int, c2: int, n: int = 1,
              e: float = 0.5) -> None:
    c_ = int(c2 * e)
    init_conv(ini, name + ".cv1", c1, c_, 1)
    init_conv(ini, name + ".cv2", c1, c_, 1)
    init_conv(ini, name + ".cv3", 2 * c_, c2, 1)
    init_transformer_block(ini, name + ".m", c_, c_, 4, n)


def c3tr(ctx: Ctx, name: str, x, c1: int, c2: int, n: int = 1, e: float = 0.5):
    c_ = int(c2 * e)
    y1 = conv(ctx, name + ".cv1", x, 1, 1)
    y1 = transformer_block(ctx, name + ".m", y1, c_, c_, 4, n)
    y2 = conv(ctx, name + ".cv2", x, 1, 1)
    return conv(ctx, name + ".cv3", jnp.concatenate([y1, y2], -1), 1)


# ---------------------------------------------------------------------------
# Focus / Contract / Expand / Concat, reference models/common.py:542-589
# ---------------------------------------------------------------------------


def init_focus(ini: Initializer, name: str, c1: int, c2: int, k: int = 1,
               g: int = 1) -> None:
    init_conv(ini, name + ".conv", c1 * 4, c2, k, g=g)


def focus(ctx: Ctx, name: str, x, k: int = 1, s: int = 1,
          p: Optional[int] = None, g: int = 1, act: bool = True):
    """Focus stem as a single stride-2 conv (TPU-critical).

    If ``ctx.pre_s2d`` the input already arrives phase-stacked (B, H/2, W/2,
    4C) — the engine's host pipeline does the space-to-depth on the uint8
    frame for free — and the stored kxk conv applies directly (0.26 ms vs
    0.75 ms for the on-device 6x6 form at 512x1024).

    The reference materializes the 2x2 space-to-depth slice-concat
    (models/common.py:549-550); on TPU those four strided slices of the
    3-channel image dominate the whole forward (terrible (8,128)-tile
    layout), so we fold them into the conv: a kxk conv on the
    phase-stacked input equals a 2k x 2k stride-2 conv on the raw image
    whose kernel is the stored weight scattered by phase:
        W[2dy+pi, 2dx+pj, c, o] = w[dy, dx, 3*p + c, o]
    with phase order [ee, oe, eo, oo] matching the torch cat (H-offset
    first).  Exact same math, same stored weights (checkpoint-compatible),
    differentiable through the scatter for training.
    """
    if getattr(ctx, "pre_s2d", False):
        return conv(ctx, name + ".conv", x, k, s, p, g, act=act)
    w = ctx.p[name + ".conv.conv.weight"]          # (k, k, 4*c, cout)
    kk, _, c4, cout = w.shape
    c = c4 // 4
    w4 = w.reshape(kk, kk, 4, c, cout)
    big = jnp.zeros((2 * kk, 2 * kk, c, cout), w.dtype)
    for pp, (pi, pj) in enumerate([(0, 0), (1, 0), (0, 1), (1, 1)]):
        big = big.at[pi::2, pj::2].set(w4[:, :, pp])
    pad = 2 * (kk // 2)
    y = jax.lax.conv_general_dilated(
        x, big.astype(x.dtype), window_strides=(2, 2),
        padding=((pad, pad), (pad, pad)), feature_group_count=g,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    b = ctx.p.get(name + ".conv.conv.bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    if not ctx.fused:
        y = ctx.batch_norm(name + ".conv.bn", y)
    return jax.nn.silu(y) if act else y


def contract(x, gain: int = 2):
    n, h, w, c = x.shape
    s = gain
    # torch: view(N,C,H/s,s,W/s,s).permute(0,3,5,1,2,4) -> (N, s*s*C, H/s, W/s)
    x = x.reshape(n, h // s, s, w // s, s, c)
    x = x.transpose(0, 2, 4, 5, 1, 3)  # (N, s, s, C, H/s, W/s)
    return x.reshape(n, s * s * c, h // s, w // s).transpose(0, 2, 3, 1)


def expand(x, gain: int = 2):
    n, h, w, c = x.shape
    s = gain
    x = x.transpose(0, 3, 1, 2).reshape(n, s, s, c // s**2, h, w)
    x = x.transpose(0, 3, 4, 1, 5, 2)  # (N, C/s^2, H, s, W, s)
    return x.reshape(n, c // s**2, h * s, w * s).transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# Attention / ARM / FFM, reference models/common.py:177-230
# ---------------------------------------------------------------------------


def init_attention(ini: Initializer, name: str, chan: int, reduction: int = 1) -> None:
    if reduction > 1:
        init_conv(ini, name + ".W.1", chan, chan // reduction, 1)
        init_conv(ini, name + ".W.2", chan // reduction, chan, 1)
    else:
        init_conv(ini, name + ".W.1", chan, chan, 1)


def attention(ctx: Ctx, name: str, x, reduction: int = 1):
    g = global_avg_pool(x)
    if reduction > 1:
        g = conv(ctx, name + ".W.1", g, 1, 1)
        g = conv(ctx, name + ".W.2", g, 1, 1, act=False)
    else:
        g = conv(ctx, name + ".W.1", g, 1, 1, act=False)
    return x * jax.nn.sigmoid(g)


def init_arm(ini: Initializer, name: str, c1: int, c2: int) -> None:
    init_conv(ini, name + ".conv", c1, c2, 3)
    init_conv(ini, name + ".channel_attention.1", c2, c2, 1)


def arm(ctx: Ctx, name: str, x):
    feat = conv(ctx, name + ".conv", x, 3, 1)
    atten = conv(ctx, name + ".channel_attention.1", global_avg_pool(feat), 1, 1, act=False)
    return feat * jax.nn.sigmoid(atten)


def init_ffm(ini: Initializer, name: str, c1: int, c2: int,
             reduction: int = 1, k: int = 1) -> None:
    init_conv(ini, name + ".convblk", c1, c2, k)
    ini.conv(name + ".channel_attention.1", c2, c2 // reduction, 1, bias=False)
    ini.conv(name + ".channel_attention.3", c2 // reduction, c2, 1, bias=False)


def ffm(ctx: Ctx, name: str, x, reduction: int = 1, is_cat: bool = True, k: int = 1,
        split: bool = False):
    """Feature Fusion Module (reference models/common.py:210-230).

    ``split=True`` takes ``x`` as a list and feeds the convblk the virtual
    concat via channel-sliced partial convs (exact; skips the materialized
    concat — see Ctx.conv_bn_act_split)."""
    feat = None
    if k == 3:
        fcat = jnp.concatenate(x, -1) if isinstance(x, (list, tuple)) else x
        feat = _conv3x3_fused_fast(ctx, name + ".convblk.conv", fcat)
    if feat is None and split:
        feat = ctx.conv_bn_act_split(name + ".convblk", x, k)
    elif feat is None:
        fcat = jnp.concatenate(x, -1) if is_cat else x
        feat = conv(ctx, name + ".convblk", fcat, k, 1)
    a = global_avg_pool(feat)
    a = jax.nn.silu(ctx.conv2d(name + ".channel_attention.1", a, 1))
    a = jax.nn.sigmoid(ctx.conv2d(name + ".channel_attention.3", a, 1))
    return feat * a + feat


# ---------------------------------------------------------------------------
# ASPP family, reference models/common.py:233-324
# ---------------------------------------------------------------------------


def init_aspp(ini: Initializer, name: str, c1: int, c2: int,
              d=(3, 6, 9), has_globel: bool = True, map_reduce: int = 4) -> None:
    hid = c1 // map_reduce
    init_conv(ini, name + ".branch0.0", c1, hid, 1)
    for bi in (1, 2, 3):
        ini.conv(f"{name}.branch{bi}.0", c1, hid, 3, bias=False)
        ini.bn(f"{name}.branch{bi}.1", hid)
    if has_globel:
        init_conv(ini, name + ".branch4.1", c1, hid, 1)
    init_conv(ini, name + ".ConvLinear", (5 if has_globel else 4) * hid, c2, 1)


def aspp(ctx: Ctx, name: str, x, d=(3, 6, 9), has_globel: bool = True):
    x0 = conv(ctx, name + ".branch0.0", x, 1, 1)
    xs = [x0]
    for bi, dd in zip((1, 2, 3), d):
        xs.append(ctx.conv2d_bn_act(f"{name}.branch{bi}.0", f"{name}.branch{bi}.1", x, 3, d=dd))
    if has_globel:
        g = conv(ctx, name + ".branch4.1", global_avg_pool(x), 1, 1)
        xs.append(jnp.broadcast_to(g, x0.shape))  # nearest-up of a 1x1 map
    return conv(ctx, name + ".ConvLinear", jnp.concatenate(xs, -1), 1, 1)


def init_aspps(ini: Initializer, name: str, c1: int, c2: int,
               d=(3, 6, 9), has_globel: bool = True, map_reduce: int = 4) -> None:
    hid = c1 // map_reduce
    init_conv(ini, name + ".branch0.0", c1, hid, 1)
    init_conv(ini, name + ".branch0.1", hid, hid, 3)
    for bi in (1, 2, 3):
        init_conv(ini, f"{name}.branch{bi}.0", c1, hid, 1)
        ini.conv(f"{name}.branch{bi}.1", hid, hid, 3, bias=False)
        ini.bn(f"{name}.branch{bi}.2", hid)
    if has_globel:
        init_conv(ini, name + ".branch4.1", c1, hid, 1)
    init_conv(ini, name + ".ConvLinear", (5 if has_globel else 4) * hid, c2, 1)


def aspps(ctx: Ctx, name: str, x, d=(3, 6, 9), has_globel: bool = True):
    x0 = conv(ctx, name + ".branch0.1", conv(ctx, name + ".branch0.0", x, 1), 3)
    xs = [x0]
    for bi, dd in zip((1, 2, 3), d):
        y = conv(ctx, f"{name}.branch{bi}.0", x, 1)
        xs.append(ctx.conv2d_bn_act(f"{name}.branch{bi}.1", f"{name}.branch{bi}.2", y, 3, d=dd))
    if has_globel:
        g = conv(ctx, name + ".branch4.1", global_avg_pool(x), 1, 1)
        xs.append(jnp.broadcast_to(g, x0.shape))
    return conv(ctx, name + ".ConvLinear", jnp.concatenate(xs, -1), 1, 1)


def init_rfb1(ini: Initializer, name: str, c1: int, c2: int,
              map_reduce: int = 4, has_globel: bool = False) -> None:
    inter = c1 // map_reduce
    init_conv(ini, name + ".branch0.0", c1, inter, 1)
    init_conv(ini, name + ".branch0.1", inter, inter, 3)
    for bi, kk in zip((1, 2, 3), (3, 3, 5)):
        init_conv(ini, f"{name}.branch{bi}.0", c1, inter, 1)
        init_conv(ini, f"{name}.branch{bi}.1", inter, inter, kk)
        ini.conv(f"{name}.branch{bi}.2", inter, inter, 3, bias=False)
        ini.bn(f"{name}.branch{bi}.3", inter)
    if has_globel:
        init_conv(ini, name + ".branch4.1", c1, inter, 1)
    init_conv(ini, name + ".Fusion", (5 if has_globel else 4) * inter, c2, 1)


def rfb1(ctx: Ctx, name: str, x, d=(3, 5, 7), has_globel: bool = False):
    x0 = conv(ctx, name + ".branch0.1", conv(ctx, name + ".branch0.0", x, 1), 3)
    xs = [x0]
    for bi, kk, dd in zip((1, 2, 3), (3, 3, 5), d):
        y = conv(ctx, f"{name}.branch{bi}.0", x, 1)
        y = conv(ctx, f"{name}.branch{bi}.1", y, kk)
        xs.append(ctx.conv2d_bn_act(f"{name}.branch{bi}.2", f"{name}.branch{bi}.3", y, 3, d=dd))
    if has_globel:
        g = conv(ctx, name + ".branch4.1", global_avg_pool(x), 1, 1)
        xs.append(jnp.broadcast_to(g, x0.shape))
    return conv(ctx, name + ".Fusion", jnp.concatenate(xs, -1), 1, 1)


def init_rfb2(ini: Initializer, name: str, c1: int, c2: int,
              map_reduce: int = 4, has_globel: bool = False) -> None:
    inter = c1 // map_reduce
    init_conv(ini, name + ".branch0.0", c1, inter, 1)
    init_conv(ini, name + ".branch0.1", inter, inter, 3)
    for bi in (1, 2):
        ini.conv(f"{name}.branch{bi}.0", inter, inter, 3, bias=False)
        ini.bn(f"{name}.branch{bi}.1", inter)
    init_conv(ini, name + ".branch3.0", c1, inter, 1)
    if has_globel:
        init_conv(ini, name + ".branch4.1", inter, inter, 1)
    init_conv(ini, name + ".ConvLinear", (5 if has_globel else 4) * inter, c2, 1)


def rfb2(ctx: Ctx, name: str, x, d=(2, 3), has_globel: bool = False):
    """Cascaded-dilation block, reference models/common.py:470-511."""
    x3 = conv(ctx, name + ".branch3.0", x, 1, 1)
    x0p = conv(ctx, name + ".branch0.0", x, 1)
    x0 = _conv3x3_fused_fast(ctx, name + ".branch0.1.conv", x0p)
    if x0 is None:
        x0 = conv(ctx, name + ".branch0.1", x0p, 3)
    x1 = _conv3x3_fused_fast(ctx, name + ".branch1.0", x0, d=d[0])
    if x1 is None:
        x1 = ctx.conv2d_bn_act(name + ".branch1.0", name + ".branch1.1",
                               x0, 3, d=d[0])
    x2 = _conv3x3_fused_fast(ctx, name + ".branch2.0", x1, d=d[1])
    if x2 is None:
        x2 = ctx.conv2d_bn_act(name + ".branch2.0", name + ".branch2.1",
                               x1, 3, d=d[1])
    xs = [x0, x1, x2, x3]
    if has_globel:
        g = conv(ctx, name + ".branch4.1", global_avg_pool(x2), 1, 1)
        xs.append(jnp.broadcast_to(g, x0.shape))
    return conv(ctx, name + ".ConvLinear", jnp.concatenate(xs, -1), 1, 1)


# ---------------------------------------------------------------------------
# DAPPM, reference models/common.py:327-412 (pre-activation ordering)
# ---------------------------------------------------------------------------


def init_dappm(ini: Initializer, name: str, c_in: int, c_branch: int, c_out: int) -> None:
    for sc in ("scale1", "scale2", "scale3", "scale4", "scale0"):
        ini.bn(f"{name}.{sc}.{1 if sc != 'scale0' else 0}", c_in)
        ini.conv(f"{name}.{sc}.{3 if sc != 'scale0' else 2}", c_in, c_branch, 1, bias=False)
    for pr in ("process1", "process2", "process3", "process4"):
        ini.bn(f"{name}.{pr}.0", c_branch)
        ini.conv(f"{name}.{pr}.2", c_branch, c_branch, 3, bias=False)
    ini.bn(name + ".compression.0", c_branch * 5)
    ini.conv(name + ".compression.2", c_branch * 5, c_out, 1, bias=False)
    ini.bn(name + ".shortcut.0", c_in)
    ini.conv(name + ".shortcut.2", c_in, c_out, 1, bias=False)


def dappm(ctx: Ctx, name: str, x):
    h, w = x.shape[1], x.shape[2]

    def bn_act_conv(prefix, bn_i, conv_i, t, k=1):
        t = ctx.batch_norm(f"{name}.{prefix}.{bn_i}", t)
        t = jax.nn.silu(t)
        return ctx.conv2d(f"{name}.{prefix}.{conv_i}", t, k)

    pools = [x,
             avg_pool(x, 5, 2, 2),
             avg_pool(x, 9, 4, 4),
             avg_pool(x, 17, 8, 8),
             global_avg_pool(x)]
    xl = [bn_act_conv("scale0", 0, 2, pools[0])]
    for i, (sc, pr) in enumerate(
            zip(("scale1", "scale2", "scale3", "scale4"),
                ("process1", "process2", "process3", "process4")), start=1):
        t = bn_act_conv(sc, 1, 3, pools[i])
        t = resize_bilinear(t, (h, w), align_corners=True) + xl[i - 1]
        xl.append(bn_act_conv(pr, 0, 2, t, k=3))
    out = bn_act_conv("compression", 0, 2, jnp.concatenate(xl, -1))
    return out + bn_act_conv("shortcut", 0, 2, x)


# ---------------------------------------------------------------------------
# PyramidPooling, reference models/common.py:514-539
# ---------------------------------------------------------------------------


def init_pyramid_pooling(ini: Initializer, name: str, c_in: int) -> None:
    c_out = c_in // 4
    for i in (1, 2, 3, 4):
        init_conv(ini, f"{name}.conv{i}", c_in, c_out, 1)


def pyramid_pooling_feats(ctx: Ctx, name: str, x, k=(1, 2, 3, 6)):
    """PSP branches as a list (caller concats — or conv-splits over them).

    All pool sizes share one pass over ``x`` (adaptive_avg_pool_multi);
    the per-k loop re-read the 2 MB map four times (~20us at 1024x512)."""
    h, w = x.shape[1], x.shape[2]
    feats = [x]
    for i, f in enumerate(adaptive_avg_pool_multi(x, k), start=1):
        f = conv(ctx, f"{name}.conv{i}", f, 1)
        feats.append(resize_bilinear(f, (h, w), align_corners=True))
    return feats


def pyramid_pooling(ctx: Ctx, name: str, x, k=(1, 2, 3, 6)):
    return jnp.concatenate(pyramid_pooling_feats(ctx, name, x, k), -1)


# ---------------------------------------------------------------------------
# experimental.py blocks: GhostConv/GhostBottleneck/CrossConv/MixConv2d/Sum
# ---------------------------------------------------------------------------


def init_ghost_conv(ini: Initializer, name: str, c1: int, c2: int, k: int = 1) -> None:
    c_ = c2 // 2
    init_conv(ini, name + ".cv1", c1, c_, k)
    init_conv(ini, name + ".cv2", c_, c_, 5, g=c_)


def ghost_conv(ctx: Ctx, name: str, x, k: int = 1, s: int = 1, c2: int = 0,
               act: bool = True):
    c_ = c2 // 2
    y = conv(ctx, name + ".cv1", x, k, s, act=act)
    return jnp.concatenate([y, conv(ctx, name + ".cv2", y, 5, 1, g=c_, act=act)], -1)


def init_cross_conv(ini: Initializer, name: str, c1: int, c2: int, k: int = 3,
                    g: int = 1, e: float = 1.0) -> None:
    """reference models/experimental.py CrossConv: (1,k) then (k,1) convs."""
    c_ = int(c2 * e)
    init_conv(ini, name + ".cv1", c1, c_, (1, k))
    init_conv(ini, name + ".cv2", c_, c2, (k, 1), g=g)


def cross_conv(ctx: Ctx, name: str, x, c1: int, c2: int, k: int = 3,
               s: int = 1, g: int = 1, e: float = 1.0, shortcut: bool = False):
    y = conv(ctx, name + ".cv1", x, (1, k), (1, s))
    y = conv(ctx, name + ".cv2", y, (k, 1), (s, 1), g=g)
    return x + y if (shortcut and c1 == c2) else y


def init_mixconv2d(ini: Initializer, name: str, c1: int, c2: int,
                   k=(1, 3), s: int = 1, equal_ch: bool = True) -> None:
    """reference models/experimental.py MixConv2d: parallel convs with mixed
    kernel sizes over channel splits, then BN + LeakyReLU."""
    import numpy as np
    groups = len(k)
    if equal_ch:
        i = np.linspace(0, groups - 1e-6, c2).astype(int)
        c_ = [int((i == g).sum()) for g in range(groups)]
    else:
        b = [c2] + [0] * groups
        a = np.eye(groups + 1, groups, k=-1)
        a -= np.roll(a, 1, axis=1)
        a *= np.array(k) ** 2
        a[0] = 1
        c_ = np.linalg.lstsq(a, b, rcond=None)[0].round().astype(int).tolist()
    for g, (kk, cc) in enumerate(zip(k, c_)):
        ini.conv(f"{name}.m.{g}", c1, int(cc), kk, bias=False)
    ini.bn(name + ".bn", c2)


def mixconv2d(ctx: Ctx, name: str, x, k=(1, 3), s: int = 1):
    ys = []
    g = 0
    while f"{name}.m.{g}.weight" in ctx.p:
        ys.append(ctx.conv2d(f"{name}.m.{g}", x, k[g], s=s))
        g += 1
    y = jnp.concatenate(ys, -1)
    # post-concat BN is unfoldable — applied in fused mode too
    if name + ".bn.weight" in ctx.p:
        y = ctx.batch_norm(name + ".bn", y)
    return x + jax.nn.leaky_relu(y, 0.1)  # residual (reference :95)


def init_ghost_bottleneck(ini: Initializer, name: str, c1: int, c2: int,
                          k: int = 3, s: int = 1) -> None:
    """reference models/experimental.py GhostBottleneck."""
    c_ = c2 // 2
    init_ghost_conv(ini, name + ".conv.0", c1, c_, 1)
    if s == 2:
        init_conv(ini, name + ".conv.1", c_, c_, k, g=math.gcd(c_, c_))
    init_ghost_conv(ini, name + ".conv.2", c_, c2, 1)
    if s == 2:
        init_conv(ini, name + ".shortcut.0", c1, c1, k, g=math.gcd(c1, c1))
        init_conv(ini, name + ".shortcut.1", c1, c2, 1)


def ghost_bottleneck(ctx: Ctx, name: str, x, c1: int, c2: int, k: int = 3,
                     s: int = 1):
    c_ = c2 // 2
    y = ghost_conv(ctx, name + ".conv.0", x, 1, 1, c2=c_)
    if s == 2:
        y = conv(ctx, name + ".conv.1", y, k, s, g=c_, act=False)
    y = ghost_conv(ctx, name + ".conv.2", y, 1, 1, c2=c2, act=False)
    if s == 2:
        sc = conv(ctx, name + ".shortcut.0", x, k, s, g=c1, act=False)
        sc = conv(ctx, name + ".shortcut.1", sc, 1, 1, act=False)
        return y + sc
    return y + x if c1 == c2 else y


def init_sum(ini: Initializer, name: str, n: int, weight: bool = False) -> None:
    if weight:
        import numpy as np
        ini.params[name + ".w"] = jnp.asarray(
            -jnp.arange(1.0, n) / 2.0, jnp.float32)


def sum_layer(ctx: Ctx, name: str, xs, weight: bool = False):
    y = xs[0]
    if weight:
        w = jax.nn.sigmoid(ctx.p[name + ".w"]) * 2
        for i in range(len(xs) - 1):
            y = y + xs[i + 1] * w[i]
    else:
        for t in xs[1:]:
            y = y + t
    return y


def init_classify(ini: Initializer, name: str, c1: int, c2: int, k: int = 1,
                  g: int = 1) -> None:
    ini.conv(name + ".conv", c1, c2, k, groups=g, bias=True)


def classify(ctx: Ctx, name: str, x, k: int = 1, g: int = 1):
    xs = x if isinstance(x, (list, tuple)) else [x]
    z = jnp.concatenate([global_avg_pool(t) for t in xs], -1)
    y = ctx.conv2d(name + ".conv", z, k, g=g)
    return y.reshape(y.shape[0], -1)
