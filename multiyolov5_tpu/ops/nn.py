"""Functional NN primitives over flat param pytrees (TPU-native, NHWC).

Design notes
------------
* Parameters live in a *flat* ``dict[str, jnp.ndarray]`` whose keys mirror the
  reference PyTorch ``state_dict`` names (e.g. ``model.4.cv1.conv.weight``).
  This makes the ``.pt`` checkpoint bridge a pure layout transform and keeps
  optimizer param-group selection (weights / BN gains / biases, reference
  train.py:121-137) a key-pattern match.
* Conv weights are stored HWIO (TPU-native); the bridge transposes from torch
  OIHW.  Activations are NHWC throughout.
* BatchNorm running statistics live in a separate flat ``state`` dict (same
  key prefixes).  Training-mode BN computes moments over the *global* batch:
  under pjit data-parallel sharding XLA lowers the mean over the sharded batch
  axis to a cross-chip psum, so SyncBN (reference train.py:191-193) is the
  default semantics here rather than an opt-in wrapper.
* A :class:`Ctx` object carries (params, state, train-flag, rng); block
  functions read like the reference modules but are pure.
"""

from __future__ import annotations

import math
import os as _os
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]

BN_EPS = 1e-3      # reference utils/torch_utils.py initialize_weights
BN_MOMENTUM = 0.03

try:  # parsed once at import; malformed values fall back to the default
    _TRAIN_DOT1X1_MAXC = int(_os.environ.get("MULTIYOLOV5_TRAIN_DOT1X1_MAXC",
                                             64))
except ValueError:
    _TRAIN_DOT1X1_MAXC = 64

# -- analytic FLOP accounting -------------------------------------------------
# When a counter is active (utils/profiling.estimate_gflops runs the forward
# under jax.eval_shape with one installed), every conv path below records its
# MACs from the *actual* input/output shapes at that point in the graph —
# unlike pricing weights at their row's output stride, which was ~10x wrong
# for the seg heads (their convs run at stride 8 but the row output is
# stride 1 after the x8 upsample).  Reference: utils/torch_utils.py:205-226
# (thop-based model_info).

_MACS: Optional[list] = None


class count_macs:
    """Context manager installing a MAC counter; yields a 1-elem list."""

    def __enter__(self):
        global _MACS
        self._prev = _MACS
        _MACS = [0]
        return _MACS

    def __exit__(self, *exc):
        global _MACS
        _MACS = self._prev
        return False


def _add_macs(n: int) -> None:
    if _MACS is not None:
        _MACS[0] += int(n)


def autopad(k, p=None, d: int = 1):
    """'same' padding for odd kernels (reference models/common.py:22-27).
    Accepts int or (kh, kw)."""
    if p is not None:
        return p
    if isinstance(k, (tuple, list)):
        return tuple(d * (kk - 1) // 2 for kk in k)
    return d * (k - 1) // 2


def _pair(k):
    return tuple(k) if isinstance(k, (tuple, list)) else (k, k)


def make_divisible(x: float, divisor: int = 8) -> int:
    """reference utils/general.py make_divisible (ceil to multiple)."""
    return int(math.ceil(x / divisor) * divisor)


# ---------------------------------------------------------------------------
# Initialization (matches torch defaults so scratch training is comparable)
# ---------------------------------------------------------------------------


class Initializer:
    """Builds a flat param/state dict with torch-default initialization."""

    def __init__(self, seed: int = 0):
        self.params: Params = {}
        self.state: Params = {}
        self._rng = np.random.RandomState(seed)

    def conv(self, name: str, c_in: int, c_out: int, k, groups: int = 1,
             bias: bool = False) -> None:
        """torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5))."""
        kh, kw = _pair(k)
        fan_in = (c_in // groups) * kh * kw
        gain = math.sqrt(2.0 / (1 + 5.0))  # leaky_relu gain with a=sqrt(5)
        bound = gain * math.sqrt(3.0 / fan_in)
        w = self._rng.uniform(-bound, bound, size=(kh, kw, c_in // groups, c_out))
        # host numpy throughout: eager jnp.* here would dispatch one tiny
        # device op (and often a fresh compile) per parameter — ~19 minutes
        # of Engine construction through the axon tunnel.  Callers
        # jax.device_put the finished tree once.
        self.params[name + ".weight"] = np.asarray(w, np.float32)
        if bias:
            b_bound = 1.0 / math.sqrt(fan_in)
            b = self._rng.uniform(-b_bound, b_bound, size=(c_out,))
            self.params[name + ".bias"] = np.asarray(b, np.float32)

    def bn(self, name: str, c: int) -> None:
        self.params[name + ".weight"] = np.ones((c,), np.float32)
        self.params[name + ".bias"] = np.zeros((c,), np.float32)
        self.state[name + ".running_mean"] = np.zeros((c,), np.float32)
        self.state[name + ".running_var"] = np.ones((c,), np.float32)

    def buffer(self, name: str, value) -> None:
        self.state[name] = np.asarray(value, np.float32)


# ---------------------------------------------------------------------------
# Apply-time context
# ---------------------------------------------------------------------------


class LazyCat:
    """Virtual channel-concat of feature maps at mixed resolutions.

    Represents ``concat([resize(p, out_hw) for p in parts], -1)`` without
    materializing the upsampled parts or the concatenated map.  A 1x1 conv
    consuming it is rewritten with the linear-commute identity

        conv1x1(concat(up(a), b)) == up(conv1x1_Wa(a)) + conv1x1_Wb(b)

    (exact for any *linear* resize — nearest and bilinear both are), so the
    channel-mixing dot runs at each part's native resolution (4x/16x fewer
    MACs for the x2/x4-upsampled parts) and the wide concat never hits HBM.
    Device-true on the m-width PSP pipeline the materialized form cost
    ~90us/frame in nearest-neck upsamples + 3-scale head concats alone.

    Parts are ``(tensor, resize)`` with ``resize`` either ``1`` (already at
    ``out_hw``) or the target implied by ``out_hw``.  Consumers that can't
    split (non-1x1 convs, pooling, ...) call :meth:`materialize`, which
    reproduces the plain upsample+concat graph exactly.
    """

    def __init__(self, parts, out_hw, mode: str = "nearest",
                 align_corners: bool = True):
        self.parts = list(parts)          # [(B,h,w,c) jnp arrays]
        self.out_hw = (int(out_hw[0]), int(out_hw[1]))
        self.mode = mode
        self.align_corners = align_corners

    @property
    def shape(self):
        b = self.parts[0].shape[0]
        c = sum(int(t.shape[-1]) for t in self.parts)
        return (b, self.out_hw[0], self.out_hw[1], c)

    @property
    def ndim(self):
        return 4

    @property
    def dtype(self):
        return self.parts[0].dtype

    def _resize(self, t):
        if (t.shape[1], t.shape[2]) == self.out_hw:
            return t
        from .resize import resize_bilinear, resize_nearest, upsample_nearest
        if self.mode == "nearest":
            sh = self.out_hw[0] // t.shape[1]
            if (t.shape[1] * sh, t.shape[2] * sh) == self.out_hw:
                return upsample_nearest(t, sh)
            return resize_nearest(t, self.out_hw)
        return resize_bilinear(t, self.out_hw, self.align_corners)

    def materialize(self) -> jnp.ndarray:
        ys = [self._resize(t) for t in self.parts]
        return ys[0] if len(ys) == 1 else jnp.concatenate(ys, -1)


def concrete(x):
    """Materialize ``x`` if it is a :class:`LazyCat` (lists map over)."""
    if isinstance(x, LazyCat):
        return x.materialize()
    if isinstance(x, (list, tuple)):
        return type(x)(concrete(t) for t in x)
    return x


@dataclass
class Ctx:
    """Carries params/state through a functional forward pass."""

    p: Params
    s: Params
    train: bool = False
    fused: bool = False              # params were BN-folded (inference fast path)
    rng: Optional[jax.Array] = None  # dropout rng (train only)
    new_state: Params = field(default_factory=dict)
    compute_dtype: jnp.dtype = jnp.float32
    pre_s2d: bool = False            # input already space-to-depth'd (stem)
    seg_up: bool = True              # False: seg heads return 1/8-res logits
                                     # PLANAR (B,C,h,w) — the app fuses
                                     # up8+up-to-frame+argmax from the planes
    dot1x1: bool = False             # route 1x1 convs via dot_general
                                     # (layout-severing; set regionally)
    pallas3x3: bool = False          # route eligible 3x3/s1 convs through
                                     # the Pallas conv kernel (set regionally)

    def next_rng(self) -> Optional[jax.Array]:
        if self.rng is None:
            return None
        self.rng, sub = jax.random.split(self.rng)
        return sub

    # -- primitives ---------------------------------------------------------

    def conv2d(self, name: str, x: jnp.ndarray, k, s=1,
               p=None, g: int = 1, d: int = 1,
               out_nchw: bool = False, act: bool = False) -> jnp.ndarray:
        """NHWC conv.  ``out_nchw=True`` makes XLA write the result planar
        (B, C, H, W) in the conv epilogue — used by the seg heads' final
        logit conv so the fused mask kernel gets contiguous per-class
        planes (an NHWC->planar relayout after the fact costs ~0.2 ms).
        ``act=True`` applies SiLU — on the dot1x1 path this happens in the
        flattened domain so XLA keeps it in the dot's epilogue (a separate
        post-reshape SiLU becomes its own ~3-7us HBM round-trip per conv)."""
        w = self.p[name + ".weight"].astype(x.dtype)
        # train-mode narrow 1x1s also route through the dot form: XLA's
        # weight-gradient for a 32/64-channel 1x1 conv is a pathological
        # skinny contraction (~0.35 ms/step each for the layer-2 C3's 1x1s
        # at bs8/832px, traced round 3); the dot's dW is a plain big-K
        # matmul.  Opt-out knob for A/Bs.
        train_dot = (self.train and k == 1 and x.ndim == 4
                     and x.shape[-1] <= _TRAIN_DOT1X1_MAXC
                     and not _os.environ.get("MULTIYOLOV5_NO_TRAIN_DOT1X1"))
        if ((getattr(self, "dot1x1", False) and not self.train and self.fused
                and not out_nchw and x.ndim == 4
                and k == 1 and s == 1 and g == 1 and d == 1)
                or (train_dot and s == 1 and g == 1 and d == 1
                    and not out_nchw)):
            # 1x1 conv as a dot_general over (B*H*W, C)-flattened pixels.
            # At serving batch sizes XLA assigns batch-1 1x1 convs a
            # T(2,128) {3,0,2,1} tiling and propagates it through the
            # trunk (then pays relayout copies back); the flattening
            # reshape is free only in the default layout, anchoring the
            # whole region to clean T(8,128) tiles — the same severing
            # trick as the planar detect/seg-logit heads (models/heads.py).
            bsz, hh, ww, ci = x.shape
            _add_macs(bsz * hh * ww * ci * w.shape[-1])
            y = jax.lax.dot_general(
                x.reshape(bsz * hh * ww, ci), w.reshape(ci, -1),
                (((1,), (0,)), ((), ())), preferred_element_type=x.dtype)
            b = self.p.get(name + ".bias")
            if b is not None:
                y = y + b.astype(y.dtype)
            if act:
                y = jax.nn.silu(y)
            return y.reshape(bsz, hh, ww, -1)
        # train-mode narrow 3x3s as column-packed tap dots (the pure-XLA
        # differentiable form of ops/pallas/c3_kernel's packed conv).
        # OPT-IN ONLY: A/B'd 35.2 -> 41.0 ms/step on the dual-task bench —
        # unlike the 1x1 dot route above, the 9-tap form's pad/reshape
        # boundaries plus its ~3.6x MAC padding waste cost more than XLA's
        # narrow conv emitters here.  Kept for future A/Bs on other
        # geometries (same math up to f32 tap reassociation).
        if (self.train and k == 3 and s == 1 and g == 1 and x.ndim == 4
                and not out_nchw and p is None and x.shape[-1] <= 64
                and _os.environ.get("MULTIYOLOV5_TRAIN_PACK3X3")
                and w.shape[0] == 3 and w.shape[1] == 3):
            from .pallas.c3_kernel import _pack_w33, packed_q_for
            q = packed_q_for(x.shape[-1], x.shape[2], d)
            if q > 1:
                bsz, hh, ww, ci = x.shape
                co = w.shape[-1]
                _add_macs(bsz * hh * ww * 9 * ci * co)
                cpq = ww // q
                cpp = -(-(cpq + 2) // 8) * 8
                xq = x.reshape(bsz, hh, cpq, q * ci)
                xq = jax.lax.dynamic_update_slice(
                    jnp.zeros((bsz, hh + 2 * d, cpp, q * ci), x.dtype), xq,
                    (0, d, 1, 0))
                w33 = _pack_w33(w, q, ci, co, d)
                acc = None
                for dy in range(3):
                    plane = xq[:, dy * d:dy * d + hh]
                    for tap in range(3):
                        m = plane[:, :, tap:tap + cpq, :].reshape(
                            bsz * hh * cpq, q * ci)
                        part = jax.lax.dot_general(
                            m, w33[dy, tap], (((1,), (0,)), ((), ())),
                            preferred_element_type=x.dtype)
                        acc = part if acc is None else acc + part
                b = self.p.get(name + ".bias")
                if b is not None:
                    acc = acc + jnp.tile(b, q).astype(acc.dtype)
                if act:
                    acc = jax.nn.silu(acc)
                return acc.reshape(bsz, hh, ww, co)
        ph, pw = _pair(autopad(k, p, d))
        sh, sw = _pair(s)
        y = jax.lax.conv_general_dilated(
            x, w,
            window_strides=(sh, sw),
            padding=((ph, ph), (pw, pw)),
            rhs_dilation=(d, d),
            feature_group_count=g,
            dimension_numbers=("NHWC", "HWIO", "NCHW" if out_nchw else "NHWC"),
            preferred_element_type=x.dtype,
        )
        oh, ow = (y.shape[2], y.shape[3]) if out_nchw else (y.shape[1], y.shape[2])
        _add_macs(y.shape[0] * oh * ow * int(np.prod(w.shape)))
        b = self.p.get(name + ".bias")
        if b is not None:
            b = b.astype(y.dtype)
            y = y + (b[:, None, None] if out_nchw else b)
        return jax.nn.silu(y) if act else y

    def batch_norm(self, name: str, x: jnp.ndarray,
                   phases: int = 1) -> jnp.ndarray:
        """BN over NHWC channels.  ``phases=k`` treats the channel dim as k
        phase-packed copies of the stored C channels (ops/stem
        stem_train_apply): moments are computed per packed channel then
        averaged across phases — the packed layout is a spatial
        re-arrangement, so the multiset (hence the statistics) is identical
        to BN on the unpacked map — and scale/shift are tiled back."""
        gamma = self.p[name + ".weight"]
        beta = self.p[name + ".bias"]
        if self.train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            ex2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            if phases > 1:
                mean = mean.reshape(phases, -1).mean(0)
                ex2 = ex2.reshape(phases, -1).mean(0)
            var = ex2 - jnp.square(mean)
            n = x.shape[0] * x.shape[1] * x.shape[2] * phases
            # torch updates running_var with the *unbiased* batch variance.
            unbiased = var * (n / max(n - 1, 1))
            self.new_state[name + ".running_mean"] = (
                (1 - BN_MOMENTUM) * self.s[name + ".running_mean"] + BN_MOMENTUM * mean)
            self.new_state[name + ".running_var"] = (
                (1 - BN_MOMENTUM) * self.s[name + ".running_var"] + BN_MOMENTUM * unbiased)
        else:
            mean = self.s[name + ".running_mean"]
            var = self.s[name + ".running_var"]
        scale = (gamma * jax.lax.rsqrt(var + BN_EPS)).astype(x.dtype)
        shift = (beta - mean * gamma * jax.lax.rsqrt(var + BN_EPS)).astype(x.dtype)
        if phases > 1:
            scale = jnp.tile(scale, phases)
            shift = jnp.tile(shift, phases)
        return x * scale + shift

    def conv1x1_lazycat(self, cname: str, lc: "LazyCat",
                        act: bool = True) -> jnp.ndarray:
        """1x1 conv over a :class:`LazyCat`: per-part channel-mix at the
        part's native resolution, resize-after, sum, then bias + SiLU once
        at full res (the act must see the complete sum).  Exact linear
        commute with the materialized concat up to float reassociation."""
        w = self.p[cname + ".weight"]
        w2 = w.reshape(w.shape[-2], w.shape[-1])
        h_out, w_out = lc.out_hw
        y = None
        off = 0
        for t in lc.parts:
            ci = int(t.shape[-1])
            wi = jax.lax.slice_in_dim(w2, off, off + ci, axis=0).astype(t.dtype)
            off += ci
            bsz, hh, ww, _ = t.shape
            _add_macs(bsz * hh * ww * ci * w2.shape[-1])
            if getattr(self, "dot1x1", False):
                yi = jax.lax.dot_general(
                    t.reshape(bsz * hh * ww, ci), wi,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=t.dtype).reshape(bsz, hh, ww, -1)
            else:
                yi = jax.lax.conv_general_dilated(
                    t, wi[None, None], window_strides=(1, 1), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=t.dtype)
            yi = lc._resize(yi)
            y = yi if y is None else y + yi
        b = self.p.get(cname + ".bias")
        if b is not None:
            y = y + b.astype(y.dtype)
        return jax.nn.silu(y) if act else y

    def conv_bn_act(self, name: str, x: jnp.ndarray, k: int = 1, s: int = 1,
                    p: Optional[int] = None, g: int = 1, d: int = 1,
                    act: bool = True) -> jnp.ndarray:
        """reference models/common.py Conv: conv(bias=False) + BN + SiLU.

        When ``self.fused`` the BN has been folded into ``<name>.conv`` as a
        bias (reference utils/torch_utils.py:182-202 fuse_conv_and_bn) and the
        BN apply is skipped entirely (reference Conv.fuseforward).
        """
        if isinstance(x, LazyCat):
            if (self.fused and not self.train and k == 1 and s == 1
                    and g == 1 and d == 1):
                return self.conv1x1_lazycat(name + ".conv", x, act=bool(act))
            x = x.materialize()
        # pallas_s2 routes ONLY stride-2 3x3s through the Pallas kernel —
        # used for the backbone downsamples at serving batch sizes, where
        # chaining custom calls (packed-C3 -> s2 conv) keeps the region in
        # the default layout and avoids XLA's {3,0,2,1} relayout copies at
        # the kernel boundary (generic s1 3x3s stay XLA there: the plain
        # im2col kernel loses on narrow-channel maps, see ops/pallas/
        # c3_kernel.py docstring)
        p3 = getattr(self, "pallas3x3", False) or (
            s == 2 and getattr(self, "pallas_s2", False))
        if (p3 and self.fused
                and not self.train and k == 3 and s in (1, 2) and g == 1
                and p is None and x.ndim == 4 and x.shape[-1] % 8 == 0
                and (s == 1 or (x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                                and d == 1))
                and x.shape[1] * x.shape[2] * x.shape[-1] <= (1 << 22)
                and jax.default_backend() == "tpu"):
            w = self.p[name + ".conv.weight"]
            if w.shape[0] == 3 and w.shape[1] == 3:
                from .pallas.conv3x3_kernel import (conv3x3_silu_pallas,
                                                    conv3x3s2_silu_pallas)
                b = self.p.get(name + ".conv.bias")
                if b is None:
                    b = jnp.zeros((w.shape[-1],), jnp.float32)
                _add_macs(x.shape[0] * (x.shape[1] // s) * (x.shape[2] // s)
                          * int(np.prod(w.shape)))
                if s == 2:
                    return conv3x3s2_silu_pallas(x, w, b, act=bool(act))
                from .pallas.c3_kernel import (conv3x3_packed_pallas,
                                               packed_q_for)
                q = packed_q_for(x.shape[-1], x.shape[2], d)
                if q > 1:
                    return conv3x3_packed_pallas(x, w, b, q=q, d=d,
                                                 act=bool(act))
                return conv3x3_silu_pallas(x, w, b, d=d, act=bool(act))
        if self.fused:
            return self.conv2d(name + ".conv", x, k, s, p, g, d,
                               act=bool(act))
        y = self.conv2d(name + ".conv", x, k, s, p, g, d)
        y = self.batch_norm(name + ".bn", y)
        return jax.nn.silu(y) if act else y

    def conv_bn_act_split(self, name: str, parts, k: int = 1,
                          act: bool = True) -> jnp.ndarray:
        """``conv_bn_act`` over a *virtual* channel-concat of ``parts``.

        conv(concat(xs), W) == sum_i conv(xs[i], W[:, :, off_i:off_i+c_i, :])
        algebraically; numerically each partial conv is rounded to the
        compute dtype before summation, so results can differ from the
        single conv's one-rounding accumulation by ~1 ulp per part (most
        visible under bf16).  The concatenated activation never
        materializes.  XLA lays
        out wide channel concats poorly (the PSP PyramidPooling concat costs
        ~0.15 ms at 1024x512, a quarter of the whole forward); the partial
        convs fuse into their producers instead."""
        w = self.p[name + ".conv.weight"]
        # Coalesce narrow consecutive parts into >=128-channel groups first:
        # XLA lowers a 32-channel 3x3 partial conv ~6x off the MXU floor
        # (the starved K dim under-fills the systolic array), so the PSP
        # FFM's [128, 32, 32, 32, 32] split cost 90us device-true at
        # 1024x512.  Two 128-channel convs over [main, concat(branches)]
        # run in ~30us; the 4x32 branch concat is 2 MB -- cheap, unlike the
        # full 256-channel one (~60us materialized).  A Pallas im2col
        # kernel for the fused pair was A/B'd at 50.6us and rejected: XLA's
        # conv emitter wins once every part is lane-wide.
        groups, cur, cur_c = [], [], 0
        for part in parts:
            cur.append(part)
            cur_c += part.shape[-1]
            if cur_c >= 128:
                groups.append(cur[0] if len(cur) == 1 else
                              jnp.concatenate(cur, -1))
                cur, cur_c = [], 0
        if cur:
            groups.append(cur[0] if len(cur) == 1 else
                          jnp.concatenate(cur, -1))
        parts = groups
        ph, pw = _pair(autopad(k, None, 1))
        _add_macs(parts[0].shape[0] * parts[0].shape[1] * parts[0].shape[2]
                  * int(np.prod(w.shape)))
        y = None
        off = 0
        for part in parts:
            ci = part.shape[-1]
            wi = jax.lax.slice_in_dim(w, off, off + ci, axis=2)
            off += ci
            yi = jax.lax.conv_general_dilated(
                part, wi.astype(part.dtype), window_strides=(1, 1),
                padding=((ph, ph), (pw, pw)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=part.dtype)
            y = yi if y is None else y + yi
        b = self.p.get(name + ".conv.bias")
        if b is not None:
            y = y + b.astype(y.dtype)
        if not self.fused:
            y = self.batch_norm(name + ".bn", y)
        return jax.nn.silu(y) if act else y

    def conv2d_bn_act(self, cname: str, bname: str, x: jnp.ndarray, k: int,
                      d: int = 1, act: bool = True) -> jnp.ndarray:
        """Bare nn.Conv2d + nn.BatchNorm2d + SiLU triple used inside
        RFB/ASPP Sequentials (reference models/common.py:242-255 etc.)."""
        y = self.conv2d(cname, x, k, s=1, d=d)
        if not self.fused:
            y = self.batch_norm(bname, y)
        return jax.nn.silu(y) if act else y

    def dropout(self, x: jnp.ndarray, rate: float) -> jnp.ndarray:
        if not self.train or rate <= 0.0:
            return x
        rng = self.next_rng()
        if rng is None:
            return x
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def fuse_conv_bn(params: Params, state: Params) -> Params:
    """Fold every conv-following ``<p>.bn`` into ``<p>.conv``, producing
    inference params.

    Same math as reference utils/torch_utils.py:182-202 (fuse_conv_and_bn):
      w' = w * gamma / sqrt(var + eps);  b' = beta - gamma * mean / sqrt(var+eps)
    BNs with no preceding conv sibling (BottleneckCSP/MixConv2d post-concat
    BNs, DAPPM's pre-activation BNs) are NOT foldable and keep their params —
    the forward applies them from running stats even in fused mode, and
    Engine keeps their running_ state (it drops stats only for folded BNs).
    """
    fused: Params = dict(params)
    bn_prefixes = sorted({k[: -len(".running_mean")] for k in state if k.endswith(".running_mean")})
    for bn in bn_prefixes:
        # numpy math: this runs at load time, per layer — eager device ops
        # through the axon tunnel would compile per unique shape
        gamma = np.asarray(params[bn + ".weight"])
        beta = np.asarray(params[bn + ".bias"])
        mean = np.asarray(state[bn + ".running_mean"])
        var = np.asarray(state[bn + ".running_var"])
        scale = gamma / np.sqrt(var + BN_EPS)
        # The conv owning this BN: reference Conv uses '<x>.conv'/'<x>.bn';
        # bare Sequentials use numeric siblings ('m.1.0' conv / 'm.1.1' bn).
        if bn.endswith(".bn"):
            conv = bn[: -len(".bn")] + ".conv"
        else:
            head, _, idx = bn.rpartition(".")
            conv = f"{head}.{int(idx) - 1}" if idx.isdigit() else ""
        wkey = conv + ".weight"
        w = fused.get(wkey)
        if w is None or w.ndim != 4 or w.shape[3] != gamma.shape[0]:
            continue  # standalone / pre-activation BN: not foldable
        fused[wkey] = np.asarray(w) * scale.reshape(1, 1, 1, -1)
        prev_b = fused.pop(conv + ".bias", None)
        b = beta - mean * scale
        if prev_b is not None:
            b = b + np.asarray(prev_b) * scale
        fused[conv + ".bias"] = b
        del fused[bn + ".weight"], fused[bn + ".bias"]
    return fused
