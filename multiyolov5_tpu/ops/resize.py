"""Resize / pooling primitives with exact PyTorch semantics, TPU-first.

Instead of gather-based interpolation, every resize here is expressed as a pair
of small dense matmuls (one per spatial axis).  On TPU the (H_out, H_in) weight
matrices ride the MXU and XLA fuses the surrounding elementwise work, which is
both faster and numerically exact.

Reference semantics reproduced (see reference multiyolov5):
  * ``F.interpolate(mode='bilinear', align_corners=True)`` — used by every
    segmentation head (reference models/yolo.py:57,111,118,143,163 etc.) and by
    the final mask upsample in detect.py:191.
  * ``F.interpolate(mode='nearest')`` — PAN upsamples (yolov5s_city_seg.yaml
    rows 11/15) and ASPP/RFB global branches (models/common.py:273).
  * ``nn.AdaptiveAvgPool2d(k)`` — PyramidPooling (models/common.py:521-524),
    SE attention global pools.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Interpolation matmuls must be exact: run them at full fp32 MXU precision.
_EXACT = jax.lax.Precision.HIGHEST

__all__ = [
    "bilinear_matrix",
    "resize_bilinear",
    "resize2x_argmax",
    "upsample_nearest",
    "adaptive_avg_pool",
    "global_avg_pool",
    "max_pool_same",
    "avg_pool",
]


@functools.lru_cache(maxsize=None)
def _bilinear_matrix_np(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) row-stochastic interpolation matrix."""
    w = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        w[:, 0] = 1.0
        return w
    if align_corners:
        if n_out == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    else:
        scale = n_in / n_out
        src = np.maximum((np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5, 0.0)
        src = np.minimum(src, n_in - 1)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, n_in - 2)
    frac = src - i0
    rows = np.arange(n_out)
    w[rows, i0] = (1.0 - frac).astype(np.float32)
    w[rows, i0 + 1] += frac.astype(np.float32)
    return w


def bilinear_matrix(n_in: int, n_out: int, align_corners: bool = True) -> jnp.ndarray:
    return jnp.asarray(_bilinear_matrix_np(n_in, n_out, align_corners))


@functools.lru_cache(maxsize=None)
def _up2x_phase_weights(n_in: int, align_corners: bool):
    """Per-phase 2-tap weights for exact 2x bilinear upsampling.

    For align_corners n -> 2n, src(o) = o*(n-1)/(2n-1); the floor index is
    k-1 for even outputs o=2k (k>=1) and k for odd outputs o=2k+1 — constant
    per phase — so the dense interpolation matmul (O(n) FLOPs per output)
    collapses to two shifted elementwise blends (O(1) per output).  Weights
    taken from the same matrix builder, so results are bit-identical.
    """
    m = _bilinear_matrix_np(n_in, 2 * n_in, align_corners)
    even = m[0::2]   # rows 2k: taps at (k-1, k)   [k=0: (0,)]
    odd = m[1::2]    # rows 2k+1: taps at (k, k+1) [k=n-1: (n-1,)]
    k = np.arange(n_in)
    w_e0 = even[k, np.maximum(k - 1, 0)]
    w_e1 = np.where(k == 0, 0.0, even[k, k]).astype(np.float32)
    w_e1[0] = even[0, 0]
    w_o0 = odd[k, k]
    w_o1 = np.where(k == n_in - 1, 0.0, odd[k, np.minimum(k + 1, n_in - 1)])
    w_o1 = w_o1.astype(np.float32)
    # k=0 even row has a single tap at 0; fold it into w_e1 and zero w_e0
    w_e0 = w_e0.astype(np.float32)
    w_e0[0] = 0.0
    return w_e0, w_e1, w_o0.astype(np.float32), w_o1


def _up2x_axis(x: jnp.ndarray, axis: int, align_corners: bool) -> jnp.ndarray:
    """Exact 2x bilinear upsample along one spatial axis (phase trick)."""
    n = x.shape[axis]
    w_e0, w_e1, w_o0, w_o1 = _up2x_phase_weights(n, align_corners)
    shape = [1] * x.ndim
    shape[axis] = n
    we0 = jnp.asarray(w_e0).reshape(shape).astype(x.dtype)
    we1 = jnp.asarray(w_e1).reshape(shape).astype(x.dtype)
    wo0 = jnp.asarray(w_o0).reshape(shape).astype(x.dtype)
    wo1 = jnp.asarray(w_o1).reshape(shape).astype(x.dtype)
    xm1 = jnp.concatenate([jax.lax.slice_in_dim(x, 0, 1, axis=axis),
                           jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis)
    xp1 = jnp.concatenate([jax.lax.slice_in_dim(x, 1, n, axis=axis),
                           jax.lax.slice_in_dim(x, n - 1, n, axis=axis)], axis)
    even = we0 * xm1 + we1 * x
    odd = wo0 * x + wo1 * xp1
    out = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return out.reshape(new_shape)


def _resize_axis_blocked(x: jnp.ndarray, axis: int, n_out: int,
                         align_corners: bool, prec, block: int = 256):
    """Banded interpolation matmul: the (n_out, n_in) bilinear matrix has
    bandwidth 2, so an output block of `block` rows only touches a narrow
    input window.  Blocking cuts both the matrix traffic and the matmul
    FLOPs by ~n_out/block vs the dense einsum, with identical results (the
    excluded columns are exact zeros)."""
    n_in = x.shape[axis]
    m = _bilinear_matrix_np(n_in, n_out, align_corners)
    eq = "oh,bhwc->bowc" if axis == 1 else "ow,bhwc->bhoc"
    chunks = []
    for o0 in range(0, n_out, block):
        rows = m[o0:o0 + block]
        nz = np.nonzero(rows.any(0))[0]
        lo, hi = int(nz[0]), int(nz[-1]) + 1
        sub = jnp.asarray(rows[:, lo:hi]).astype(x.dtype)
        xs = jax.lax.slice_in_dim(x, lo, hi, axis=axis)
        y = jnp.einsum(eq, sub, xs, precision=prec,
                       preferred_element_type=jnp.float32)
        chunks.append(y.astype(x.dtype))
    return jnp.concatenate(chunks, axis)


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool = True) -> jnp.ndarray:
    """Bilinear resize of NHWC ``x`` to (H_out, W_out), exact torch semantics.

    fp32 inputs use full-precision MXU passes (bit-exact vs torch — the parity
    and eval paths).  bf16 inputs ride the fast bf16 MXU with fp32
    accumulation — interpolation weights round to bf16 (<0.4% error), which is
    noise relative to bf16 activations themselves.  Exact-2x upsamples take a
    phase-decomposed elementwise path (no matmul at all).
    """
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    b, h, w, c = x.shape
    dt = x.dtype
    if h == h_out and w == w_out:
        return x
    fast = dt == jnp.bfloat16
    xf = x if fast else x.astype(jnp.float32)
    prec = None if fast else _EXACT
    # NOTE: a phase-decomposed O(1)-tap path for exact-2x upsampling
    # (_up2x_axis) was benchmarked and LOST to the dense matmul on TPU
    # (1.6-3.7ms vs 1.1ms at 1024x2048x19): the elementwise interleave
    # generates layout-hostile memory patterns while the "wasteful" dense
    # interpolation matmul rides the MXU.  Kept for reference/tests.
    if h != h_out:
        if h_out >= 512 and h_out > h:
            xf = _resize_axis_blocked(xf, 1, h_out, align_corners, prec)
        else:
            mh = bilinear_matrix(h, h_out, align_corners).astype(xf.dtype)
            xf = jnp.einsum("oh,bhwc->bowc", mh, xf, precision=prec,
                            preferred_element_type=jnp.float32)
            xf = xf.astype(dt) if fast else xf
    if w != w_out:
        if w_out >= 512 and w_out > w:
            xf = _resize_axis_blocked(xf, 2, w_out, align_corners, prec)
        else:
            mw = bilinear_matrix(w, w_out, align_corners).astype(xf.dtype)
            xf = jnp.einsum("ow,bhwc->bhoc", mw, xf, precision=prec,
                            preferred_element_type=jnp.float32)
    return xf.astype(dt)


def _phase_blend(x: jnp.ndarray, axis: int, align_corners: bool):
    """Even/odd-phase 2-tap blends for exact 2x upsampling along ``axis``
    (same weights as the interpolation matmul; see _up2x_phase_weights)."""
    n = x.shape[axis]
    w_e0, w_e1, w_o0, w_o1 = _up2x_phase_weights(n, align_corners)
    shape = [1] * x.ndim
    shape[axis] = n
    we0 = jnp.asarray(w_e0).reshape(shape).astype(x.dtype)
    we1 = jnp.asarray(w_e1).reshape(shape).astype(x.dtype)
    wo0 = jnp.asarray(w_o0).reshape(shape).astype(x.dtype)
    wo1 = jnp.asarray(w_o1).reshape(shape).astype(x.dtype)
    xm1 = jnp.concatenate([jax.lax.slice_in_dim(x, 0, 1, axis=axis),
                           jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis)
    xp1 = jnp.concatenate([jax.lax.slice_in_dim(x, 1, n, axis=axis),
                           jax.lax.slice_in_dim(x, n - 1, n, axis=axis)], axis)
    return we0 * xm1 + we1 * x, wo0 * x + wo1 * xp1


def resize2x_argmax(x: jnp.ndarray, align_corners: bool = True) -> jnp.ndarray:
    """``argmax_c(resize_bilinear(x, (2H, 2W)))`` without materializing the
    upsampled logits (the detect.py:191-193 mask path at Cityscapes sizes
    would materialize 2048x1024x19 — 19x more HBM traffic than needed).

    Phase-decompose both axes into even/odd 2-tap blends, argmax each of the
    four phase maps over C (XLA fuses the elementwise blends into the
    reduce, so the full-res logits never hit HBM), then interleave the four
    small integer index maps.

    Status: 2x faster than argmax(resize_bilinear()) as a standalone op
    (0.77 vs 1.42 ms at 1024x512x19 bf16), but A/B'd INSIDE the full detect
    pipeline it LOSES (1.66 vs 1.56 ms/frame) — in the larger graph XLA
    already overlaps the banded matmuls while this path's stack/reshape
    interleaves add layout copies.  Kept (with exactness tests) for
    standalone mask workloads; the engine/eval paths use the matmul form."""
    b, h, w, c = x.shape
    he, ho = _phase_blend(x, 1, align_corners)
    ee, eo = _phase_blend(he, 2, align_corners)
    oe, oo = _phase_blend(ho, 2, align_corners)
    row_e = jnp.stack([jnp.argmax(ee, -1), jnp.argmax(eo, -1)], -1)
    row_o = jnp.stack([jnp.argmax(oe, -1), jnp.argmax(oo, -1)], -1)
    out = jnp.stack([row_e.reshape(b, h, 2 * w),
                     row_o.reshape(b, h, 2 * w)], 2)
    return out.reshape(b, 2 * h, 2 * w)


def upsample_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Nearest 2x/4x... upsample (torch ``nn.Upsample(mode='nearest')``)."""
    x = jnp.repeat(x, scale, axis=1)
    x = jnp.repeat(x, scale, axis=2)
    return x


def resize_nearest(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Nearest resize to arbitrary size (torch F.interpolate nearest).

    torch maps dst index i -> src index floor(i * n_in / n_out).
    """
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    b, h, w, c = x.shape
    if h == h_out and w == w_out:
        return x
    hi = np.floor(np.arange(h_out) * (h / h_out)).astype(np.int32)
    wi = np.floor(np.arange(w_out) * (w / w_out)).astype(np.int32)
    return x[:, hi][:, :, wi]


@functools.lru_cache(maxsize=None)
def _adaptive_pool_matrix_np(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) averaging matrix with torch AdaptiveAvgPool bin edges."""
    w = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_out):
        lo = (i * n_in) // n_out
        hi = -(-((i + 1) * n_in) // n_out)  # ceil
        w[i, lo:hi] = 1.0 / (hi - lo)
    return w


def adaptive_avg_pool(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """``nn.AdaptiveAvgPool2d`` on NHWC input."""
    if isinstance(out_hw, int):
        out_hw = (out_hw, out_hw)
    h_out, w_out = out_hw
    b, h, w, c = x.shape
    dt = x.dtype
    xf = x.astype(jnp.float32)
    if h_out == 1 and w_out == 1:
        return jnp.mean(xf, axis=(1, 2), keepdims=True).astype(dt)
    mh = jnp.asarray(_adaptive_pool_matrix_np(h, h_out))
    mw = jnp.asarray(_adaptive_pool_matrix_np(w, w_out))
    xf = jnp.einsum("oh,bhwc->bowc", mh, xf, precision=_EXACT)
    xf = jnp.einsum("ow,bhwc->bhoc", mw, xf, precision=_EXACT)
    return xf.astype(dt)


def adaptive_avg_pool_multi(x: jnp.ndarray, ks) -> list:
    """``[adaptive_avg_pool(x, k) for k in ks]`` with ONE pass over ``x``.

    The naive per-k loop reads the full feature map once per pool size
    (the PSP pyramid's four pools cost ~20us at 1024x512, dominated by
    re-streaming the 2 MB map); stacking the row-averaging matrices makes
    the row reduction a single read, and the per-k column reductions then
    run on (sum(ks), W) intermediates — negligible.  Exact same bin-edge
    math as ``adaptive_avg_pool`` (torch AdaptiveAvgPool2d semantics)."""
    ks = [(k, k) if isinstance(k, int) else k for k in ks]
    b, h, w, c = x.shape
    dt = x.dtype
    mh_all = np.concatenate([_adaptive_pool_matrix_np(h, kh)
                             for kh, _ in ks], axis=0)
    if dt == jnp.bfloat16:
        # bf16 fast path: the row reduction is the one pass over the full
        # map (the f32-converted EXACT dot cost ~19us/frame at 1024x512,
        # 3-6 MXU passes + a 4 MB f32 materialization).  torch bin weights
        # are uniform 1/binsize per row, so contract with the exact 0/1
        # indicator in native bf16 (f32 accumulation — the sum of bf16
        # values is exact) and apply the 1/binsize scale once in f32:
        # same math as the f32 path up to one f32 rounding per output.
        ind = (mh_all > 0).astype(np.float32)
        t = jnp.einsum("oh,bhwc->bowc", jnp.asarray(ind, dt), x,
                       preferred_element_type=jnp.float32)
        t = t * jnp.asarray(mh_all.max(axis=1))[None, :, None, None]
    else:
        t = jnp.einsum("oh,bhwc->bowc", jnp.asarray(mh_all),
                       x.astype(jnp.float32), precision=_EXACT)
    outs, off = [], 0
    for kh, kw in ks:
        ti = jax.lax.slice_in_dim(t, off, off + kh, axis=1)
        off += kh
        mw = jnp.asarray(_adaptive_pool_matrix_np(w, kw))
        outs.append(jnp.einsum("ow,bhwc->bhoc", mw, ti,
                               precision=_EXACT).astype(dt))
    return outs


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def max_pool_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Stride-1 same-padding max pool (SPP, reference models/common.py:170).

    Separable (rows then columns): the forward max is identical, and the
    backward becomes two 1-D select_and_scatters (2k window taps instead of
    k^2) — the monolithic 13x13 select_and_scatter cost 15 ms/step of the
    dual-task training step.  Gradient tie-routing can differ from the 2-D
    form on exactly-equal window values, same as any argmax tie-break.
    """
    import jax.lax as lax

    pad = k // 2
    # -inf init is required for reduce_window-max to have a defined VJP
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    y = lax.reduce_window(
        x, neg, lax.max,
        window_dimensions=(1, k, 1, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (0, 0), (0, 0)),
    )
    return lax.reduce_window(
        y, neg, lax.max,
        window_dimensions=(1, 1, k, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (pad, pad), (0, 0)),
    )


def avg_pool(x: jnp.ndarray, k: int, s: int, pad: int) -> jnp.ndarray:
    """torch ``nn.AvgPool2d(k, s, pad)`` with count_include_pad=True (DAPPM)."""
    import jax.lax as lax

    summed = lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, s, s, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return (summed / float(k * k)).astype(x.dtype)
