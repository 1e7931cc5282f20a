"""Pallas TPU kernel: fused bilinear-upsample + softmax cross-entropy.

The training seg loss is CE at LABEL resolution: the head's 1/8-res logits
are bilinearly upsampled x8 (reference models/yolo.py:57 nn.Upsample in the
head) and fed to SegmentationLosses (reference utils/loss.py:221-263).  At
Cityscapes crops that materializes (B, 512, 1024, 19) logits — ~640 MB of
f32 HBM round-trips per step counting forward, log_softmax and the backward
pass; the region costs ~2.8 ms of the 40.7 ms bs8 train step.

Upsampling is a pair of interpolation matmuls (ops/resize.py), so the loss
fuses: per class plane, two small MXU matmuls produce the full-res logits
IN VMEM, an online (flash-style) running logsumexp consumes them on the
VPU, and only the scalar (weighted nll sum, weight sum) pair leaves the
kernel.  The backward kernel recomputes the planes (cheaper than storing
them) and contracts the per-pixel softmax-minus-onehot against the
transposed interpolation matrices, emitting gradients at 1/8 res directly.
Full-res logits never touch HBM in either direction.

Exact same math as ``cross_entropy_seg(resize_bilinear(z, (8h, 8w)), y)``
(losses.py / resize.py) up to f32-accumulation differences — verified,
values and gradients, in tests/test_seg_ce_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..resize import _bilinear_matrix_np

_NEG = -3.0e38  # finite -inf stand-in (exp(_NEG - m) == 0 in f32)


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _matrices(h, w, H, W, hp, wp, Wp, dt):
    mh = np.zeros((H, hp), np.float32)
    mh[:, :h] = _bilinear_matrix_np(h, H, True)
    mwt = np.zeros((wp, Wp), np.float32)
    mwt[:w, :W] = _bilinear_matrix_np(w, W, True).T
    return jnp.asarray(mh, dt), jnp.asarray(mwt, dt)


def _plane(zp_ref, mh_blk, mwt, c, prec):
    """Full-res logit plane for class c over this row block: MH @ z_c @ MW,
    column-expand first (ops/pallas/upsample_argmax_kernel.py ordering)."""
    t = jax.lax.dot_general(zp_ref[0, c], mwt,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    return jax.lax.dot_general(mh_blk, t.astype(zp_ref.dtype),
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _fwd_kernel(zp_ref, mh_ref, mwt_ref, y_ref, w_ref, nll_ref, den_ref, *,
                c, ignore_index):
    prec = (jax.lax.Precision.HIGHEST
            if zp_ref.dtype == jnp.float32 else None)
    y = y_ref[0]
    mh = mh_ref[:]
    mwt = mwt_ref[:]
    wv = w_ref[:]
    shape = y.shape
    m = jnp.full(shape, _NEG, jnp.float32)
    s = jnp.zeros(shape, jnp.float32)
    py = jnp.zeros(shape, jnp.float32)
    wy = jnp.zeros(shape, jnp.float32)
    for ci in range(c):
        p = _plane(zp_ref, mh, mwt, ci, prec)
        mn = jnp.maximum(m, p)
        s = s * jnp.exp(m - mn) + jnp.exp(p - mn)
        m = mn
        hit = y == ci
        py = jnp.where(hit, p, py)
        wy = jnp.where(hit, wv[ci], wy)
    valid = y != ignore_index
    nll = (jnp.log(s) + m - py) * wy
    first = pl.program_id(1) == 0

    @pl.when(first)
    def _init():
        nll_ref[0] = jnp.zeros_like(nll_ref[0])
        den_ref[0] = jnp.zeros_like(den_ref[0])

    # scalar partial sums broadcast into a minimal legal (8, 128) VMEM tile
    nll_ref[0] += jnp.full(nll_ref.shape[1:], jnp.sum(
        jnp.where(valid, nll, 0.0)), jnp.float32)
    den_ref[0] += jnp.full(den_ref.shape[1:], jnp.sum(
        jnp.where(valid, wy, 0.0)), jnp.float32)


def _bwd_kernel(zp_ref, mh_ref, mwt_ref, y_ref, w_ref, dz_ref, *,
                c, ignore_index):
    prec = (jax.lax.Precision.HIGHEST
            if zp_ref.dtype == jnp.float32 else None)
    y = y_ref[0]
    mh = mh_ref[:]
    mwt = mwt_ref[:]
    wv = w_ref[:]
    shape = y.shape
    m = jnp.full(shape, _NEG, jnp.float32)
    s = jnp.zeros(shape, jnp.float32)
    wy = jnp.zeros(shape, jnp.float32)
    for ci in range(c):
        p = _plane(zp_ref, mh, mwt, ci, prec)
        mn = jnp.maximum(m, p)
        s = s * jnp.exp(m - mn) + jnp.exp(p - mn)
        m = mn
        wy = jnp.where(y == ci, wv[ci], wy)
    lse = jnp.log(s) + m
    valid = y != ignore_index
    # d nll / d p_full_c = (softmax_c - onehot_c) * w[y], masked; the
    # upstream cotangent / denominator scale is pre-folded into w_ref
    gsc = jnp.where(valid, wy, 0.0)
    first = pl.program_id(1) == 0

    @pl.when(first)
    def _init():
        dz_ref[0] = jnp.zeros_like(dz_ref[0])

    for ci in range(c):
        p = _plane(zp_ref, mh, mwt, ci, prec)
        g = (jnp.exp(p - lse) - (y == ci).astype(jnp.float32)) * gsc
        g = g.astype(zp_ref.dtype)
        u = jax.lax.dot_general(mh, g,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)   # (hp, Wp)
        dzc = jax.lax.dot_general(u.astype(g.dtype), mwt,
                                  dimension_numbers=(((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=prec)  # (hp, wp)
        dz_ref[0, ci] += dzc


def _specs(b, c, hp, wp, bh, Wp):
    return [
        pl.BlockSpec((1, c, hp, wp), lambda bi, ri: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bh, hp), lambda bi, ri: (ri, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((wp, Wp), lambda bi, ri: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bh, Wp), lambda bi, ri: (bi, ri, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]


def _t_c_minor_major(x3, out_dtype=None):
    """(B, P, C) -> (B, C, P) as a batched contraction with the identity —
    an MXU-internal transpose.  XLA's shuffle transpose for these
    channel-minor/major flips traced at ~0.63 ms/step device-lane time at
    Cityscapes train scale (f32 (8,19,64,128), round 4); the identity dot
    streams the tensor through the MXU once (~10 us).  End-to-end step
    time is unchanged (the scheduler overlapped the transpose), but the
    lane time freed is real.  Exact: each output is a single 1.0 * x
    product."""
    b, p, c = x3.shape
    eye = jnp.broadcast_to(jnp.eye(c, dtype=x3.dtype), (b, c, c))
    return jax.lax.dot_general(
        eye, x3, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=out_dtype or x3.dtype)


def _t_c_major_minor(x3, out_dtype=None):
    """(B, C, P) -> (B, P, C); see :func:`_t_c_minor_major`."""
    b, c, p = x3.shape
    eye = jnp.broadcast_to(jnp.eye(c, dtype=x3.dtype), (b, c, c))
    return jax.lax.dot_general(
        x3, eye, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=out_dtype or x3.dtype)


def _prep(z, y, ignore_index):
    b, h, w, c = z.shape
    _, H, W = y.shape
    assert H % h == 0 and W % w == 0, (z.shape, y.shape)
    hp, wp, Wp = _pad_to(h, 8), _pad_to(w, 128), _pad_to(W, 128)
    # row block: the (bh, Wp) f32 running stats (m/s/py/wy) dominate the
    # kernel's VMEM stack — bh=256 OOM'd the 16 MB scoped budget at
    # Cityscapes scale (Wp=1024, bs8 under vjp)
    bh = 128 if H % 128 == 0 else H
    zp = _t_c_minor_major(z.reshape(b, h * w, c)).reshape(b, c, h, w)
    if (hp, wp) != (h, w):
        zp = jnp.pad(zp, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    yp = y.astype(jnp.int32)
    if Wp != W:
        yp = jnp.pad(yp, ((0, 0), (0, 0), (0, Wp - W)),
                     constant_values=ignore_index)
    mh, mwt = _matrices(h, w, H, W, hp, wp, Wp, z.dtype)
    return zp, yp, mh, mwt, (b, c, h, w, hp, wp, H, W, Wp, bh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _seg_ce(z, y, wvec, ignore_index):
    return _seg_ce_fwd(z, y, wvec, ignore_index)[0]


def _seg_ce_fwd(z, y, wvec, ignore_index):
    zp, yp, mh, mwt, (b, c, h, w, hp, wp, H, W, Wp, bh) = _prep(
        z, y, ignore_index)
    kernel = functools.partial(_fwd_kernel, c=c, ignore_index=ignore_index)
    nll, den = pl.pallas_call(
        kernel,
        grid=(b, H // bh),
        in_specs=_specs(b, c, hp, wp, bh, Wp),
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((b, 8, 128), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(zp, mh, mwt, yp, wvec)
    d = jnp.maximum(jnp.sum(den[:, 0, 0]), 1.0)
    loss = jnp.sum(nll[:, 0, 0]) / d
    return loss, (z, y, wvec, d)


def _seg_ce_bwd(ignore_index, res, g):
    z, y, wvec, d = res
    zp, yp, mh, mwt, (b, c, h, w, hp, wp, H, W, Wp, bh) = _prep(
        z, y, ignore_index)
    wsc = wvec * (g.astype(jnp.float32) / d)   # fold ĝ/D into the weights
    kernel = functools.partial(_bwd_kernel, c=c, ignore_index=ignore_index)
    dz = pl.pallas_call(
        kernel,
        grid=(b, H // bh),
        in_specs=_specs(b, c, hp, wp, bh, Wp),
        out_specs=pl.BlockSpec((1, c, hp, wp), lambda bi, ri: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, hp, wp), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(zp, mh, mwt, yp, wsc)
    dz3 = dz[:, :, :h, :w].reshape(b, c, h * w)
    dz = _t_c_major_minor(dz3).reshape(b, h, w, c)
    return (dz.astype(z.dtype), np.zeros(y.shape, jax.dtypes.float0),
            jnp.zeros_like(wvec))


_seg_ce.defvjp(_seg_ce_fwd, _seg_ce_bwd)


def seg_ce_up8(z: jnp.ndarray, y: jnp.ndarray, weight=None,
               ignore_index: int = -1) -> jnp.ndarray:
    """Mean CE of ``resize_bilinear(z, y.shape[1:], align_corners=True)``
    vs ``y`` without materializing the upsampled logits.

    z: (B, h, w, C) logits (the seg head's pre-upsample output, NHWC);
    y: (B, k*h, k*w) int labels; weight: optional (C,) class weights.
    Matches losses.cross_entropy_seg ∘ resize.resize_bilinear exactly
    (f32 accumulation).  Differentiable (custom VJP, fused backward)."""
    c = z.shape[-1]
    wvec = (jnp.ones((c,), jnp.float32) if weight is None
            else jnp.asarray(weight, jnp.float32))
    return _seg_ce(z, y, wvec, int(ignore_index))
