"""Pallas TPU kernel: fused (chained-)bilinear-upsample + channel argmax.

The reference mask path (detect.py:191-193) interpolates seg logits twice —
the head's x8 upsample to net-input size (models/yolo.py:186) and the app's
resize to the original frame — then argmaxes over classes.  At Cityscapes
sizes that materializes 2048x1024x19 logits (~160 MB of HBM round-trips).

Both interpolations are linear maps, so their composition is a single pair
of dense row/col interpolation matrices (computed in float64 on the host).
This kernel evaluates ``argmax_c(MH @ x_c @ MW)`` straight from the 1/8-res
head logits (64x128x19 for a 512x1024 input): the two small matmuls ride
the MXU entirely in VMEM, the VPU only runs the per-channel running-argmax
update, and the full-resolution logits never touch HBM.  Input traffic
drops from ~240 MB to ~0.3 MB per frame.

Layout: the kernel consumes the head's NHWC logits as a free ``(h, w*c)``
reshape — no transpose on either side of the pallas_call (materializing a
planar (C,h,w) copy out of the fused forward graph cost ~0.2 ms/frame in an
earlier revision).  The H-blend contracts the *sublane* axis of that 2-D
view with a transposed-output ``dot_general`` (an MXU-internal transpose),
producing t[(w,c), out_h]; a view reshape to (w, c, out_h) then makes each
channel plane a static sublane slice, and the W-blend is a second
sublane-contracting matmul per channel.  Everything stays in VMEM.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..resize import _bilinear_matrix_np


def _compose_matrix(n_in: int, n_out: int, via: int | None,
                    align_corners: bool) -> np.ndarray:
    """(n_out, n_in) interpolation matrix, optionally through a ``via`` grid
    (float64 product — strictly closer to the exact two-stage math than the
    chained f32/bf16 evaluation it replaces)."""
    if via is None or via == n_in:
        return _bilinear_matrix_np(n_in, n_out, align_corners).astype(np.float64)
    m1 = _bilinear_matrix_np(n_in, via, align_corners).astype(np.float64)
    m2 = _bilinear_matrix_np(via, n_out, align_corners).astype(np.float64)
    return m2 @ m1


def _kernel(x_ref, mh_ref, mwt_ref, idx_ref, *, c, wp, bh):
    x2d = x_ref[:]                       # (hp, wp*c): NHWC view, c minor
    # f32 inputs: force true-f32 MXU passes (Mosaic's default f32 dot is a
    # single bf16 pass — ~1e-2 relative error, visibly wrong argmaxes);
    # bf16 inputs ride the native bf16 MXU with f32 accumulation.
    prec = (jax.lax.Precision.HIGHEST if x2d.dtype == jnp.float32 else None)
    # t[(w,c), oh] = sum_h x[h, (w,c)] * MH[oh, h] — lhs contracts its
    # sublane axis (MXU-internal transpose; no relayout)
    t = jax.lax.dot_general(x2d, mh_ref[:],
                            dimension_numbers=(((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    t = t.astype(x2d.dtype).reshape(wp, c, bh)  # view: splits sublanes

    # Packed-key running argmax: a naive (compare + two selects + an int32
    # index array) chain is VPU/VMEM-traffic bound and costs ~2.5x the whole
    # rest of the kernel.  Instead each plane is bitcast to the signed-int
    # ordering of f32 (flip the magnitude bits of negatives), the low
    # ceil(log2(c)) (>=5) mantissa bits are replaced by (lim - ci), and the
    # running reduction is a single jnp.maximum per plane.  Ties within
    # 2^bits ulps (relative ~2^-18 for <=32 classes, ~1e-6 of 2M pixels at
    # Cityscapes size) resolve to the smaller class id, same as
    # jnp.argmax's first-max-wins.
    bits = max(5, int(c - 1).bit_length())
    lim = (1 << bits) - 1

    def key_of(ci):
        plane = jax.lax.dot_general(t[:, ci, :], mwt_ref[:],
                                    dimension_numbers=(((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=prec)  # (bh, bw)
        pi = jax.lax.bitcast_convert_type(plane, jnp.int32)
        mono = pi ^ ((pi >> 31) & jnp.int32(0x7FFFFFFF))
        return (mono & jnp.int32(~lim)) | jnp.int32(lim - ci)

    best = key_of(0)
    for ci in range(1, c):
        best = jnp.maximum(best, key_of(ci))
    idx_ref[:] = (jnp.int32(lim) - (best & jnp.int32(lim))).astype(idx_ref.dtype)


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("out_hw", "via_hw",
                                             "align_corners"))
def _upsample_argmax_tpu(x: jnp.ndarray, out_hw, via_hw, align_corners):
    b, h, w, c = x.shape
    h0, w0 = out_hw
    dt = x.dtype
    mh = _compose_matrix(h, h0, None if via_hw is None else via_hw[0],
                         align_corners)
    mw = _compose_matrix(w, w0, None if via_hw is None else via_hw[1],
                         align_corners)
    hp = _pad_to(h, 8)
    wp = w
    while (wp * c) % 128:
        wp += 1
    bh = min(256, _pad_to(h0, 256))
    bw = min(2048, _pad_to(w0, 512))
    h0p, w0p = _pad_to(h0, bh), _pad_to(w0, bw)
    mh_p = np.zeros((h0p, hp), np.float64)
    mh_p[:h0, :h] = mh
    mwt_p = np.zeros((wp, w0p), np.float64)
    mwt_p[:w, :w0] = mw.T
    mh_j = jnp.asarray(mh_p, dt)
    mwt_j = jnp.asarray(mwt_p, dt)

    if (hp, wp) != (h, w):
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    x2d = x.reshape(b, hp, wp * c)       # free view of NHWC

    kernel = functools.partial(_kernel, c=c, wp=wp, bh=bh)
    call = pl.pallas_call(
        kernel,
        grid=(h0p // bh, w0p // bw),
        in_specs=[
            pl.BlockSpec((hp, wp * c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, hp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wp, bw), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h0p, w0p), jnp.uint8),
    )
    outs = [call(x2d[i], mh_j, mwt_j) for i in range(b)]
    return jnp.stack(outs)[:, :h0, :w0]


def _kernel_planar(x_ref, mh_ref, mwt_ref, idx_ref, t_ref, *, c,
                   offset_key, batched=False):
    """Planar input (c, hp, wp): each class plane is a native (sublane,
    lane)-tiled 2-D slab — two standard matmuls per class, no relayouts.
    This is the preferred form: feeding the NHWC kernel above from a
    fixed-layout producer (a conv inside the same jit) forces a
    lane-merge relayout of the (h, w, c) output that costs ~4 ms; the
    seg heads emit planar logits directly (ops/nn.Ctx.conv2d out_nchw).

    The column-expanded planes ``t_c = plane_c @ MW_block`` depend only on
    the w-block, so they are computed once per w-block (grid is (j, i)
    with the h-block i iterating fastest) into ``t_ref`` scratch and
    reused across all h-blocks — recomputing them per h-block was ~25% of
    the kernel's MACs at Cityscapes geometry.

    ``offset_key``: the kernel is VPU-bound on the per-class key chain (the
    matmuls hide under it), so the wrapper pre-clamps the 1/8-res logits at
    -63, appends a ones-row to every plane and puts +64 in the matching
    extra column of MH (bilinear rows sum to 1, so the offset rides the MXU
    through both expansions for free).  The interpolated planes are then
    strictly positive and the f32 bitcast is ALREADY monotonic — the 3-op
    sign-fold of the general form drops out, cutting the key chain from
    ~7 to ~4 VPU ops/class/pixel.  Key quantization coarsens from relative
    2^-18 to absolute ~2.4e-4 on the logits; ties inside that band resolve
    to the smaller class id (same direction as jnp.argmax)."""
    prec = (jax.lax.Precision.HIGHEST
            if x_ref.dtype == jnp.float32 else None)
    bits = max(5, int(c - 1).bit_length())
    lim = (1 << bits) - 1
    mh = mh_ref[:]
    # batched form: grid (b, j, i) with a leading size-1 batch block on
    # x/idx; the h-block id moves to program_id(2)
    h_id = pl.program_id(2) if batched else pl.program_id(1)

    def x_plane(ci):
        return x_ref[0, ci] if batched else x_ref[ci]

    @pl.when(h_id == 0)
    def _fill_t():
        mwt = mwt_ref[:]
        for ci in range(c):
            # column-expand first: (h, w)@(w, bw) is tiny (w lanes), and
            # the row-expand then contracts over only h instead of w —
            # 302 MFLOP vs 554 per class at 64x128 -> 1024x2048 (the other
            # association order made the kernel ~35% slower)
            t_ref[ci] = jax.lax.dot_general(
                x_plane(ci), mwt, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec).astype(t_ref.dtype)

    def key_of(ci):
        p = jax.lax.dot_general(mh, t_ref[ci],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        pi = jax.lax.bitcast_convert_type(p, jnp.int32)
        if not offset_key:
            pi = pi ^ ((pi >> 31) & jnp.int32(0x7FFFFFFF))
        return (pi & jnp.int32(~lim)) | jnp.int32(lim - ci)

    best = key_of(0)
    for ci in range(1, c):
        best = jnp.maximum(best, key_of(ci))
    out = (jnp.int32(lim) - (best & jnp.int32(lim))).astype(idx_ref.dtype)
    if batched:
        idx_ref[0] = out
    else:
        idx_ref[:] = out


_OFFSET_KEY = os.environ.get("MULTIYOLOV5_MASK_OFFSET_KEY", "1") != "0"
_KEY_OFFSET = 64.0     # 2^6: exact in bf16, and |clamped logit| < offset


@functools.partial(jax.jit, static_argnames=("out_hw", "via_hw",
                                             "align_corners"))
def _upsample_argmax_planar_tpu(xp: jnp.ndarray, out_hw, via_hw,
                                align_corners):
    b, c, h, w = xp.shape
    h0, w0 = out_hw
    dt = xp.dtype
    mh = _compose_matrix(h, h0, None if via_hw is None else via_hw[0],
                         align_corners)
    mw = _compose_matrix(w, w0, None if via_hw is None else via_hw[1],
                         align_corners)
    hp = _pad_to(h + 1, 8) if _OFFSET_KEY else _pad_to(h, 8)
    wp = _pad_to(w, 128)
    bh = min(256, _pad_to(h0, 256))
    bw = min(2048, _pad_to(w0, 512))
    h0p, w0p = _pad_to(h0, bh), _pad_to(w0, bw)
    mh_p = np.zeros((h0p, hp), np.float64)
    mh_p[:h0, :h] = mh
    mwt_p = np.zeros((wp, w0p), np.float64)
    mwt_p[:w, :w0] = mw.T
    if _OFFSET_KEY:
        # +offset through the MXU: plane row h is all-ones (set below) and
        # column h of MH carries the offset.  MW's rows sum to 1, so the
        # ones-row column-expands to exactly-constant-per-column values
        # (~1 up to the bf16 matrix rounding — identical for every class,
        # so argmax comparisons are unaffected).
        mh_p[:h0, h] = _KEY_OFFSET
    mh_j = jnp.asarray(mh_p, dt)
    mwt_j = jnp.asarray(mwt_p, dt)
    if _OFFSET_KEY:
        # clamp so interpolated values stay above -offset (convex
        # combinations of clamped logits): only affects classes at
        # < -63, which never win an argmax against the others
        xp = jnp.maximum(xp, jnp.asarray(1.0 - _KEY_OFFSET, dt))
        xp = jnp.concatenate([xp, jnp.ones((b, c, 1, w), dt)], 2)
    if xp.shape[2:] != (hp, wp):
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, hp - xp.shape[2]),
                          (0, wp - w)))

    if b == 1:
        kernel = functools.partial(_kernel_planar, c=c,
                                   offset_key=_OFFSET_KEY)
        # grid (j, i): the h-block i iterates fastest so the per-w-block
        # column-expand scratch (t_ref) fills once at i==0 and is reused
        call = pl.pallas_call(
            kernel,
            grid=(w0p // bw, h0p // bh),
            in_specs=[
                pl.BlockSpec((c, hp, wp), lambda j, i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bh, hp), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((wp, bw), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bh, bw), lambda j, i: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h0p, w0p), jnp.uint8),
            scratch_shapes=[pltpu.VMEM((c, hp, bw), dt)],
            # the column-expand scratch (c, hp, bw) overflows the 16 MB
            # default scoped budget in the f32 test path; v5e has 128 MB
            # physical VMEM
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        )
        return call(xp[0], mh_j, mwt_j)[None, :h0, :w0]
    # batched grid (b, j, i): one custom call for the whole batch — the
    # per-image call loop dispatched b kernels and paid a (B, H0, W0)
    # stack copy on their outputs at serving batch sizes
    kernel = functools.partial(_kernel_planar, c=c, offset_key=_OFFSET_KEY,
                               batched=True)
    call = pl.pallas_call(
        kernel,
        grid=(b, w0p // bw, h0p // bh),
        in_specs=[
            pl.BlockSpec((1, c, hp, wp), lambda bi, j, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, hp), lambda bi, j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wp, bw), lambda bi, j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, bw), lambda bi, j, i: (bi, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h0p, w0p), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((c, hp, bw), dt)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )
    return call(xp, mh_j, mwt_j)[:, :h0, :w0]


def upsample_argmax_planar(xp: jnp.ndarray, out_hw, via_hw=None,
                           align_corners: bool = True) -> jnp.ndarray:
    """``upsample_argmax`` over planar (B, C, h, w) logits (the layout the
    seg heads emit on the fused inference path)."""
    out_hw = (int(out_hw[0]), int(out_hw[1]))
    if via_hw is not None:
        via_hw = (int(via_hw[0]), int(via_hw[1]))
    if jax.default_backend() == "tpu":
        return _upsample_argmax_planar_tpu(xp, out_hw, via_hw, align_corners)
    return upsample_argmax(jnp.transpose(xp, (0, 2, 3, 1)), out_hw, via_hw,
                           align_corners)


def upsample_argmax(x: jnp.ndarray, out_hw, via_hw=None,
                    align_corners: bool = True) -> jnp.ndarray:
    """``argmax_c`` of ``x`` bilinearly upsampled to ``out_hw``.

    Args:
      x: (B, h, w, C) logits (f32 or bf16).
      out_hw: target (H0, W0).
      via_hw: optional intermediate (Hi, Wi) — composes upsample(h,w -> via)
        then upsample(via -> out), matching the reference's head-then-app
        double interpolation exactly (as one float64-composed linear map).
    Returns:
      (B, H0, W0) uint8 class map.
    """
    out_hw = (int(out_hw[0]), int(out_hw[1]))
    if via_hw is not None:
        via_hw = (int(via_hw[0]), int(via_hw[1]))
    if jax.default_backend() == "tpu":
        return _upsample_argmax_tpu(x, out_hw, via_hw, align_corners)
    # reference path elsewhere: chained resizes + argmax (exact two-stage)
    from ..resize import resize_bilinear
    y = x
    if via_hw is not None and tuple(via_hw) != x.shape[1:3]:
        y = resize_bilinear(y, via_hw, align_corners)
    y = resize_bilinear(y, out_hw, align_corners)
    return jnp.argmax(y, -1).astype(jnp.uint8)
