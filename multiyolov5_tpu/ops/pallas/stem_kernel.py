"""Pallas TPU kernel for the folded YOLOv5 stem (ops/stem.py).

XLA lowers the two folded stem convs (3x3 48->128 and 2x2 128->64 at
256x128) with a spatially-partitioned strategy plus layout copies — ~127us
device-true, 4x the arithmetic floor.  This kernel runs both convs (+SiLU)
on-core: the padded input lives in VMEM once per batch item, and only the
final NHWC (B, H/4, W/4, c_out) activation is written back to HBM — the
intermediate c_mid-channel map never leaves VMEM.

MXU-fill packing (both convs are fill-bound, not FLOP-bound):

* conv1 taps have K = c_in = 48 lanes, 37.5% of the 128-row systolic fill.
  Mosaic can't lane-concat 48-lane vectors at unaligned offsets, so in-core
  im2col is off the table; instead XLA pre-concats a row-shifted copy of
  the input along channels (``x96`` below), which packs the dy=0/dy=1 taps
  of each column into one K=2*c_in dot at 75% fill.  The dy=2 tap reads the
  low lanes of the same buffer (a K=c_in dot).  9 -> 6 dots, ~2x fill.
* conv2 taps have N = c_out = 64, half the output tile.  The two dx taps of
  each dy are packed along N into one K=c_mid, N=2*c_out dot at full tile;
  the halves are re-added with a one-sublane shift (out[r,c] needs the
  dx=1 product at column c+1).

Both packings only regroup the f32 tap accumulation (a+b)+c vs ((a+b)+c)
order, bit-identical in fp32 up to one f32 rounding (~1e-7 rel); verified
against ops/stem.stem_apply in tests/test_stem_kernel.py.  127.5 -> 94.2us
device-true standalone at 1024x512.

Exact same math as ops/stem.stem_apply (reference stem: models/common.py
Focus(3,c2,3) + Conv(c2,c2b,3,2), models/yolov5s_city_seg.yaml:17-18).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_BLOCK = 32


def pack_stem96_host(x48, pad_cols: int):
    """Host-side padded row-pair packing for :func:`stem_apply_pallas_u8`.

    x48: (B, H, W, c_in) uint8 quarter-grid (two host space-to-depths).
    Returns (B, H+3, pad_cols, 2*c_in) uint8 where out[r] = (xp[r], xp[r+1])
    with xp = x48 padded by 2 rows top/bottom and 2 cols left (conv1 pad=1
    plus conv2's top/left halo) — exactly the ``x96`` the f32 kernel used to
    materialize on-device (which cost ~480us/step of XLA pad/slice fusions
    at serving batch sizes)."""
    import numpy as np
    b, h, w, c = x48.shape
    xp = np.zeros((b, h + 4, pad_cols, c), x48.dtype)
    xp[:, 2:h + 2, 2:w + 2] = x48
    out = np.empty((b, h + 3, pad_cols, 2 * c), x48.dtype)
    out[..., :c] = xp[:, :-1]
    out[..., c:] = xp[:, 1:]
    return out


def _kernel_u8(x96_ref, w96_ref, w48_ref, b1_ref, w2_ref, b2_ref, out_ref,
               conv_ref, *, cols, c_in, c_mid, c_out):
    """uint8 variant: x96_ref is the host-packed (1, H+3, cols_p, 2*c_in)
    uint8 block; the 1/255 normalize is folded into w96/w48 (linear
    pre-scale of conv1), so the kernel converts u8 -> bf16 once per row
    block (into ``conv_ref`` scratch) and runs the same dots as
    :func:`_kernel`."""
    r_out = out_ref.shape[1]
    r0 = pl.program_id(1) * r_out
    r1 = r_out + 1
    c1 = -(-(cols + 1) // 8) * 8
    dt = out_ref.dtype
    # one u8 -> bf16 convert of the rows this block touches (r0 .. r0+r1+2:
    # conv1 rows + the dy=2 tap's 2-row offset); all tap slices then read
    # the scratch with the standard bf16 tiling
    # Mosaic has no direct u8 -> float cast; widen to i32 first
    conv_ref[...] = x96_ref[0, pl.ds(r0, r1 + 2)].astype(jnp.int32).astype(dt)

    acc = None
    for dx in range(3):
        m96 = conv_ref[pl.ds(0, r1), dx:dx + c1, :].reshape(r1 * c1,
                                                            2 * c_in)
        part = jax.lax.dot_general(
            m96, w96_ref[dx], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m48 = conv_ref[pl.ds(2, r1), dx:dx + c1, 0:c_in].reshape(r1 * c1,
                                                                 c_in)
        part = part + jax.lax.dot_general(
            m48, w48_ref[dx], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    y1 = acc + b1_ref[:].astype(jnp.float32)
    y1 = (y1 * jax.nn.sigmoid(y1)).astype(dt).reshape(r1, c1, c_mid)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (r1, c1, c_mid), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (r1, c1, c_mid), 1)
    edge = (cols_i == 0) | ((rows_i == 0) & (pl.program_id(1) == 0))
    y1 = jnp.where(edge, jnp.zeros_like(y1), y1)

    if w2_ref.ndim == 2:
        # wide stems (m+): one K=c_mid dot with BOTH dy taps N-packed
        # (4*c_out columns, host-packed [dy0dx0, dy0dx1, dy1dx0, dy1dx1])
        # and the dy=1 half re-added with a one-row shift — 6 MXU
        # tile-passes vs 8 for the two-dot form at c_mid=192 (for
        # c_mid=128 the two-dot form is already at one full pass per tile
        # and the packing would only add the halo row)
        m = y1.reshape(r1 * c1, c_mid)
        part = jax.lax.dot_general(
            m, w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(r1, c1, 4 * c_out)
        q = (part[0:r_out, 0:cols, 0:c_out]
             + part[0:r_out, 1:cols + 1, c_out:2 * c_out]
             + part[1:r1, 0:cols, 2 * c_out:3 * c_out]
             + part[1:r1, 1:cols + 1, 3 * c_out:4 * c_out])
        acc2 = q
    else:
        acc2 = None
        for dy in range(2):
            m = y1[dy:dy + r_out, 0:c1, :].reshape(r_out * c1, c_mid)
            part = jax.lax.dot_general(
                m, w2_ref[dy], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            part = part.reshape(r_out, c1, 2 * c_out)
            q = (part[:, 0:cols, 0:c_out]
                 + part[:, 1:cols + 1, c_out:2 * c_out])
            acc2 = q if acc2 is None else acc2 + q
    y2 = acc2 + b2_ref[:].astype(jnp.float32)
    out_ref[0] = (y2 * jax.nn.sigmoid(y2)).astype(dt)


def stem_pack_geometry(h: int, w: int):
    """(padded col count, packed row count) the u8 kernel expects for an
    (h, w) quarter grid — the host packer must match."""
    c1 = -(-(w + 1) // 8) * 8
    return c1 + 2, h + 3


@functools.partial(jax.jit, static_argnames=("cols", "out_dtype"))
def stem_apply_pallas_u8(x96u8: jnp.ndarray, w1p: jnp.ndarray,
                         b1p: jnp.ndarray, w2p: jnp.ndarray,
                         b2p: jnp.ndarray, cols: int,
                         out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Folded stem from host-packed uint8 input (pack_stem96_host).

    x96u8: (B, H+3, cols_p, 2*c_in) uint8; returns (B, H, cols, c_out)
    in ``out_dtype``.  The /255 input normalize is folded into the conv1
    weights (exact same math as normalize-then-conv up to one bf16
    rounding), so the raw frame bytes are the only HBM-resident input —
    no device-side normalize or packing pass at all."""
    b, hp3, cp, c2in = x96u8.shape
    c_in = c2in // 2
    h = hp3 - 3
    c_mid = w1p.shape[-1]
    c_out = w2p.shape[-1]
    dt = out_dtype
    # row block: 32 measured best (or tied) across s/m widths and batch
    # sizes 1/8 on v5e — the u8 input block is 4x smaller than the old f32
    # kernel's, so the VMEM pressure that forced narrower blocks is gone
    # (the 64 MB scoped limit below covers the f32 conv1 accumulator for
    # wide stems).  f32 out is the test path: f32 temporaries double the
    # stack, so keep blocks small there.
    import os as _os
    # wide stems (c_mid > 128, i.e. m and up) run best at rpb 16 on v5e:
    # the conv1 f32 accumulator scales with c_mid and at rpb 32 the block
    # working set spills past the pipelining sweet spot (m bs1 A/B:
    # 846 -> 862 FPS e2e at rpb 16; s regresses 1715 -> 1703 there)
    rpb_max = 8 if dt == jnp.float32 else int(
        _os.environ.get("MULTIYOLOV5_STEM_RPB", 32 if c_mid <= 128 else 16))
    rpb = h
    for cand in (128, 64, 32, 16, 8):
        if cand <= rpb_max and h % cand == 0:
            rpb = cand
            break
    c1 = -(-(cols + 1) // 8) * 8
    assert cp == c1 + 2, (cp, c1)
    inv = jnp.float32(1.0 / 255.0)
    w96 = jnp.stack([jnp.concatenate([w1p[0, dx], w1p[1, dx]], 0)
                     for dx in range(3)]) * inv
    w48 = jnp.stack([w1p[2, dx] for dx in range(3)]) * inv
    w2n = jnp.stack([jnp.concatenate([w2p[dy, 0], w2p[dy, 1]], 1)
                     for dy in range(2)])
    if c_mid > 128:
        w2n = jnp.concatenate([w2n[0], w2n[1]], 1)   # (c_mid, 4*c_out)
    kernel = functools.partial(_kernel_u8, cols=cols, c_in=c_in,
                               c_mid=c_mid, c_out=c_out)
    return pl.pallas_call(
        kernel,
        grid=(b, h // rpb),
        in_specs=[
            pl.BlockSpec((1, hp3, cp, 2 * c_in),
                         lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rpb, cols, c_out),
                               lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, cols, c_out), dt),
        scratch_shapes=[pltpu.VMEM((rpb + 3, cp, 2 * c_in), dt)],
        # the f32 conv1 accumulator stack for wide stems (c_mid 192/256)
        # plus the double-buffered batch input block outgrows the 16 MB
        # default scoped budget; v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=jax.default_backend() != "tpu",
    )(x96u8, jnp.asarray(w96, dt), jnp.asarray(w48, dt),
      jnp.asarray(b1p, jnp.float32), jnp.asarray(w2n, dt),
      jnp.asarray(b2p, jnp.float32))


def pack_stem96_chunked_host(x48, pad_cols: int, rpb: int):
    """Row-block-chunked variant of :func:`pack_stem96_host` for the
    multi-output kernel: (nri, B, rpb+3, pad_cols, 2*c_in) uint8 where
    chunk ri holds packed rows ri*rpb .. ri*rpb+rpb+2 (the rows one output
    row block reads, conv2 halo included).  Halo rows are duplicated
    host-side (~2/rpb extra bytes) so each grid step is one clean
    contiguous DMA — no whole-image re-fetch with batch inner."""
    return chunk_stem96_host(pack_stem96_host(x48, pad_cols), rpb)


def chunk_stem96_host(x96, rpb: int):
    """(B, H+3, cp, 2c) packed rows -> (nri, B, rpb+3, cp, 2c) chunks."""
    import numpy as np
    b, hp3, cp, c = x96.shape
    h = hp3 - 3
    assert h % rpb == 0, (h, rpb)
    nri = h // rpb
    out = np.empty((nri, b, rpb + 3, cp, c), x96.dtype)
    for ri in range(nri):
        out[ri] = x96[:, ri * rpb:ri * rpb + rpb + 3]
    return out


def _kernel_u8_multi(x_ref, w96_ref, w48_ref, b1_ref, w2_ref, b2_ref,
                     *out_refs, cols, c_in, c_mid, c_out, bsz):
    """Multi-output u8 stem: grid (nri, bsz) with batch INNER; out_refs are
    ``bsz`` separate (1, H, cols, c_out) per-image arrays, each written only
    at its own bi step (other steps leave its block buffer untouched, and
    the block index ignores bi so nothing is flushed in between).  Feeding
    the serving engine's per-image regime directly kills the 8-way stem
    output slice XLA otherwise materializes (~11.5us/frame at bs8).

    x_ref: (1, 1, rpb+3, cp, 2*c_in) host-chunked block
    (pack_stem96_chunked_host) — rows for THIS (ri, bi) only."""
    ri = pl.program_id(0)
    bi = pl.program_id(1)
    r_out = out_refs[0].shape[1]
    r1 = r_out + 1
    c1 = -(-(cols + 1) // 8) * 8
    dt = out_refs[0].dtype
    conv = x_ref[0, 0].astype(jnp.int32).astype(dt)   # (rpb+3, cp, 2c_in)

    acc = None
    for dx in range(3):
        m96 = conv[0:r1, dx:dx + c1, :].reshape(r1 * c1, 2 * c_in)
        part = jax.lax.dot_general(
            m96, w96_ref[dx], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m48 = conv[2:2 + r1, dx:dx + c1, 0:c_in].reshape(r1 * c1, c_in)
        part = part + jax.lax.dot_general(
            m48, w48_ref[dx], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    y1 = acc + b1_ref[:].astype(jnp.float32)
    y1 = (y1 * jax.nn.sigmoid(y1)).astype(dt).reshape(r1, c1, c_mid)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (r1, c1, c_mid), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (r1, c1, c_mid), 1)
    edge = (cols_i == 0) | ((rows_i == 0) & (ri == 0))
    y1 = jnp.where(edge, jnp.zeros_like(y1), y1)

    if w2_ref.ndim == 2:
        m = y1.reshape(r1 * c1, c_mid)
        part = jax.lax.dot_general(
            m, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(r1, c1, 4 * c_out)
        acc2 = (part[0:r_out, 0:cols, 0:c_out]
                + part[0:r_out, 1:cols + 1, c_out:2 * c_out]
                + part[1:r1, 0:cols, 2 * c_out:3 * c_out]
                + part[1:r1, 1:cols + 1, 3 * c_out:4 * c_out])
    else:
        acc2 = None
        for dy in range(2):
            m = y1[dy:dy + r_out, 0:c1, :].reshape(r_out * c1, c_mid)
            part = jax.lax.dot_general(
                m, w2_ref[dy], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            part = part.reshape(r_out, c1, 2 * c_out)
            q = (part[:, 0:cols, 0:c_out]
                 + part[:, 1:cols + 1, c_out:2 * c_out])
            acc2 = q if acc2 is None else acc2 + q
    y2 = acc2 + b2_ref[:].astype(jnp.float32)
    y2 = (y2 * jax.nn.sigmoid(y2)).astype(dt)
    # each per-image block buffer persists across the inner bi steps and is
    # flushed once when ri advances — content is whatever image b's step
    # wrote, so every flush carries the right rows with no re-fetch
    for b in range(bsz):
        @pl.when(bi == b)
        def _store(b=b):
            out_refs[b][0] = y2


@functools.partial(jax.jit, static_argnames=("cols", "out_dtype"))
def stem_apply_pallas_u8_multi(x96c: jnp.ndarray, w1p: jnp.ndarray,
                               b1p: jnp.ndarray, w2p: jnp.ndarray,
                               b2p: jnp.ndarray, cols: int,
                               out_dtype=jnp.bfloat16):
    """Folded stem from the host-CHUNKED uint8 input
    (pack_stem96_chunked_host); returns a TUPLE of per-image
    (1, H, cols, c_out) arrays — the engine's batch>1 per-image serving
    regime consumes them directly, with no stem-output batch slicing.
    Same math as :func:`stem_apply_pallas_u8` (one f32 tap-regroup
    rounding), asserted equal in tests/test_stem_kernel.py."""
    nri, b, rpb3, cp, c2in = x96c.shape
    rpb = rpb3 - 3
    c_in = c2in // 2
    h = nri * rpb
    c_mid = w1p.shape[-1]
    c_out = w2p.shape[-1]
    dt = out_dtype
    c1 = -(-(cols + 1) // 8) * 8
    assert cp == c1 + 2, (cp, c1)
    inv = jnp.float32(1.0 / 255.0)
    w96 = jnp.stack([jnp.concatenate([w1p[0, dx], w1p[1, dx]], 0)
                     for dx in range(3)]) * inv
    w48 = jnp.stack([w1p[2, dx] for dx in range(3)]) * inv
    w2n = jnp.stack([jnp.concatenate([w2p[dy, 0], w2p[dy, 1]], 1)
                     for dy in range(2)])
    if c_mid > 128:
        w2n = jnp.concatenate([w2n[0], w2n[1]], 1)
    kernel = functools.partial(_kernel_u8_multi, cols=cols, c_in=c_in,
                               c_mid=c_mid, c_out=c_out, bsz=b)
    outs = pl.pallas_call(
        kernel,
        grid=(nri, b),
        in_specs=[
            pl.BlockSpec((1, 1, rpb3, cp, 2 * c_in),
                         lambda ri, bi: (ri, bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, rpb, cols, c_out),
                                lambda ri, bi: (0, ri, 0, 0),
                                memory_space=pltpu.VMEM)] * b,
        out_shape=[jax.ShapeDtypeStruct((1, h, cols, c_out), dt)] * b,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=jax.default_backend() != "tpu",
    )(x96c, jnp.asarray(w96, dt), jnp.asarray(w48, dt),
      jnp.asarray(b1p, jnp.float32), jnp.asarray(w2n, dt),
      jnp.asarray(b2p, jnp.float32))
    return tuple(outs)


def _kernel(x96_ref, w96_ref, w48_ref, b1_ref, w2_ref, b2_ref, out_ref, *,
            cols, c_in, c_mid, c_out):
    """x96_ref: (1, H+3, cols+3, 2*c_in) padded input with lanes
    (x[r], x[r+1]); out_ref: (1, R, cols, c_out) block at row r0."""
    r_out = out_ref.shape[1]
    r0 = pl.program_id(1) * r_out
    r1 = r_out + 1                          # conv1 rows incl. conv2 halo
    # conv1 col region incl. conv2 halo, padded to the sublane tile so the
    # (r1, c1, K) -> (r1*c1, K) merge is a legal Mosaic shape cast
    c1 = -(-(cols + 1) // 8) * 8
    dt = x96_ref.dtype

    # conv1: per dx, one K=2*c_in dot (dy=0+1 packed in lanes) + one
    # K=c_in dot (dy=2 from the buffer's low lanes, rows shifted by 2)
    acc = None
    for dx in range(3):
        m96 = x96_ref[0, pl.ds(r0, r1), dx:dx + c1, :].reshape(r1 * c1,
                                                               2 * c_in)
        part = jax.lax.dot_general(
            m96, w96_ref[dx], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m48 = x96_ref[0, pl.ds(r0 + 2, r1),
                      dx:dx + c1, 0:c_in].reshape(r1 * c1, c_in)
        part = part + jax.lax.dot_general(
            m48, w48_ref[dx], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    y1 = acc + b1_ref[:].astype(jnp.float32)
    y1 = (y1 * jax.nn.sigmoid(y1)).astype(dt).reshape(r1, c1, c_mid)
    # conv2's top/left padding zero-pads the Y1 MAP (stem_apply uses
    # padding=((1,0),(1,0)) on y1), so at the global boundary the halo is
    # zero — NOT conv1 applied to padded x
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (r1, c1, c_mid), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (r1, c1, c_mid), 1)
    edge = (cols_i == 0) | ((rows_i == 0) & (pl.program_id(1) == 0))
    y1 = jnp.where(edge, jnp.zeros_like(y1), y1)

    # conv2: 2x2, stride 1 on the coarse grid (pad top/left = the y1 halo);
    # dx taps packed along N, halves re-added with a one-column shift
    acc2 = None
    for dy in range(2):
        m = y1[dy:dy + r_out, 0:c1, :].reshape(r_out * c1, c_mid)
        part = jax.lax.dot_general(
            m, w2_ref[dy], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        part = part.reshape(r_out, c1, 2 * c_out)
        q = part[:, 0:cols, 0:c_out] + part[:, 1:cols + 1, c_out:2 * c_out]
        acc2 = q if acc2 is None else acc2 + q
    y2 = acc2 + b2_ref[:].astype(jnp.float32)
    out_ref[0] = (y2 * jax.nn.sigmoid(y2)).astype(dt)


@jax.jit
def stem_apply_pallas(x48: jnp.ndarray, w1p: jnp.ndarray, b1p: jnp.ndarray,
                      w2p: jnp.ndarray, b2p: jnp.ndarray) -> jnp.ndarray:
    """x48: (B, H, W, c_in) normalized input on the 4x4 s2d grid (bf16/f32).
    Returns (B, H, W, c_out) — layer 1's output, same as stem_apply."""
    b, h, w, c_in = x48.shape
    c_mid = w1p.shape[-1]
    c_out = w2p.shape[-1]
    dt = x48.dtype
    # The kernel's f32 accumulator stack (~2 x rpb*cols*c_mid) plus the
    # whole-image input block must fit the 16 MB scoped-VMEM budget, so the
    # row block shrinks with the stem width (yolov5m's c_mid=192 OOM'd at
    # the yolov5s-tuned rpb=32) and again for batched serving, where XLA
    # schedules neighbouring per-item calls with overlapping lifetimes
    # (b=8 OOM'd at rpb=32 even for yolov5s).
    rpb_max = max(8, ROWS_PER_BLOCK * 128 // c_mid)
    if b > 1:
        rpb_max = max(8, rpb_max // 2)
    rpb = h
    for cand in (64, 32, 16, 8):
        if cand <= rpb_max and h % cand == 0:
            rpb = cand
            break
    # conv1 pad=1 everywhere; conv2 consumes one extra halo row/col at the
    # top/left; right cols padded out to the kernel's sublane-aligned c1;
    # one extra bottom row so the dy=2 tap's row window stays in range
    c1 = -(-(w + 1) // 8) * 8
    xp = jnp.pad(x48, ((0, 0), (2, 2), (2, c1 - w), (0, 0)))
    # lane-pack consecutive rows: x96[r] = (xp[r], xp[r+1]) -> conv1's
    # dy=0/1 taps become one K=2*c_in dot (see module docstring)
    x96 = jnp.concatenate([xp[:, :-1], xp[:, 1:]], -1)
    w96 = jnp.stack([jnp.concatenate([w1p[0, dx], w1p[1, dx]], 0)
                     for dx in range(3)])        # (3, 2*c_in, c_mid)
    w48 = jnp.stack([w1p[2, dx] for dx in range(3)])   # (3, c_in, c_mid)
    w2n = jnp.stack([jnp.concatenate([w2p[dy, 0], w2p[dy, 1]], 1)
                     for dy in range(2)])        # (2, c_mid, 2*c_out)
    kernel = functools.partial(_kernel, cols=w, c_in=c_in, c_mid=c_mid,
                               c_out=c_out)
    call = pl.pallas_call(
        kernel,
        # one batch item per call: with a batch grid axis the (constant
        # across ri) whole-image input block gets double-buffered across
        # bi steps — 2 x 6.7 MB blows the 16 MB scoped-VMEM budget at
        # serving batch sizes.  Per-item calls keep the block single-
        # buffered (the same structure as the mask kernel's batch loop).
        grid=(1, h // rpb),
        in_specs=[
            # whole packed image: revisited across the row grid (index_map
            # ignores ri), so it's DMA'd once
            pl.BlockSpec((1, h + 3, c1 + 2, 2 * c_in),
                         lambda bi, ri: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rpb, w, c_out),
                               lambda bi, ri: (0, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, h, w, c_out), dt),
        interpret=jax.default_backend() != "tpu",
    )
    ws = (jnp.asarray(w96, dt), jnp.asarray(w48, dt),
          jnp.asarray(b1p, jnp.float32), jnp.asarray(w2n, dt),
          jnp.asarray(b2p, jnp.float32))
    outs = [call(x96[i:i + 1], *ws) for i in range(b)]
    return outs[0] if b == 1 else jnp.concatenate(outs, 0)
