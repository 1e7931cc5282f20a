"""Pallas TPU kernels: stride-1 (optionally dilated) 3x3 conv + SiLU, and
stride-2 3x3 conv + SiLU as a 2x2 conv over a space-to-depth'd grid.

For the low-resolution tail of the network (the seg head's RFB2/FFM convs
and the neck's C3/downsample convs at 1/8..1/32 input resolution) XLA picks
narrow T(2,128) tilings and pays relayout copies — its FFM 3x3 runs ~2.3x
slower than the same conv compiled standalone, and the two neck stride-2
downsample convs ran ~10x off their MXU floor (see PROGRESS round 2).
These kernels run the conv as full-K-fill im2col dots on VMEM-resident
rows (the same structure as ops/pallas/stem_kernel.py conv1), and being
custom calls they anchor their operands/results to the clean default
layout — severing backward layout propagation into the producers.

Scope: kernel 3x3, NHWC, c_in % 8 == 0, whole padded input block resident
in VMEM per batch item.  Stride 1 supports dilation d (torch autopad);
stride 2 packs the padded input into 2x2 phase blocks (channels x4) and
runs a 2x2-tap conv whose grouped weights are the 3x3 taps scattered into
their (row-parity, col-parity) phase slots — exact same math, and every
dot contracts K = 4*c_in lanes (MXU-fill even for small c_in).  Inference
path only (BN pre-folded into w/b by the engine).  Exact vs the XLA
lowering — verified in tests/test_conv3x3_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, out_ref, *, cols, c_in, c_out, kh, kw, d,
            act):
    """x_ref: (1, R_out + (kh-1)*d, cols_p + (kw-1)*d, c_in) haloed input;
    out_ref: (1, R, cols, c_out) block at row r0.  w_ref: (kh, kw, c_in,
    c_out); b_ref: (c_out,)."""
    r_out = out_ref.shape[1]
    r0 = pl.program_id(1) * r_out
    # padded col count: output cols padded to the sublane tile so the
    # (r, c, K) -> (r*c, K) merge is a legal Mosaic shape cast
    cp = -(-cols // 8) * 8
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            m = x_ref[0, pl.ds(r0 + dy * d, r_out),
                      dx * d:dx * d + cp, :].reshape(r_out * cp, c_in)
            part = jax.lax.dot_general(
                m, w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    y = acc + b_ref[:].astype(jnp.float32)
    if act:
        y = y * jax.nn.sigmoid(y)
    out_ref[0] = y.astype(x_ref.dtype).reshape(r_out, cp, c_out)[:, :cols]


def _conv_haloed(xh: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                 out_rows: int, out_cols: int, d: int, act: bool,
                 rows_per_block: int) -> jnp.ndarray:
    """Shared pallas_call: xh already carries the (kh-1)*d / (kw-1)*d halo
    (rows exactly, cols at least out_cols padded to the sublane tile)."""
    bsz = xh.shape[0]
    kh, kw, c_in, c_out = w.shape
    dt = xh.dtype
    rpb = rows_per_block if out_rows % rows_per_block == 0 else out_rows
    cp = -(-out_cols // 8) * 8
    need_cols = cp + (kw - 1) * d
    if xh.shape[2] < need_cols:
        xh = jnp.pad(xh, ((0, 0), (0, 0), (0, need_cols - xh.shape[2]),
                          (0, 0)))
    kernel = functools.partial(_kernel, cols=out_cols, c_in=c_in,
                               c_out=c_out, kh=kh, kw=kw, d=d, act=act)
    return pl.pallas_call(
        kernel,
        grid=(bsz, out_rows // rpb),
        in_specs=[
            pl.BlockSpec((1, out_rows + (kh - 1) * d, need_cols, c_in),
                         lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rpb, out_cols, c_out),
                               lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, out_rows, out_cols, c_out), dt),
        # whole-item input blocks double-buffer across the batch grid axis;
        # the 16 MB default scoped budget OOMs at serving batch sizes
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=jax.default_backend() != "tpu",
    )(xh, jnp.asarray(w, dt), jnp.asarray(b, jnp.float32))


@functools.partial(jax.jit, static_argnames=("d", "act", "rows_per_block"))
def conv3x3_silu_pallas(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                        d: int = 1, act: bool = True,
                        rows_per_block: int = 0) -> jnp.ndarray:
    """x: (B, H, W, c_in); w: (3, 3, c_in, c_out) HWIO fused weight;
    b: (c_out,) fused bias.  Stride 1, padding d (torch autopad for a
    dilated 3x3).  Returns (B, H, W, c_out).

    rows_per_block 0 picks per width: the wide-K convs (c_in >= 256, the
    FFM entry 3x3s) run best at 16-row blocks on v5e (standalone A/B:
    s 256->128 37.0 -> 34.8 us, m 384->192 90.4 -> 81.0); narrower convs
    keep 32 (16 is a small loss at 96-192ch)."""
    bsz, h, w_, c_in = x.shape
    assert c_in % 8 == 0, c_in
    if not rows_per_block:
        rows_per_block = 16 if c_in >= 256 else 32
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    return _conv_haloed(xp, w, b, h, w_, d, act, rows_per_block)


def _kernel_s2(x2_ref, wa_ref, wb_ref, b_ref, out_ref, *, cols, c_in,
               c_out, act):
    """x2_ref: (1, 2*rpb+2, cpp, 2*c_in) column-pair-packed padded input
    rows for this block (full-res rows 2*r0 .. 2*r0+2*rpb+1); out_ref:
    (1, rpb, cols, c_out).

    out[i,j] needs xpad rows 2i..2i+2 and packed cols j (lanes hold full-
    res cols 2j, 2j+1 = taps dx=0,1) and j+1 (low lanes = col 2j+2 = tap
    dx=2).  Row parity resolves through a free outer-dim split; per dy one
    K=2c dot covers dx=0+1 (both lane halves useful) and one K=2c dot with
    a zero-bottom weight covers dx=2."""
    rpb = out_ref.shape[1]
    r0 = pl.program_id(1) * rpb
    cp = -(-cols // 8) * 8
    rows = x2_ref[0, pl.ds(2 * r0, 2 * rpb + 2)]
    view = rows.reshape(rpb + 1, 2, x2_ref.shape[2], 2 * c_in)
    acc = None
    for dy in range(3):
        plane = (view[0:rpb, dy] if dy < 2
                 else view[1:rpb + 1, 0])          # (rpb, cpp, 2c)
        ma = plane[:, 0:cp, :].reshape(rpb * cp, 2 * c_in)
        part = jax.lax.dot_general(
            ma, wa_ref[dy], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        mb = plane[:, 1:cp + 1, :].reshape(rpb * cp, 2 * c_in)
        part = part + jax.lax.dot_general(
            mb, wb_ref[dy], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    y = acc + b_ref[:].astype(jnp.float32)
    if act:
        y = y * jax.nn.sigmoid(y)
    out_ref[0] = y.astype(out_ref.dtype).reshape(rpb, cp, c_out)[:, :cols]


@functools.partial(jax.jit, static_argnames=("act", "rows_per_block"))
def conv3x3s2_silu_pallas(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                          act: bool = True,
                          rows_per_block: int = 32) -> jnp.ndarray:
    """Stride-2 3x3 conv + SiLU (torch autopad p=1) for even H, W.

    out[i,j] = sum_{dy,dx} w[dy,dx] . xpad[2i+dy, 2j+dx].  The padded
    input's adjacent column pairs are lane-packed by a *bitcast* reshape
    (NHWC row-major: (hp, wp, c) -> (hp, wp/2, 2c) is free — unlike the
    earlier 4-phase space-to-depth transpose, whose relayout chain cost
    more device time than the conv itself: ~30us of reshape+copy per site
    vs a 17us conv at m widths).  Row parity is a free outer-dim split in
    VMEM.  Each dy contributes two K=2*c_in dots: dx=0,1 share one dot
    (both lane halves useful), dx=2 reads the next packed column with a
    zero-bottom weight.  x: (B, H, W, c_in) -> (B, H/2, W/2, c_out)."""
    bsz, h, w_, c_in = x.shape
    c_out = w.shape[-1]
    assert h % 2 == 0 and w_ % 2 == 0, (h, w_)
    assert (2 * c_in) % 8 == 0, c_in
    out_cols = w_ // 2
    cp = -(-out_cols // 8) * 8
    # cols: 1 left pad + w_ + right pad out to 2*(cp+1)-1 full-res cols so
    # the packed view has cp+1 packed columns (tap dx=2 of output col j
    # reads packed col j+1)
    pad_r = 2 * (cp + 1) - 1 - w_
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, pad_r), (0, 0)))
    x2 = xp.reshape(bsz, h + 2, cp + 1, 2 * c_in)       # free bitcast
    wa = jnp.stack([jnp.concatenate([w[dy, 0], w[dy, 1]], 0)
                    for dy in range(3)])                 # (3, 2c, c_out)
    wb = jnp.stack([jnp.concatenate([w[dy, 2], jnp.zeros_like(w[dy, 2])], 0)
                    for dy in range(3)])
    out_rows = h // 2
    rpb = rows_per_block if out_rows % rows_per_block == 0 else out_rows
    dt = x.dtype
    kernel = functools.partial(_kernel_s2, cols=out_cols, c_in=c_in,
                               c_out=c_out, act=act)
    return pl.pallas_call(
        kernel,
        grid=(bsz, out_rows // rpb),
        in_specs=[
            pl.BlockSpec((1, 2 * out_rows + 2, cp + 1, 2 * c_in),
                         lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rpb, out_cols, c_out),
                               lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, out_rows, out_cols, c_out), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=jax.default_backend() != "tpu",
    )(x2, jnp.asarray(wa, dt), jnp.asarray(wb, dt),
      jnp.asarray(b, jnp.float32))
