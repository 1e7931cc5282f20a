"""Fused C3 block as one Pallas TPU kernel on a column-packed layout.

The early backbone C3 blocks (reference models/common.py:117-126 ``C3``,
instantiated at 1/4 resolution by models/yolov5s_city_seg.yaml:19) run at
32-48 hidden channels over large spatial maps.  XLA prices every load of
such a map at the full 128-lane vector width, so its conv emitters waste
~75% of each cycle (measured: the layer-2 C3's five convs cost ~122us/frame
at batch 8, ~53us at batch 1, vs a ~15us arithmetic+HBM floor).

This kernel packs ``q`` adjacent *columns* into lanes — a free bitcast in
row-major NHWC, ``(H, W, c) -> (H, W/q, q*c)`` — so every dot contracts
K = q*c >= 96 dense lanes, and runs the WHOLE C3 on-core:

    cv1 -> n x (Bottleneck: cv1 1x1, cv2 3x3, add) -> [concat] cv3
                                                    ^ cv2(x) branch

* 1x1 convs become block-diagonal dots on the packed layout (one block per
  packed pixel); the q-fold zero padding costs MXU passes, but these convs
  are fill-bound, not FLOP-bound.
* the 3x3 becomes, per ``dy``, three K=q*c dots against the previous /
  current / next packed column (taps that cross the quad boundary land in
  the neighbour column's weight matrix — mostly zeros, same fill argument).
* cv3 never sees a concat: conv(concat(a, b)) == a @ W3[:c_] + b @ W3[c_:]
  (the same linear commute the engine's LazyCat uses), so the hidden
  activations never leave VMEM — one HBM read of x, one write of y.

Boundary semantics match the XLA lowering exactly: each 3x3's zero padding
applies to its *input feature map* (zero rows/cols re-masked after every
bottleneck — SiLU(bias) of a padded input pixel is NOT zero), and the
row-block halo is recomputed per block from the VMEM-resident input.

Verified against the plain ``blocks.c3`` lowering in
tests/test_c3_kernel.py (interpret mode on CPU, fp32 exact to 1e-5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu_f32(y):
    return y * jax.nn.sigmoid(y)


def _c3_math(rows, r0, rpb, *, H, cpq, cpp, q, c_, nb, shortcut, dt,
             wcv1_ref, bcv1_ref, wcv2_ref, bcv2_ref, w3a_ref, w3b_ref,
             bcv3_ref, wb1_ref, bb1_ref, w33_ref, bb2_ref):
    """Shared C3 math on a padded packed slab.

    rows: (S, cpp, q*c1) slab covering padded rows r0 .. r0+S (slab row t
    is global row r0 + t - nb); returns the (rpb*cpq, q*c2) f32 output of
    the valid region.  Global pad rows/cols are zero in the slab but must
    be re-zeroed after every conv+SiLU (see module docstring)."""
    S = rpb + 2 * nb
    qc_ = q * c_
    rows2d = rows.reshape(S * cpp, rows.shape[-1])

    # global-pad mask for a (S, cpp, K)-shaped slab value: row t is pad iff
    # r0 + t < nb or r0 + t >= H + nb; packed col u is pad iff u == 0 or
    # u > cpq (caller pads 1 left, cpp - cpq - 1 right)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (S, cpp, qc_), 0) + r0
    col_i = jax.lax.broadcasted_iota(jnp.int32, (S, cpp, qc_), 1)
    is_pad = (row_i < nb) | (row_i >= H + nb) | (col_i == 0) | (col_i > cpq)

    def mask(a):
        return jnp.where(is_pad, jnp.zeros_like(a), a)

    # cv1 (1x1, c1 -> c_) on the full slab
    a = jax.lax.dot_general(rows2d, wcv1_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    a = _silu_f32(a + bcv1_ref[:].astype(jnp.float32))
    A = mask(a.astype(dt).reshape(S, cpp, qc_))

    for j in range(nb):
        # bottleneck cv1 (1x1, c_ -> c_)
        b1 = jax.lax.dot_general(A.reshape(S * cpp, qc_), wb1_ref[j],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        b1 = _silu_f32(b1 + bb1_ref[j].astype(jnp.float32))
        # the 3x3's zero padding applies to ITS input (this cv1's output):
        # at global pad positions b1 = SiLU(bias) != 0 and must be zeroed
        B1 = mask(b1.astype(dt).reshape(S, cpp, qc_))
        # bottleneck cv2 (3x3): rows 1..S-2, packed cols 1..cpq of the slab
        acc = None
        for dy in range(3):
            plane = B1[dy:dy + S - 2]                # (S-2, cpp, qc_)
            for tap in range(3):
                m = plane[:, tap:tap + cpq, :].reshape((S - 2) * cpq, qc_)
                part = jax.lax.dot_general(
                    m, w33_ref[j, dy, tap],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
        c = _silu_f32(acc + bb2_ref[j].astype(jnp.float32))
        c = c.reshape(S - 2, cpq, qc_)
        if shortcut:
            c = c + A[1:S - 1, 1:cpq + 1].astype(jnp.float32)
        A = jnp.pad(c.astype(dt), ((1, 1), (1, cpp - cpq - 1), (0, 0)))
        A = mask(A)

    # cv2 branch (1x1 on x) + split cv3, valid region only
    xa = rows[nb:nb + rpb, 1:cpq + 1].reshape(rpb * cpq, rows.shape[-1])
    b2 = jax.lax.dot_general(xa, wcv2_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    b2 = _silu_f32(b2 + bcv2_ref[:].astype(jnp.float32)).astype(dt)
    av = A[nb:nb + rpb, 1:cpq + 1].reshape(rpb * cpq, qc_)
    y = jax.lax.dot_general(av, w3a_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + jax.lax.dot_general(b2, w3b_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return _silu_f32(y + bcv3_ref[:].astype(jnp.float32))


def _kernel(x_ref, wcv1_ref, bcv1_ref, wcv2_ref, bcv2_ref, w3a_ref, w3b_ref,
            bcv3_ref, wb1_ref, bb1_ref, w33_ref, bb2_ref, out_ref, *,
            H, cpq, cpp, q, c_, nb, shortcut):
    """x_ref: (1, H + 2*nb, cpp, q*c1) padded packed image; out_ref:
    (1, rpb, cpq, q*c2) block at output row r0 = ri * rpb."""
    rpb = out_ref.shape[1]
    r0 = pl.program_id(1) * rpb
    dt = out_ref.dtype
    rows = x_ref[0, pl.ds(r0, rpb + 2 * nb)]         # (S, cpp, q*c1)
    y = _c3_math(rows, r0, rpb, H=H, cpq=cpq, cpp=cpp, q=q, c_=c_, nb=nb,
                 shortcut=shortcut, dt=dt, wcv1_ref=wcv1_ref,
                 bcv1_ref=bcv1_ref, wcv2_ref=wcv2_ref, bcv2_ref=bcv2_ref,
                 w3a_ref=w3a_ref, w3b_ref=w3b_ref, bcv3_ref=bcv3_ref,
                 wb1_ref=wb1_ref, bb1_ref=bb1_ref, w33_ref=w33_ref,
                 bb2_ref=bb2_ref)
    out_ref[0] = y.astype(dt).reshape(rpb, cpq, out_ref.shape[-1])


def _kernel_hwbc(x_ref, wcv1_ref, bcv1_ref, wcv2_ref, bcv2_ref, w3a_ref,
                 w3b_ref, bcv3_ref, wb1_ref, bb1_ref, w33_ref, bb2_ref,
                 out_ref, slab_ref, *, H, cpq, cpp, q, c_, nb, shortcut,
                 bsz, c2, nri):
    """Batch-layout variant: grid (nri, bsz) with bi INNER; out_ref is the
    (rpb, cpq, q*bsz*c2) block at (ri, 0, 0), revisited across bi (stays
    VMEM-resident), lane-ordered (q-phase, batch, channel) so the 3D HBM
    result's bytes are exactly the (H, W, B, c2) row-major array — i.e.
    the {3,0,2,1} batch layout XLA's bs>1 conv emitters want, with zero
    relayout copies at either custom-call boundary (round-5: those copies
    cost ~55us/frame of the bs8 serving budget).

    x_ref: (1, H, cpq, q*c1) RAW packed image bi (reshape-of-NHWC bitcast,
    not pre-padded); the zero halo lives in slab_ref, built in-kernel."""
    rpb = out_ref.shape[0]
    S = rpb + 2 * nb
    ri = pl.program_id(0)
    bi = pl.program_id(1)
    r0 = ri * rpb
    dt = out_ref.dtype

    # padded slab build: col pads (packed col 0 and cpq+1..) are zeroed once
    # and never overwritten; row pads are zeroed when first/last row blocks
    # are entered; the interior is copied from the raw image every step
    qc1 = x_ref.shape[-1]

    @pl.when((ri == 0) & (bi == 0))
    def _zero_all():
        slab_ref[...] = jnp.zeros((S, cpp, qc1), dt)

    if nri > 1:
        @pl.when((ri == nri - 1) & (bi == 0))
        def _zero_bottom():   # rows S-nb.. held interior data at earlier ri
            slab_ref[S - nb:, :, :] = jnp.zeros((nb, cpp, qc1), dt)

    if nri == 1:
        slab_ref[nb:nb + H, 1:cpq + 1, :] = x_ref[0]
    else:
        @pl.when(ri == 0)
        def _fill_first():
            slab_ref[nb:S, 1:cpq + 1, :] = x_ref[0, 0:rpb + nb]

        @pl.when((ri > 0) & (ri < nri - 1))
        def _fill_mid():
            slab_ref[0:S, 1:cpq + 1, :] = x_ref[0, pl.ds(r0 - nb, S)]

        @pl.when(ri == nri - 1)
        def _fill_last():
            slab_ref[0:S - nb, 1:cpq + 1, :] = \
                x_ref[0, pl.ds(H - (rpb + nb), rpb + nb)]

    y = _c3_math(slab_ref[...], r0, rpb, H=H, cpq=cpq, cpp=cpp, q=q, c_=c_,
                 nb=nb, shortcut=shortcut, dt=dt, wcv1_ref=wcv1_ref,
                 bcv1_ref=bcv1_ref, wcv2_ref=wcv2_ref, bcv2_ref=bcv2_ref,
                 w3a_ref=w3a_ref, w3b_ref=w3b_ref, bcv3_ref=bcv3_ref,
                 wb1_ref=wb1_ref, bb1_ref=bb1_ref, w33_ref=w33_ref,
                 bb2_ref=bb2_ref)
    yk = y.astype(dt).reshape(rpb, cpq, q * c2)
    # static lane-window writes: packed pixel k of image b lands at lane
    # window (k*bsz + b)*c2 — bytes (h, wq, k, b, c) == (H, W, B, c2)
    for b in range(bsz):
        @pl.when(bi == b)
        def _store(b=b):
            for k in range(q):
                out_ref[:, :, (k * bsz + b) * c2:(k * bsz + b + 1) * c2] = \
                    yk[:, :, k * c2:(k + 1) * c2]


def _bd(w: jnp.ndarray, q: int) -> jnp.ndarray:
    """Block-diagonal packed-pixel weight: kron(I_q, w) -> (q*ci, q*co)."""
    return jnp.kron(jnp.eye(q, dtype=w.dtype), w)


def _pack_w33(w: jnp.ndarray, q: int, ci: int, co: int,
              d: int = 1) -> jnp.ndarray:
    """(3, 3, ci, co) HWIO 3x3 weight -> (3, 3, q*ci, q*co) packed-column
    tap mats [dy, tap] for tap in (prev, cur, next): output pixel k of a
    packed col takes w[dy, dx] from input pixel p = k + (dx-1)*d, which
    lives in the previous (p < 0), current (0 <= p < q), or next (p >= q)
    packed column (d <= q keeps every tap within one column of halo)."""
    assert d <= q, (d, q)
    out = jnp.zeros((3, 3, q * ci, q * co), w.dtype)
    for k in range(q):
        for dx in range(3):
            p = k + (dx - 1) * d
            tap, pp = ((0, p + q) if p < 0 else (2, p - q) if p >= q
                       else (1, p))
            out = out.at[:, tap, pp * ci:(pp + 1) * ci,
                         k * co:(k + 1) * co].set(w[:, dx])
    return out


def packed_q_for(ci: int, w: int, d: int = 1) -> int:
    """Column-packing factor for a narrow stride-1 3x3 (dilation ``d``) at
    width ``w`` — 0 when the plain im2col kernel (full-K already, or
    unpackable geometry) should be used instead.  Dilated taps reach
    ±d full-res columns, which stays within one packed-column halo only
    for d <= q."""
    if ci > 64 or ci % 8 or ci >= 128:
        return 0
    q = 128 // ci
    while q > 1 and (w % q or (w // q) % 8 or d > q):
        q //= 2
    return q if q > 1 and d <= q else 0


def _conv_kernel(x_ref, w33_ref, b_ref, out_ref, *, H, cpq, cpp, q, d, act):
    """Standalone column-packed 3x3/s1 conv (+SiLU): the packed-C3 kernel's
    tap machinery without the 1x1s.  x_ref: (1, H+2d, cpp, q*ci) padded
    packed image (d-row halo, 1 packed-col left halo); out block
    (1, rpb, cpq, q*co)."""
    rpb = out_ref.shape[1]
    r0 = pl.program_id(1) * rpb
    qci = x_ref.shape[-1]
    rows = x_ref[0, pl.ds(r0, rpb + 2 * d)]          # (rpb+2d, cpp, q*ci)
    acc = None
    for dy in range(3):
        plane = rows[dy * d:dy * d + rpb]
        for tap in range(3):
            m = plane[:, tap:tap + cpq, :].reshape(rpb * cpq, qci)
            part = jax.lax.dot_general(
                m, w33_ref[dy, tap], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    y = acc + b_ref[:].astype(jnp.float32)
    if act:
        y = _silu_f32(y)
    out_ref[0] = y.astype(out_ref.dtype).reshape(rpb, cpq,
                                                 out_ref.shape[-1])


@functools.partial(jax.jit, static_argnames=("q", "d", "act"))
def conv3x3_packed_pallas(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                          q: int, d: int = 1, act: bool = True) -> jnp.ndarray:
    """3x3 stride-1 conv + SiLU on a q-column-packed layout, for narrow
    channel counts (q*ci fills the 128 contraction lanes the plain im2col
    kernel under-fills at ci < 128).  Supports torch-autopad dilation
    d <= q (the RFB2 cascade's d=2/3 branches, reference
    models/common.py:470-511).  x: (B, H, W, ci), W % q == 0 and
    (W // q) % 8 == 0; w: (3, 3, ci, co) HWIO; returns (B, H, W, co)."""
    bsz, h, w_, ci = x.shape
    co = w.shape[-1]
    dt = x.dtype
    cpq = w_ // q
    cpp = -(-(cpq + 2) // 8) * 8
    xq = x.reshape(bsz, h, cpq, q * ci)
    xq = jax.lax.dynamic_update_slice(
        jnp.zeros((bsz, h + 2 * d, cpp, q * ci), dt), xq, (0, d, 1, 0))
    rpb = h
    for cand in (32, 16, 8):
        if h % cand == 0:
            rpb = cand
            break
    w33 = _pack_w33(w, q, ci, co, d)
    kernel = functools.partial(_conv_kernel, H=h, cpq=cpq, cpp=cpp, q=q,
                               d=d, act=act)
    return pl.pallas_call(
        kernel,
        grid=(bsz, h // rpb),
        in_specs=[
            pl.BlockSpec((1, h + 2 * d, cpp, q * ci),
                         lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rpb, cpq, q * co),
                               lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, cpq, q * co), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=jax.default_backend() != "tpu",
    )(xq, w33.astype(dt),
      jnp.tile(b, q).astype(jnp.float32)).reshape(bsz, h, w_, co)


@functools.partial(jax.jit, static_argnames=("q", "shortcut"))
def c3_packed_pallas_hwbc(x: jnp.ndarray, wcv1, bcv1, wcv2, bcv2, wcv3,
                          bcv3, mws, q: int,
                          shortcut: bool = True) -> jnp.ndarray:
    """Batch-layout fused C3: same math as :func:`c3_packed_pallas`, but
    both custom-call boundaries are copy-free at serving batch sizes.

    The input is the RAW packed reshape of x (a row-major bitcast — the
    zero halo is built in an in-kernel VMEM slab, so no XLA pad/DUS that
    layout assignment can bracket with relayout copies), and the output is
    a 3D (H, Wq, q*B*c2) array whose lane order (q-phase, batch, channel)
    makes its bytes exactly the (H, W, B, c2) row-major array == the
    [B,H,W,c2]{3,0,2,1} batch layout XLA's bs>1 conv emitters consume
    directly (dim_labels 01bf — verified: the final transpose compiles to
    a bitcast).  Grid is (row blocks, batch) with batch INNER so the
    output block stays VMEM-resident across the batch and is stored once.

    Returns (B, H, W, c2), numerically identical to c3_packed_pallas
    (tests/test_c3_kernel.py::test_c3_hwbc_matches_packed)."""
    bsz, h, w_, c1 = x.shape
    c_ = wcv1.shape[-1]
    c2 = wcv3.shape[-1]
    nb = len(mws)
    dt = x.dtype
    cpq = w_ // q
    cpp = -(-(cpq + 2) // 8) * 8
    xq = x.reshape(bsz, h, cpq, q * c1)          # row-major bitcast

    rpb = h
    for cand in (32, 16, 8):
        if h % cand == 0:
            rpb = cand
            break
    nri = h // rpb

    wb1 = jnp.stack([_bd(m[0].reshape(c_, c_), q) for m in mws])
    bb1 = jnp.stack([jnp.tile(m[1], q) for m in mws]).astype(jnp.float32)
    w33 = jnp.stack([_pack_w33(m[2], q, c_, c_) for m in mws])
    bb2 = jnp.stack([jnp.tile(m[3], q) for m in mws]).astype(jnp.float32)

    kernel = functools.partial(_kernel_hwbc, H=h, cpq=cpq, cpp=cpp, q=q,
                               c_=c_, nb=nb, shortcut=shortcut, bsz=bsz,
                               c2=c2, nri=nri)
    out3 = pl.pallas_call(
        kernel,
        grid=(nri, bsz),
        in_specs=[
            # whole raw image per (ri, bi): re-DMA'd per step (batch inner),
            # hidden under the block's MXU work
            pl.BlockSpec((1, h, cpq, q * c1), lambda ri, bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec((rpb, cpq, q * bsz * c2),
                               lambda ri, bi: (ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, cpq, q * bsz * c2), dt),
        scratch_shapes=[pltpu.VMEM((rpb + 2 * nb, cpp, q * c1), dt)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=jax.default_backend() != "tpu",
    )(xq,
      _bd(wcv1.reshape(c1, c_), q).astype(dt),
      jnp.tile(bcv1, q).astype(jnp.float32),
      _bd(wcv2.reshape(c1, c_), q).astype(dt),
      jnp.tile(bcv2, q).astype(jnp.float32),
      _bd(wcv3.reshape(2 * c_, c2)[:c_], q).astype(dt),
      _bd(wcv3.reshape(2 * c_, c2)[c_:], q).astype(dt),
      jnp.tile(bcv3, q).astype(jnp.float32),
      wb1.astype(dt), bb1, w33.astype(dt), bb2)
    # (H, Wq, q*B*c2) -> (H, W, B, c2) is stride-uniform (pure bitcast);
    # the 4D HWBC -> BHWC transpose is then absorbed into the consumer
    # conv's dim_labels (01bf) by XLA — keep it in exactly this 4D form
    # (a 5D transpose+reshape chain defeated the bitcast pass)
    y = out3.reshape(h, w_, bsz, c2)
    return jnp.transpose(y, (2, 0, 1, 3))


@functools.partial(jax.jit, static_argnames=("q", "shortcut"))
def c3_packed_pallas(x: jnp.ndarray, wcv1, bcv1, wcv2, bcv2, wcv3, bcv3,
                     mws, q: int, shortcut: bool = True) -> jnp.ndarray:
    """Fused C3 on a q-column-packed layout.

    x: (B, H, W, c1) NHWC, W % q == 0 and (W // q) % 8 == 0.
    wcv1/wcv2: (1, 1, c1, c_); wcv3: (1, 1, 2*c_, c2); mws: tuple of
    (wb1 (1,1,c_,c_), bb1, wb2 (3,3,c_,c_), bb2) per bottleneck.
    Biases are the BN-folded fused biases.  Returns (B, H, W, c2)."""
    bsz, h, w_, c1 = x.shape
    c_ = wcv1.shape[-1]
    c2 = wcv3.shape[-1]
    nb = len(mws)
    dt = x.dtype
    cpq = w_ // q
    cpp = -(-(cpq + 2) // 8) * 8
    xq = x.reshape(bsz, h, cpq, q * c1)
    # padded halo buffer via dynamic-update-slice into zeros: jnp.pad here
    # made XLA's layout assignment run the pad in a {1,3,2,0} layout and
    # bracket it with two full relayout copies (~27us/frame at bs8); the
    # DUS lowers to one fused write pass in the default layout, which is
    # also the custom call's operand layout — no copies at the boundary
    xq = jax.lax.dynamic_update_slice(
        jnp.zeros((bsz, h + 2 * nb, cpp, q * c1), dt), xq, (0, nb, 1, 0))

    rpb = h
    for cand in (32, 16, 8):
        if h % cand == 0:
            rpb = cand
            break

    wb1 = jnp.stack([_bd(m[0].reshape(c_, c_), q) for m in mws])
    bb1 = jnp.stack([jnp.tile(m[1], q) for m in mws]).astype(jnp.float32)
    w33 = jnp.stack([_pack_w33(m[2], q, c_, c_) for m in mws])
    bb2 = jnp.stack([jnp.tile(m[3], q) for m in mws]).astype(jnp.float32)

    kernel = functools.partial(_kernel, H=h, cpq=cpq, cpp=cpp, q=q, c_=c_,
                               nb=nb, shortcut=shortcut)
    return pl.pallas_call(
        kernel,
        grid=(bsz, h // rpb),
        in_specs=[
            pl.BlockSpec((1, h + 2 * nb, cpp, q * c1),
                         lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec((1, rpb, cpq, q * c2),
                               lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, cpq, q * c2), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=jax.default_backend() != "tpu",
    )(xq,
      _bd(wcv1.reshape(c1, c_), q).astype(dt),
      jnp.tile(bcv1, q).astype(jnp.float32),
      _bd(wcv2.reshape(c1, c_), q).astype(dt),
      jnp.tile(bcv2, q).astype(jnp.float32),
      _bd(wcv3.reshape(2 * c_, c2)[:c_], q).astype(dt),
      _bd(wcv3.reshape(2 * c_, c2)[c_:], q).astype(dt),
      jnp.tile(bcv3, q).astype(jnp.float32),
      wb1.astype(dt), bb1, w33.astype(dt), bb2,
      ).reshape(bsz, h, w_, c2)
