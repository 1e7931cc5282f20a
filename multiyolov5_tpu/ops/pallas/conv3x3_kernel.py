"""Pallas TPU kernel: stride-1 (optionally dilated) 3x3 conv + SiLU.

For the low-resolution tail of the network (the seg head's RFB2/FFM convs
at 1/8 input resolution) XLA picks narrow T(2,128) tilings and pays
relayout copies — its FFM 3x3 runs ~2.3x slower than the same conv
compiled standalone (see PROGRESS round 2).  This kernel runs the conv as
9 full-K-fill im2col dots on VMEM-resident rows (the same structure as
ops/pallas/stem_kernel.py conv1), and being a custom call it anchors its
operands/results to the clean default layout — severing backward layout
propagation into the producers.

Scope: stride 1, kernel 3x3, symmetric padding d (= dilation, torch
autopad), NHWC, c_in % 8 == 0, whole (H+2d, W-padded, c_in) input block
resident in VMEM per batch item.  Inference path only (BN pre-folded into
w/b by the engine).  Exact same math as ops/nn.Ctx.conv_bn_act on the
fused params — verified in tests/test_conv3x3_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, out_ref, *, cols, c_in, c_out, d, act):
    """x_ref: (1, H+2d, cols_p+2d, c_in) padded input; out_ref: (1, R, cols,
    c_out) block at row r0.  w_ref: (3, 3, c_in, c_out); b_ref: (c_out,)."""
    r_out = out_ref.shape[1]
    r0 = pl.program_id(1) * r_out
    # padded col count: output cols padded to the sublane tile so the
    # (r, c, K) -> (r*c, K) merge is a legal Mosaic shape cast
    cp = -(-cols // 8) * 8
    acc = None
    for dy in range(3):
        for dx in range(3):
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


@functools.partial(jax.jit, static_argnames=("d", "act", "rows_per_block"))
def conv3x3_silu_pallas(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                        d: int = 1, act: bool = True,
                        rows_per_block: int = 32) -> jnp.ndarray:
    """x: (B, H, W, c_in); w: (3, 3, c_in, c_out) HWIO fused weight;
    b: (c_out,) fused bias.  Stride 1, padding d (torch autopad for a
    dilated 3x3).  Returns (B, H, W, c_out)."""
    bsz, h, w_, c_in = x.shape
    c_out = w.shape[-1]
    assert c_in % 8 == 0, c_in
    dt = x.dtype
    rpb = rows_per_block if h % rows_per_block == 0 else h
    cp = -(-w_ // 8) * 8
    xp = jnp.pad(x, ((0, 0), (d, d), (d, cp - w_ + d), (0, 0)))
    kernel = functools.partial(_kernel, cols=w_, c_in=c_in, c_out=c_out,
                               d=d, act=act)
    return pl.pallas_call(
        kernel,
        grid=(bsz, h // rpb),
        in_specs=[
            pl.BlockSpec((1, h + 2 * d, cp + 2 * d, c_in),
                         lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rpb, w_, c_out),
                               lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w_, c_out), dt),
        interpret=jax.default_backend() != "tpu",
    )(xp, jnp.asarray(w, dt), jnp.asarray(b, jnp.float32))
