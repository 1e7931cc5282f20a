"""Pallas TPU kernel for greedy NMS.

The XLA ``lax.scan`` formulation (ops/nms.py:_nms_fixed) pays ~10us of
while-loop overhead per pick — 300 picks ≈ 3ms.  This kernel runs the whole
greedy loop on-core: candidates live in VMEM ((N//128) x 128 lane tiles), each
pick is an argmax + one IoU row broadcast + mask update, so a pick costs a few
VPU ops and the full 300-pick NMS lands in the ~100us range.

Semantics identical to sequential greedy NMS truncated at max_det (which is
what reference utils/general.py:493-496 computes via torchvision.ops.nms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _nms_kernel(boxes_ref, scores_ref, out_idx_ref, out_valid_ref, *, n_rows,
                iou_thres, max_det, md_pad):
    """boxes: (4, R, 128) f32; scores: (R, 128) f32 (<=0 -> invalid)."""
    x1 = boxes_ref[0]
    y1 = boxes_ref[1]
    x2 = boxes_ref[2]
    y2 = boxes_ref[3]
    area = (x2 - x1) * (y2 - y1)
    scores0 = scores_ref[:]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_rows, LANES), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (n_rows, LANES), 1)
    flat_ids = row_ids * LANES + lane_ids

    # pre-fill: every slot is empty until a pick lands in it, so the pick
    # loop can stop at the first failed pick (torchvision nms also does no
    # work past the last surviving candidate)
    def clear(t, _):
        out_idx_ref[t] = jnp.int32(-1)
        out_valid_ref[t] = jnp.int32(0)
        return 0
    jax.lax.fori_loop(0, md_pad, clear, 0)

    def cond(carry):
        t, go, _ = carry
        return (t < max_det) & (go > 0)

    def body(carry):
        t, _, active = carry
        # active: float32 0/1 mask (Mosaic can't carry i1 vectors in scf.for)
        s = jnp.where(active > 0.5, scores0, -jnp.inf)
        m = jnp.max(s)
        is_pick = (s == m) & (active > 0.5)
        # tie-break: lowest flat index among maxima
        pick_id = jnp.min(jnp.where(is_pick, flat_ids, jnp.int32(2 ** 30)))
        pick = flat_ids == pick_id
        ok = m > 0.0
        # gather the picked box via one-hot reduction (no dynamic gather)
        px1 = jnp.sum(jnp.where(pick, x1, 0.0))
        py1 = jnp.sum(jnp.where(pick, y1, 0.0))
        px2 = jnp.sum(jnp.where(pick, x2, 0.0))
        py2 = jnp.sum(jnp.where(pick, y2, 0.0))
        parea = (px2 - px1) * (py2 - py1)
        iw = jnp.maximum(jnp.minimum(x2, px2) - jnp.maximum(x1, px1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, py2) - jnp.maximum(y1, py1), 0.0)
        inter = iw * ih
        iou = inter / (area + parea - inter + 1e-9)
        keep_f = jnp.where((iou > iou_thres) | pick, 0.0, 1.0)
        new_active = active * keep_f

        @pl.when(ok)
        def _():
            out_idx_ref[t] = pick_id
            out_valid_ref[t] = jnp.int32(1)

        return (t + 1, jnp.where(ok, 1, 0), new_active)

    jax.lax.while_loop(cond, body,
                       (0, 1, jnp.where(scores0 > 0.0, 1.0, 0.0)))


@functools.partial(jax.jit, static_argnames=("iou_thres", "max_det"))
def nms_pallas(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thres: float,
               max_det: int):
    """boxes (N,4) xyxy f32 (already class-offset), scores (N,) f32 with
    <=0 marking invalid.  N must be a multiple of 128.
    Returns (idx (max_det,), valid (max_det,) bool)."""
    n = boxes.shape[0]
    assert n % LANES == 0, n
    r = n // LANES
    boxes_t = boxes.T.reshape(4, r, LANES).astype(jnp.float32)
    scores_t = scores.reshape(r, LANES).astype(jnp.float32)
    # pad max_det to the lane width for a legal (1, max_det) output tile
    md = int(np.ceil(max_det / LANES) * LANES)
    kernel = functools.partial(_nms_kernel, n_rows=r, iou_thres=iou_thres,
                               max_det=max_det, md_pad=md)
    idx, valid = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((md,), jnp.int32),
                   jax.ShapeDtypeStruct((md,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=jax.default_backend() != "tpu",
    )(boxes_t, scores_t)
    return idx[:max_det], valid[:max_det] > 0
