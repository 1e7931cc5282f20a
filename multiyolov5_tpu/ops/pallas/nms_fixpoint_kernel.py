"""Pallas TPU kernel for the Jacobi-fixpoint greedy NMS.

The XLA formulation (ops/nms.py:_nms_fixpoint) materializes the (N,N)
suppression matrix in HBM and pays while-loop dispatch overhead per Jacobi
round — ~98us/frame at the engine operating point.  Here the whole fixpoint
runs on-core: the suppression matrix is built once into VMEM (N<=1024 →
4 MB), each round is one (1,N)x(N,N) MXU matvec, and the convergence check
is a scalar in the loop carry.  Exact greedy-NMS semantics (reference
utils/general.py:493-496 via torchvision.ops.nms), same as _nms_fixpoint:
``keep[i] = valid[i] & !any(keep[j] & iou[j,i] > t, j < i)`` over
score-sorted candidates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# (N,N) f32 suppression matrix must fit VMEM (~16 MB/core) next to the
# operands: 1024^2 f32 = 4 MB.
FIXPOINT_PALLAS_MAX_N = 1024


def _kernel(rows_ref, cols_ref, scores_ref, keep_ref, s_ref, *, n, iou_thres):
    """rows: (4, n) f32 [x1;y1;x2;y2]; cols: (n, 4) f32 (same boxes,
    transposed); scores: (1, n) f32 (<=0 -> invalid).  keep out: (1, n) f32.
    s_ref: (n, n) f32 VMEM scratch holding S_T[j, i] = 1 iff kept j would
    suppress i (j < i, iou > thr)."""
    x1r, y1r = rows_ref[0:1, :], rows_ref[1:2, :]
    x2r, y2r = rows_ref[2:3, :], rows_ref[3:4, :]
    x1c, y1c = cols_ref[:, 0:1], cols_ref[:, 1:2]
    x2c, y2c = cols_ref[:, 2:3], cols_ref[:, 3:4]

    area_r = (x2r - x1r) * (y2r - y1r)          # (1, n) lane-wise
    area_c = (x2c - x1c) * (y2c - y1c)          # (n, 1) sublane-wise
    iw = jnp.maximum(jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r), 0.0)
    ih = jnp.maximum(jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r), 0.0)
    inter = iw * ih                              # (n, n) [j, i]
    # division-free threshold: iou > t  <=>  inter*(1+t) > t*(area_j+area_i)
    # (1M VPU divides cost ~45us; the multiply form builds S in ~9us).
    # Rounds differently from the divide at ~1-ulp-off-threshold ties only.
    ji = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)   # j (suppressor)
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)   # i (victim)
    s_ref[:] = jnp.where(
        (inter * (1.0 + iou_thres) > iou_thres * (area_c + area_r))
        & (ji < ii), 1.0, 0.0)

    valid = scores_ref[:] > 0.0                  # (1, n)
    keep0 = jnp.where(valid, 1.0, 0.0)

    def cond(c):
        t, _, changed = c
        return (changed > 0) & (t < n)

    def body(c):
        t, keep, _ = c
        # sup[i] = sum_j keep[j] * S_T[j, i] — one MXU matvec per round
        sup = jax.lax.dot_general(keep, s_ref[:],
                                  dimension_numbers=(((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        keep_new = jnp.where(valid & (sup <= 0.0), 1.0, 0.0)
        changed = jnp.sum(jnp.abs(keep_new - keep)) > 0.0
        return t + 1, keep_new, jnp.where(changed, 1, 0)

    _, keep, _ = jax.lax.while_loop(cond, body, (0, keep0, 1))
    keep_ref[:] = keep


@functools.partial(jax.jit, static_argnames=("iou_thres",))
def nms_fixpoint_pallas(boxes: jnp.ndarray, scores: jnp.ndarray,
                        iou_thres: float) -> jnp.ndarray:
    """boxes (N,4) xyxy f32 (class-offset applied), scores (N,) f32
    score-sorted descending with <=0 marking invalid; N % 128 == 0 and
    N <= FIXPOINT_PALLAS_MAX_N.  Returns keep (N,) bool."""
    n = boxes.shape[0]
    assert n % LANES == 0 and n <= FIXPOINT_PALLAS_MAX_N, n
    rows = boxes.T.astype(jnp.float32)            # (4, n)
    cols = boxes.astype(jnp.float32)              # (n, 4)
    sc = scores.reshape(1, n).astype(jnp.float32)
    kernel = functools.partial(_kernel, n=n, iou_thres=float(iou_thres))
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(rows, cols, sc)
    return keep[0] > 0.5
