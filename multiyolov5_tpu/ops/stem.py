"""Folded TPU stem: Focus + first stride-2 Conv on a 4x4 space-to-depth grid.

The YOLOv5 stem (reference models/common.py:542-551 Focus(3,c2,k=3) followed
by Conv(c2,c2b,3,s=2), models/yolov5s_city_seg.yaml:17-18) is the slowest
part of the whole network on TPU: a 3x3 conv with 12 input channels at
512x256 leaves the 128x128 MXU ~90% idle and costs ~0.45 ms/frame — more
than the entire rest of the backbone.

Both stem convs are linear (+bias) with an elementwise SiLU between, so they
can be re-expressed *exactly* on the 4x4 space-to-depth grid (B, H/4, W/4,
48) that the host already produces for free while copying the frame:

  * conv1': 3x3, 48 -> 4*c2.  Output channel (P, co) holds phase P of the
    original Focus-conv output; each tap w0[dy,dx,cin,co] lands at coarse
    offset du = 1 + floor((p+dy-1)/2) reading input phase (p+dy-1) mod 2
    (and likewise for columns).  SiLU applies elementwise, so activating the
    phase-interleaved layout is identical to activating the full-res map.
  * conv2': 2x2 (pad top/left 1), 4*c2 -> c2b, stride 1 on the coarse grid —
    the original stride-2 3x3 window spans exactly two coarse rows/cols.
    Its output *is* layer 1's output (same spatial grid), so the rest of the
    network runs unchanged.

48->128->64 channel matmuls at 256x128 keep the MXU busy: ~0.05 ms vs
~0.6 ms for the two original convs.  Weights are derived from the fused
(BN-folded) checkpoint weights at engine build time — same math, same
checkpoints, verified exact in tests/test_ops.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# phase order of the host space-to-depth: [ee, oe, eo, oo], H-offset first
# (native/preprocess.cpp; engine.space_to_depth_host)
_PHASE = {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3}


def can_fold_stem(spec) -> bool:
    """True when rows 0/1 are the standard Focus(k=3) + Conv(k=3,s=2) stem
    and neither intermediate is consumed elsewhere."""
    if len(spec.rows) < 2:
        return False
    r0, r1 = spec.rows[0], spec.rows[1]
    return (r0.module == "Focus" and len(r0.args) >= 3 and r0.args[2] == 3
            and r1.module == "Conv" and len(r1.args) >= 4
            and r1.args[2] == 3 and r1.args[3] == 2
            and 0 not in spec.save and 1 not in spec.save)


def fold_stem_weights(w0, b0, w1, b1) -> Tuple[np.ndarray, ...]:
    """Derive the folded-stem weights from the fused stem weights.

    Args:
      w0: (3, 3, 4*c1, c2) HWIO Focus conv weight (input phase-stacked).
      b0: (c2,) fused bias.
      w1: (3, 3, c2, c2b) HWIO layer-1 conv weight (stride 2 originally).
      b1: (c2b,) fused bias.
    Returns:
      (w1p (3,3,16*c1,4*c2), b1p (4*c2,), w2p (2,2,4*c2,c2b), b2p (c2b,)).
    """
    w0 = np.asarray(w0, np.float32)
    w1 = np.asarray(w1, np.float32)
    k0, _, c12, c2 = w0.shape
    assert k0 == 3, k0
    c1 = c12 // 4
    _, _, c2_in, c2b = w1.shape
    assert c2_in == c2, (c2_in, c2)

    w1p = np.zeros((3, 3, 4 * c12, 4 * c2), np.float32)
    for p in (0, 1):
        for q in (0, 1):
            pout = _PHASE[(p, q)]
            for dy in range(3):
                du = 1 + (p + dy - 1) // 2
                pr = (p + dy - 1) % 2
                for dx in range(3):
                    dv = 1 + (q + dx - 1) // 2
                    qc = (q + dx - 1) % 2
                    pin = _PHASE[(pr, qc)]
                    w1p[du, dv, pin * c12:(pin + 1) * c12,
                        pout * c2:(pout + 1) * c2] += w0[dy, dx]
    b1p = np.tile(np.asarray(b0, np.float32), 4)

    w2p = np.zeros((2, 2, 4 * c2, c2b), np.float32)
    for dy in range(3):
        du = 1 + (dy - 1) // 2
        p = (dy - 1) % 2
        for dx in range(3):
            dv = 1 + (dx - 1) // 2
            q = (dx - 1) % 2
            pin = _PHASE[(p, q)]
            w2p[du, dv, pin * c2:(pin + 1) * c2] += w1[dy, dx]
    b2p = np.asarray(b1, np.float32)
    return w1p, b1p, w2p, b2p


def fold_stem_from_params(params, c1: int = 3):
    """Extract + fold from a *fused* flat param dict (engine layout)."""
    return fold_stem_weights(
        params["model.0.conv.conv.weight"], params["model.0.conv.conv.bias"],
        params["model.1.conv.weight"], params["model.1.conv.bias"])


def fold_focus_weight(w0: jnp.ndarray) -> jnp.ndarray:
    """jnp (differentiable) analog of ``fold_stem_weights``'s first map.

    w0: (3, 3, 4*c1, c2) stored Focus conv weight -> (3, 3, 16*c1, 4*c2)
    quarter-grid conv whose output channel (P, co) is phase P of the raw
    Focus-conv output.  BN-free: usable at TRAIN time (the fused fold in
    ``fold_stem_weights`` is inference-only because it bakes both convs'
    BN into the weights)."""
    kk, _, c12, c2 = w0.shape
    assert kk == 3, kk
    out = jnp.zeros((3, 3, 4 * c12, 4 * c2), w0.dtype)
    for p in (0, 1):
        for q in (0, 1):
            pout = _PHASE[(p, q)]
            for dy in range(3):
                du = 1 + (p + dy - 1) // 2
                pr = (p + dy - 1) % 2
                for dx in range(3):
                    dv = 1 + (q + dx - 1) // 2
                    qc = (q + dx - 1) % 2
                    pin = _PHASE[(pr, qc)]
                    out = out.at[du, dv, pin * c12:(pin + 1) * c12,
                                 pout * c2:(pout + 1) * c2].add(w0[dy, dx])
    return out


def fold_layer1_weight(w1: jnp.ndarray) -> jnp.ndarray:
    """jnp (differentiable) analog of ``fold_stem_weights``'s second map.

    w1: (3, 3, c2, c2b) layer-1 conv weight (stride 2 on the half grid)
    -> (2, 2, 4*c2, c2b) stride-1 conv on the phase-packed quarter grid
    (pad top/left 1).  BN-free."""
    kk, _, c2, c2b = w1.shape
    assert kk == 3, kk
    out = jnp.zeros((2, 2, 4 * c2, c2b), w1.dtype)
    for dy in range(3):
        du = 1 + (dy - 1) // 2
        p = (dy - 1) % 2
        for dx in range(3):
            dv = 1 + (dx - 1) // 2
            q = (dx - 1) % 2
            pin = _PHASE[(p, q)]
            out = out.at[du, dv, pin * c2:(pin + 1) * c2].add(w1[dy, dx])
    return out


def stem_train_apply(ctx, x48: jnp.ndarray) -> jnp.ndarray:
    """Rows 0-1 (Focus + Conv(3,2)) on the 4x4 s2d grid with LIVE BN.

    The training profile's worst ops by far are the stem convs on the raw
    3-channel frame (6x6-s2d Focus fold + 3x3-s2 layer 1): ~9.4 ms
    fwd+grads at bs8/832px vs ~1.5 ms for this quarter-grid form — 3-ch
    convs leave the MXU idle and drag 1 ms input relayout copies with
    them.  The host feeds (B, H/4, W/4, 16*ch) (pack_stem_host); conv1'
    runs phase-packed (4*c2 channels) with BN moments combined across the
    4 phases (``phases=4`` — identical multiset, so identical statistics),
    and layer 1 is the folded 2x2 quarter-grid conv.  Exact same math and
    the same stored weights/params as rows 0-1 on the raw frame
    (tests/test_train_stem_packed.py); both weight folds are
    differentiable, so training updates the ORIGINAL checkpoint weights.

    Reference semantics: models/common.py Focus.forward + Conv.forward
    (the first two rows of every yolov5 yaml)."""
    w0 = ctx.p["model.0.conv.conv.weight"]
    c2 = w0.shape[-1]
    dt = x48.dtype
    y = jax.lax.conv_general_dilated(
        x48, fold_focus_weight(w0).astype(dt), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt)
    b0 = ctx.p.get("model.0.conv.conv.bias")
    if b0 is not None:
        y = y + jnp.tile(b0, 4).astype(dt)
    if not ctx.fused:
        y = ctx.batch_norm("model.0.conv.bn", y, phases=4)
    y = jax.nn.silu(y)
    w1 = ctx.p["model.1.conv.weight"]
    y = jax.lax.conv_general_dilated(
        y, fold_layer1_weight(w1).astype(dt), window_strides=(1, 1),
        padding=((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt)
    b1 = ctx.p.get("model.1.conv.bias")
    if b1 is not None:
        y = y + b1.astype(dt)
    if not ctx.fused:
        y = ctx.batch_norm("model.1.bn", y)
    return jax.nn.silu(y)


def pack_stem_host(x: np.ndarray) -> np.ndarray:
    """(B, H, W, C) -> (B, H/4, W/4, 16C) host-side double space-to-depth
    (phase order matching stem_train_apply / the engine's folded stem)."""
    from ..engine import space_to_depth_host
    return space_to_depth_host(space_to_depth_host(x))


def stem_apply(x48: jnp.ndarray, w1p, b1p, w2p, b2p) -> jnp.ndarray:
    """x48: (B, H/4, W/4, 16*c1) normalized input on the 4x4 s2d grid.
    Returns layer-1's output (B, H/4, W/4, c2b) exactly."""
    dt = x48.dtype
    y = jax.lax.conv_general_dilated(
        x48, jnp.asarray(w1p).astype(dt), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt)
    y = jax.nn.silu(y + jnp.asarray(b1p).astype(dt))
    y = jax.lax.conv_general_dilated(
        y, jnp.asarray(w2p).astype(dt), window_strides=(1, 1),
        padding=((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt)
    return jax.nn.silu(y + jnp.asarray(b2p).astype(dt))
