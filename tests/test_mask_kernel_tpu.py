"""On-device validation of the fused upsample+argmax mask kernel.

Runs ONLY on real TPU hardware (``MULTIYOLOV5_TPU_TESTS=1 python -m pytest
tests/test_mask_kernel_tpu.py``) — the CPU suite exercises the exact
fallback path and never reaches ``_upsample_argmax_planar_tpu``.

Validates the advisor-flagged (round 4) default-on packed/offset argmax
keys against exact float64 ground truth (the same composed interpolation
matrices evaluated on host):

  * any pixel where the kernel disagrees with exact argmax must be a
    genuine near-tie — the float64 top1-top2 logit gap at that pixel is
    below the documented quantization band (+ interpolation rounding);
  * the disagreement *rate* on random logits is negligible;
  * on adversarially tied logits the kernel still picks one of the true
    top-2 classes everywhere;
  * MULTIYOLOV5_MASK_OFFSET_KEY=0 and =1 agree except inside the band.

Reference analog: detect.py:191-193 (interpolate + argmax on CPU) — the
reference has no fused kernel; exact jnp.argmax is the parity target.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="real TPU only")


def _exact_f64(xp, out_hw, via_hw, align_corners=True):
    """Host float64 ground truth: composed-matrix planes, argmax, top-2 gap."""
    from multiyolov5_tpu.ops.pallas.upsample_argmax_kernel import \
        _compose_matrix
    b, c, h, w = xp.shape
    mh = _compose_matrix(h, out_hw[0], via_hw[0] if via_hw else None,
                         align_corners)
    mw = _compose_matrix(w, out_hw[1], via_hw[1] if via_hw else None,
                         align_corners)
    x64 = np.asarray(xp, np.float64)
    planes = np.einsum("oh,bchw,wp->bcop", mh, x64, mw.T, optimize=True)
    srt = np.sort(planes, axis=1)
    gap = srt[:, -1] - srt[:, -2]
    return np.argmax(planes, axis=1).astype(np.uint8), gap


def _run_kernel(xp, out_hw, via_hw):
    from multiyolov5_tpu.ops.pallas.upsample_argmax_kernel import \
        upsample_argmax_planar
    return np.asarray(upsample_argmax_planar(
        jnp.asarray(xp), out_hw, via_hw=via_hw, align_corners=True))


GEOM = dict(c=19, h=64, w=128, via=(512, 1024), out=(1024, 2048))


@pytest.mark.parametrize("dtype,band", [
    # offset-key band: ~2.4e-4 absolute on the logits; f32 interp adds ~1e-5.
    (np.float32, 5e-4),
    # bf16 inputs/matrices: interpolation rounding dominates (~1e-2 relative
    # on O(5) logits) — the key quantization is invisible under it.
    ("bfloat16", 1.2e-1),
])
def test_random_logits_mismatches_are_near_ties(dtype, band):
    rng = np.random.RandomState(7)
    g = GEOM
    xp = rng.randn(1, g["c"], g["h"], g["w"]).astype(np.float32) * 2.0
    ref, gap = _exact_f64(xp, g["out"], g["via"])
    xk = jnp.asarray(xp).astype(jnp.bfloat16) if dtype == "bfloat16" else xp
    out = _run_kernel(np.asarray(xk, np.float32), g["out"], g["via"]) \
        if dtype == np.float32 else _run_kernel(xk, g["out"], g["via"])
    mism = out[0] != ref[0]
    rate = mism.mean()
    # every mismatch must be a genuine near-tie in the exact computation
    if mism.any():
        assert gap[0][mism].max() < band, (
            f"non-tie mismatch: worst exact gap {gap[0][mism].max():.2e} "
            f"(band {band:.1e}), rate {rate:.2e}")
    assert rate < (1e-4 if dtype == np.float32 else 2e-2), rate


def test_adversarial_ties_pick_a_true_top2_class():
    """Logits engineered so classes 0/1 are within the quantization band
    everywhere: the kernel may pick either, but never a third class."""
    rng = np.random.RandomState(8)
    g = GEOM
    xp = np.full((1, g["c"], g["h"], g["w"]), -3.0, np.float32)
    # keep the tied pair strictly above the -3.0 floor everywhere (bilinear
    # interpolation is convex, so interpolated values can't dip below the
    # input min): classes 0/1 are the true top-2 at every output pixel
    base = (0.5 * rng.randn(g["h"], g["w"]) + 2.0).astype(np.float32)
    xp[0, 0] = base
    xp[0, 1] = base + rng.uniform(-2e-4, 2e-4,
                                  (g["h"], g["w"])).astype(np.float32)
    out = _run_kernel(xp, g["out"], g["via"])
    assert np.isin(out, (0, 1)).all(), np.unique(out)


def test_offset_key_matches_signfold_key_outside_band(monkeypatch):
    """OFFSET_KEY=1 (default) vs =0 (sign-fold keys): same class map except
    where the exact gap is inside the coarser band."""
    import importlib
    from multiyolov5_tpu.ops.pallas import upsample_argmax_kernel as mod
    rng = np.random.RandomState(9)
    g = GEOM
    xp = rng.randn(1, g["c"], g["h"], g["w"]).astype(np.float32) * 2.0
    ref, gap = _exact_f64(xp, g["out"], g["via"])
    out_on = _run_kernel(xp, g["out"], g["via"])
    monkeypatch.setattr(mod, "_OFFSET_KEY", False)
    mod._upsample_argmax_planar_tpu.clear_cache()
    try:
        out_off = _run_kernel(xp, g["out"], g["via"])
    finally:
        monkeypatch.setattr(mod, "_OFFSET_KEY", True)
        mod._upsample_argmax_planar_tpu.clear_cache()
    diff = out_on[0] != out_off[0]
    if diff.any():
        assert gap[0][diff].max() < 5e-4, gap[0][diff].max()
    # and the sign-fold path is itself near-exact vs f64
    mism = out_off[0] != ref[0]
    assert mism.mean() < 1e-4


def test_batched_matches_per_image():
    """The bs>1 single-call batched grid must produce exactly the same
    class maps as b separate single-image calls."""
    rng = np.random.RandomState(11)
    g = GEOM
    xp = rng.randn(4, g["c"], g["h"], g["w"]).astype(np.float32) * 2.0
    out_b = _run_kernel(xp, g["out"], g["via"])
    for i in range(xp.shape[0]):
        out_1 = _run_kernel(xp[i:i + 1], g["out"], g["via"])
        assert (out_b[i] == out_1[0]).all(), i


def test_below_clamp_pixels_resolve_to_smallest_class():
    """All classes < -63 at a pixel -> clamped tie; documented semantics:
    resolves to the smallest class id (same direction as jnp.argmax picks
    the first max)."""
    g = GEOM
    xp = np.full((1, g["c"], g["h"], g["w"]), -80.0, np.float32)
    out = _run_kernel(xp, g["out"], g["via"])
    assert (out == 0).all()
