"""forward(stop_before)+forward(feats_in) == one-shot forward.

The serving engine's batch>1 path runs the trunk per image (batch-1
custom-kernel regime) and the head rows batched (engine._compiled,
round-5); this pins the split-forward plumbing itself on CPU — the
on-device path equivalence is covered by tests/test_batch_scan_tpu.py."""

import numpy as np
import pytest

import jax.numpy as jnp

from multiyolov5_tpu.models.config import load_spec
from multiyolov5_tpu.models.model import forward, init_model


@pytest.fixture(scope="module")
def model():
    spec = load_spec("yolov5s_city_seg")
    params, state = init_model(spec, seed=0)
    return spec, params, state


def test_forward_split_matches_oneshot(model):
    spec, params, state = model
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 128, 3).astype(np.float32))

    det_full, seg_full, _ = forward(spec, params, state, x, decode="planar")

    head_stop = min(i for i in (spec.seg_index, spec.detect_index)
                    if i is not None and i >= 0)
    head_need = sorted({
        j for r in spec.rows[head_stop:]
        for j in (r.f if isinstance(r.f, (list, tuple)) else [r.f])
        if j != -1 and j < head_stop})

    feats, y, _ = forward(spec, params, state, x, decode="planar",
                          stop_before=head_stop)
    assert sorted(feats) == head_need
    det_sp, seg_sp, _ = forward(spec, params, state, y, decode="planar",
                                start_layer=head_stop, feats_in=feats)

    for a, b in zip(det_full[0], det_sp[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(seg_full), np.asarray(seg_sp))


def test_forward_split_per_image_concat(model):
    """Per-image trunk + batched heads == batched one-shot (the engine's
    actual hybrid shape; forward is batch-equivariant on CPU)."""
    spec, params, state = model
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(3, 64, 128, 3).astype(np.float32))

    det_full, seg_full, _ = forward(spec, params, state, x, decode=True)

    head_stop = min(i for i in (spec.seg_index, spec.detect_index)
                    if i is not None and i >= 0)
    per = [forward(spec, params, state, x[i:i + 1], decode=True,
                   stop_before=head_stop) for i in range(3)]
    need = sorted(per[0][0])
    feats = {j: jnp.concatenate([p[0][j] for p in per], 0) for j in need}
    y_s = jnp.concatenate([p[1] for p in per], 0)
    det_sp, seg_sp, _ = forward(spec, params, state, y_s, decode=True,
                                start_layer=head_stop, feats_in=feats)

    np.testing.assert_allclose(np.asarray(det_full[0]),
                               np.asarray(det_sp[0]), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(seg_full), np.asarray(seg_sp),
                               rtol=1e-6, atol=1e-6)
