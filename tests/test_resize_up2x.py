"""The phase-decomposed 2x upsample must stay bit-identical to the matmul
path (it documents the 2-tap structure even though the matmul is faster)."""

import numpy as np
import jax.numpy as jnp

from multiyolov5_tpu.ops.resize import _up2x_axis, bilinear_matrix


def test_up2x_phase_equals_matrix(rng):
    for n, align in [(8, True), (64, True), (8, False), (33, True)]:
        x = jnp.asarray(rng.randn(2, n, 5, 3).astype(np.float32))
        got = np.asarray(_up2x_axis(x, 1, align))
        m = bilinear_matrix(n, 2 * n, align)
        want = np.asarray(jnp.einsum("oh,bhwc->bowc", m, x))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6,
                                   err_msg=f"n={n} align={align}")


def test_resize2x_argmax_exact_fp32():
    """Fused phase-blend+argmax == argmax(resize_bilinear(2x)) bit-exactly
    in fp32 (the engine/eval mask path at native Cityscapes sizes)."""
    import jax.numpy as jnp
    import numpy as np
    from multiyolov5_tpu.ops.resize import resize2x_argmax, resize_bilinear

    rng = np.random.RandomState(7)
    for h, w, c in [(37, 53, 19), (64, 128, 2), (1, 5, 4), (16, 16, 21)]:
        x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
        ref = jnp.argmax(resize_bilinear(x, (2 * h, 2 * w),
                                         align_corners=True), -1)
        got = resize2x_argmax(x)
        assert (np.asarray(ref) == np.asarray(got)).all(), (h, w, c)
