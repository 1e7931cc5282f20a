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
