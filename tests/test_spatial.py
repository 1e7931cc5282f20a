"""Spatial (H-axis) model parallelism vs the single-device forward.

GSPMD partitions the convs over the mesh's ``model`` axis (halo exchanges
inserted by XLA); results must match the unsharded forward.  Runs on the
8-virtual-CPU mesh from conftest."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multiyolov5_tpu.models.model import Model, forward
from multiyolov5_tpu.parallel.mesh import make_mesh
from multiyolov5_tpu.parallel.spatial import (spatial_forward,
                                              spatial_sharding_ok)


@pytest.mark.parametrize("n_data,n_model", [(2, 4), (1, 8)])
def test_spatial_forward_matches_single_device(n_data, n_model):
    m = Model("yolov5s_city_seg")
    spec, params, state = m.spec, m.params, m.state
    mesh = make_mesh(n_data, n_model)
    h, w = 256, 256
    assert spatial_sharding_ok(h, n_model)
    x = (np.random.RandomState(0).rand(n_data, h, w, 3) * 255).astype(
        np.uint8)

    fn = spatial_forward(spec, params, state, mesh,
                         compute_dtype=jnp.float32, fused=False)
    z_sh, seg_sh = jax.tree.map(np.asarray, fn(jnp.asarray(x)))

    det, seg, _ = forward(spec, params, state,
                          jnp.asarray(x, jnp.float32) / 255.0,
                          train=False, fused=False, decode=True)
    z, seg = np.asarray(det[0]), np.asarray(seg)

    assert z_sh.shape == z.shape and seg_sh.shape == seg.shape
    np.testing.assert_allclose(z_sh, z, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(seg_sh, seg, rtol=1e-4, atol=1e-5)
