"""Pallas folded-stem kernel vs the XLA stem_apply (interpret mode on CPU).

Semantics target: ops/stem.stem_apply — itself verified exact against the
reference Focus+Conv stem in tests/test_ops.py."""

import numpy as np
import pytest

import jax.numpy as jnp

from multiyolov5_tpu.ops import stem as stem_lib
from multiyolov5_tpu.ops.pallas.stem_kernel import stem_apply_pallas


@pytest.mark.parametrize("b,h,w", [(1, 64, 96), (2, 32, 48)])
def test_stem_kernel_matches_xla(rng, b, h, w):
    c1 = 3
    c2, c2b = 16, 24
    w0 = rng.randn(3, 3, 4 * c1, c2).astype(np.float32) * 0.2
    b0 = rng.randn(c2).astype(np.float32) * 0.1
    w1 = rng.randn(3, 3, c2, c2b).astype(np.float32) * 0.2
    b1 = rng.randn(c2b).astype(np.float32) * 0.1
    w1p, b1p, w2p, b2p = stem_lib.fold_stem_weights(w0, b0, w1, b1)
    x = rng.rand(b, h, w, 16 * c1).astype(np.float32)

    want = np.asarray(stem_lib.stem_apply(jnp.asarray(x), w1p, b1p, w2p, b2p))
    got = np.asarray(stem_apply_pallas(jnp.asarray(x), w1p, b1p, w2p, b2p))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_stem_kernel_bf16(rng):
    c2, c2b = 16, 24
    w0 = rng.randn(3, 3, 12, c2).astype(np.float32) * 0.2
    b0 = rng.randn(c2).astype(np.float32) * 0.1
    w1 = rng.randn(3, 3, c2, c2b).astype(np.float32) * 0.2
    b1 = rng.randn(c2b).astype(np.float32) * 0.1
    w1p, b1p, w2p, b2p = stem_lib.fold_stem_weights(w0, b0, w1, b1)
    x = jnp.asarray(rng.rand(1, 64, 64, 48), jnp.bfloat16)

    want = np.asarray(stem_lib.stem_apply(x, w1p, b1p, w2p, b2p),
                      dtype=np.float32)
    got = np.asarray(stem_apply_pallas(x, w1p, b1p, w2p, b2p),
                     dtype=np.float32)
    # bf16 accumulation order differs (im2col vs XLA conv): tolerate ~1%
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


@pytest.mark.parametrize("b,h,w,c2,c2b", [
    (1, 64, 96, 16, 24), (3, 32, 48, 16, 24),
    # m-width stem (c_mid = 4*48 = 192 > 128) exercises the dy-N-packed
    # conv2 branch of the kernel
    (1, 32, 48, 48, 96),
])
def test_stem_kernel_u8_matches_xla(rng, b, h, w, c2, c2b):
    """u8 serving kernel (host-packed bytes, in-kernel normalize) vs the
    normalize-then-stem_apply reference path — exact up to f32 rounding of
    the w/255 weight fold."""
    from multiyolov5_tpu.ops.pallas.stem_kernel import (
        pack_stem96_host, stem_apply_pallas_u8, stem_pack_geometry)

    w0 = rng.randn(3, 3, 12, c2).astype(np.float32) * 0.2
    b0 = rng.randn(c2).astype(np.float32) * 0.1
    w1 = rng.randn(3, 3, c2, c2b).astype(np.float32) * 0.2
    b1 = rng.randn(c2b).astype(np.float32) * 0.1
    fw = stem_lib.fold_stem_weights(w0, b0, w1, b1)
    hq, wq = h // 4, w // 4
    x48u8 = (rng.rand(b, hq, wq, 48) * 255).astype(np.uint8)

    want = np.asarray(stem_lib.stem_apply(
        jnp.asarray(x48u8, jnp.float32) / 255.0, *fw))
    cp, hp = stem_pack_geometry(hq, wq)
    x96 = pack_stem96_host(x48u8, cp)
    assert x96.shape == (b, hp, cp, 96)
    got = np.asarray(stem_apply_pallas_u8(
        jnp.asarray(x96), *fw, cols=wq, out_dtype=jnp.float32))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_stem_u8_multi_matches_batched():
    """Multi-output (per-image) u8 stem == batched u8 stem, elementwise
    exact — same dots, only the grid order and store targets differ
    (engine batch>1 regime, round 5)."""
    import numpy as np
    import jax.numpy as jnp
    from multiyolov5_tpu.ops.pallas.stem_kernel import (
        pack_stem96_chunked_host, pack_stem96_host, stem_apply_pallas_u8,
        stem_apply_pallas_u8_multi, stem_pack_geometry)

    rng = np.random.RandomState(3)
    B, H, W, c_in = 3, 32, 64, 48
    c_mid, c_out = 64, 32
    x48 = rng.randint(0, 255, (B, H, W, c_in), np.uint8)
    w1p = jnp.asarray(rng.randn(3, 3, c_in, c_mid).astype(np.float32) * .05)
    b1p = jnp.asarray(rng.randn(c_mid).astype(np.float32) * .1)
    w2p = jnp.asarray(rng.randn(2, 2, c_mid, c_out).astype(np.float32) * .05)
    b2p = jnp.asarray(rng.randn(c_out).astype(np.float32) * .1)

    cp, _ = stem_pack_geometry(H, W)
    xb = jnp.asarray(pack_stem96_host(x48, cp))
    xc = jnp.asarray(pack_stem96_chunked_host(x48, cp, 16))
    yb = stem_apply_pallas_u8(xb, w1p, b1p, w2p, b2p, cols=W,
                              out_dtype=jnp.float32)
    ym = stem_apply_pallas_u8_multi(xc, w1p, b1p, w2p, b2p, cols=W,
                                    out_dtype=jnp.float32)
    assert len(ym) == B and ym[0].shape == (1, H, W, c_out)
    for i in range(B):
        np.testing.assert_array_equal(np.asarray(yb[i:i + 1]),
                                      np.asarray(ym[i]))
