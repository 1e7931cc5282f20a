"""Pallas 3x3 conv+SiLU kernel vs the XLA conv (interpret mode on CPU).

Semantics target: jax.lax.conv_general_dilated with torch autopad — the
same lowering ops/nn.Ctx.conv_bn_act uses on the engine's fused params
(reference models/common.py:33-43 Conv forward_fuse)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multiyolov5_tpu.ops.pallas.conv3x3_kernel import conv3x3_silu_pallas


def _xla_conv3x3(x, w, b, d=1, act=True):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=((d, d), (d, d)), rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b.astype(y.dtype)
    return y * jax.nn.sigmoid(y) if act else y


@pytest.mark.parametrize("b,h,w,ci,co,d", [
    (1, 32, 32, 16, 24, 1),     # plain 3x3
    (2, 16, 24, 8, 8, 1),       # batch>1, non-multiple-of-8 cols
    (1, 32, 32, 16, 16, 2),     # dilation 2 (RFB2 branch1)
    (1, 16, 20, 24, 8, 3),      # dilation 3 (RFB2 branch2)
    (1, 40, 36, 8, 40, 1),      # rows not divisible by rows_per_block
])
def test_conv3x3_kernel_matches_xla(rng, b, h, w, ci, co, d):
    x = jnp.asarray(rng.rand(b, h, w, ci).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.2)
    bi = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)

    want = np.asarray(_xla_conv3x3(x, wt, bi, d=d))
    got = np.asarray(conv3x3_silu_pallas(x, wt, bi, d=d))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_conv3x3_kernel_no_act(rng):
    x = jnp.asarray(rng.rand(1, 16, 16, 8).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.2)
    bi = jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)
    want = np.asarray(_xla_conv3x3(x, wt, bi, act=False))
    got = np.asarray(conv3x3_silu_pallas(x, wt, bi, act=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


from multiyolov5_tpu.ops.pallas.conv3x3_kernel import conv3x3s2_silu_pallas


def _xla_conv3x3_s2(x, w, b, act=True):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b.astype(y.dtype)
    return y * jax.nn.sigmoid(y) if act else y


@pytest.mark.parametrize("b,h,w,ci,co", [
    (1, 32, 64, 16, 24),        # neck downsample shape family
    (2, 16, 24, 8, 8),          # batch>1, cols/2 not a multiple of 8
    (1, 64, 48, 32, 16),        # rows/2 not divisible by rows_per_block
])
def test_conv3x3_s2_kernel_matches_xla(rng, b, h, w, ci, co):
    x = jnp.asarray(rng.rand(b, h, w, ci).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.2)
    bi = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)
    want = np.asarray(_xla_conv3x3_s2(x, wt, bi))
    got = np.asarray(conv3x3s2_silu_pallas(x, wt, bi))
    assert got.shape == want.shape == (b, h // 2, w // 2, co)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_conv3x3_s2_kernel_no_act(rng):
    x = jnp.asarray(rng.rand(1, 16, 16, 8).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.2)
    bi = jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)
    want = np.asarray(_xla_conv3x3_s2(x, wt, bi, act=False))
    got = np.asarray(conv3x3s2_silu_pallas(x, wt, bi, act=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_conv3x3_kernel_bf16(rng):
    x = jnp.asarray(rng.rand(1, 32, 32, 16), jnp.bfloat16)
    wt = jnp.asarray(rng.randn(3, 3, 16, 16).astype(np.float32) * 0.2)
    bi = jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)
    want = np.asarray(_xla_conv3x3(x, wt, bi), dtype=np.float32)
    got = np.asarray(conv3x3_silu_pallas(x, wt, bi), dtype=np.float32)
    # bf16 accumulation order differs (9-dot im2col vs XLA conv)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
