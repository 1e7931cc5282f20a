"""Numerical parity of the op layer against PyTorch reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from multiyolov5_tpu.ops import resize as R
from multiyolov5_tpu.ops.nn import Ctx, fuse_conv_bn, BN_EPS


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


@pytest.mark.parametrize("hw_in,hw_out", [((8, 12), (16, 24)), ((7, 9), (56, 72)),
                                          ((16, 24), (8, 12)), ((5, 5), (13, 17))])
def test_bilinear_align_corners(rng, hw_in, hw_out):
    x = rng.randn(2, *hw_in, 3).astype(np.float32)
    got = np.asarray(R.resize_bilinear(jnp.asarray(x), hw_out, align_corners=True))
    want = F.interpolate(torch.from_numpy(to_nchw(x)), hw_out, mode="bilinear",
                         align_corners=True).numpy()
    np.testing.assert_allclose(to_nchw(got), want, rtol=1e-5, atol=1e-5)


def test_nearest_upsample(rng):
    x = rng.randn(1, 6, 10, 4).astype(np.float32)
    got = np.asarray(R.upsample_nearest(jnp.asarray(x), 2))
    want = F.interpolate(torch.from_numpy(to_nchw(x)), scale_factor=2,
                         mode="nearest").numpy()
    np.testing.assert_allclose(to_nchw(got), want)


def test_nearest_resize_arbitrary(rng):
    x = rng.randn(1, 6, 10, 4).astype(np.float32)
    got = np.asarray(R.resize_nearest(jnp.asarray(x), (13, 17)))
    want = F.interpolate(torch.from_numpy(to_nchw(x)), (13, 17), mode="nearest").numpy()
    np.testing.assert_allclose(to_nchw(got), want)


@pytest.mark.parametrize("k", [1, 2, 3, 6])
def test_adaptive_avg_pool(rng, k):
    x = rng.randn(2, 13, 29, 5).astype(np.float32)
    got = np.asarray(R.adaptive_avg_pool(jnp.asarray(x), k))
    want = F.adaptive_avg_pool2d(torch.from_numpy(to_nchw(x)), k).numpy()
    np.testing.assert_allclose(to_nchw(got), want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("k", [5, 9, 13])
def test_max_pool_same(rng, k):
    x = rng.randn(1, 16, 20, 3).astype(np.float32)
    got = np.asarray(R.max_pool_same(jnp.asarray(x), k))
    want = F.max_pool2d(torch.from_numpy(to_nchw(x)), k, stride=1, padding=k // 2).numpy()
    np.testing.assert_allclose(to_nchw(got), want)


def test_avg_pool_include_pad(rng):
    x = rng.randn(1, 17, 23, 3).astype(np.float32)
    got = np.asarray(R.avg_pool(jnp.asarray(x), 5, 2, 2))
    want = F.avg_pool2d(torch.from_numpy(to_nchw(x)), 5, 2, 2).numpy()
    np.testing.assert_allclose(to_nchw(got), want, rtol=1e-5, atol=1e-6)


def _torch_conv_bn_silu(x, w, gamma, beta, mean, var, stride=1, pad=1):
    t = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=stride, padding=pad)
    t = F.batch_norm(t, torch.from_numpy(mean), torch.from_numpy(var),
                     torch.from_numpy(gamma), torch.from_numpy(beta), eps=BN_EPS)
    return F.silu(t).numpy()


def test_conv_bn_silu_and_fusion(rng):
    c1, c2, k = 6, 8, 3
    x = rng.randn(2, 10, 14, c1).astype(np.float32)
    w = (rng.randn(c2, c1, k, k) * 0.2).astype(np.float32)
    gamma = rng.rand(c2).astype(np.float32) + 0.5
    beta = rng.randn(c2).astype(np.float32)
    mean = rng.randn(c2).astype(np.float32) * 0.1
    var = rng.rand(c2).astype(np.float32) + 0.5

    params = {"m.conv.weight": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
              "m.bn.weight": jnp.asarray(gamma), "m.bn.bias": jnp.asarray(beta)}
    state = {"m.bn.running_mean": jnp.asarray(mean), "m.bn.running_var": jnp.asarray(var)}
    ctx = Ctx(p=params, s=state, train=False)
    got = np.asarray(ctx.conv_bn_act("m", jnp.asarray(x), k=3, s=1))
    want = _torch_conv_bn_silu(to_nchw(x), w, gamma, beta, mean, var)
    np.testing.assert_allclose(to_nchw(got), want, rtol=1e-4, atol=1e-5)

    # fused path must match the unfused one
    fparams = fuse_conv_bn(params, state)
    fctx = Ctx(p=fparams, s={}, train=False, fused=True)
    got_f = np.asarray(fctx.conv_bn_act("m", jnp.asarray(x), k=3, s=1))
    np.testing.assert_allclose(got_f, got, rtol=1e-4, atol=1e-5)


def test_batch_norm_train_updates_running_stats(rng):
    c = 4
    x = rng.randn(8, 6, 6, c).astype(np.float32)
    params = {"bn.weight": jnp.ones(c), "bn.bias": jnp.zeros(c)}
    state = {"bn.running_mean": jnp.zeros(c), "bn.running_var": jnp.ones(c)}
    ctx = Ctx(p=params, s=state, train=True)
    y = ctx.batch_norm("bn", jnp.asarray(x))

    tbn = torch.nn.BatchNorm2d(c, eps=BN_EPS, momentum=0.03)
    with torch.no_grad():
        ty = tbn(torch.from_numpy(to_nchw(x)))
    np.testing.assert_allclose(to_nchw(np.asarray(y)), ty.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ctx.new_state["bn.running_mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ctx.new_state["bn.running_var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-6)


def test_dilated_conv_matches_torch(rng):
    c = 5
    x = rng.randn(1, 12, 12, c).astype(np.float32)
    w = (rng.randn(c, c, 3, 3) * 0.2).astype(np.float32)
    params = {"c.weight": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    ctx = Ctx(p=params, s={})
    got = np.asarray(ctx.conv2d("c", jnp.asarray(x), k=3, d=3))
    want = F.conv2d(torch.from_numpy(to_nchw(x)), torch.from_numpy(w),
                    padding=3, dilation=3).numpy()
    np.testing.assert_allclose(to_nchw(got), want, rtol=1e-4, atol=1e-5)


def test_model_fuse_half_standalone_bn():
    """Model.fuse() keeps running stats for unfoldable BNs; half() actually
    runs bf16 compute (compute_dtype plumbed through __call__)."""
    import jax.numpy as jnp
    from multiyolov5_tpu.models.model import Model

    d = {"nc": 2, "depth_multiple": 1.0, "width_multiple": 1.0,
         "anchors": [[10, 13, 16, 30, 33, 23]],
         "backbone": [[-1, 1, "Focus", [16, 3]],
                      [-1, 1, "Conv", [32, 3, 2]],
                      [-1, 1, "BottleneckCSP", [32]]],
         "head": [[[2], 1, "Detect", ["nc", "anchors"]]]}
    m = Model(d)
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    (z0, _), _, _ = m(x)
    m.fuse()
    (z1, _), _, _ = m(x)  # must not KeyError on running stats
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1),
                               rtol=1e-4, atol=1e-5)
    m.half()
    raw, _, _ = m(x, decode=False)
    assert raw[0].dtype == jnp.bfloat16  # actually computing in bf16


def test_letterbox_grayscale():
    from multiyolov5_tpu.data.letterbox import letterbox

    g = np.zeros((100, 60), np.uint8)
    out, ratio, (dw, dh) = letterbox(g, 128, auto=False)
    assert out.ndim == 2 and out.shape == (128, 128)
    assert out[0, 0] == 114  # padded with the gray fill value


def test_warmup_accumulate_endpoint():
    """Warmup must end exactly at the steady-state accumulate: the fork
    interps to floor(nbs/total_bs) and never reassigns after warmup
    (reference train.py:347)."""
    from multiyolov5_tpu.train.optim import WarmupCosine

    sched = WarmupCosine(lr0=0.01, lrf=0.2, epochs=10, warmup_iters=300)
    wi = sched.warmup_iters
    # nbs=64, total_bs=18 (repo default bs) -> floor(3.56) = 3, not round=4
    assert sched.accumulate_at(wi, 64, 18) == 3
    assert sched.accumulate_at(wi + 1, 64, 18) == 3
    assert sched.accumulate_at(0, 64, 18) == 1
    # endpoint == steady state (no discontinuity at warmup end)
    assert sched.accumulate_at(wi, 64, 24) == sched.accumulate_at(wi + 1, 64, 24)


def test_max_pool_same_separable_backward():
    """Separable stride-1 maxpool: forward equals the 2-D window max, and
    the backward routes gradients to the per-window argmax exactly like
    torch's MaxPool2d backward on tie-free inputs."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F
    from multiyolov5_tpu.ops.resize import max_pool_same

    rng = np.random.RandomState(7)
    x = rng.randn(2, 9, 11, 3).astype(np.float32)  # continuous: no ties
    k = 5

    fwd = np.asarray(max_pool_same(jnp.asarray(x), k))
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)), requires_grad=True)
    yt = F.max_pool2d(xt, k, stride=1, padding=k // 2)
    np.testing.assert_allclose(fwd, np.transpose(yt.detach().numpy(),
                                                 (0, 2, 3, 1)), atol=0)

    g = rng.randn(*fwd.shape).astype(np.float32)
    grad = jax.grad(lambda t: (max_pool_same(t, k) * jnp.asarray(g)).sum())(
        jnp.asarray(x))
    yt.backward(torch.tensor(np.transpose(g, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(grad),
                               np.transpose(xt.grad.numpy(), (0, 2, 3, 1)),
                               atol=1e-6)
