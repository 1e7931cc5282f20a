"""Loss parity vs reference semantics (torch re-implementations in-test)."""

import math
import os
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from multiyolov5_tpu.train.losses import (DetectionLoss, cross_entropy_seg,
                                          ohem_ce_loss, pad_targets,
                                          segmentation_loss)

HYP = {"box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0, "obj_pw": 1.0,
       "anchor_t": 4.0, "fl_gamma": 0.0, "label_smoothing": 0.1}

ANCHORS = np.array([[10, 13, 16, 30, 33, 23],
                    [30, 61, 62, 45, 59, 119],
                    [116, 90, 156, 198, 373, 326]], np.float32)
STRIDES = [8, 16, 32]


REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_compute_loss():
    """Build the actual reference ComputeLoss against a dummy Detect."""
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    for name in ("torchvision", "torchvision.ops"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    sys.modules["torchvision"].ops = sys.modules["torchvision.ops"]
    sys.modules["torchvision.ops"].nms = None
    sys.path.insert(0, REF)
    from utils.loss import ComputeLoss  # reference

    # newer torch forbids float clamp_ bounds on long tensors; the reference
    # (written for torch 1.x) does gj.clamp_(0, gain[3]-1) with float gain.
    orig_clamp_ = torch.Tensor.clamp_

    def lenient_clamp_(self, min=None, max=None):
        if not torch.is_floating_point(self):
            min = int(min) if isinstance(min, (float, torch.Tensor)) else min
            max = int(max) if isinstance(max, (float, torch.Tensor)) else max
        return orig_clamp_(self, min, max)

    torch.Tensor.clamp_ = lenient_clamp_

    class DummyDetect(nn.Module):
        def __init__(self):
            super().__init__()
            self.na, self.nc, self.nl = 3, 10, 3
            a = torch.from_numpy(ANCHORS).float().view(3, 3, 2)
            self.anchors = a / torch.tensor(STRIDES).view(3, 1, 1)
            self.stride = torch.tensor(STRIDES).float()

    class DummyModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.hyp = dict(HYP)
            self.gr = 1.0
            self.model = nn.ModuleList([DummyDetect()])

        def parameters(self):
            return iter([torch.zeros(1)])

    loss = ComputeLoss(DummyModel())
    yield loss
    torch.Tensor.clamp_ = orig_clamp_
    sys.path.remove(REF)


def _rand_case(rng, B=2, T=7, nc=10, sz=64, collision_free=False):
    preds = []
    for s in STRIDES:
        ny, nx = sz // s, sz // s
        preds.append((rng.randn(B, 3, ny, nx, 5 + nc) * 2).astype(np.float32))
    # targets: (n, 6) [img, cls, x, y, w, h] normalized
    n = 4 if collision_free else 9
    tgt = np.zeros((n, 6), np.float32)
    tgt[:, 0] = np.arange(n) % B
    tgt[:, 1] = rng.randint(0, nc, n)
    if collision_free:
        # spread far apart so no (b, a, cell) is written twice at any level
        tgt[:, 2:4] = (np.stack([np.arange(n), np.arange(n)], 1) * 0.22 + 0.15
                       + rng.rand(n, 2) * 0.01)
        tgt[:, 4:6] = rng.rand(n, 2) * 0.2 + 0.05
    else:
        tgt[:, 0] = rng.randint(0, B, n)
        tgt[:, 2:4] = rng.rand(n, 2) * 0.8 + 0.1
        tgt[:, 4:6] = rng.rand(n, 2) * 0.4 + 0.02
    return preds, tgt


def test_detection_loss_matches_reference(rng, ref_compute_loss):
    """Exact parity on collision-free targets (duplicate tobj cells are
    resolved max-scatter here vs last-write-wins in the reference)."""
    preds, tgt = _rand_case(rng, collision_free=True)
    tl, titems = ref_compute_loss(
        [torch.from_numpy(p) for p in preds], torch.from_numpy(tgt))

    dl = DetectionLoss(nc=10, na=3,
                       anchors=ANCHORS.reshape(3, 3, 2) / np.array(STRIDES)[:, None, None],
                       strides=STRIDES, hyp=HYP)
    B = 2
    per_img = [tgt[tgt[:, 0] == i][:, 1:] for i in range(B)]
    padded, mask = pad_targets(per_img, max_t=16)
    loss, items = dl([jnp.asarray(p) for p in preds], jnp.asarray(padded),
                     jnp.asarray(mask))
    np.testing.assert_allclose(float(loss), float(tl), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(items), titems.numpy().ravel(), rtol=2e-4)


def test_detection_loss_close_with_collisions(rng, ref_compute_loss):
    """Dense targets (duplicate tobj cells): only the obj term may deviate,
    and by < 1%."""
    preds, tgt = _rand_case(rng)
    tl, titems = ref_compute_loss(
        [torch.from_numpy(p) for p in preds], torch.from_numpy(tgt))
    dl = DetectionLoss(nc=10, na=3,
                       anchors=ANCHORS.reshape(3, 3, 2) / np.array(STRIDES)[:, None, None],
                       strides=STRIDES, hyp=HYP)
    per_img = [tgt[tgt[:, 0] == i][:, 1:] for i in range(2)]
    padded, mask = pad_targets(per_img, max_t=16)
    loss, items = dl([jnp.asarray(p) for p in preds], jnp.asarray(padded),
                     jnp.asarray(mask))
    ti = titems.numpy().ravel()
    got = np.asarray(items)
    np.testing.assert_allclose(got[[0, 2]], ti[[0, 2]], rtol=2e-4)  # box, cls exact
    np.testing.assert_allclose(got[1], ti[1], rtol=1e-2)            # obj close


def test_detection_loss_scatter_gather_path_matches(rng, monkeypatch):
    """The indexed-gather fallback (MULTIYOLOV5_DET_GATHER=scatter, also the
    automatic route for huge grids) computes the same loss as the default
    one-hot contraction."""
    preds, tgt = _rand_case(rng)
    dl = DetectionLoss(nc=10, na=3,
                       anchors=ANCHORS.reshape(3, 3, 2) / np.array(STRIDES)[:, None, None],
                       strides=STRIDES, hyp=HYP)
    per_img = [tgt[tgt[:, 0] == i][:, 1:] for i in range(2)]
    padded, mask = pad_targets(per_img, max_t=16)
    jp = [jnp.asarray(p) for p in preds]
    loss_oh, items_oh = dl(jp, jnp.asarray(padded), jnp.asarray(mask))
    monkeypatch.setenv("MULTIYOLOV5_DET_GATHER", "scatter")
    loss_sc, items_sc = dl(jp, jnp.asarray(padded), jnp.asarray(mask))
    np.testing.assert_allclose(float(loss_oh), float(loss_sc), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(items_oh), np.asarray(items_sc),
                               rtol=1e-5)


def test_detection_loss_hwna_layout_matches(rng, monkeypatch):
    """The transpose-free (B,ny,nx,na,no) layout the train step feeds
    (losses hwna=True) computes identical values to the canonical
    (B,na,ny,nx,no) layout — on both gather routes."""
    preds, tgt = _rand_case(rng)
    dl = DetectionLoss(nc=10, na=3,
                       anchors=ANCHORS.reshape(3, 3, 2) / np.array(STRIDES)[:, None, None],
                       strides=STRIDES, hyp=HYP)
    per_img = [tgt[tgt[:, 0] == i][:, 1:] for i in range(2)]
    padded, mask = pad_targets(per_img, max_t=16)
    jp = [jnp.asarray(p) for p in preds]
    jp_hwna = [jnp.transpose(p, (0, 2, 3, 1, 4)) for p in jp]
    for env in (None, "scatter"):
        if env:
            monkeypatch.setenv("MULTIYOLOV5_DET_GATHER", env)
        loss_a, items_a = dl(jp, jnp.asarray(padded), jnp.asarray(mask))
        loss_b, items_b = dl(jp_hwna, jnp.asarray(padded), jnp.asarray(mask),
                             hwna=True)
        np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(items_a), np.asarray(items_b),
                                   rtol=1e-6)


def test_detection_loss_empty_targets(rng, ref_compute_loss):
    preds, _ = _rand_case(rng)
    tgt = np.zeros((0, 6), np.float32)
    tl, _ = ref_compute_loss([torch.from_numpy(p) for p in preds],
                             torch.from_numpy(tgt))
    dl = DetectionLoss(nc=10, na=3,
                       anchors=ANCHORS.reshape(3, 3, 2) / np.array(STRIDES)[:, None, None],
                       strides=STRIDES, hyp=HYP)
    padded, mask = pad_targets([np.zeros((0, 5))] * 2, max_t=8)
    loss, _ = dl([jnp.asarray(p) for p in preds], jnp.asarray(padded),
                 jnp.asarray(mask))
    np.testing.assert_allclose(float(loss), float(tl), rtol=2e-4)


def test_seg_ce_matches_torch(rng):
    B, H, W, C = 2, 16, 24, 19
    logits = rng.randn(B, H, W, C).astype(np.float32)
    target = rng.randint(-1, C, (B, H, W))
    got = float(cross_entropy_seg(jnp.asarray(logits), jnp.asarray(target)))
    tl = nn.CrossEntropyLoss(ignore_index=-1)(
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(target))
    np.testing.assert_allclose(got, float(tl), rtol=1e-5)


def test_seg_aux_weighting(rng):
    B, H, W, C = 1, 8, 8, 5
    ps = [rng.randn(B, H, W, C).astype(np.float32) for _ in range(3)]
    target = rng.randint(0, C, (B, H, W))
    got = float(segmentation_loss([jnp.asarray(p) for p in ps],
                                  jnp.asarray(target), aux=True, aux_num=2,
                                  aux_weight=0.1))
    ces = [float(cross_entropy_seg(jnp.asarray(p), jnp.asarray(target))) for p in ps]
    want = ces[0] + 0.15 * ces[1] + 0.05 * ces[2]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_ohem_matches_torch_reference_semantics(rng):
    B, H, W, C = 1, 12, 12, 5
    logits = rng.randn(B, H, W, C).astype(np.float32) * 3
    target = rng.randint(-1, C, (B, H, W))
    got = float(ohem_ce_loss(jnp.asarray(logits), jnp.asarray(target), thresh=0.7))

    # torch restatement of reference OhemCELoss.forward_once
    tl = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    tt = torch.from_numpy(target)
    thresh = -math.log(0.7)
    n_min = int(tt[tt != -1].numel() // 16)
    loss = nn.CrossEntropyLoss(ignore_index=-1, reduction="none")(tl, tt).view(-1)
    loss_hard = loss[loss > thresh]
    if loss_hard.numel() < n_min:
        loss_hard, _ = loss.topk(n_min)
    want = float(loss_hard.mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_autobalance_updates_balance(rng):
    """autobalance: balance EMA toward 1e-4/obji, renormalized by the
    stride-16 level (reference utils/loss.py:156-161)."""
    import jax.numpy as jnp
    from multiyolov5_tpu.train.losses import DetectionLoss, pad_targets

    anchors = np.array([[[10, 13], [16, 30], [33, 23]],
                        [[30, 61], [62, 45], [59, 119]],
                        [[116, 90], [156, 198], [373, 326]]], np.float32)
    anchors = anchors / np.array([8, 16, 32], np.float32)[:, None, None]
    hyp = {"box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0, "obj_pw": 1.0,
           "anchor_t": 4.0, "fl_gamma": 0.0, "label_smoothing": 0.0}
    loss_fn = DetectionLoss(nc=3, na=3, anchors=anchors, strides=[8, 16, 32],
                            hyp=hyp, autobalance=True)
    assert loss_fn.ssi == 1  # stride-16 level
    preds = [jnp.asarray(rng.randn(2, 3, 80 // s, 80 // s, 8).astype(np.float32))
             for s in (8, 16, 32)]
    tgts, mask = pad_targets(
        [np.array([[1, .5, .5, .2, .2]], np.float32)] * 2, 8)
    bal0 = jnp.asarray([4.0, 1.0, 0.4])
    loss, items, bal1 = loss_fn(preds, jnp.asarray(tgts), jnp.asarray(mask),
                                balance=bal0)
    bal1 = np.asarray(bal1)
    assert bal1.shape == (3,) and np.isfinite(bal1).all()
    assert np.isclose(bal1[1], 1.0)          # renormalized at ssi
    assert not np.allclose(bal1, np.asarray(bal0))  # actually updated
    # without balance: two-tuple return, same loss value at the default
    loss2, items2 = loss_fn(preds, jnp.asarray(tgts), jnp.asarray(mask))
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)


def test_qfocal_wrap_matches_torch(rng):
    """_qfocal_wrap == reference QFocalLoss modulation (utils/loss.py:63-86;
    defined there but never instantiated — kept available here the same way)."""
    import jax.numpy as jnp
    import torch
    from multiyolov5_tpu.train.losses import _bce_logits, _qfocal_wrap

    logits = rng.randn(64).astype(np.float32)
    targets = (rng.rand(64) > 0.5).astype(np.float32)
    base = _bce_logits(jnp.asarray(logits), jnp.asarray(targets), 1.0)
    got = np.asarray(_qfocal_wrap(base, jnp.asarray(logits),
                                  jnp.asarray(targets), 1.5)).mean()

    lt, tt = torch.tensor(logits), torch.tensor(targets)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(
        lt, tt, reduction="none")
    pred_prob = torch.sigmoid(lt)
    alpha, gamma = 0.25, 1.5
    alpha_factor = tt * alpha + (1 - tt) * (1 - alpha)
    modulating = torch.abs(tt - pred_prob) ** gamma
    want = (ce * alpha_factor * modulating).mean().item()
    np.testing.assert_allclose(got, want, rtol=1e-5)
