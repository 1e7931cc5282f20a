"""Training losses (reference utils/loss.py), static-shape / jit-friendly.

The YOLOv5 assigner (reference ComputeLoss.build_targets,
utils/loss.py:164-217) produces data-dependent positive counts; XLA needs
static shapes, so targets arrive **padded** to (B, T, 5) [cls,x,y,w,h]-norm
with a validity mask, and the assigner materializes the full candidate lattice
(B*T, na, 5 neighbor cells) with a boolean mask instead of boolean indexing.
Masked reductions reproduce the reference's means exactly.

One deliberate deviation, documented: the reference writes IoU values into
``tobj`` with last-write-wins on duplicate cells (utils/loss.py:137); we use a
max-scatter, which is deterministic under parallel execution (the reference's
order is an artifact of memory layout).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.boxes import bbox_iou_ciou

# 5 candidate cells: center + left/up/right/down neighbors (g = 0.5 bias)
_OFF = np.array([[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]], np.float32) * 0.5


def smooth_bce(eps: float = 0.1) -> Tuple[float, float]:
    return 1.0 - 0.5 * eps, 0.5 * eps


def _bce_logits(logits, targets, pos_weight: float = 1.0):
    """Elementwise BCE-with-logits with pos_weight (torch semantics)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_np)


def _focal_wrap(loss, logits, targets, gamma: float, alpha: float = 0.25):
    """FocalLoss wrapper (reference utils/loss.py:33-60, TF formulation)."""
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_f = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_f * (1.0 - p_t) ** gamma


def _qfocal_wrap(loss, logits, targets, gamma: float, alpha: float = 0.25):
    p = jax.nn.sigmoid(logits)
    alpha_f = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_f * jnp.abs(targets - p) ** gamma


@dataclass
class DetectionLoss:
    """reference ComputeLoss (utils/loss.py:89-217)."""

    nc: int
    na: int
    anchors: np.ndarray          # (nl, na, 2) in grid units (stride-divided)
    strides: Sequence[int]
    hyp: Dict[str, float]
    gr: float = 1.0
    balance: Sequence[float] = field(default_factory=lambda: [4.0, 1.0, 0.4])
    autobalance: bool = False

    def __post_init__(self):
        self.cp, self.cn = smooth_bce(self.hyp.get("label_smoothing", 0.0))
        if len(self.anchors) != 3:
            self.balance = [4.0, 1.0, 0.25, 0.06, 0.02][: len(self.anchors)]
        # autobalance renormalization index (reference: stride-16 level)
        strides = list(self.strides)
        self.ssi = strides.index(16) if (self.autobalance and 16 in strides) else 0

    def __call__(self, preds: List[jnp.ndarray], targets: jnp.ndarray,
                 tmask: jnp.ndarray, balance: Optional[jnp.ndarray] = None,
                 hwna: bool = False):
        """
        Args:
          preds: per-level raw maps (B, na, ny, nx, 5+nc) — or, with
            ``hwna=True``, (B, ny, nx, na, 5+nc), the head conv's native
            NHWC order.  The train step feeds the latter: the (0,3,1,2,4)
            transpose detect_raw would apply is pure layout (its cotangent
            traced at ~0.6 ms/step device-lane time at bs8/832px; e2e step
            time is scheduler-overlapped, so this mainly frees lanes).
            Same values either way.
          targets: (B, T, 5) [cls, x, y, w, h] normalized 0..1 (padded).
          tmask: (B, T) bool validity.
          balance: optional (nl,) per-level obj weights carried as training
            state for autobalance (reference utils/loss.py:156-161 mutates
            self.balance in place; functionally it's state in, state out).
        Returns (loss_total*B, items (lbox, lobj, lcls, loss)), plus the
        updated balance array when ``balance`` is given.
        """
        B, T = targets.shape[:2]
        na = self.na
        hyp = self.hyp
        fl_g = hyp.get("fl_gamma", 0.0)
        lcls = jnp.zeros((), jnp.float32)
        lbox = jnp.zeros((), jnp.float32)
        lobj = jnp.zeros((), jnp.float32)
        obj_per_level = []

        # flatten batch: tgt (B*T, 6) = [img, cls, x, y, w, h]
        img_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T)).reshape(-1)
        t_flat = targets.reshape(B * T, 5)
        valid = tmask.reshape(B * T)

        for i, pi in enumerate(preds):
            anchors_i = jnp.asarray(self.anchors[i], jnp.float32)  # (na, 2)
            ny, nx = ((pi.shape[1], pi.shape[2]) if hwna
                      else (pi.shape[2], pi.shape[3]))
            gain = jnp.asarray([nx, ny, nx, ny], jnp.float32)
            txywh = t_flat[:, 1:5] * gain                      # grid units
            gxy, gwh = txywh[:, :2], txywh[:, 2:]

            # anchor-ratio filter (N, na)
            r = gwh[:, None, :] / anchors_i[None, :, :]
            amask = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < hyp["anchor_t"]
            amask = amask & valid[:, None]

            # neighbor-cell candidates (reference :192-198)
            gxi = gain[:2] - gxy
            jm = (gxy % 1.0 < 0.5) & (gxy > 1.0)               # (N, 2) -> j, k
            lm = (gxi % 1.0 < 0.5) & (gxi > 1.0)               # (N, 2) -> l, m
            cand = jnp.stack([jnp.ones_like(jm[:, 0]), jm[:, 0], jm[:, 1],
                              lm[:, 0], lm[:, 1]], axis=-1)     # (N, 5)

            # full lattice (N, na, 5)
            pos = amask[:, :, None] & cand[:, None, :]
            off = jnp.asarray(_OFF)                            # (5, 2)
            gij = jnp.floor(gxy[:, None, :] - off[None, :, :]) # (N, 5, 2)
            gi = jnp.clip(gij[..., 0], 0, nx - 1).astype(jnp.int32)
            gj = jnp.clip(gij[..., 1], 0, ny - 1).astype(jnp.int32)

            # broadcast to (N, na, 5)
            N = B * T
            b_idx = jnp.broadcast_to(img_idx[:, None, None], (N, na, 5))
            a_idx = jnp.broadcast_to(jnp.arange(na)[None, :, None], (N, na, 5))
            gi_b = jnp.broadcast_to(gi[:, None, :], (N, na, 5))
            gj_b = jnp.broadcast_to(gj[:, None, :], (N, na, 5))

            # gather predictions at positives.  The fancy-index gather's
            # BACKWARD is a (N*na*5, no) scatter-add into the full
            # prediction lattice — XLA lowers it near-serially (~1.14
            # ms/step for the stride-8 level alone at bs8/832px, traced
            # round 3).  The separable one-hot contraction below computes
            # the exact same values (a one-hot row picks exactly one
            # element; 0*x terms vanish in any dtype) and its backward is
            # a pair of big-K matmuls.  Indices are per-image by
            # construction (t_flat is the (B, T) reshape), so the row/col
            # one-hots contract batched over images — 8x fewer MACs than a
            # flat (B*ny)-wide one-hot.
            # memory bound of the one-hot route: the row-contracted
            # intermediate is (B, na, T*5, nx, no).  ~24M elems at the
            # benched geometry (bs8 / T128 / 832px / nc10); guard against
            # huge grids or target caps blowing it up and fall back to the
            # indexed gather (which also avoids 0*inf -> NaN should preds
            # overflow in bf16 — the one-hot zero no longer annihilates).
            onehot_elems = B * na * (T * 5) * nx * pi.shape[-1]
            if (os.environ.get("MULTIYOLOV5_DET_GATHER") == "scatter"
                    or onehot_elems > (1 << 28)):
                if hwna:
                    ps = pi[b_idx, gj_b, gi_b, a_idx]          # (N, na, 5, no)
                else:
                    ps = pi[b_idx, a_idx, gj_b, gi_b]          # (N, na, 5, no)
            else:
                no = pi.shape[-1]
                gj5 = gj.reshape(B, T * 5)
                gi5 = gi.reshape(B, T * 5)
                r1h = jax.nn.one_hot(gj5, ny, dtype=pi.dtype)  # (B, T5, ny)
                c1h = jax.nn.one_hot(gi5, nx, dtype=pi.dtype)  # (B, T5, nx)
                if hwna:
                    tmp = jnp.einsum("bty,byxac->btxac", r1h, pi,
                                     preferred_element_type=pi.dtype)
                    ps = jnp.einsum("btx,btxac->btac", c1h, tmp,
                                    preferred_element_type=pi.dtype)
                    ps = ps.reshape(B, T, 5, na, no).transpose(0, 1, 3, 2, 4)
                else:
                    tmp = jnp.einsum("bty,bayxc->batxc", r1h, pi,
                                     preferred_element_type=pi.dtype)
                    ps = jnp.einsum("btx,batxc->batc", c1h, tmp,
                                    preferred_element_type=pi.dtype)
                    ps = ps.reshape(B, na, T, 5, no).transpose(0, 2, 1, 3, 4)
                ps = ps.reshape(N, na, 5, no)
            # target box relative to chosen cell
            tx = gxy[:, None, :2]                              # (N, 1, 2)
            gij_f = jnp.stack([gi, gj], -1).astype(jnp.float32)  # (N, 5, 2)
            txy = jnp.broadcast_to(tx, (N, 5, 2)) - gij_f      # (N, 5, 2)
            txy_b = jnp.broadcast_to(txy[:, None, :, :], (N, na, 5, 2))
            twh_b = jnp.broadcast_to(gwh[:, None, None, :], (N, na, 5, 2))
            tbox = jnp.concatenate([txy_b, twh_b], -1)

            pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
            pwh = jnp.square(jax.nn.sigmoid(ps[..., 2:4]) * 2.0) * \
                anchors_i[None, :, None, :]
            pbox = jnp.concatenate([pxy, pwh], -1)
            iou = bbox_iou_ciou(pbox, tbox)                    # (N, na, 5)

            n_pos = jnp.maximum(jnp.sum(pos), 1)
            lbox += jnp.sum(jnp.where(pos, 1.0 - iou, 0.0)) / n_pos

            # objectness target: max-scatter of clamped detached iou
            iou_d = jnp.clip(jax.lax.stop_gradient(iou), 0.0, None)
            iou_d = jnp.where(pos, (1.0 - self.gr) + self.gr * iou_d, 0.0)
            tobj = jnp.zeros(pi.shape[:4], jnp.float32)
            if hwna:
                tobj = tobj.at[b_idx, gj_b, gi_b, a_idx].max(iou_d)
            else:
                tobj = tobj.at[b_idx, a_idx, gj_b, gi_b].max(iou_d)
            obj_loss = _bce_logits(pi[..., 4].astype(jnp.float32), tobj,
                                   hyp.get("obj_pw", 1.0))
            if fl_g > 0:
                obj_loss = _focal_wrap(obj_loss, pi[..., 4].astype(jnp.float32),
                                       tobj, fl_g)
            obji = jnp.mean(obj_loss)
            obj_per_level.append(obji)
            lobj += obji * (balance[i] if balance is not None
                            else self.balance[i])

            if self.nc > 1:
                tcls = t_flat[:, 0].astype(jnp.int32)          # (N,)
                t_onehot = jax.nn.one_hot(tcls, self.nc) * (self.cp - self.cn) + self.cn
                t_b = jnp.broadcast_to(t_onehot[:, None, None, :],
                                       (N, na, 5, self.nc))
                cls_logits = ps[..., 5:].astype(jnp.float32)
                cls_loss = _bce_logits(cls_logits, t_b, hyp.get("cls_pw", 1.0))
                if fl_g > 0:
                    cls_loss = _focal_wrap(cls_loss, cls_logits, t_b, fl_g)
                lcls += jnp.sum(jnp.where(pos[..., None], cls_loss, 0.0)) / \
                    (n_pos * self.nc)

        lbox = lbox * hyp["box"]
        lobj = lobj * hyp["obj"]
        lcls = lcls * hyp["cls"]
        loss = lbox + lobj + lcls
        items = jax.lax.stop_gradient(jnp.stack([lbox, lobj, lcls, loss]))
        if balance is not None:
            # reference utils/loss.py:158-161: EMA toward 1e-4/obji, then
            # renormalize by the stride-16 level
            obji = jax.lax.stop_gradient(jnp.stack(obj_per_level))
            new_bal = balance * 0.9999 + 0.0001 / obji
            new_bal = new_bal / new_bal[self.ssi]
            return loss * B, items, new_bal
        return loss * B, items


# ---------------------------------------------------------------------------
# Segmentation losses (reference utils/loss.py:221-390)
# ---------------------------------------------------------------------------


def _select_class(values: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """values[..., t] via one-hot contraction. take_along_axis over the minor
    (class) dim lowers to a TPU-hostile gather — and a scatter in the backward
    pass — that costs ~64 ms at (8,512,1024,19) f32; the eq+multiply+reduce
    form fuses into the surrounding elementwise graph (~0 marginal cost)."""
    c = values.shape[-1]
    onehot = (t[..., None] == jnp.arange(c, dtype=t.dtype)).astype(values.dtype)
    return jnp.sum(values * onehot, axis=-1)


def cross_entropy_seg(logits: jnp.ndarray, target: jnp.ndarray,
                      weight: Optional[jnp.ndarray] = None,
                      ignore_index: int = -1) -> jnp.ndarray:
    """Mean CE over non-ignored pixels; logits (B,H,W,C), target (B,H,W)."""
    valid = target != ignore_index
    t = jnp.where(valid, target, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -_select_class(logp, t)
    if weight is not None:
        wpix = weight[t]
        nll = nll * wpix
        denom = jnp.sum(jnp.where(valid, wpix, 0.0))
    else:
        denom = jnp.sum(valid)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(denom, 1.0)


def segmentation_loss(preds, target, aux: bool = False, aux_num: int = 2,
                      aux_weight: float = 0.1, weight=None,
                      ignore_index: int = -1):
    """reference SegmentationLosses (utils/loss.py:221-263): plain CE or
    CE + weighted aux heads (BiSe: aux_weight*1.5 and aux_weight/2)."""
    if not aux:
        p = preds[0] if isinstance(preds, (list, tuple)) else preds
        return cross_entropy_seg(p, target, weight, ignore_index)
    if aux_num == 2:
        p1, p2, p3 = preds
        return (cross_entropy_seg(p1, target, weight, ignore_index)
                + aux_weight * 1.5 * cross_entropy_seg(p2, target, weight, ignore_index)
                + aux_weight / 2.0 * cross_entropy_seg(p3, target, weight, ignore_index))
    p1, p2 = preds
    return (cross_entropy_seg(p1, target, weight, ignore_index)
            + aux_weight * cross_entropy_seg(p2, target, weight, ignore_index))


def seg_focal_loss(logits, target, gamma: float = 2.0, ignore_index: int = -1):
    """reference SegFocalLoss (utils/loss.py:279-297): note the reference
    multiplies the *scalar mean CE* by per-pixel (1-p)^gamma then means."""
    ce = cross_entropy_seg(logits, target, None, ignore_index)
    t = jnp.where(target == ignore_index, 0, target).astype(jnp.int32)
    prob = jax.nn.softmax(logits.astype(jnp.float32), -1)
    pt = _select_class(prob, t)
    return jnp.mean((1.0 - pt) ** gamma * ce)


def ohem_ce_loss(preds, target, thresh: float = 0.7, ignore_index: int = -1,
                 aux: bool = False, aux_weight=(0.15, 0.05)):
    """reference OhemCELoss (utils/loss.py:303-328): keep pixel losses above
    -log(thresh), but at least 1/16 of the valid pixels (top-k)."""
    def once(logits):
        valid = target != ignore_index
        t = jnp.where(valid, target, 0).astype(jnp.int32)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -_select_class(logp, t)
        nll = jnp.where(valid, nll, 0.0).reshape(-1)
        n_min = jnp.sum(valid) // 16
        th = -math.log(thresh)
        sorted_l = jnp.sort(nll)[::-1]
        n_hard = jnp.sum(sorted_l > th)
        k = jnp.maximum(n_hard, n_min)
        idx = jnp.arange(sorted_l.shape[0])
        keep = idx < k
        return jnp.sum(jnp.where(keep, sorted_l, 0.0)) / jnp.maximum(k, 1)

    if not aux:
        p = preds[0] if isinstance(preds, (list, tuple)) else preds
        return once(p)
    return (once(preds[0]) + aux_weight[0] * once(preds[1])
            + aux_weight[1] * once(preds[2]))


def prob_ohem_ce_loss(preds, target, thresh: float = 0.5, min_kept: int = 256,
                      ignore_index: int = -1, aux: bool = False,
                      aux_weight=(0.4, 0.4), class_weight=None):
    """reference ProbOhemCrossEntropy2d (utils/loss.py:332-390): keep pixels
    whose true-class prob <= max(thresh, min_kept-th smallest prob)."""
    def once(logits):
        valid = (target != ignore_index).reshape(-1)
        t = jnp.where(target == ignore_index, 0, target).astype(jnp.int32).reshape(-1)
        prob = jax.nn.softmax(logits.astype(jnp.float32), -1).reshape(-1, logits.shape[-1])
        mask_prob = jnp.where(valid, _select_class(prob, t), 1.0)
        sorted_p = jnp.sort(mask_prob)
        kth = sorted_p[jnp.minimum(min_kept, sorted_p.shape[0]) - 1]
        th = jnp.maximum(kth, thresh)
        kept = valid & (mask_prob <= th)
        logp = jnp.log(jnp.clip(prob, 1e-12))
        nll = -_select_class(logp, t)
        if class_weight is not None:
            w = jnp.asarray(class_weight)[t]
            nll = nll * w
            denom = jnp.sum(jnp.where(kept, w, 0.0))
        else:
            denom = jnp.sum(kept)
        return jnp.sum(jnp.where(kept, nll, 0.0)) / jnp.maximum(denom, 1.0)

    if not aux:
        p = preds[0] if isinstance(preds, (list, tuple)) else preds
        return once(p)
    return (once(preds[0]) + aux_weight[0] * once(preds[1])
            + aux_weight[1] * once(preds[2]))


def pad_targets(labels: List[np.ndarray], max_t: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host helper: list of per-image (n,5) [cls,xywh] -> padded (B,T,5)+mask."""
    B = len(labels)
    out = np.zeros((B, max_t, 5), np.float32)
    mask = np.zeros((B, max_t), bool)
    for i, l in enumerate(labels):
        n = min(len(l), max_t)
        if n:
            out[i, :n] = l[:n]
            mask[i, :n] = True
    return out, mask
