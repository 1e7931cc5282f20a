"""Jitted dual-task train step + training state.

Reproduces the reference's signature schedule (reference train.py:335-401):
every iteration runs a detection forward/backward AND a segmentation
forward/backward; gradients accumulate across ``accumulate`` iterations and a
single optimizer step fires, followed by an EMA update.  Here both
forward/backwards, the accumulation, the conditional optimizer step, and the
EMA all live inside ONE jitted function, so the whole iteration is a single
XLA program — no Python between microbatches.

Data parallelism: jit the step with batch args sharded over the mesh 'data'
axis and state replicated.  The global-batch loss means make XLA insert the
gradient psum (DDP all-reduce equivalent); BN moments over the global batch
give SyncBN semantics (reference --sync-bn) without a wrapper.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelSpec
from ..models.model import forward, init_model
from ..ops.pallas.seg_ce_kernel import seg_ce_up8
from . import optim
from .losses import DetectionLoss, ohem_ce_loss, seg_focal_loss, segmentation_loss

Params = Dict[str, jnp.ndarray]


@dataclass
class TrainConfig:
    hyp: Dict[str, float]
    epochs: int = 300
    batch_size: int = 16
    seg_batch_size: int = 16
    nbs: int = 64                      # nominal batch size
    detgain: float = 0.6               # reference train.py:290
    seggain: float = 0.35
    seg_loss: str = "ce"               # ce | ohem | focal
    seg_enabled: bool = True           # False = detection-only training
    seg_aux: bool = False              # BiSe head -> True (aux_num=2)
    seg_aux_weight: float = 0.1
    adam: bool = False
    max_targets: int = 128             # padded targets per image
    quad: bool = False                 # quad collate (reference train.py:368)
    compute_dtype: Any = jnp.bfloat16  # bf16 on TPU (no GradScaler needed)
    remat: bool = False                # jax.checkpoint the backbone
    class_weight: Optional[np.ndarray] = None
    # host feeds 4x4-s2d-packed images (ops/stem.pack_stem_host) and rows
    # 0-1 run as quarter-grid convs (stem_train_apply): ~6x faster stem,
    # exact same math/params.  Requires can_fold_stem(spec).
    pack_stem: bool = False


def create_train_state(spec: ModelSpec, cfg: TrainConfig, seed: int = 0,
                       params: Optional[Params] = None,
                       state: Optional[Params] = None) -> Dict[str, Any]:
    if params is None:
        params, state = init_model(spec, seed)
    groups = optim.classify_params(params, state)
    # build on host (numpy) then transfer once — eager per-leaf device ops
    # pay a tunnel round-trip + tiny compile each (see ops/nn.Initializer)
    np_params = {k: np.asarray(v) for k, v in params.items()}
    np_state = {k: np.asarray(v) for k, v in state.items()}
    ts = {
        "params": np_params,
        "state": np_state,
        "opt": (optim.init_adam_state(np_params) if cfg.adam
                else optim.init_sgd_state(np_params)),
        "accum": {k: np.zeros_like(v) for k, v in np_params.items()},
        # EMA starts as a *copy* — sharing buffers with params breaks jit
        # donation (same buffer donated twice)
        "ema_params": {k: v.copy() for k, v in np_params.items()},
        "ema_state": {k: v.copy() for k, v in np_state.items()},
        "updates": np.zeros((), np.int32),
    }
    return jax.device_put(ts), groups


def make_train_step(spec: ModelSpec, cfg: TrainConfig, groups: Dict[str, int],
                    mesh=None, donate: bool = True):
    """Returns step(ts, det_imgs, det_tgts, det_mask, seg_imgs, seg_lbls,
    rng, lr, lr_bias, momentum, do_update) -> (ts, metrics)."""
    det_loss_fn = DetectionLoss(
        nc=spec.nc, na=spec.na,
        anchors=np.asarray(spec.anchors, np.float32).reshape(spec.nl, spec.na, 2)
        / np.asarray(spec.strides, np.float32)[:, None, None],
        strides=spec.strides, hyp=cfg.hyp)
    wd = cfg.hyp.get("weight_decay", 0.0)
    accumulate_target = max(round(cfg.nbs / cfg.batch_size), 1)
    # reference train.py:117 scales weight decay by total_bs*accumulate/nbs
    wd = wd * cfg.batch_size * accumulate_target / cfg.nbs
    cw = jnp.asarray(cfg.class_weight) if cfg.class_weight is not None else None

    fwd = forward
    if cfg.remat:
        def fwd(spec_, params, state, x, train=False, rng=None, decode=False,
                fused=False, pre_s2d2=False, seg_up=True, det_hwna=False):
            def inner(p, s, xx, r):
                return forward(spec_, p, s, xx, train=train, rng=r,
                               decode=decode, fused=fused, pre_s2d2=pre_s2d2,
                               seg_up=seg_up, det_hwna=det_hwna)
            return jax.checkpoint(inner)(params, state, x, rng)

    # Fused upsample+CE (ops/pallas/seg_ce_kernel.py): on TPU, single-output
    # heads skip the in-head x8 upsample (seg_up=False -> 1/8-res NHWC
    # logits) and the loss kernel evaluates CE at label resolution without
    # ever materializing the (B, 8h, 8w, C) logits — ~2.8 ms -> ~0.8 ms of
    # the bs8 dual step.  Exact same math (custom VJP); OHEM/focal/BiSe-aux
    # losses need the materialized full-res logits and keep the XLA path.
    # MULTIYOLOV5_XLA_SEGCE=1 opts back into the XLA lowering.
    seg_module = (spec.rows[spec.seg_index].module
                  if spec.seg_index is not None else None)
    # dp x sp training (mesh with a non-trivial 'model' axis) keeps the
    # pure-XLA lowering everywhere: GSPMD cannot partition the Pallas
    # seg-CE custom call over the spatially-sharded logits
    spatial = (mesh is not None and "model" in mesh.axis_names
               and mesh.shape["model"] > 1)
    fused_ce = (cfg.seg_loss == "ce" and not cfg.seg_aux and not spatial
                and seg_module in ("SegMaskPSP", "SegMaskBase", "SegMaskLab")
                and jax.default_backend() == "tpu"
                and not os.environ.get("MULTIYOLOV5_XLA_SEGCE"))

    def seg_loss_fn(seg_out, seg_lbls):
        if cfg.seg_loss == "ohem":
            return ohem_ce_loss(seg_out, seg_lbls, aux=cfg.seg_aux,
                                aux_weight=(cfg.seg_aux_weight * 1.5,
                                            cfg.seg_aux_weight / 2.0))
        if cfg.seg_loss == "focal":
            p = seg_out[0] if isinstance(seg_out, (list, tuple)) else seg_out
            return seg_focal_loss(p, seg_lbls)
        if fused_ce:
            return seg_ce_up8(seg_out, seg_lbls, weight=cw)
        return segmentation_loss(seg_out, seg_lbls, aux=cfg.seg_aux, aux_num=2,
                                 aux_weight=cfg.seg_aux_weight, weight=cw)

    def losses(params, state, det_imgs, det_tgts, det_mask, seg_imgs,
               seg_lbls, rng):
        x = det_imgs.astype(cfg.compute_dtype) / 255.0
        det_raw, _, new_state = fwd(spec, params, state, x, train=True,
                                    rng=rng, decode=False,
                                    pre_s2d2=cfg.pack_stem, det_hwna=True)
        dloss, ditems = det_loss_fn(det_raw, det_tgts, det_mask, hwna=True)
        dloss = dloss * cfg.detgain * (4.0 if cfg.quad else 1.0)
        if not cfg.seg_enabled or spec.seg_index is None:
            return dloss, ({**state, **new_state}, ditems, jnp.float32(0))
        # second forward: BN stats already advanced by det microbatch
        state2 = {**state, **new_state}
        xs = seg_imgs.astype(cfg.compute_dtype)  # already /255'd by loader
        _, seg_out, new_state2 = fwd(spec, params, state2, xs, train=True,
                                     rng=rng, decode=False,
                                     pre_s2d2=cfg.pack_stem,
                                     seg_up=not fused_ce)
        # reference train.py:386 scales the mean CE by the DETECTION batch
        # size (the two tasks share one accumulated optimizer step)
        sloss = seg_loss_fn(seg_out, seg_lbls) * cfg.batch_size * cfg.seggain
        total = dloss + sloss
        return total, ({**state2, **new_state2}, ditems,
                       jax.lax.stop_gradient(sloss))

    def step(ts, det_imgs, det_tgts, det_mask, seg_imgs, seg_lbls, rng,
             lr, lr_bias, momentum, do_update):
        (total, (new_state, ditems, sloss)), grads = jax.value_and_grad(
            losses, has_aux=True)(ts["params"], ts["state"], det_imgs,
                                  det_tgts, det_mask, seg_imgs, seg_lbls, rng)
        accum = {k: ts["accum"][k] + grads[k] for k in grads}

        def do_step(_):
            if cfg.adam:
                new_p, new_opt = optim.adam_update(
                    ts["params"], accum, ts["opt"], groups, lr, lr_bias,
                    momentum, wd)
            else:
                new_p, new_opt = optim.sgd_update(
                    ts["params"], accum, ts["opt"], groups, lr, lr_bias,
                    momentum, wd)
            updates = ts["updates"] + 1
            d = optim.ema_decay(updates)
            ema_p = optim.ema_update(ts["ema_params"], new_p, d)
            ema_s = optim.ema_update(ts["ema_state"], new_state, d)
            zero = {k: jnp.zeros_like(v) for k, v in accum.items()}
            return new_p, new_opt, ema_p, ema_s, updates, zero

        def no_step(_):
            return (ts["params"], ts["opt"], ts["ema_params"], ts["ema_state"],
                    ts["updates"], accum)

        new_p, new_opt, ema_p, ema_s, updates, accum_out = jax.lax.cond(
            do_update, do_step, no_step, None)
        new_ts = {"params": new_p, "state": {**ts["state"], **new_state},
                  "opt": new_opt, "accum": accum_out, "ema_params": ema_p,
                  "ema_state": ema_s, "updates": updates}
        metrics = {"det_items": ditems, "seg_loss": sloss, "total": total}
        return new_ts, metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        # dp x sp training: when the mesh carries a non-trivial 'model'
        # axis, additionally shard the image H axis over it — the 2-D
        # analog of sequence-parallel training.  GSPMD partitions every
        # conv (halo exchanges for the 3x3 taps) and the loss reductions;
        # params/state stay replicated so the gradient psum covers both
        # axes.  The train-mode forward is pure XLA (the Pallas fast paths
        # are serving-only), so no custom-call partitioning is needed —
        # but the fused seg-CE kernel must be off (cli sets
        # MULTIYOLOV5_XLA_SEGCE or seg_loss!='ce'); assert it.
        img = NamedSharding(mesh, P("data", "model")) if spatial else data
        step = jax.jit(
            step,
            in_shardings=(repl, img, data, data, img, img, repl, repl,
                          repl, repl, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else ())
    else:
        step = jax.jit(step, donate_argnums=(0,) if donate else ())
    return step
