"""Optimizer (torch-semantics SGD/Adam with 3 param groups), EMA, schedules.

reference train.py:115-151: nominal batch 64 -> gradient accumulation,
weight-decay scaling, param groups (BN gains no-decay / weights decay /
biases no-decay), SGD(momentum, nesterov) or Adam, one-cycle cosine LR with
per-group warmup, ModelEMA decay 0.9999*(1-exp(-t/2000)).

Implemented by hand (not optax) because the reference semantics need
per-parameter-group learning rates that *change every warmup step* plus
torch-exact (coupled) weight decay and nesterov momentum; 30 lines of scan-
free tree math is simpler than composing optax transforms around that.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]

GROUP_BN, GROUP_WEIGHT, GROUP_BIAS = 0, 1, 2


def classify_params(params: Params, state: Params) -> Dict[str, int]:
    """Param-group assignment (reference train.py:120-137):
    BN gains -> pg0 (no decay), other weights -> pg1 (decay), biases -> pg2."""
    groups = {}
    for k in params:
        if k.endswith(".bias"):
            groups[k] = GROUP_BIAS
        elif k.endswith(".weight"):
            bn_prefix = k[: -len(".weight")]
            if bn_prefix + ".running_mean" in state:
                groups[k] = GROUP_BN
            else:
                groups[k] = GROUP_WEIGHT
        else:
            groups[k] = GROUP_WEIGHT
    return groups


def init_sgd_state(params: Params) -> Params:
    # host numpy: eager jnp.zeros_like per leaf pays a tunnel round-trip
    # each; create_train_state device_puts the whole tree once
    return {k: np.zeros_like(v) for k, v in params.items()}


def sgd_update(params: Params, grads: Params, momentum_buf: Params,
               groups: Dict[str, int], lr: jnp.ndarray, lr_bias: jnp.ndarray,
               momentum: jnp.ndarray, weight_decay: float,
               nesterov: bool = True) -> Tuple[Params, Params]:
    """torch.optim.SGD semantics: buf = mu*buf + (g + wd*w); nesterov step
    d = g + mu*buf; w -= lr_g * d.  lr_bias applies to the bias group
    (separate warmup ramp, reference train.py:348-352)."""
    new_p, new_buf = {}, {}
    for k, w in params.items():
        g = grads[k].astype(jnp.float32)
        if groups[k] == GROUP_WEIGHT and weight_decay:
            g = g + weight_decay * w
        buf = momentum * momentum_buf[k] + g
        d = g + momentum * buf if nesterov else buf
        lr_k = lr_bias if groups[k] == GROUP_BIAS else lr
        new_p[k] = w - lr_k * d
        new_buf[k] = buf
    return new_p, new_buf


def init_adam_state(params: Params):
    return ({k: np.zeros_like(v) for k, v in params.items()},
            {k: np.zeros_like(v) for k, v in params.items()},
            np.zeros((), np.int32))


def adam_update(params, grads, adam_state, groups, lr, lr_bias, beta1,
                weight_decay: float, beta2: float = 0.999, eps: float = 1e-8):
    """torch.optim.Adam (reference --adam path, train.py:131) with coupled
    weight decay on the weight group."""
    m, v, t = adam_state
    t = t + 1
    bc1 = 1 - beta1 ** t.astype(jnp.float32)
    bc2 = 1 - beta2 ** t.astype(jnp.float32)
    new_p, new_m, new_v = {}, {}, {}
    for k, w in params.items():
        g = grads[k].astype(jnp.float32)
        if groups[k] == GROUP_WEIGHT and weight_decay:
            g = g + weight_decay * w
        new_m[k] = beta1 * m[k] + (1 - beta1) * g
        new_v[k] = beta2 * v[k] + (1 - beta2) * jnp.square(g)
        lr_k = lr_bias if groups[k] == GROUP_BIAS else lr
        new_p[k] = w - lr_k * (new_m[k] / bc1) / (jnp.sqrt(new_v[k] / bc2) + eps)
    return new_p, (new_m, new_v, t)


# ---------------------------------------------------------------------------
# EMA (reference utils/torch_utils.py:270-304)
# ---------------------------------------------------------------------------


def ema_decay(updates: jnp.ndarray, decay: float = 0.9999,
              tau: float = 2000.0) -> jnp.ndarray:
    return decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))


def ema_update(ema: Params, new: Params, d: jnp.ndarray) -> Params:
    """EMAs every float entry (torch ModelEMA covers the whole state_dict,
    i.e. params AND BN running stats)."""
    out = {}
    for k, v in ema.items():
        nv = new[k]
        if jnp.issubdtype(v.dtype, jnp.floating):
            out[k] = v * d + (1.0 - d) * nv.astype(v.dtype)
        else:
            out[k] = nv
    return out


# ---------------------------------------------------------------------------
# Schedules (host-side scalar math, passed into the jitted step)
# ---------------------------------------------------------------------------


@dataclass
class WarmupCosine:
    """One-cycle cosine epoch schedule + linear per-iteration warmup
    (reference train.py:143-147, 344-352)."""

    lr0: float
    lrf: float
    epochs: int
    warmup_iters: int
    warmup_bias_lr: float = 0.1
    warmup_momentum: float = 0.8
    momentum: float = 0.937
    linear: bool = False

    def lf(self, epoch: float) -> float:
        if self.linear:
            return (1 - epoch / (self.epochs - 1)) * (1.0 - self.lrf) + self.lrf
        return ((1 - math.cos(epoch * math.pi / self.epochs)) / 2) * (self.lrf - 1) + 1

    def at(self, ni: int, epoch: int) -> Tuple[float, float, float]:
        """Returns (lr, lr_bias, momentum) for integrated batch ni."""
        base = self.lr0 * self.lf(epoch)
        if ni <= self.warmup_iters:
            xi = [0, max(self.warmup_iters, 1)]
            lr = float(np.interp(ni, xi, [0.0, base]))
            lr_bias = float(np.interp(ni, xi, [self.warmup_bias_lr, base]))
            mom = float(np.interp(ni, xi, [self.warmup_momentum, self.momentum]))
            return lr, lr_bias, mom
        return base, base, self.momentum

    def accumulate_at(self, ni: int, nbs: int, total_bs: int) -> int:
        """Warmup-ramped gradient accumulation.  The reference (this fork,
        train.py:347) interps to math.floor(nbs/total_bs) — a deliberate
        change from upstream ("prevent NaN") — and never reassigns after
        warmup, so the steady state IS that floor value."""
        end = max(math.floor(nbs / total_bs), 1)
        if ni <= self.warmup_iters:
            return max(1, int(round(np.interp(
                ni, [0, max(self.warmup_iters, 1)], [1, end]))))
        return end
