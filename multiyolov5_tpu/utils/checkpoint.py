"""Checkpoint bridge + native checkpointing.

Two jobs:
  1. **Torch bridge** — import reference ``.pt`` checkpoints (reference
     train.py:482-489 saves {'model','ema',...} of pickled nn.Modules; the
     published pspv5s/pspv5m weights use this format) into our flat NHWC
     pytrees, and export back.  Key names match the torch ``state_dict``
     exactly (by construction of the init functions) so the transform is a
     pure per-tensor layout change.
  2. **Native checkpoints** — msgpack-free ``.npz`` save/restore of
     {params, state, opt_state, ema, step} used by the trainer.  Orbax is
     available in the image but a flat-dict npz is dependency-light and
     instantaneous for a ~7M-param model.
"""

from __future__ import annotations

import io
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]

_SKIP_SUFFIXES = (".num_batches_tracked",)
_STATE_SUFFIXES = (".running_mean", ".running_var")
_BUFFER_NAMES = (".anchors", ".anchor_grid")


def from_torch_state_dict(sd: Dict[str, Any]) -> Tuple[Params, Params]:
    """Convert a torch state_dict (tensors or ndarrays) to (params, state).

    Conv weights OIHW -> HWIO.  BN running stats and Detect anchor buffers go
    to ``state``; everything trainable goes to ``params``.
    """
    params: Params = {}
    state: Params = {}
    for k, v in sd.items():
        if any(k.endswith(s) for s in _SKIP_SUFFIXES):
            continue
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        arr = arr.astype(np.float32) if arr.dtype == np.float16 else arr
        if arr.ndim == 4 and k.endswith(".weight"):
            arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        tgt = state if (any(k.endswith(s) for s in _STATE_SUFFIXES)
                        or any(k.endswith(b) for b in _BUFFER_NAMES)) else params
        tgt[k] = arr  # host numpy; callers device_put the finished tree
    return params, state


def to_torch_state_dict(params: Params, state: Params) -> Dict[str, np.ndarray]:
    """Inverse of :func:`from_torch_state_dict` (numpy arrays, torch layout)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in {**params, **state}.items():
        arr = np.asarray(v)
        if arr.ndim == 4 and k.endswith(".weight"):
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
        out[k] = arr
    return out


def _torch_load_reference(path: str):
    """torch.load of a reference checkpoint.

    Published pspv5s/pspv5m .pt files pickle whole nn.Modules, so unpickling
    needs the reference's ``models``/``utils`` packages importable.  We try
    plainly first; on ModuleNotFoundError we look for a reference checkout
    (MULTIYOLOV5_REF env var, /root/reference, or ./reference), stub its
    heavyweight imports (onnx, torchvision), and retry.
    """
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=False)
    except ModuleNotFoundError as e:
        import os
        import sys
        import types

        candidates = [os.environ.get("MULTIYOLOV5_REF"), "/root/reference",
                      "./reference", "./multiyolov5"]
        ref = next((c for c in candidates if c and os.path.isdir(c)), None)
        if ref is None:
            raise ModuleNotFoundError(
                f"{e}. Unpickling a reference .pt needs the reference repo; "
                f"set MULTIYOLOV5_REF to its checkout or convert once with "
                f"tools/convert_pt.py") from e
        for name in ("onnx", "onnx.external_data_helper", "torchvision",
                     "torchvision.ops", "seaborn", "wandb"):
            sys.modules.setdefault(name, types.ModuleType(name))
        if not hasattr(sys.modules["torchvision"], "ops"):
            sys.modules["torchvision"].ops = sys.modules["torchvision.ops"]
        sys.path.insert(0, ref)
        try:
            return torch.load(path, map_location="cpu", weights_only=False)
        finally:
            sys.path.remove(ref)


def load_pt(path: str, prefer_ema: bool = True) -> Tuple[Params, Params, Dict[str, Any]]:
    """Load a reference ``.pt`` checkpoint.

    Mirrors reference attempt_load (models/experimental.py:113-134): prefer the
    'ema' entry, fall back to 'model'; tolerate a bare state_dict.  Requires
    torch (baked into the image) purely as an unpickler.
    """
    ckpt = _torch_load_reference(path)
    meta: Dict[str, Any] = {}
    if isinstance(ckpt, dict) and ("model" in ckpt or "ema" in ckpt):
        meta = {k: ckpt.get(k) for k in ("epoch", "best_fitness", "training_results")
                if k in ckpt}
        obj = ckpt.get("ema") if (prefer_ema and ckpt.get("ema") is not None) else ckpt["model"]
        sd = obj.float().state_dict() if hasattr(obj, "state_dict") else obj
        for src in (obj, ckpt.get("model")):
            if hasattr(src, "yaml"):  # reference Model stores its config dict
                meta["yaml"] = src.yaml
                break
    elif hasattr(ckpt, "state_dict"):
        sd = ckpt.float().state_dict()
    else:
        sd = ckpt
    params, state = from_torch_state_dict(sd)
    return params, state, meta


def intersect_load(params: Params, new: Params, exclude=()) -> Tuple[Params, int]:
    """reference utils/torch_utils.py:140-142 intersect_dicts: copy matching
    name+shape entries, keep the rest."""
    out = dict(params)
    n = 0
    for k, v in new.items():
        if k in out and out[k].shape == v.shape and not any(e in k for e in exclude):
            out[k] = v
            n += 1
    return out, n


# ---------------------------------------------------------------------------
# Native flat-npz checkpoints
# ---------------------------------------------------------------------------


def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray]) -> Any:
    """Flatten a nested dict/list/tuple of arrays into string keys; returns a
    JSON-able skeleton describing the structure."""
    if isinstance(tree, dict):
        return {k: _flatten(v, f"{prefix}/{k}", out) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        kind = "list" if isinstance(tree, list) else "tuple"
        return {"__seq__": kind,
                "items": [_flatten(v, f"{prefix}/{i}", out) for i, v in enumerate(tree)]}
    if tree is None:
        return {"__none__": True}
    if isinstance(tree, (int, float, str, bool)):
        return {"__scalar__": tree}
    out[prefix] = np.asarray(tree)
    return {"__leaf__": prefix}


def _unflatten(skel: Any, arrays: Dict[str, np.ndarray]) -> Any:
    if isinstance(skel, dict):
        if "__leaf__" in skel:
            return np.asarray(arrays[skel["__leaf__"]])
        if "__none__" in skel:
            return None
        if "__scalar__" in skel:
            return skel["__scalar__"]
        if "__seq__" in skel:
            items = [_unflatten(s, arrays) for s in skel["items"]]
            return items if skel["__seq__"] == "list" else tuple(items)
        return {k: _unflatten(v, arrays) for k, v in skel.items()}
    raise ValueError(f"bad skeleton node: {skel!r}")


def save_npz(path: str, tree: Dict[str, Any]) -> None:
    arrays: Dict[str, np.ndarray] = {}
    skel = _flatten(tree, "", arrays)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as fh:
        np.savez(fh, __skeleton__=np.frombuffer(
            json.dumps(skel).encode(), dtype=np.uint8), **arrays)


def load_npz(path: str) -> Dict[str, Any]:
    with np.load(path, allow_pickle=False) as z:
        skel = json.loads(bytes(z["__skeleton__"]).decode())
        arrays = {k: z[k] for k in z.files if k != "__skeleton__"}
    return _unflatten(skel, arrays)


def save_orbax(path: str, tree: Dict[str, Any]) -> None:
    """Multi-host/sharded checkpointing via orbax (the npz format is
    single-host).  Use for multi-host training where params are sharded —
    orbax writes per-shard files and restores onto any mesh."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, target=None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def strip_optimizer(path: str, out_path: Optional[str] = None) -> None:
    """Native analog of reference utils/general.py:512-525: finalize a train
    checkpoint for inference — promote EMA to params, drop optimizer state."""
    ckpt = load_npz(path)
    final = {
        "params": ckpt.get("ema_params") or ckpt["params"],
        "state": ckpt.get("ema_state") or ckpt["state"],
        "spec_yaml": ckpt.get("spec_yaml"),
        # the trainer stores the EMA/update counter as "updates"
        # (cli/train.py); keep it so a resumed EMA doesn't restart its
        # 2000-step decay warmup
        "updates": ckpt.get("updates", ckpt.get("step")),
        "epoch": ckpt.get("epoch"),
        "best_fitness": ckpt.get("best_fitness"),
    }
    save_npz(out_path or path, final)
