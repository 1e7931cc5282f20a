"""Run management + misc helpers (reference utils/general.py subset)."""

from __future__ import annotations

import glob
import logging
import math
import os
import re
from pathlib import Path

import numpy as np

logger = logging.getLogger("multiyolov5_tpu")


def set_logging(rank: int = -1) -> None:
    logging.basicConfig(
        format="%(message)s",
        level=logging.INFO if rank in (-1, 0) else logging.WARN)


def increment_path(path, exist_ok: bool = False, sep: str = "") -> str:
    """runs/exp -> runs/exp{sep}2, ... (reference utils/general.py:594-604)."""
    path = Path(path)
    if (path.exists() and exist_ok) or (not path.exists()):
        return str(path)
    dirs = glob.glob(f"{path}{sep}*")
    matches = [re.search(rf"%s{sep}(\d+)" % re.escape(path.stem), d) for d in dirs]
    i = [int(m.groups()[0]) for m in matches if m]
    n = max(i) + 1 if i else 2
    return f"{path}{sep}{n}"


def get_latest_run(search_dir: str = ".") -> str:
    last = glob.glob(f"{search_dir}/**/last*.npz", recursive=True) + \
        glob.glob(f"{search_dir}/**/last*.pt", recursive=True)
    return max(last, key=os.path.getctime) if last else ""


def colorstr(*input):
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {"black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
              "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
              "cyan": "\033[36m", "white": "\033[37m", "bright_black": "\033[90m",
              "bright_red": "\033[91m", "bright_green": "\033[92m",
              "bright_yellow": "\033[93m", "bright_blue": "\033[94m",
              "bright_magenta": "\033[95m", "bright_cyan": "\033[96m",
              "bright_white": "\033[97m", "end": "\033[0m", "bold": "\033[1m",
              "underline": "\033[4m"}
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


def one_cycle(y1: float = 0.0, y2: float = 1.0, steps: int = 100):
    """Cosine ramp y1->y2 (reference utils/general.py:186-188)."""
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def labels_to_class_weights(labels, nc: int = 80) -> np.ndarray:
    """Inverse-frequency class weights (reference utils/general.py:216-230)."""
    if len(labels) == 0:
        return np.zeros(nc)
    labels = np.concatenate(labels, 0)
    classes = labels[:, 0].astype(int)
    weights = np.bincount(classes, minlength=nc).astype(float)
    weights[weights == 0] = 1
    weights = 1 / weights
    weights /= weights.sum()
    return weights


def labels_to_image_weights(labels, nc: int = 80, class_weights=None) -> np.ndarray:
    if class_weights is None:
        class_weights = np.ones(nc)
    class_counts = np.array(
        [np.bincount(l[:, 0].astype(int), minlength=nc) for l in labels])
    return (class_weights.reshape(1, nc) * class_counts).sum(1)


def check_dataset(data: dict) -> None:
    """Verify dataset paths exist (reference auto-download is replaced by a
    clear error: zero-egress environment)."""
    for k in ("train", "val"):
        if k in data and data[k]:
            paths = data[k] if isinstance(data[k], list) else [data[k]]
            for p in paths:
                if not os.path.exists(p):
                    raise FileNotFoundError(
                        f"dataset path missing: {p} (auto-download disabled)")


def clean_str(s: str) -> str:
    return re.sub(pattern="[|@#!¡·$€%&()=?¿^*;:,¨´><+]", repl="_", string=s)
