"""Plotting utilities (reference utils/plots.py subset, torch-free)."""

from __future__ import annotations

import math
import os
from pathlib import Path

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def color_list():
    """matplotlib tab10-ish base colors as RGB tuples."""
    hexs = ("1f77b4", "ff7f0e", "2ca02c", "d62728", "9467bd", "8c564b",
            "e377c2", "7f7f7f", "bcbd22", "17becf")
    return [tuple(int(h[i:i + 2], 16) for i in (0, 2, 4)) for h in hexs]


def plot_one_box(x, img, color=None, label=None, line_thickness=3):
    """Draw one xyxy box (BGR image, in place) — reference utils/plots.py."""
    tl = line_thickness or round(0.002 * (img.shape[0] + img.shape[1]) / 2) + 1
    color = color or [np.random.randint(0, 255) for _ in range(3)]
    c1, c2 = (int(x[0]), int(x[1])), (int(x[2]), int(x[3]))
    cv2.rectangle(img, c1, c2, color, thickness=tl, lineType=cv2.LINE_AA)
    if label:
        tf = max(tl - 1, 1)
        t_size = cv2.getTextSize(label, 0, fontScale=tl / 3, thickness=tf)[0]
        c2 = c1[0] + t_size[0], c1[1] - t_size[1] - 3
        cv2.rectangle(img, c1, c2, color, -1, cv2.LINE_AA)
        cv2.putText(img, label, (c1[0], c1[1] - 2), 0, tl / 3, [225, 255, 255],
                    thickness=tf, lineType=cv2.LINE_AA)


def plot_images(images, targets, paths=None, fname="images.jpg", names=None,
                max_size=640, max_subplots=16):
    """Training-batch mosaic (reference utils/plots.py:114-191 simplified).

    images: (B, H, W, 3) float [0,1] NHWC; targets: (n, 6) [img, cls, xywh-norm].
    """
    if images.max() <= 1:
        images = images * 255
    bs, h, w, _ = images.shape
    bs = min(bs, max_subplots)
    ns = int(np.ceil(bs ** 0.5))
    scale = max_size / max(h, w)
    if scale < 1:
        h, w = int(h * scale), int(w * scale)
    mosaic = np.full((ns * h, ns * w, 3), 255, np.uint8)
    colors = color_list()
    for i in range(bs):
        img = images[i].astype(np.uint8)
        if scale < 1:
            img = cv2.resize(img, (w, h))
        bx, by = (i % ns) * w, (i // ns) * h
        mosaic[by:by + h, bx:bx + w] = img
        if targets is not None and len(targets):
            ti = targets[targets[:, 0] == i]
            for t in ti:
                cls = int(t[1])
                cx, cy, bw, bh = t[2] * w, t[3] * h, t[4] * w, t[5] * h
                xyxy = [bx + cx - bw / 2, by + cy - bh / 2,
                        bx + cx + bw / 2, by + cy + bh / 2]
                label = names[cls] if names and cls < len(names) else str(cls)
                plot_one_box(xyxy, mosaic, color=colors[cls % 10], label=label,
                             line_thickness=1)
    if fname:
        cv2.imwrite(str(fname), mosaic[:, :, ::-1])
    return mosaic


def plot_lr_scheduler(lrs, save_dir=""):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.plot(lrs, ".-", label="LR")
    plt.xlabel("epoch")
    plt.ylabel("LR")
    plt.grid()
    plt.savefig(Path(save_dir) / "LR.png", dpi=200)
    plt.close()


def plot_results(results_file="results.txt", save_dir=""):
    """Plot per-epoch training curves from results.txt (reference layout)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    try:
        data = np.loadtxt(results_file, usecols=range(2, 12), ndmin=2).T
    except Exception:
        return
    fig, ax = plt.subplots(2, 5, figsize=(12, 6), tight_layout=True)
    ax = ax.ravel()
    titles = ["Box", "Objectness", "Classification", "Precision", "Recall",
              "Seg", "mAP@0.5", "mAP@0.5:0.95", "mIoU", "fitness2"]
    n = data.shape[1]
    for i in range(min(10, data.shape[0])):
        ax[i].plot(range(n), data[i], marker=".", linewidth=2, markersize=8)
        ax[i].set_title(titles[i] if i < len(titles) else str(i))
    fig.savefig(Path(save_dir) / "results.png", dpi=200)
    plt.close()


def plot_evolution(evolve_txt="evolve.txt", keys=(), save_dir=None):
    """Hyperparameter-evolution scatter grid (reference utils/plots.py
    plot_evolution): fitness vs each hyper, best point highlighted."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.loadtxt(evolve_txt, ndmin=2)
    if not len(x):
        return
    f = x[:, 0]
    n = x.shape[1] - 5
    keys = list(keys) if keys else [f"hyp{i}" for i in range(n)]
    plt.figure(figsize=(12, 12), tight_layout=True)
    cols = int(np.ceil(np.sqrt(n)))
    for i in range(n):
        y = x[:, 5 + i]
        plt.subplot(cols, int(np.ceil(n / cols)), i + 1)
        plt.scatter(y, f, c=f, cmap="viridis", alpha=0.8, edgecolors="none")
        plt.plot(y[f.argmax()], f.max(), "k+", markersize=15)
        plt.title(f"{keys[i] if i < len(keys) else i} = {y[f.argmax()]:.3g}",
                  fontdict={"size": 9})
        plt.tick_params(labelsize=7)
    out = Path(save_dir or Path(evolve_txt).parent) / "evolve.png"
    plt.savefig(out, dpi=200)
    plt.close()
    print(f"saved evolution plot to {out}")


def plot_pr_curve(px, py, ap, save_dir="pr_curve.png", names=()):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    if py:
        py = np.stack(py, axis=1)
        if 0 < len(names) < 21:
            for i, y in enumerate(py.T):
                ax.plot(px, y, linewidth=1, label=f"{names[i]} {ap[i, 0]:.3f}")
        else:
            ax.plot(px, py, linewidth=1, color="grey")
        ax.plot(px, py.mean(1), linewidth=3, color="blue",
                label="all classes %.3f mAP@0.5" % ap[:, 0].mean())
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    plt.legend(bbox_to_anchor=(1.04, 1), loc="upper left")
    fig.savefig(Path(save_dir), dpi=250)
    plt.close()


def plot_mc_curve(px, py, save_dir="mc_curve.png", names=(), xlabel="Confidence",
                  ylabel="Metric"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    if 0 < len(names) < 21:
        for i, y in enumerate(py):
            ax.plot(px, y, linewidth=1, label=f"{names[i]}")
    else:
        ax.plot(px, py.T, linewidth=1, color="grey")
    y = py.mean(0)
    ax.plot(px, y, linewidth=3, color="blue",
            label=f"all classes {y.max():.2f} at {px[y.argmax()]:.3f}")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    plt.legend(bbox_to_anchor=(1.04, 1), loc="upper left")
    fig.savefig(Path(save_dir), dpi=250)
    plt.close()


def plot_confusion_matrix(matrix, nc, save_dir="", names=()):
    try:
        import seaborn as sn
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        array = matrix / (matrix.sum(0).reshape(1, nc + 1) + 1e-6)
        array[array < 0.005] = np.nan
        fig = plt.figure(figsize=(12, 9), tight_layout=True)
        labels = (0 < len(names) < 99) and len(names) == nc
        sn.heatmap(array, annot=nc < 30, annot_kws={"size": 8}, cmap="Blues",
                   fmt=".2f", square=True,
                   xticklabels=list(names) + ["background FP"] if labels else "auto",
                   yticklabels=list(names) + ["background FN"] if labels else "auto",
                   ).set_facecolor((1, 1, 1))
        fig.axes[0].set_xlabel("True")
        fig.axes[0].set_ylabel("Predicted")
        fig.savefig(Path(save_dir) / "confusion_matrix.png", dpi=250)
        plt.close()
    except Exception:
        pass


def plot_labels(labels, names=(), save_dir=""):
    """Label distribution plots (reference utils/plots.py plot_labels)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    c, b = labels[:, 0], labels[:, 1:5].T
    nc = int(c.max() + 1) if len(c) else 1
    fig, ax = plt.subplots(2, 2, figsize=(8, 8), tight_layout=True)
    ax = ax.ravel()
    ax[0].hist(c, bins=np.linspace(0, nc, nc + 1) - 0.5, rwidth=0.8)
    ax[0].set_ylabel("instances")
    ax[1].scatter(b[0], b[1], c=c, cmap="tab10", s=3)
    ax[1].set_xlabel("x")
    ax[1].set_ylabel("y")
    ax[2].scatter(b[2], b[3], c=c, cmap="tab10", s=3)
    ax[2].set_xlabel("width")
    ax[2].set_ylabel("height")
    ax[3].hist2d(b[0], b[1], bins=50)
    plt.savefig(Path(save_dir) / "labels.jpg", dpi=200)
    plt.close()
