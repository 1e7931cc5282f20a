"""End-to-end smoke of the training CLI (reference train.py main loop).

One epoch, detection-only, tiny synthetic dataset, 64px: exercises argument
plumbing, dataloader build, the jitted train step, eval, checkpointing, and
the (disabled-wandb) logger wiring without needing TPU or real data.
"""

import os
from pathlib import Path

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def tiny_det_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("tinyds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    from PIL import Image
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
                        "RGB").save(root / "images" / f"im{i}.png")
        (root / "labels" / f"im{i}.txt").write_text(
            "0 0.5 0.5 0.4 0.4\n1 0.3 0.3 0.2 0.2\n")
    yml = root / "data.yaml"
    yml.write_text(yaml.safe_dump({
        "train": str(root / "images"), "val": str(root / "images"),
        "nc": 2, "names": ["a", "b"]}))
    return yml


def test_train_cli_one_epoch(tiny_det_dataset, tmp_path):
    from multiyolov5_tpu.cli.train import main
    save_dir, best = main([
        "--cfg", "/root/reference/models/yolov5s.yaml",
        "--data", str(tiny_det_dataset),
        "--epochs", "1", "--batch-size", "2",
        "--img-size", "64", "64", "--img-size-test", "64",
        "--workers", "2", "--project", str(tmp_path / "runs"),
        "--no-tb", "--noautoanchor"])
    run = Path(save_dir)
    assert (run / "weights" / "last.npz").exists()
    assert (run / "opt.yaml").exists() and (run / "hyp.yaml").exists()
    lines = (run / "results.txt").read_text().strip().splitlines()
    assert len(lines) == 1 and lines[0].startswith("0 ")
