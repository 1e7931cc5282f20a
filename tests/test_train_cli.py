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
    # 16 images: batch sizes round up to 8 on the 8-virtual-device mesh, so
    # fewer than 8 images would mean ZERO train iterations per epoch
    for i in range(16):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
                        "RGB").save(root / "images" / f"im{i}.png")
        (root / "labels" / f"im{i}.txt").write_text(
            "0 0.5 0.5 0.4 0.4\n1 0.3 0.3 0.2 0.2\n")
    yml = root / "data.yaml"
    yml.write_text(yaml.safe_dump({
        "train": str(root / "images"), "val": str(root / "images"),
        "nc": 2, "names": ["a", "b"]}))
    return yml


@pytest.fixture(scope="module")
def tiny_joint_dataset(tmp_path_factory):
    """Detection + custom-kind segmentation fixture (segimages/seglabels
    layout, trainId masks) for the collapsed train-variant smokes."""
    root = tmp_path_factory.mktemp("tinyjoint")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    from PIL import Image
    rng = np.random.default_rng(0)
    # 32 images: batch sizes round up to 8 on the 8-virtual-device mesh
    # (fewer would mean zero train iterations per epoch), and --quad needs
    # 4x that since collate_fn4 merges 4 loader images into one
    for i in range(32):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
                        "RGB").save(root / "images" / f"im{i}.png")
        (root / "labels" / f"im{i}.txt").write_text(
            "0 0.5 0.5 0.4 0.4\n1 0.3 0.3 0.2 0.2\n")
    seg = root / "seg"
    for split in ("train", "val"):
        (seg / "segimages" / split).mkdir(parents=True)
        (seg / "seglabels" / split).mkdir(parents=True)
        for i in range(8):
            Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
                            "RGB").save(seg / "segimages" / split / f"s{i}.png")
            m = rng.integers(0, 19, (64, 64)).astype(np.uint8)
            m[:4, :4] = 255  # ignore region (-1 after load)
            Image.fromarray(m, "L").save(seg / "seglabels" / split / f"s{i}.png")
    yml = root / "data.yaml"
    yml.write_text(yaml.safe_dump({
        "train": str(root / "images"), "val": str(root / "images"),
        "segtrain": str(seg), "segval": str(seg),
        "nc": 2, "names": ["a", "b"]}))
    return yml


def _run_variant(data_yaml, tmp_path, *extra):
    from multiyolov5_tpu.cli.train import main
    save_dir, best = main([
        "--data", str(data_yaml),
        "--epochs", "1", "--batch-size", "2",
        "--img-size", "64", "64", "--img-size-test", "64",
        "--base-size", "64", "--seg-data-kind", "custom",
        "--seg-eval-interval", "1",
        "--workers", "2", "--project", str(tmp_path / "runs"),
        "--no-tb", "--noautoanchor", *extra])
    run = Path(save_dir)
    assert (run / "weights" / "last.npz").exists()
    line = (run / "results.txt").read_text().strip().splitlines()[0]
    assert np.isfinite([float(v) for v in line.split()]).all()
    return run


def test_train_cli_seg_ohem(tiny_joint_dataset, tmp_path):
    """--seg-loss ohem: the reference train_citysbdd.py OhemCELoss wiring
    through the jitted dual-task step."""
    _run_variant(tiny_joint_dataset, tmp_path,
                 "--cfg", "yolov5s_city_seg", "--seg-loss", "ohem")


def test_train_cli_bise_aux(tiny_joint_dataset, tmp_path):
    """BiSe config: --seg-aux is implied by the head (3 training outputs,
    reference models/yolo.py:30-86) and must flow through the jitted step."""
    _run_variant(tiny_joint_dataset, tmp_path,
                 "--cfg", "yolov5s_city_seg_bise")


def test_train_cli_quad(tiny_joint_dataset, tmp_path):
    """--quad: collate_fn4 batching + the 4x loss gain
    (reference train.py:368)."""
    _run_variant(tiny_joint_dataset, tmp_path,
                 "--cfg", "yolov5s_city_seg", "--quad")


def test_train_cli_model_parallel(tiny_joint_dataset, tmp_path):
    """--model-parallel 2 on the 8-virtual-device mesh: dp4 x sp2 training
    end-to-end through the CLI (loss finite, checkpoint written)."""
    _run_variant(tiny_joint_dataset, tmp_path,
                 "--cfg", "yolov5s_city_seg", "--model-parallel", "2",
                 "--batch-size", "4")


def test_train_cli_pspv5m(tiny_joint_dataset, tmp_path):
    """pspv5m config smoke: the m widths/depths hit different kernel
    eligibility gates in the train step."""
    _run_variant(tiny_joint_dataset, tmp_path,
                 "--cfg", "yolov5m_city_seg")


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


def test_evolve_two_generations(tiny_det_dataset, tmp_path):
    """--evolve smoke (reference train.py:638-717): 2 generations on the
    tiny fixture — evolve.txt gains one row per generation, hyp_evolved.yaml
    is written, and every evolved hyper respects the EVOLVE_META bounds."""
    from multiyolov5_tpu.cli.train import main
    from multiyolov5_tpu.data.hyps import EVOLVE_META, load_hyp

    project = tmp_path / "runs"
    main([
        "--cfg", "/root/reference/models/yolov5s.yaml",
        "--data", str(tiny_det_dataset),
        "--epochs", "1", "--batch-size", "2",
        "--img-size", "64", "64", "--img-size-test", "64",
        "--workers", "2", "--project", str(project),
        "--no-tb", "--noautoanchor",
        "--evolve", "--evolve-generations", "2"])
    evolve_txt = project / "evolve.txt"
    assert evolve_txt.exists()
    rows = np.loadtxt(str(evolve_txt), ndmin=2)
    assert rows.shape[0] == 2
    assert np.isfinite(rows).all()
    evolved = yaml.safe_load((project / "hyp_evolved.yaml").read_text())
    base = load_hyp("scratch")
    keys = [k for k in EVOLVE_META if k in base]
    # print_mutation stores results(5 cols) then the hypers in key order
    assert rows.shape[1] == 5 + len(keys)
    for k in keys:
        lo, hi = EVOLVE_META[k][1], EVOLVE_META[k][2]
        assert lo - 1e-9 <= float(evolved[k]) <= hi + 1e-9, (k, evolved[k])


def test_train_cli_image_weights(tiny_det_dataset, tmp_path, monkeypatch):
    """--image-weights (reference train.py:303-316): per-epoch weighted
    resampling must actually be applied — set_image_weights is called each
    epoch and rewrites ds.indices to a weighted draw (with replacement, so
    across two epochs the order is not the identity)."""
    from multiyolov5_tpu.cli.train import main
    from multiyolov5_tpu.data.detection import DetectionLoader

    calls = []
    orig = DetectionLoader.set_image_weights

    def spy(self, weights):
        assert np.isfinite(weights).all() and (weights >= 0).all()
        orig(self, weights)
        calls.append(list(self.ds.indices))

    monkeypatch.setattr(DetectionLoader, "set_image_weights", spy)
    save_dir, _ = main([
        "--cfg", "/root/reference/models/yolov5s.yaml",
        "--data", str(tiny_det_dataset),
        "--epochs", "2", "--batch-size", "2",
        "--img-size", "64", "64", "--img-size-test", "64",
        "--workers", "2", "--project", str(tmp_path / "runs"),
        "--no-tb", "--noautoanchor", "--noval", "--image-weights"])
    assert len(calls) == 2  # once per epoch
    n = len(calls[0])
    assert all(len(c) == n for c in calls)
    # a weighted redraw with replacement: identity-ordering twice in a row
    # has probability (1/n!)^2-ish — assert the resampling really reorders
    assert any(c != list(range(n)) for c in calls), calls
    line = (Path(save_dir) / "results.txt").read_text().strip().splitlines()
    assert len(line) == 2


def test_train_cli_multi_scale(tiny_det_dataset, tmp_path, monkeypatch):
    """--multi-scale (reference train.py:354-361): the bucket draw must
    change the jitted train-step geometry at least once.  The sf sequence is
    deterministic given --seed (dedicated RNG): seed 0 draws buckets
    [4, 0, ...] -> 96px then 32px batches on the 64px fixture."""
    import multiyolov5_tpu.cli.train as tmod

    shapes = []
    orig = tmod.multiscale_resize

    def spy(imgs, sf, gs):
        out = orig(imgs, sf, gs)
        shapes.append(out.shape[1:3])
        return out

    monkeypatch.setattr(tmod, "multiscale_resize", spy)
    save_dir, _ = tmod.main([
        "--cfg", "/root/reference/models/yolov5s.yaml",
        "--data", str(tiny_det_dataset),
        "--epochs", "1", "--batch-size", "2",
        "--img-size", "64", "64", "--img-size-test", "64",
        "--workers", "2", "--project", str(tmp_path / "runs"),
        "--no-tb", "--noautoanchor", "--noval", "--multi-scale"])
    assert shapes, "multiscale_resize never called"
    assert any(s != (64, 64) for s in shapes), shapes
    # the run survived re-jitting under the changed geometry
    line = (Path(save_dir) / "results.txt").read_text().strip().splitlines()[0]
    assert np.isfinite([float(v) for v in line.split()]).all()
