"""W&B artifact-workflow logger vs reference utils/wandb_logging/wandb_utils.py.

wandb is not installed in this image, so a fake module exercises the full
surface: dataset artifacts + ground-truth tables (wandb_utils.py:193-261),
per-epoch bbox debug panels joined on the val table (:263-300), model
artifacts (:179-191), and ``wandb-artifact://`` resume (:42-53, 167-177).
"""

import argparse
import json
import os
from pathlib import Path

import numpy as np
import pytest
import yaml

from multiyolov5_tpu.utils import loggers as L


# ---------------------------------------------------------------- fake wandb

class FakeArtifact:
    def __init__(self, name=None, type=None, metadata=None):
        self.name, self.type = name, type
        self.metadata = metadata or {}
        self.files, self.objects, self._dir = [], {}, None

    def add_file(self, path, name=None):
        self.files.append((str(path), name))

    def add(self, obj, name):
        self.objects[name] = obj

    def wait(self):
        return self

    def get(self, name):
        return self.objects.get(name)

    def download(self):
        return self._dir


class FakeTable:
    def __init__(self, columns=None):
        self.columns = list(columns) if columns else []
        self.data = []

    def add_data(self, *row):
        self.data.append(list(row))


class FakeRun:
    def __init__(self, **kw):
        self.id = kw.get("id") or "fake123"
        self.kw = kw
        self.config = argparse.Namespace()
        self.logged, self.artifacts, self.used = [], [], []
        self.finished = False

    def log(self, d, step=None):
        self.logged.append(dict(d))

    def log_artifact(self, art, aliases=None):
        self.artifacts.append((art, aliases or []))

    def use_artifact(self, art):
        self.used.append(art)
        return art if not isinstance(art, str) else FakeWandb.registry.get(
            art.split(":")[0])

    def finish(self):
        self.finished = True


class FakeWandb:
    """Module stand-in; ``registry`` maps artifact name -> FakeArtifact for
    use_artifact-by-name lookups."""
    registry = {}
    Artifact, Table = FakeArtifact, FakeTable

    def __init__(self):
        self.run = None
        self.logged = []

    def init(self, **kw):
        self.run = FakeRun(**kw)
        # route by-name use_artifact through the class registry
        run = self.run

        def use_artifact(art):
            run.used.append(art)
            if isinstance(art, str):
                got = FakeWandb.registry.get(art.split(":")[0])
                assert got is not None, f"no fake artifact {art}"
                return got
            return art
        run.use_artifact = use_artifact
        return self.run

    def log(self, d, step=None):
        self.logged.append(dict(d))

    @staticmethod
    def Image(src, classes=None, boxes=None):
        return ("img", src, boxes)

    @staticmethod
    def Classes(items):
        return ("classes", tuple(i["id"] for i in items))

    @staticmethod
    def JoinedTable(a, b, key):
        return ("joined", a, b, key)


@pytest.fixture
def fake_wandb(monkeypatch):
    fw = FakeWandb()
    FakeWandb.registry = {}
    monkeypatch.setattr(L, "wandb", fw)
    return fw


def _opt(**kw):
    d = dict(resume=False, project="runs/train", epochs=20, data="",
             single_cls=False, upload_dataset=False, bbox_interval=-1,
             artifact_alias="latest", no_wandb=False, weights="")
    d.update(kw)
    return argparse.Namespace(**d)


# ------------------------------------------------------------------- no-op

def test_disabled_without_wandb(monkeypatch):
    monkeypatch.setattr(L, "wandb", None)
    lg = L.WandbLogger(_opt(), "exp")
    assert not lg.enabled
    lg.log({"x": 1.0})
    lg.end_epoch()
    lg.log_model("/nonexistent", _opt(), 0, 0.0)
    lg.log_training_progress(np.zeros((0, 6)), "a.png", {0: "car"})
    lg.finish()


def test_no_wandb_flag(fake_wandb):
    lg = L.WandbLogger(_opt(no_wandb=True), "exp")
    assert not lg.enabled and fake_wandb.run is None


# --------------------------------------------------------------- scalar log

def test_log_and_end_epoch(fake_wandb):
    lg = L.WandbLogger(_opt(), "exp")
    assert lg.enabled
    lg.log({"metrics/mAP_0.5": 0.5})
    lg.log({"train/box_loss": 0.1})
    assert fake_wandb.logged == []          # buffered until end_epoch
    lg.end_epoch()
    assert fake_wandb.logged == [
        {"metrics/mAP_0.5": 0.5, "train/box_loss": 0.1}]
    assert lg.log_dict == {}
    # bbox_interval resolves to epochs//10 (wandb_utils.py:155-156)
    assert lg.bbox_interval == 2


def test_log_model_artifact(fake_wandb, tmp_path):
    ck = tmp_path / "last.npz"
    ck.write_bytes(b"x")
    lg = L.WandbLogger(_opt(), "exp")
    lg.current_epoch = 3
    lg.log_model(str(ck), _opt(epochs=9), epoch=3, fitness=0.7, best=True)
    (art, aliases), = lg.run.artifacts
    assert art.type == "model" and art.metadata["epochs_trained"] == 4
    assert art.metadata["total_epochs"] == 9
    assert ("best" in aliases) and ("latest" in aliases)
    assert art.files == [(str(ck), "last.npz")]


# --------------------------------------------------------- dataset artifact

def _make_dataset(root: Path, n=2):
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir(parents=True)
    from PIL import Image
    for i in range(n):
        Image.new("RGB", (32, 24), (i * 40, 0, 0)).save(
            root / "images" / f"im{i}.png")
        (root / "labels" / f"im{i}.txt").write_text("0 0.5 0.5 0.25 0.5\n")
    yml = root / "data.yaml"
    yml.write_text(yaml.safe_dump({
        "train": str(root / "images"), "val": str(root / "images"),
        "nc": 2, "names": ["car", "person"]}))
    return yml


def test_log_dataset_artifact(fake_wandb, tmp_path):
    yml = _make_dataset(tmp_path)
    lg = L.WandbLogger(_opt(), "exp", job_type="Dataset Creation")
    cfg = lg.log_dataset_artifact(str(yml), False, "proj")
    assert cfg.endswith("data_wandb.yaml")
    new = yaml.safe_load(open(cfg))
    assert new["train"] == L.WANDB_ARTIFACT_PREFIX + "proj/train"
    assert new["val"] == L.WANDB_ARTIFACT_PREFIX + "proj/val"
    # both artifacts logged, each with images+labels and a GT table
    assert len(lg.run.artifacts) == 2
    art = lg.train_artifact
    names = {n for _, n in art.files}
    assert "data/images/im0.png" in names and "data/labels/im0.txt" in names
    table = art.objects["train"]
    assert len(table.data) == 2
    # box scaled to pixels: cx=16, w=8 -> minX=12, maxX=20 (32x24 image)
    _, img, classes_json, fname = table.data[0]
    box = img[2]["ground_truth"]["box_data"][0]["position"]
    assert box["minX"] == pytest.approx(12) and box["maxX"] == pytest.approx(20)
    assert json.loads(classes_json) == {"0": "car"}
    assert fname == "im0.png"


def test_upload_dataset_training_links_val_table(fake_wandb, tmp_path):
    yml = _make_dataset(tmp_path)
    data = yaml.safe_load(open(yml))
    lg = L.WandbLogger(_opt(data=str(yml), upload_dataset=True), "exp",
                       data_dict=data)
    assert lg.enabled and lg.val_table is not None
    assert lg.val_table_map == {"im0.png": 0, "im1.png": 1}
    # training job links lineage via use_artifact, not log_artifact
    assert lg.train_artifact in lg.run.used
    assert lg.result_table is not None and lg.result_artifact is not None


# ------------------------------------------------------------- bbox panels

def test_log_training_progress_and_epoch_table(fake_wandb, tmp_path):
    yml = _make_dataset(tmp_path)
    data = yaml.safe_load(open(yml))
    lg = L.WandbLogger(_opt(data=str(yml), upload_dataset=True), "exp",
                       data_dict=data)
    pred = np.array([[1.0, 2.0, 11.0, 12.0, 0.9, 1],
                     [0.0, 0.0, 5.0, 5.0, 0.1, 0]])  # low conf dropped
    lg.current_epoch = 4
    lg.log_training_progress(pred, str(tmp_path / "images" / "im1.png"),
                             {0: "car", 1: "person"})
    row, = lg.result_table.data
    assert row[0] == 4 and row[1] == 1            # epoch, val-table id
    assert row[3] == pytest.approx(0.9)           # avg confidence
    boxes = row[2][2]["predictions"]["box_data"]
    assert len(boxes) == 1 and boxes[0]["class_id"] == 1
    lg.log({"m": 1.0})
    lg.end_epoch(best_result=True)
    # joined table published on the progress artifact (wandb_utils.py:294-300)
    art, aliases = lg.run.artifacts[-1]
    assert art.type == "evaluation" and "best" in aliases
    assert art.objects["result"][0] == "joined"
    assert lg.result_table.data == []             # fresh table for next epoch


# ------------------------------------------------------------------ resume

def test_check_wandb_resume():
    assert L.check_wandb_resume(
        _opt(resume=L.WANDB_ARTIFACT_PREFIX + "p/r1")) is True
    assert L.check_wandb_resume(_opt(resume=True)) is None
    assert L.check_wandb_resume(_opt(resume="runs/train/exp/weights/last.npz")) \
        is None


def test_get_run_info():
    rid, proj, model = L.get_run_info(L.WANDB_ARTIFACT_PREFIX + "myproj/abc9")
    assert (rid, proj, model) == ("abc9", "myproj", "run_abc9_model")


def test_resume_from_artifact(fake_wandb, tmp_path):
    modeldir = tmp_path / "dl"
    modeldir.mkdir()
    (modeldir / "last.npz").write_bytes(b"x")
    art = FakeArtifact("run_abc9_model", "model",
                       {"epochs_trained": 3, "total_epochs": 20})
    art._dir = str(modeldir)
    # wandb resolves the bare model name inside the resumed run's project
    # (reference wandb_utils.py:89,169)
    FakeWandb.registry["run_abc9_model"] = art
    opt = _opt(resume=L.WANDB_ARTIFACT_PREFIX + "myproj/abc9", epochs=20)
    lg = L.WandbLogger(opt, "exp", data_dict={})
    assert lg.enabled and lg.run.id == "abc9"
    assert opt.weights == str(modeldir / "last.npz")


def test_resume_finished_run_refuses(fake_wandb, tmp_path):
    art = FakeArtifact("run_abc9_model", "model",
                       {"epochs_trained": 20, "total_epochs": 20})
    art._dir = str(tmp_path)
    FakeWandb.registry["myproj/run_abc9_model"] = art
    opt = _opt(resume=L.WANDB_ARTIFACT_PREFIX + "myproj/abc9", epochs=20)
    lg = L.WandbLogger.__new__(L.WandbLogger)
    lg.run = FakeRun(id="abc9")
    lg.run.use_artifact = lambda a: FakeWandb.registry[a.split(":")[0]]
    opt.resume = L.WANDB_ARTIFACT_PREFIX + "myproj/run_abc9_model"
    with pytest.raises(AssertionError, match="nothing to resume"):
        lg.download_model_artifact(opt)


def test_download_dataset_artifact_swaps_paths(fake_wandb, tmp_path):
    ddir = tmp_path / "valdl"
    (ddir / "data" / "images").mkdir(parents=True)
    art = FakeArtifact("proj/val", "dataset")
    art._dir = str(ddir)
    # a val table matching map_val_table_path's row layout
    t = FakeTable(["id", "train_image", "Classes", "name"])
    t.add_data(0, ("img", "x", None), "{}", "im0.png")
    art.objects["val"] = t
    FakeWandb.registry["proj/val"] = art
    opt = _opt()
    lg = L.WandbLogger(opt, "exp",
                       data_dict={"val": L.WANDB_ARTIFACT_PREFIX + "proj/val"})
    assert lg.data_dict["val"] == str(ddir / "data" / "images")
    assert lg.val_table_map == {"im0.png": 0}


# ------------------------------------------------------------ eval wiring

def test_evaluate_detection_accepts_logger_kw():
    import inspect
    from multiyolov5_tpu.evaluation import evaluate_detection
    assert "wandb_logger" in inspect.signature(evaluate_detection).parameters
