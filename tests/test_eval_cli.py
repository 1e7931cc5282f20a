"""End-to-end smoke of the eval CLI (reference test.py:343-406).

Drives cli/test.run() the way test_train_cli drives training: det split on
the reference's checked-in custom dataset, seg split through the custom
loader (--seg-data-kind custom), checking arg plumbing, rect eval, metric
assembly and the combined det+seg run.
"""

import argparse
import json
import os

import numpy as np
import pytest
import yaml

REF = "/root/reference"
CUSTOM = os.path.join(REF, "data", "customdata")
pytestmark = pytest.mark.skipif(not os.path.isdir(CUSTOM),
                                reason="reference fixture data not mounted")


def _opt(data_yaml, save_dir, **over):
    from multiyolov5_tpu.cli.test import build_parser
    opt = build_parser().parse_args([])
    opt.weights = ""
    opt.cfg = "yolov5s_custom_seg"   # nc=1, n_segcls=2 (reference cfg)
    opt.data = str(data_yaml)
    opt.img_size = 128
    opt.base_size = 128
    opt.batch_size = 8
    opt.workers = 2
    opt.save_dir = str(save_dir)
    for k, v in over.items():
        setattr(opt, k, v)
    return opt


@pytest.fixture(scope="module")
def data_yaml(tmp_path_factory):
    p = tmp_path_factory.mktemp("evalcli") / "custom.yaml"
    p.write_text(yaml.safe_dump({
        "val": os.path.join(CUSTOM, "detdata/images/val"),
        "segval": CUSTOM,
        "nc": 1, "names": ["crack"]}))
    return p


def test_eval_cli_det_and_seg(data_yaml, tmp_path):
    from multiyolov5_tpu.cli.test import run

    res = run(_opt(data_yaml, tmp_path, seg_data_kind="custom"))
    # random-init weights: metrics near zero, but every key must exist and
    # be finite — this drives the full det (rect, IoU-matched mAP) and seg
    # (testval mIoU accumulators) pipelines
    for k in ("P", "R", "mAP50", "mAP", "pixAcc", "mIoU"):
        assert k in res, res
        assert np.isfinite(float(res[k])), (k, res[k])
    assert 0.0 <= float(res["mIoU"]) <= 1.0
    assert 0.0 <= float(res["pixAcc"]) <= 1.0


def test_eval_cli_det_only_save_txt(data_yaml, tmp_path):
    from multiyolov5_tpu.cli.test import run

    res = run(_opt(data_yaml, tmp_path, det_only=True, save_txt=True,
                   conf_thres=0.0001))
    assert "mAP50" in res and "mIoU" not in res
    labels = list((tmp_path / "labels").glob("*.txt")) \
        if (tmp_path / "labels").exists() else []
    # save_txt wrote yolo-format prediction files somewhere under save_dir
    found = list(tmp_path.rglob("*.txt"))
    assert found or labels  # at least one predictions file at conf 1e-4
