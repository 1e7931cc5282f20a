"""Data pipeline tests on the reference's checked-in 10-image custom dataset."""

import os

import numpy as np
import pytest

REF = "/root/reference"
CUSTOM = os.path.join(REF, "data", "customdata")
pytestmark = pytest.mark.skipif(not os.path.isdir(CUSTOM),
                                reason="reference fixture data not mounted")

HYP = {"degrees": 0.0, "translate": 0.1, "scale": 0.5, "shear": 0.0,
       "perspective": 0.0, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
       "flipud": 0.0, "fliplr": 0.5, "mosaic": 1.0, "mixup": 0.0}


def test_detection_dataset_and_loader(tmp_path):
    from multiyolov5_tpu.data.detection import DetectionDataset, DetectionLoader

    ds = DetectionDataset(os.path.join(CUSTOM, "detdata/images/train"),
                          img_size=320, batch_size=4, augment=True, hyp=HYP)
    assert len(ds) > 0
    img, labels, path, shapes = ds[0]
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    assert labels.ndim == 2 and labels.shape[1] == 5
    assert (labels[:, 1:] >= 0).all() and (labels[:, 1:] <= 1).all()

    loader = DetectionLoader(ds, batch_size=4, max_targets=32, shuffle=True,
                             workers=2)
    n = 0
    for imgs, tgts, mask, paths, _ in loader:
        # mosaic canvas is 2s x 2s but random_perspective's border crops back to s x s
        assert imgs.shape == (4, 320, 320, 3)
        assert tgts.shape == (4, 32, 5)
        assert mask.shape == (4, 32)
        n += 1
    assert n == len(loader)


def test_quad_collate(monkeypatch):
    """collate_fn4 semantics (reference utils/datasets.py:601-625): groups of
    4 fold into one 2x-res item, by 2x2 stitch or 2x upsample."""
    from multiyolov5_tpu.data import detection as det_mod
    from multiyolov5_tpu.data.detection import DetectionLoader

    class StubDS:
        def __init__(self):
            self.items = []
            for i in range(8):
                img = np.full((32, 32, 3), i * 10, np.uint8)
                lbl = np.array([[float(i % 3), .5, .5, .25, .25]], np.float32)
                self.items.append((img, lbl, f"im{i}.jpg", None))

        def __len__(self):
            return 8

        def __getitem__(self, i):
            return self.items[i]

    loader = DetectionLoader(StubDS(), batch_size=8, max_targets=16,
                             shuffle=False, workers=1, quad=True)

    # stitch branch
    monkeypatch.setattr(det_mod.random, "random", lambda: 0.9)
    (imgs, tgts, mask, paths, shapes), = list(loader)
    assert imgs.shape == (2, 64, 64, 3)
    assert imgs[0, 0, 0, 0] == 0 and imgs[0, 40, 0, 0] == 10      # below
    assert imgs[0, 0, 40, 0] == 20 and imgs[0, 40, 40, 0] == 30   # right
    got = tgts[0][mask[0]]
    assert got.shape == (4, 5)
    # item0 center (.5,.5) -> (.25,.25); item3 (below+right) -> (.75,.75)
    np.testing.assert_allclose(got[0], [0, .25, .25, .125, .125])
    np.testing.assert_allclose(got[3], [0, .75, .75, .125, .125])

    # upsample branch: labels unchanged (normalized), image doubled
    monkeypatch.setattr(det_mod.random, "random", lambda: 0.1)
    (imgs, tgts, mask, paths, shapes), = list(loader)
    assert imgs.shape == (2, 64, 64, 3)
    assert (imgs[0] == 0).all() and (imgs[1] == 40).all()
    np.testing.assert_allclose(tgts[0][mask[0]][0], [0, .5, .5, .25, .25])


def test_detection_rect_eval_mode():
    from multiyolov5_tpu.data.detection import DetectionDataset

    ds = DetectionDataset(os.path.join(CUSTOM, "detdata/images/val"),
                          img_size=320, batch_size=2, augment=False, rect=True,
                          pad=0.5)
    img, labels, path, shapes = ds[0]
    assert img.shape[0] % 32 == 0 and img.shape[1] % 32 == 0
    assert shapes is not None  # ((h0,w0), ((gain), pad)) for mAP unmapping


def test_seg_dataset_modes():
    from multiyolov5_tpu.data.segmentation import CustomSegmentation, SegLoader

    for mode, crop in (("train", None), ("val", None), ("testval", None)):
        ds = CustomSegmentation(root=CUSTOM, split="train", mode=mode,
                                base_size=256, crop_size=(256, 256),
                                jitter=(0.4, 0.4, 0.4, 0.0) if mode == "train" else None)
        img, mask = ds[0]
        assert img.dtype == np.float32 and img.max() <= 1.0
        mask = np.asarray(mask)
        assert mask.min() >= -1 and mask.max() < 2  # n_segcls=2 fixture
        if mode == "train":
            assert img.shape[:2] == (256, 256)
            assert mask.shape == img.shape[:2]

    loader = SegLoader(CustomSegmentation(root=CUSTOM, split="train",
                                          mode="train", base_size=128,
                                          crop_size=(128, 128)),
                       batch_size=2, shuffle=True, drop_last=True)
    for imgs, masks in loader:
        assert imgs.shape == (2, 128, 128, 3)
        assert masks.shape == (2, 128, 128)
        break


def test_cityscapes_id_mapping_roundtrip():
    from multiyolov5_tpu.data.cityscapes import id2trainid, trainid2id, ID2TRAINID
    from multiyolov5_tpu.data.segmentation import CitySegmentation

    # the digitize table in the dataset must agree with the flat lookup
    ds = CitySegmentation.__new__(CitySegmentation)
    ds._key = np.array([-1, -1, -1, -1, -1, -1, -1, -1, 0, 1, -1, -1, 2, 3, 4,
                        -1, -1, -1, 5, -1, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
                        -1, -1, 16, 17, 18])
    ds._mapping = np.arange(-1, 34).astype("int32")
    raw = np.random.RandomState(0).randint(0, 34, (16, 16)).astype("int32")
    want = ds._class_to_index(raw.copy())
    got = id2trainid(raw)
    np.testing.assert_array_equal(got, want)
    # trainId -> labelId -> trainId is identity on the 19 classes
    t = np.arange(19).reshape(1, 19)
    back = id2trainid(trainid2id(t)[..., 0])
    np.testing.assert_array_equal(back, t)


def test_long_size_sampler_statistics():
    from multiyolov5_tpu.data.segmentation import get_long_size

    import random
    random.seed(0)
    vals = [get_long_size(1024, 0.65, 3.0, 25) for _ in range(500)]
    assert all(v % 32 == 0 for v in vals)
    assert min(vals) >= int(1024 * 0.65) // 32 * 32
    # mode should sit near base_size - 4*32
    assert 600 < np.median(vals) < 1400


def test_loader_shard_len_matches_yield():
    """__len__ must equal the number of batches actually yielded per shard
    (warmup/LR schedules key off it)."""
    from multiyolov5_tpu.data.detection import DetectionLoader

    class StubDS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            img = np.zeros((8, 8, 3), np.uint8)
            return img, np.zeros((0, 5), np.float32), f"{i}.jpg", None

    for shard in range(3):
        ld = DetectionLoader(StubDS(), batch_size=1, max_targets=4,
                             workers=2, shard=shard, num_shards=3)
        assert len(list(ld)) == len(ld), shard


def test_loader_quad_batch_size_guard():
    from multiyolov5_tpu.data.detection import DetectionLoader

    class StubDS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise AssertionError

    with pytest.raises(ValueError):
        DetectionLoader(StubDS(), batch_size=6, quad=True)


def test_loader_early_abandon_no_thread_leak():
    """Breaking out of iteration mid-epoch must unblock producer threads
    (bounded queues + timeout-put)."""
    import threading
    import time as _time
    from multiyolov5_tpu.data.detection import DetectionLoader

    class StubDS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            img = np.zeros((8, 8, 3), np.uint8)
            return img, np.zeros((0, 5), np.float32), f"{i}.jpg", None

    before = threading.active_count()
    ld = DetectionLoader(StubDS(), batch_size=2, max_targets=4, workers=4)
    it = iter(ld)
    next(it)
    it.close()  # abandon mid-epoch (generator finally -> stop.set())
    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before


def test_loader_rect_keeps_bins(tmp_path):
    """rect mode: batches follow the dataset's aspect-ratio bins even with
    shuffle requested (mixed letterbox shapes would crash np.stack)."""
    from multiyolov5_tpu.data.detection import DetectionDataset, DetectionLoader

    ds = DetectionDataset(os.path.join(CUSTOM, "detdata/images/train"),
                          img_size=320, batch_size=4, augment=False, rect=True,
                          pad=0.5)
    ld = DetectionLoader(ds, batch_size=4, max_targets=32, shuffle=True,
                         workers=2, drop_last=False)
    n = 0
    for imgs, *_ in ld:
        assert imgs.ndim == 4  # np.stack succeeded -> uniform shapes
        n += 1
    assert n == len(ld) > 0
