"""Native C++ loader core vs the pure-Python pipeline (SURVEY.md §2b N7).

The native path must be BIT-IDENTICAL: it calls the same OpenCV primitives
in the same order (native/loader_core.cpp), consumes the rng identically,
and shares the box-transform helpers — so every test here is exact
equality, not tolerance."""

import ctypes
import os

import numpy as np
import pytest

from heltondetection_tpu.data.augment import (EvalPipeline, TrainPipeline,
                                              letterbox_np, random_hsv)
from heltondetection_tpu.data.loader import EvalLoader, TrainLoader
from heltondetection_tpu.data.readers import COCODataset
from heltondetection_tpu.native import get_loader_lib
from tests.synth_data import build_coco_dataset

pytestmark = pytest.mark.skipif(get_loader_lib() is None,
                                reason="native loader core not buildable")


@pytest.fixture(scope="module")
def coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("nl_coco")
    ann, imgs = build_coco_dataset(str(root), n_images=10, hw=(75, 101))
    return COCODataset(ann, imgs)


@pytest.fixture(scope="module")
def coco_jpg(tmp_path_factory):
    root = tmp_path_factory.mktemp("nl_coco_jpg")
    ann, imgs = build_coco_dataset(str(root), n_images=6, hw=(80, 105),
                                   ext="jpg")
    return COCODataset(ann, imgs)


def _native_train(ds, **kw):
    from heltondetection_tpu.data.native_loader import NativeTrainPipeline
    return NativeTrainPipeline(ds, 96, **kw)


def _py_train(ds, **kw):
    return TrainPipeline(ds, 96, **kw)


def test_kernels_bit_exact_vs_python():
    lib = get_loader_lib()
    rng = np.random.default_rng(3)
    src = rng.integers(0, 255, (67, 93, 3)).astype(np.uint8)

    out = np.empty((96, 96, 3), np.uint8)
    lib.hd_letterbox(src, 67, 93, out, 96, 114)
    ref, _, _ = letterbox_np(src, np.zeros((0, 4), np.float32), 96)
    assert np.array_equal(out, ref)

    draw = np.random.default_rng(5).uniform(-1, 1, 3)
    r = draw * [0.015, 0.7, 0.4] + 1  # same arithmetic as hsv_params

    class _R:  # rng standin replaying the draw
        def uniform(self, a, b, n=None):
            return draw
    img = src.copy()
    lib.hd_hsv_jitter(img, 67, 93, float(r[0]), float(r[1]), float(r[2]))
    assert np.array_equal(img, random_hsv(src, _R()))

    img = src.copy()
    lib.hd_flip_h(img, 67, 93)
    assert np.array_equal(img, src[:, ::-1])


def test_jpeg_decode_matches_cv2(tmp_path):
    import cv2
    lib = get_loader_lib()
    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, (120, 77, 3)).astype(np.uint8)
    buf = np.frombuffer(
        cv2.imencode(".jpg", cv2.cvtColor(src, cv2.COLOR_RGB2BGR))[1]
        .tobytes(), np.uint8)
    h, w = ctypes.c_int(), ctypes.c_int()
    assert lib.hd_jpeg_dims(buf, buf.nbytes, ctypes.byref(h),
                            ctypes.byref(w)) == 0
    assert (h.value, w.value) == (120, 77)
    out = np.empty((120, 77, 3), np.uint8)
    assert lib.hd_decode_jpeg(buf, buf.nbytes, out, out.nbytes,
                              ctypes.byref(h), ctypes.byref(w)) == 0
    ref = cv2.cvtColor(cv2.imdecode(buf, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    assert np.array_equal(out, ref)


@pytest.mark.parametrize("mosaic_p,affine", [(0.0, False), (1.0, False),
                                             (1.0, True), (0.5, True)])
def test_train_pipeline_matches_python(coco, mosaic_p, affine):
    """Bit-identical without affine; with affine, pixel values may differ by
    a few intensity levels when the pip cv2 wheel and the system OpenCV C++
    library are different releases (warpAffine's fixed-point tables changed
    between 4.x and 5.x) — boxes stay exact either way (shared numpy math).
    """
    py = _py_train(coco, mosaic_p=mosaic_p, affine=affine, seed=7)
    nat = _native_train(coco, mosaic_p=mosaic_p, affine=affine, seed=7)
    for epoch in (0, 1):
        for idx in range(len(coco)):
            a = py.sample(idx, epoch)
            b = nat.sample(idx, epoch)
            if affine:
                d = np.abs(a["image"].astype(int) - b["image"].astype(int))
                assert d.max() <= 24 and d.mean() < 1.0, (epoch, idx, d.max())
            else:
                assert np.array_equal(a["image"], b["image"]), (epoch, idx)
            assert np.array_equal(a["gt_boxes"], b["gt_boxes"])
            assert np.array_equal(a["gt_cls"], b["gt_cls"])
            assert np.array_equal(a["gt_mask"], b["gt_mask"])


def test_train_pipeline_matches_python_with_mixup(coco):
    """Mixup (second plan + host-side blend) stays bit-identical to the
    Python pipeline's blend of two fully-augmented samples."""
    py = _py_train(coco, mosaic_p=0.5, affine=False, mixup_p=0.6, seed=13)
    nat = _native_train(coco, mosaic_p=0.5, affine=False, mixup_p=0.6,
                        seed=13)
    mixed = 0
    for epoch in (0, 1):
        for idx in range(len(coco)):
            a = py.sample(idx, epoch)
            b = nat.sample(idx, epoch)
            assert np.array_equal(a["image"], b["image"]), (epoch, idx)
            assert np.array_equal(a["gt_boxes"], b["gt_boxes"])
            assert np.array_equal(a["gt_cls"], b["gt_cls"])
            assert np.array_equal(a["gt_mask"], b["gt_mask"])
            plans, _, _, _ = nat.plan(
                idx, epoch, np.empty((96, 96, 3), np.uint8))
            mixed += len(plans) == 2
    assert mixed > 0  # the coin actually triggered some mixups


def test_pool_batch_equals_per_sample_with_mixup(coco):
    from heltondetection_tpu.data.native_loader import NativePool
    nat = _native_train(coco, mosaic_p=0.5, affine=False, mixup_p=0.7,
                        seed=2)
    pool = NativePool(4)
    idxs = list(range(8))
    batch = nat.sample_batch(idxs, epoch=1, pool=pool)
    for i, idx in enumerate(idxs):
        one = nat.sample(idx, 1)
        assert np.array_equal(batch["image"][i], one["image"])
        assert np.array_equal(batch["gt_boxes"][i], one["gt_boxes"])
        assert np.array_equal(batch["gt_mask"][i], one["gt_mask"])
    pool.close()


def test_pool_batch_equals_per_sample(coco):
    from heltondetection_tpu.data.native_loader import NativePool
    nat = _native_train(coco, mosaic_p=0.7, seed=1)
    pool = NativePool(4)
    idxs = list(range(8))
    batch = nat.sample_batch(idxs, epoch=2, pool=pool)
    for i, idx in enumerate(idxs):
        one = nat.sample(idx, 2)
        assert np.array_equal(batch["image"][i], one["image"])
        assert np.array_equal(batch["gt_boxes"][i], one["gt_boxes"])
    pool.close()


def test_train_loader_native_matches_python_loader(coco):
    py_loader = TrainLoader(_py_train(coco, mosaic_p=0.5, seed=3,
                                      affine=False), 4,
                            seed=11, num_workers=2)
    nat_loader = TrainLoader(_native_train(coco, mosaic_p=0.5, seed=3,
                                           affine=False), 4,
                             seed=11, num_workers=2)
    for a, b in zip(py_loader.epoch(0), nat_loader.epoch(0)):
        assert np.array_equal(a["image"], b["image"])
        assert np.array_equal(a["gt_boxes"], b["gt_boxes"])
        assert np.array_equal(a["gt_cls"], b["gt_cls"])
        assert np.array_equal(a["gt_mask"], b["gt_mask"])


def test_eval_pipeline_and_loader(coco):
    from heltondetection_tpu.data.native_loader import NativeEvalPipeline
    py = EvalPipeline(coco, 96)
    nat = NativeEvalPipeline(coco, 96)
    for idx in range(4):
        a, b = py.sample(idx), nat.sample(idx)
        assert np.array_equal(a["image"], b["image"])
        assert a["img_id"] == b["img_id"]
        assert a["scale"] == b["scale"]
        assert (a["pad_x"], a["pad_y"]) == (b["pad_x"], b["pad_y"])
    # loader path incl. tail-batch padding
    py_l = EvalLoader(py, 4, num_workers=2)
    nat_l = EvalLoader(nat, 4, num_workers=2)
    for a, b in zip(py_l, nat_l):
        assert np.array_equal(a["image"], b["image"])
        assert a["img_id"] == b["img_id"]


def test_decode_in_pool_matches_host_decode(coco_jpg):
    """In-pool libjpeg decode produces the same batches as cv2-decoded
    sources (COCO jpgs; dims come from the annotation metadata)."""
    nat_host = _native_train(coco_jpg, mosaic_p=1.0, seed=5)
    nat_pool = _native_train(coco_jpg, mosaic_p=1.0, seed=5,
                             decode_in_pool=True)
    assert nat_pool.decode_in_pool
    for idx in range(len(coco_jpg)):
        a = nat_host.sample(idx, 0)
        b = nat_pool.sample(idx, 0)
        assert np.array_equal(a["image"], b["image"])
        assert np.array_equal(a["gt_boxes"], b["gt_boxes"])


def test_pool_run_is_deterministic_across_thread_counts(coco):
    from heltondetection_tpu.data.native_loader import NativePool
    nat = _native_train(coco, mosaic_p=0.5, seed=9)
    idxs = list(range(10))
    p1, p8 = NativePool(1), NativePool(8)
    b1 = nat.sample_batch(idxs, 0, p1)
    b8 = nat.sample_batch(idxs, 0, p8)
    assert np.array_equal(b1["image"], b8["image"])
    p1.close()
    p8.close()


def test_device_aug_pipeline_bit_identical(coco):
    from heltondetection_tpu.data.augment import DeviceAugPipeline
    from heltondetection_tpu.data.native_loader import (
        NativeDeviceAugPipeline, NativePool)
    py = DeviceAugPipeline(coco, 96, max_boxes=8, seed=4, mosaic_p=0.5)
    nat = NativeDeviceAugPipeline(coco, 96, max_boxes=8, seed=4,
                                  mosaic_p=0.5)
    for epoch in (0, 1):
        for idx in range(len(coco)):
            a = py.sample(idx, epoch)
            b = nat.sample(idx, epoch)
            for k in ("images4", "boxes4", "cls4", "mask4", "mosaic4"):
                assert np.array_equal(a[k], b[k]), (epoch, idx, k)
    # pool batch path == per-sample path
    pool = NativePool(4)
    batch = nat.sample_batch(list(range(6)), 1, pool)
    for i in range(6):
        one = nat.sample(i, 1)
        for k in ("images4", "boxes4", "cls4", "mask4", "mosaic4"):
            assert np.array_equal(batch[k][i], one[k]), (i, k)
    pool.close()


def test_half_pixel_rounding_matches_python(coco):
    """int(round()) is half-to-even in Python; the C++ core must match
    (std::lround's half-away-from-zero skewed tiles 1px vs the box math
    whenever w*scale lands exactly on .5 — e.g. a (192, 33) source at
    S=96)."""
    import cv2 as _cv2  # noqa: F401 — ensures cv2 present for py path
    lib = get_loader_lib()
    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, (192, 33, 3)).astype(np.uint8)
    out = np.empty((96, 96, 3), np.uint8)
    lib.hd_letterbox(src, 192, 33, out, 96, 114)
    ref, _, meta = letterbox_np(src, np.zeros((0, 4), np.float32), 96)
    assert np.array_equal(out, ref)


def test_decode_in_pool_rejects_wrong_metadata_dims(tmp_path):
    import json
    import cv2
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (60, 80, 3)).astype(np.uint8)
    f = tmp_path / "img.jpg"
    cv2.imwrite(str(f), img)
    ann = {"images": [{"id": 1, "file_name": "img.jpg",
                       "height": 80, "width": 60}],  # swapped on purpose
           "annotations": [], "categories": [{"id": 1, "name": "x"}]}
    af = tmp_path / "ann.json"
    af.write_text(json.dumps(ann))
    ds = COCODataset(str(af), str(tmp_path))
    nat = _native_train(ds, mosaic_p=0.0, decode_in_pool=True)
    with pytest.raises(RuntimeError, match="dims disagree"):
        nat.sample(0, 0)


def test_abandoned_epoch_then_new_epoch(coco):
    loader = TrainLoader(_native_train(coco, mosaic_p=0.5, seed=2), 4,
                         seed=5, num_workers=2, prefetch=2)
    it = loader.epoch(0)
    next(it)
    it.close()  # abandon mid-epoch: producer must stop and join
    n = 0
    for batch in loader.epoch(1):  # must not race the orphaned producer
        assert batch["image"].shape[0] == 4
        n += 1
    assert n == loader.steps_per_epoch()
