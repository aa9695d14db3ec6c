import numpy as np
import pytest

from heltondetection_tpu.data.augment import (EvalPipeline, TrainPipeline,
                                              horizontal_flip, letterbox_np,
                                              mosaic4, random_affine,
                                              random_hsv)
from heltondetection_tpu.data.loader import EvalLoader, TrainLoader
from heltondetection_tpu.data.readers import (COCODataset, DOTADataset,
                                              VOCDataset, YOLODataset)
from synth_data import (build_coco_dataset, build_dota_dataset,
                        build_voc_dataset, build_yolo_dataset)


@pytest.fixture(scope="module")
def coco_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    ann, imgs = build_coco_dataset(str(root), n_images=8)
    return COCODataset(ann, imgs)


def test_coco_reader(coco_ds):
    assert len(coco_ds) == 8
    assert coco_ds.num_classes == 4
    s = coco_ds.load(0)
    assert s["image"].shape == (96, 128, 3)
    assert s["boxes"].shape[1] == 4
    assert len(s["boxes"]) == len(s["classes"])
    # category remap: ids 10..13 → 0..3
    assert set(coco_ds.cat_to_label.values()) <= {0, 1, 2, 3}
    assert coco_ds.label_to_cat[0] == 10


def test_yolo_reader(tmp_path):
    img_dir, lbl_dir = build_yolo_dataset(str(tmp_path))
    ds = YOLODataset(img_dir, lbl_dir, [f"class{i}" for i in range(4)])
    assert len(ds) == 4
    s = ds.load(0)
    assert len(s["boxes"]) >= 1
    # boxes within image bounds
    assert (s["boxes"][:, [0, 2]] <= 128 + 1e-3).all()
    assert (s["boxes"][:, [1, 3]] <= 96 + 1e-3).all()


def test_dota_reader(tmp_path):
    img_dir, lbl_dir, names = build_dota_dataset(str(tmp_path))
    ds = DOTADataset(img_dir, lbl_dir, names)
    assert len(ds) == 3
    s = ds.load(0)
    assert len(s["boxes"]) >= 1
    assert (s["boxes"][:, 2] > s["boxes"][:, 0]).all()


def test_visdrone_reader(tmp_path):
    """VisDrone CSV reader: category 1..10 → label 0..9, score==0 /
    category-0/11 rows become class-agnostic ignore regions (dropped from
    train GT, registered per-class as ignore at eval)."""
    from heltondetection_tpu.data.readers import (VisDroneDataset,
                                                  drop_ignore_boxes)
    from synth_data import build_visdrone_dataset
    img_dir, lbl_dir = build_visdrone_dataset(str(tmp_path))
    ds = VisDroneDataset(img_dir, lbl_dir)
    assert len(ds) == 3 and ds.num_classes == 10
    # results-JSON dumps must map labels 0..9 back to native categories
    # 1..10 (0/11 are the ignore/others pseudo-categories)
    assert ds.label_to_cat == {i: i + 1 for i in range(10)}
    s0 = ds.load(0)
    assert (s0["boxes"][:, 2] > s0["boxes"][:, 0]).all()
    # builder appends exactly two ignore rows to image 0
    assert s0["iscrowd"].sum() == 2 and (s0["iscrowd"][:-2] == 0).all()
    assert (s0["classes"] >= 0).all() and (s0["classes"] < 10).all()
    kept = drop_ignore_boxes(s0)
    assert len(kept["classes"]) == len(s0["classes"]) - 2

    # eval registration: ignore regions expand to every class
    from heltondetection_tpu.utils.cocoeval import DetEval
    de = DetEval(10)
    ds.gt_for_eval(de)
    n_real = int((s0["iscrowd"] == 0).sum())
    img0 = [g for (iid, _), lst in de._gts.items() if iid == s0["img_id"]
            for g in lst]
    assert len(img0) == n_real + 2 * 10
    assert sum(crowd for _, crowd, _, _ in img0) == 2 * 10

    # build_dataset dispatch ("visdrone" format)
    from heltondetection_tpu.configs.base import DataConfig
    from heltondetection_tpu.engine.runner import build_dataset
    dc = DataConfig(format="visdrone", train_ann=lbl_dir, train_imgs=img_dir,
                    val_ann=lbl_dir, val_imgs=img_dir, class_names=None)
    assert len(build_dataset(dc, "train")) == 3


def test_voc_reader(tmp_path):
    """VOC XML reader: Annotations-dir mode, split-file mode, 1-based box
    convention, and difficult→iscrowd (ignore-region) mapping."""
    ann_dir, img_dir, split_file, names = build_voc_dataset(str(tmp_path))
    ds = VOCDataset(ann_dir, img_dir, names)
    assert len(ds) == 4 and ds.num_classes == 4
    s0 = ds.load(0)
    assert len(s0["boxes"]) >= 1
    assert (s0["boxes"][:, 2] > s0["boxes"][:, 0]).all()
    # builder marks the LAST object of image 0 difficult
    assert s0["iscrowd"][-1] == 1 and (s0["iscrowd"][:-1] == 0).all()

    # split-file mode resolves ../../Annotations and reads the same samples
    ds2 = VOCDataset(split_file, img_dir, names)
    assert len(ds2) == 4
    np.testing.assert_allclose(ds2.load(0)["boxes"], s0["boxes"])

    # same seed → VOC boxes equal the COCO builder's (xml round-trip exact)
    ann, imgs = build_coco_dataset(str(tmp_path / "c"), n_images=4, seed=0)
    sc = COCODataset(ann, imgs).load(0)
    np.testing.assert_allclose(np.sort(s0["boxes"], 0),
                               np.sort(sc["boxes"], 0), atol=1e-4)

    # difficult gts register as ignore regions with the evaluator
    from heltondetection_tpu.utils.cocoeval import DetEval
    de = DetEval(4)
    ds.gt_for_eval(de)

    # build_dataset dispatch ("voc" format)
    from heltondetection_tpu.configs.base import DataConfig
    from heltondetection_tpu.engine.runner import build_dataset
    dc = DataConfig(format="voc", train_ann=ann_dir, train_imgs=img_dir,
                    val_ann=split_file, val_imgs=img_dir,
                    class_names=names)
    assert len(build_dataset(dc, "train")) == 4
    assert len(build_dataset(dc, "val")) == 4


def test_train_gt_excludes_ignore_boxes(tmp_path):
    """Train pipelines drop iscrowd/difficult boxes from the GT (the
    reference lineage never trains on them: Ultralytics drops iscrowd=1,
    py-faster-rcnn use_diff=False) while eval keeps them as ignore
    regions."""
    from heltondetection_tpu.data.readers import drop_ignore_boxes
    ann_dir, img_dir, _, names = build_voc_dataset(str(tmp_path))
    ds = VOCDataset(ann_dir, img_dir, names)
    raw = ds.load(0)                 # last object is difficult (iscrowd=1)
    n_all = len(raw["classes"])
    kept = drop_ignore_boxes(raw)
    assert len(kept["classes"]) == n_all - 1
    assert not kept["iscrowd"].any()
    np.testing.assert_allclose(kept["boxes"], raw["boxes"][:-1])
    # no-crowd samples pass through untouched (same object, no copy)
    clean = {"image": raw["image"], "boxes": kept["boxes"],
             "classes": kept["classes"], "iscrowd": kept["iscrowd"]}
    assert drop_ignore_boxes(clean) is clean
    nofield = {"image": raw["image"], "boxes": raw["boxes"],
               "classes": raw["classes"]}
    assert drop_ignore_boxes(nofield) is nofield
    # the geometry-only train pipeline emits n_all-1 GT rows...
    pipe = TrainPipeline(ds, 64, mosaic_p=0.0, hsv=False, flip_p=0.0,
                         max_boxes=16, seed=0)
    assert int(pipe.sample(0, 0)["gt_mask"].sum()) == n_all - 1
    # ...while eval still registers ALL boxes, the difficult one as ignore
    from heltondetection_tpu.utils.cocoeval import DetEval
    de = DetEval(len(names))
    ds.gt_for_eval(de)
    img0 = [t for (iid, _), lst in de._gts.items()
            if iid == ds.stems[0] for t in lst]
    assert len(img0) == n_all and sum(t[1] for t in img0) == 1


def test_yolo_vs_coco_same_content(tmp_path):
    """Same seed → YOLO reader and COCO reader yield identical boxes."""
    ann, imgs = build_coco_dataset(str(tmp_path / "c"), n_images=4, seed=7)
    img_dir, lbl_dir = build_yolo_dataset(str(tmp_path / "y"), n_images=4,
                                          seed=7)
    c = COCODataset(ann, imgs)
    y = YOLODataset(img_dir, lbl_dir, [f"class{i}" for i in range(4)])
    sc, sy = c.load(0), y.load(0)
    np.testing.assert_allclose(np.sort(sc["boxes"], 0),
                               np.sort(sy["boxes"], 0), atol=0.51)


def test_letterbox_np_geometry():
    img = np.zeros((96, 128, 3), np.uint8)
    boxes = np.array([[10, 10, 50, 60]], np.float32)
    out, b, meta = letterbox_np(img, boxes, 64)
    assert out.shape == (64, 64, 3)
    assert abs(meta["scale"] - 0.5) < 1e-6
    assert meta["pad_y"] == 8.0 and meta["pad_x"] == 0.0
    np.testing.assert_allclose(b[0], [5, 13, 25, 38], atol=1e-4)


def test_flip_involution():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
    boxes = np.array([[5, 5, 20, 25]], np.float32)
    i2, b2 = horizontal_flip(img, boxes)
    i3, b3 = horizontal_flip(i2, b2)
    np.testing.assert_array_equal(i3, img)
    np.testing.assert_allclose(b3, boxes)


def test_hsv_preserves_shape_dtype():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
    out = random_hsv(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_mosaic_boxes_in_bounds(coco_ds):
    rng = np.random.default_rng(3)
    samples = [coco_ds.load(i) for i in range(4)]
    img, boxes, classes = mosaic4(samples, 128, rng)
    assert img.shape == (128, 128, 3)
    assert len(boxes) == len(classes)
    if len(boxes):
        assert (boxes >= 0).all() and (boxes <= 128).all()
        assert (boxes[:, 2] > boxes[:, 0]).all()


def test_train_pipeline_deterministic(coco_ds):
    pipe = TrainPipeline(coco_ds, 64, mosaic_p=1.0, seed=42)
    a = pipe.sample(0, epoch=3)
    b = pipe.sample(0, epoch=3)
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])
    c = pipe.sample(0, epoch=4)
    assert not np.array_equal(a["image"], c["image"])  # epoch changes aug


def test_mixup_blends_pixels_and_unions_labels(coco_ds):
    from heltondetection_tpu.data.augment import (MIXUP_STREAM_TAG,
                                                  letterbox_np, mixup_blend,
                                                  mixup_draws)
    # geometry-only pipeline (mosaic/HSV/flip off) so the expected mixup
    # output is exactly blend(letterbox(idx), letterbox(partner), r)
    pipe = TrainPipeline(coco_ds, 64, mosaic_p=0.0, hsv=False, flip_p=0.0,
                         mixup_p=1.0, max_boxes=32, seed=5)
    out = pipe.sample(0, epoch=0)
    # replay the decision draws (coin, partner, beta weight)
    rng = np.random.default_rng(np.random.SeedSequence([5, 0, 0]))
    partner, r = mixup_draws(rng, 1.0, len(coco_ds))
    assert partner is not None and 0.0 < r < 1.0
    raw_a = coco_ds.load(0)
    raw_b = coco_ds.load(partner)
    img_a, box_a, _ = letterbox_np(raw_a["image"], raw_a["boxes"], 64)
    img_b, box_b, _ = letterbox_np(raw_b["image"], raw_b["boxes"], 64)
    np.testing.assert_array_equal(out["image"],
                                  mixup_blend(img_a, img_b, r))
    # labels are the union of both samples' boxes, in order
    n = min(len(raw_a["classes"]) + len(raw_b["classes"]), 32)
    assert int(out["gt_mask"].sum()) == n
    both = np.concatenate([box_a.reshape(-1, 4), box_b.reshape(-1, 4)])[:n]
    got = out["gt_boxes"][:n]
    np.testing.assert_allclose(got[:, 0], (both[:, 0] + both[:, 2]) / 2,
                               atol=1e-5)
    # deterministic
    out2 = pipe.sample(0, epoch=0)
    np.testing.assert_array_equal(out["image"], out2["image"])
    # mixup_p=0 keeps the pre-mixup stream (no extra draws consumed)
    off_a = TrainPipeline(coco_ds, 64, mosaic_p=1.0, max_boxes=32, seed=9)
    off_b = TrainPipeline(coco_ds, 64, mosaic_p=1.0, max_boxes=32, seed=9,
                          mixup_p=0.0)
    np.testing.assert_array_equal(off_a.sample(1, 2)["image"],
                                  off_b.sample(1, 2)["image"])
    assert MIXUP_STREAM_TAG == 1  # ckpt'd constant: partner streams are
    # seeded [seed, epoch, partner, 1]; changing it changes every mixup draw


def test_train_loader_shapes_and_determinism(coco_ds):
    pipe = TrainPipeline(coco_ds, 64, mosaic_p=0.5, max_boxes=32, seed=1)
    loader = TrainLoader(pipe, batch_size=4, seed=1, num_workers=4)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    b0 = batches[0]
    assert b0["image"].shape == (4, 64, 64, 3)
    assert b0["gt_boxes"].shape == (4, 32, 4)
    assert b0["gt_mask"].dtype == bool
    # threads don't change content
    loader1 = TrainLoader(pipe, batch_size=4, seed=1, num_workers=1)
    batches1 = list(loader1.epoch(0))
    np.testing.assert_array_equal(batches[0]["image"], batches1[0]["image"])
    np.testing.assert_array_equal(batches[1]["gt_boxes"],
                                  batches1[1]["gt_boxes"])


def test_train_loader_shards_partition_global_batch(coco_ds):
    """The DistributedSampler analog: per-process shard slices of every
    batch concatenate to EXACTLY the single-process global batch (same
    seed/epoch permutation), so multi-host training sees the same data."""
    pipe = TrainPipeline(coco_ds, 64, mosaic_p=0.5, max_boxes=32, seed=1)
    global_batches = list(TrainLoader(pipe, batch_size=4, seed=1,
                                      num_workers=1).epoch(2))
    shard_batches = [list(TrainLoader(pipe, batch_size=4, seed=1,
                                      num_workers=1,
                                      shard=(p, 2)).epoch(2))
                     for p in range(2)]
    for bi, gb in enumerate(global_batches):
        assert shard_batches[0][bi]["image"].shape[0] == 2
        for k in gb:
            cat = np.concatenate([shard_batches[p][bi][k]
                                  for p in range(2)], axis=0)
            np.testing.assert_array_equal(gb[k], cat)


def test_random_affine_identity_and_jitter():
    rng_id = np.random.default_rng(0)
    img = rng_id.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    boxes = np.array([[10, 10, 40, 40]], np.float32)
    classes = np.array([1], np.int32)
    # zero-jitter affine ≈ identity
    out, b, c = random_affine(img, boxes, classes, rng_id, translate=0.0,
                              scale=0.0, degrees=0.0)
    np.testing.assert_allclose(b, boxes, atol=0.6)
    np.testing.assert_array_equal(c, classes)
    # jittered: boxes stay in canvas and valid
    rng2 = np.random.default_rng(1)
    out2, b2, c2 = random_affine(img, boxes, classes, rng2, translate=0.1,
                                 scale=0.5)
    if len(b2):
        assert (b2 >= 0).all() and (b2 <= 64).all()
        assert (b2[:, 2] > b2[:, 0]).all()


def test_train_pipeline_on_yolo_and_dota(tmp_path):
    """Readers are interchangeable under the pipelines (format parity)."""
    img_dir, lbl_dir = build_yolo_dataset(str(tmp_path / "y"), n_images=4)
    yds = YOLODataset(img_dir, lbl_dir, [f"class{i}" for i in range(4)])
    pipe = TrainPipeline(yds, 64, mosaic_p=1.0, max_boxes=16, seed=0)
    s = pipe.sample(0, 0)
    assert s["image"].shape == (64, 64, 3)
    img_dir, lbl_dir, names = build_dota_dataset(str(tmp_path / "d"))
    dds = DOTADataset(img_dir, lbl_dir, names)
    s2 = EvalPipeline(dds, 64).sample(0)
    assert s2["image"].shape == (64, 64, 3)
    # eval gt registration works for both
    from heltondetection_tpu.utils.cocoeval import DetEval
    de = DetEval(4)
    yds.gt_for_eval(de)
    dds.gt_for_eval(de)
    assert len(de._gts) > 0


def test_eval_loader_pads_tail(coco_ds):
    pipe = EvalPipeline(coco_ds, 64)
    loader = EvalLoader(pipe, batch_size=3, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    tail = batches[-1]
    assert tail["image"].shape == (3, 64, 64, 3)
    assert tail["img_id"][-1] is None  # padding marker
    real = [i for b in batches for i in b["img_id"] if i is not None]
    assert len(real) == 8 and len(set(real)) == 8


def test_cached_dataset_wrapper():
    """CachedDataset memoizes decoded samples and delegates everything
    else (ultralytics --cache ram lineage)."""
    import tempfile
    from synth_data import build_coco_dataset
    from heltondetection_tpu.data.readers import CachedDataset, COCODataset
    root = tempfile.mkdtemp()
    ann, imgs = build_coco_dataset(root, n_images=4, hw=(64, 96))
    ds = CachedDataset(COCODataset(ann, imgs))
    assert len(ds) == 4 and ds.num_classes > 0
    a = ds.load(1)
    b = ds.load(1)
    assert a is b                      # cache hit returns the same object
    np.testing.assert_array_equal(a["image"], ds.ds.load(1)["image"])
    # byte budget: a tiny budget disables caching but stays correct
    small = CachedDataset(COCODataset(ann, imgs), max_bytes=10)
    x = small.load(0); y = small.load(0)
    assert x is not y
    np.testing.assert_array_equal(x["image"], y["image"])
