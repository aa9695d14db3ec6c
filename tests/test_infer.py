"""Detector frontend tests: image file, video loop, TTA fusion, heatmap
visualization — the reference's C21/C19/C23 surface on synthetic data."""

import os
import tempfile

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from synth_data import build_coco_dataset
from heltondetection_tpu.data.readers import COCODataset
from heltondetection_tpu.engine.infer import Detector
from heltondetection_tpu.models.yolov5 import YOLOv5, decode_full
from heltondetection_tpu.utils.vis import (draw_boxes, feature_heatmaps,
                                           objectness_maps)


@pytest.fixture(scope="module")
def tiny_detector():
    nc = 4
    model = YOLOv5(num_classes=nc, depth_multiple=0.33, width_multiple=0.125)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)

    def fwd(images):  # contract: raw 0-255 in, fwd owns normalization
        outs = model.apply(variables, images / 255.0, train=False)
        return decode_full(outs, nc)

    return fwd, nc


def test_detect_image_shapes(tiny_detector):
    fwd, nc = tiny_detector
    det = Detector(fwd, nc, 64, conf_thres=0.01)
    img = np.random.default_rng(0).integers(0, 255, (96, 128, 3)).astype(np.uint8)
    boxes, scores, classes = det.detect_image(img)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    if len(boxes):
        assert (boxes[:, [0, 2]] <= 128).all()
        assert (boxes[:, [1, 3]] <= 96).all()


def test_detect_image_tta(tiny_detector):
    fwd, nc = tiny_detector
    det = Detector(fwd, nc, 64, conf_thres=0.01, tta=True,
                   tta_scales=(1.0, 0.5))
    img = np.random.default_rng(1).integers(0, 255, (96, 128, 3)).astype(np.uint8)
    boxes, scores, classes = det.detect_image(img)
    assert boxes.shape[1] == 4
    assert np.isfinite(boxes).all()


def test_infer_image_file_renders(tiny_detector, tmp_path):
    fwd, nc = tiny_detector
    root = tempfile.mkdtemp()
    ann, imgs = build_coco_dataset(root, n_images=1)
    det = Detector(fwd, nc, 64, conf_thres=0.001)
    src = os.path.join(imgs, sorted(os.listdir(imgs))[0])
    out = str(tmp_path / "render.png")
    res = det.infer_image_file(src, out, class_names=["a", "b", "c", "d"])
    assert os.path.exists(out)
    assert "boxes" in res


def test_infer_video_file(tiny_detector, tmp_path):
    fwd, nc = tiny_detector
    # synth video: 6 frames
    vid = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
    rng = np.random.default_rng(2)
    for _ in range(6):
        w.write(rng.integers(0, 255, (96, 128, 3)).astype(np.uint8))
    w.release()
    det = Detector(fwd, nc, 64, conf_thres=0.01)
    out = str(tmp_path / "out.mp4")
    n = det.infer_video_file(vid, out, max_frames=5)
    assert n == 5
    assert os.path.getsize(out) > 0


def test_vis_draw_and_heatmaps():
    img = np.zeros((64, 64, 3), np.uint8)
    out = draw_boxes(img, np.array([[5, 5, 30, 30]]), np.array([0.9]),
                     np.array([1]), ["a", "b"])
    assert out.shape == img.shape and out.sum() > 0
    feats = [np.random.default_rng(0).normal(size=(8, 8, 16)),
             np.random.default_rng(1).normal(size=(4, 4, 32))]
    hm = feature_heatmaps(img, feats)
    assert hm.shape == (64, 128, 3)
    raws = [np.random.default_rng(2).normal(size=(8, 8, 3 * 9))]
    om = objectness_maps(img, raws, num_classes=4)
    assert om.shape == (64, 64, 3)


def test_detect_batch_matches_detect_image(tiny_detector):
    """A multi-frame batch must reproduce the B=1 results per frame (batch
    independence of the jitted detect + vmapped postprocess)."""
    fwd, nc = tiny_detector
    det = Detector(fwd, nc, 64, conf_thres=0.01)
    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
              for _ in range(5)]
    singles = [det.detect_image(f) for f in frames]
    batched = det.detect_batch(frames)
    for (b1, s1, c1), (b2, s2, c2) in zip(singles, batched):
        np.testing.assert_allclose(b1, b2, atol=1e-4)
        np.testing.assert_allclose(s1, s2, atol=1e-5)
        assert np.array_equal(c1, c2)


def test_detect_batch_tta_matches_single(tiny_detector):
    """Batched TTA (per-view batched dispatch + vmapped WBF) must match
    the B=1 TTA result per frame — mixed-size frames included, so the
    per-image scale-view remap factors are exercised (VERDICT r2 weak-7:
    TTA was single-image only)."""
    fwd, nc = tiny_detector
    det = Detector(fwd, nc, 64, conf_thres=0.01, tta=True,
                   tta_scales=(1.0, 0.5))
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 255, (96, 128, 3)).astype(np.uint8),
              rng.integers(0, 255, (128, 96, 3)).astype(np.uint8),
              rng.integers(0, 255, (80, 80, 3)).astype(np.uint8)]
    singles = [det.detect_batch([f])[0] for f in frames]
    batched = det.detect_batch(frames)
    for (b1, s1, c1), (b2, s2, c2) in zip(singles, batched):
        np.testing.assert_allclose(b1, b2, atol=1e-3)
        np.testing.assert_allclose(s1, s2, atol=1e-5)
        assert np.array_equal(c1, c2)


def test_load_detector_api(tmp_path):
    """heltondetection_tpu.load_detector: config(+ckpt) → ready Detector —
    the programmatic one-liner over the same construction --mode test uses.
    Covers the lazy package export, eval.ckpt override, kwarg overrides,
    and the explicit-checkpoint-directory branch."""
    import heltondetection_tpu
    from heltondetection_tpu.configs.base import (DataConfig,
                                                  ExperimentConfig,
                                                  ModelConfig, TestConfig)
    from heltondetection_tpu.engine.runner import build_model
    from heltondetection_tpu.train.schedule import make_optimizer
    from heltondetection_tpu.train.trainer import TrainState
    from heltondetection_tpu.utils import ckpt as ckpt_io

    nc = 4
    cfg = ExperimentConfig(
        name="ld_api", work_dir=str(tmp_path),
        data=DataConfig(class_names=["a", "b", "c", "d"]),
        model=ModelConfig(family="yolov5", variant="n", num_classes=nc,
                          img_size=64),
        test=TestConfig(conf_thres=0.01))
    model = build_model(cfg.model, nc)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    tx = make_optimizer(1e-3, total_steps=10, warmup_steps=1)
    state = TrainState(v["params"], v.get("batch_stats", {}),
                       tx.init(v["params"]), jnp.zeros((), jnp.int32),
                       v["params"])
    ckpt_io.save_state(cfg.ckpt_dir, jax.device_get(state), 1)

    det = heltondetection_tpu.load_detector(cfg, tta=True,
                                            tta_scales=(1.0, 0.5))
    assert det.tta and det.num_classes == nc
    img = np.random.default_rng(2).integers(0, 255, (96, 128, 3)) \
        .astype(np.uint8)
    boxes, scores, classes = det.detect_image(img)
    assert boxes.ndim == 2 and boxes.shape[1] == 4

    # explicit checkpoint-directory branch gives the same detections
    det2 = heltondetection_tpu.load_detector(cfg, ckpt=cfg.ckpt_dir)
    b1, s1, c1 = heltondetection_tpu.load_detector(cfg).detect_image(img)
    b2, s2, c2 = det2.detect_image(img)
    np.testing.assert_allclose(b1, b2, atol=1e-5)
    np.testing.assert_allclose(s1, s2, atol=1e-6)
    assert np.array_equal(c1, c2)


@pytest.mark.smoke   # the r2 regression class: RCNN eval-restore + run_test
def test_run_test_rcnn_heatmaps(tmp_path):
    """--mode test heatmap panels for the two-stage family: FPN activation
    heatmaps + RPN objectness maps (the YOLO path's demo-parity panels,
    extended to FasterRCNN)."""
    import cv2
    import jax
    import jax.numpy as jnp
    from heltondetection_tpu.configs.base import (DataConfig, EvalConfig,
                                                  ExperimentConfig,
                                                  ModelConfig, TestConfig,
                                                  TrainConfig)
    from heltondetection_tpu.engine.runner import build_model, run_test
    from heltondetection_tpu.models.faster_rcnn import init_faster_rcnn
    from heltondetection_tpu.train.schedule import make_optimizer
    from heltondetection_tpu.train.trainer import TrainState
    from heltondetection_tpu.utils import ckpt as ckpt_io

    cfg = ExperimentConfig(
        name="rcnn_hm", work_dir=str(tmp_path),
        data=DataConfig(format="coco", train_ann="x", train_imgs="y",
                        class_names=["a", "b", "c", "d"]),
        model=ModelConfig(family="faster_rcnn", backbone="resnet18",
                          num_classes=4, img_size=64),
        train=TrainConfig(), eval=EvalConfig(),
        test=TestConfig(save_heatmaps=True, conf_thres=0.01))
    model = build_model(cfg.model, 4)
    v = init_faster_rcnn(model, jax.random.PRNGKey(0), 64)
    tx = make_optimizer(1e-3, total_steps=10, warmup_steps=1)
    state = TrainState(v["params"], v["batch_stats"], tx.init(v["params"]),
                       jnp.zeros((), jnp.int32), v["params"])
    ckpt_io.save_state(cfg.ckpt_dir, jax.device_get(state), 1)

    src = str(tmp_path / "in.png")
    rng = np.random.default_rng(0)
    cv2.imwrite(src, rng.integers(0, 255, (80, 120, 3)).astype(np.uint8))
    out = str(tmp_path / "out.png")
    run_test(cfg, src, out)
    hm = cv2.imread(str(tmp_path / "out_heatmaps.png"))
    om = cv2.imread(str(tmp_path / "out_objmaps.png"))
    cm = cv2.imread(str(tmp_path / "out_clsmaps.png"))
    assert hm is not None and om is not None and cm is not None
    # one panel per pyramid level (P2..P6), each letterboxed-square wide;
    # clsmaps = second-stage box-head class scores splatted over proposals
    assert hm.shape[1] == 5 * 64 and om.shape[1] == 5 * 64
    assert cm.shape[1] == 5 * 64
