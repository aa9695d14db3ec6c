"""Anchor fitting (data/autoanchor.py) + the model.anchors plumbing.

The fitter's contract: BPR/fitness use the SAME shape-ratio metric as the
train-time assigner (train/yolo_loss.build_level_targets), fitting is
deterministic under seed, and a config's custom anchors reach every decode
path (loss, fused serve, decode_full) identically.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from heltondetection_tpu.data.autoanchor import (anchor_stats,
                                                 anchors_to_levels,
                                                 check_anchors,
                                                 dataset_label_wh,
                                                 fit_anchors,
                                                 flatten_anchors)
from heltondetection_tpu.ops.anchors import YOLOV5_ANCHORS


def _clustered_wh(rng, n=600):
    """Three tight wh clusters nothing like the COCO anchor set."""
    c = rng.choice(3, n)
    base = np.array([[4.0, 9.0], [210.0, 40.0], [45.0, 480.0]])
    return base[c] * rng.lognormal(0.0, 0.08, (n, 2))


def test_anchor_stats_perfect_fit():
    wh = flatten_anchors(YOLOV5_ANCHORS)
    st = anchor_stats(wh, YOLOV5_ANCHORS)
    assert st["bpr"] == 1.0
    assert st["fitness"] == pytest.approx(1.0)
    assert st["n_boxes"] == 9


def test_fit_improves_fitness_and_bpr():
    rng = np.random.default_rng(3)
    wh = _clustered_wh(rng)
    before = anchor_stats(wh, YOLOV5_ANCHORS)
    fitted, st = fit_anchors(wh, seed=0, generations=300)
    assert st["fitness"] > before["fitness"]
    assert st["bpr"] > 0.99          # 3 clusters, 9 anchors: near-total recall
    # canonical nested shape, area-sorted across levels
    flat = flatten_anchors(fitted)
    areas = flat[:, 0] * flat[:, 1]
    assert len(fitted) == 3 and all(len(lv) == 3 for lv in fitted)
    assert (np.diff(areas) >= 0).all()


def test_fit_deterministic_under_seed():
    rng = np.random.default_rng(5)
    wh = _clustered_wh(rng, 300)
    a1, _ = fit_anchors(wh, seed=11, generations=100)
    a2, _ = fit_anchors(wh, seed=11, generations=100)
    assert a1 == a2


def test_check_anchors_keeps_good_set():
    # labels ARE the anchor set: BPR = 1, nothing to do
    wh = flatten_anchors(YOLOV5_ANCHORS)

    class _DS:
        def __len__(self):
            return len(wh)

        def load(self, i):
            w, h = wh[i]
            return {"image": np.zeros((640, 640, 3), np.uint8),
                    "boxes": np.array([[0, 0, w, h]], np.float32),
                    "classes": np.zeros(1, np.int32),
                    "iscrowd": np.zeros(1, np.int32)}

    new, st = check_anchors(_DS(), img_size=640)
    assert new is None and st["bpr"] == 1.0


def test_dataset_label_wh_coco_metadata_path(tmp_path):
    from tests.synth_data import build_coco_dataset
    from heltondetection_tpu.data.readers import COCODataset
    ann, imgs = build_coco_dataset(str(tmp_path), n_images=4)
    ds = COCODataset(ann, imgs)
    wh_meta = dataset_label_wh(ds, 640)
    assert len(wh_meta) > 0

    # the generic load() fallback (metadata attrs hidden) must agree
    class _Wrap:
        def __init__(self, inner):
            self._inner = inner

        def __len__(self):
            return len(self._inner)

        def load(self, i):
            return self._inner.load(i)

    wh_load = dataset_label_wh(_Wrap(ds), 640)
    np.testing.assert_allclose(np.sort(wh_meta, 0), np.sort(wh_load, 0),
                               rtol=1e-6)


CUSTOM = tuple(tuple((w * 0.25, h * 0.25) for w, h in lv)
               for lv in YOLOV5_ANCHORS)


def test_decode_full_custom_anchors():
    from heltondetection_tpu.models.yolov5 import decode_full
    rng = np.random.default_rng(0)
    raw = [jnp.asarray(rng.normal(size=(1, 8 // (2 ** l) * 2,
                                        8 // (2 ** l) * 2, 3 * 9)),
                       jnp.float32) for l in range(3)]
    b_def, _, _ = decode_full(raw, 4)
    b_cus, _, _ = decode_full(raw, 4, anchors=CUSTOM)
    # xy identical (anchor-independent), wh scaled by exactly 0.25
    wh_def = b_def[..., 2:4] - b_def[..., 0:2]
    wh_cus = b_cus[..., 2:4] - b_cus[..., 0:2]
    np.testing.assert_allclose(np.asarray(wh_cus), np.asarray(wh_def) * 0.25,
                               rtol=1e-3, atol=1e-4)


def test_fused_postprocess_custom_anchors_matches_unfused():
    """make_fused_postprocess(anchors=...) ≡ make_postprocess ∘
    decode_full(anchors=...) — the custom-anchor serve path cannot drift
    from the reference route."""
    from heltondetection_tpu.engine.evaluator import make_postprocess
    from heltondetection_tpu.models.yolov5 import decode_full
    from heltondetection_tpu.ops.postprocess import make_fused_postprocess
    rng = np.random.default_rng(1)
    nc = 4
    raw = [jnp.asarray(rng.normal(size=(2, 16 >> l, 16 >> l, 3 * (5 + nc))),
                       jnp.float32) for l in range(3)]
    fused = make_fused_postprocess(nc, max_det=20, use_pallas=False,
                                   anchors=CUSTOM)
    fb, fs, fc, fv = jax.jit(fused)(raw)
    post = make_postprocess(nc, max_det=20)
    db, do, dc = decode_full(raw, nc, anchors=CUSTOM)
    ub, us, uc, uv = jax.jit(post)(db, do, dc)
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(uv))
    m = np.asarray(fv).astype(bool)
    # bf16 packed-candidate rows in the fused path: same tolerance as
    # test_postprocess_fused's default-anchor parity pins
    np.testing.assert_allclose(np.asarray(fb)[m], np.asarray(ub)[m],
                               rtol=0.02, atol=0.06)
    np.testing.assert_array_equal(np.asarray(fc)[m], np.asarray(uc)[m])


def test_loss_uses_cfg_anchors():
    from heltondetection_tpu.train.yolo_loss import YoloLossConfig, yolo_loss
    rng = np.random.default_rng(2)
    nc = 4
    raw = [jnp.asarray(rng.normal(size=(2, 8 >> l, 8 >> l, 3 * (5 + nc))),
                       jnp.float32) for l in range(3)]
    gt = jnp.asarray([[[20.0, 20.0, 10.0, 14.0]], [[40.0, 30.0, 60.0, 40.0]]])
    cls = jnp.zeros((2, 1), jnp.int32)
    mask = jnp.ones((2, 1), bool)
    base = YoloLossConfig(num_classes=nc, img_size=64)
    l_def, _ = yolo_loss(raw, gt, cls, mask, base)
    l_cfg, _ = yolo_loss(raw, gt, cls, mask,
                         base._replace(anchors=CUSTOM))
    l_arg, _ = yolo_loss(raw, gt, cls, mask, base, anchors=CUSTOM)
    assert float(l_cfg) == pytest.approx(float(l_arg))
    assert float(l_cfg) != pytest.approx(float(l_def))


def test_run_train_autoanchor_e2e(tmp_path):
    """run_train with train.autoanchor=True re-fits the anchors when the
    labels fail the shape-ratio test (extreme-aspect boxes — the v6.1
    anchor_t=4 check tolerates a 16x size range, so only aspect outliers
    trip it), trains, and every decode path reads the fitted set via cfg."""
    import json as _json
    from tests.synth_data import build_coco_dataset
    from heltondetection_tpu.configs.base import ExperimentConfig
    from heltondetection_tpu.engine.runner import run_train

    ann, imgs = build_coco_dataset(str(tmp_path / "d"), n_images=8,
                                   hw=(96, 128))
    # rewrite every gt as a ~110x6 px sliver: no default anchor matches
    # (best per-dim ratio < 1/4 for all nine), so BPR = 0 → re-fit
    with open(ann) as f:
        coco = _json.load(f)
    rng = np.random.default_rng(0)
    for a in coco["annotations"]:
        w = float(rng.uniform(100, 120))
        h = float(rng.uniform(5, 7))
        a["bbox"] = [float(rng.uniform(0, 128 - w)),
                     float(rng.uniform(0, 96 - h)), w, h]
        a["area"] = w * h
    with open(ann, "w") as f:
        _json.dump(coco, f)
    cfg = ExperimentConfig(name="autoanchor_e2e")
    cfg.work_dir = str(tmp_path / "run")
    cfg.data.format = "coco"
    cfg.data.train_ann = cfg.data.val_ann = ann
    cfg.data.train_imgs = cfg.data.val_imgs = imgs
    cfg.data.max_boxes = 16
    cfg.model.family = "yolov5"
    cfg.model.variant = "n"
    cfg.model.num_classes = 4
    cfg.model.img_size = 64
    cfg.train.autoanchor = True
    cfg.train.epochs = 1
    cfg.train.batch_size = 4
    cfg.train.num_workers = 1
    cfg.train.native_loader = False
    cfg.train.mosaic_p = 0.0
    cfg.train.hsv = False
    cfg.train.flip_p = 0.0
    cfg.train.warmup_epochs = 1
    cfg.train.eval_interval = 100
    cfg.train.ckpt_interval = 100
    run_train(cfg, resume=False)
    assert cfg.model.anchors is not None, \
        "autoanchor should have re-fit anchors for tiny synthetic boxes"
    flat = flatten_anchors(cfg.model.anchors)
    # synthetic boxes at 64² are tiny; fitted anchors must all be < the
    # default set's biggest (373x326) by a wide margin
    assert flat.max() < 100
