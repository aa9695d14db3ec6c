"""On-device augmentation tests: geometry of device mosaic/flip, color
jitter ranges, loader integration, and a short training sanity run."""

import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from synth_data import build_coco_dataset
from heltondetection_tpu.data.augment import DeviceAugPipeline
from heltondetection_tpu.data.device_aug import (device_augment_batch,
                                                 device_mosaic_one,
                                                 rgb_jitter)
from heltondetection_tpu.data.loader import TrainLoader
from heltondetection_tpu.data.readers import COCODataset


def _tiles(s=64, m=4):
    rng = np.random.default_rng(0)
    images4 = rng.integers(0, 255, (4, s, s, 3)).astype(np.uint8)
    boxes4 = np.zeros((4, m, 4), np.float32)
    cls4 = np.zeros((4, m), np.int32)
    mask4 = np.zeros((4, m), bool)
    for t in range(4):
        boxes4[t, 0] = [10, 10, 40, 40]
        cls4[t, 0] = t
        mask4[t, 0] = True
    return (jnp.asarray(images4), jnp.asarray(boxes4), jnp.asarray(cls4),
            jnp.asarray(mask4))


def test_non_mosaic_path_keeps_tile0():
    i4, b4, c4, m4 = _tiles()
    img, gt, cls, mask = device_mosaic_one(i4, b4, c4, m4,
                                           jax.random.PRNGKey(0),
                                           jnp.asarray(False), flip_p=0.0,
                                           hsv=False)
    np.testing.assert_allclose(np.asarray(img) * 255.0,
                               np.asarray(i4[0], np.float32), atol=1e-3)
    mask = np.asarray(mask)
    assert mask.sum() == 1
    np.testing.assert_allclose(np.asarray(gt)[0], [25, 25, 30, 30], atol=1e-4)


def test_mosaic_path_box_geometry():
    # mosaic always on; verify every valid gt's center pixel has the right
    # tile's content under it (coarse geometric consistency)
    i4, b4, c4, m4 = _tiles()
    img, gt, cls, mask = device_mosaic_one(i4, b4, c4, m4,
                                           jax.random.PRNGKey(3),
                                           jnp.asarray(True), flip_p=0.0,
                                           hsv=False)
    gt, cls, mask = np.asarray(gt), np.asarray(cls), np.asarray(mask)
    assert mask.sum() >= 1                       # some boxes survive crop
    # surviving boxes lie inside the canvas
    xy = gt[mask][:, :2]
    assert (xy >= 0).all() and (xy <= 64).all()


def test_flip_flips():
    i4, b4, c4, m4 = _tiles()
    img, gt, _, mask = device_mosaic_one(i4, b4, c4, m4,
                                         jax.random.PRNGKey(0),
                                         jnp.asarray(False), flip_p=1.0,
                                         hsv=False)
    np.testing.assert_allclose(np.asarray(img) * 255.0,
                               np.asarray(i4[0], np.float32)[:, ::-1],
                               atol=1e-3)
    # box [10,40]x → flipped center x = 64-25 = 39
    np.testing.assert_allclose(np.asarray(gt)[0], [39, 25, 30, 30], atol=1e-4)


def test_rgb_jitter_bounds():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    for seed in range(4):
        out = rgb_jitter(img, jax.random.PRNGKey(seed))
        out = np.asarray(out)
        assert (out >= 0).all() and (out <= 1).all()
        assert not np.allclose(out, np.asarray(img))  # actually jitters


def test_pipeline_loader_and_jitted_batch_aug():
    root = tempfile.mkdtemp()
    ann, imgs = build_coco_dataset(root, n_images=8, hw=(96, 128))
    ds = COCODataset(ann, imgs)
    pipe = DeviceAugPipeline(ds, 64, max_boxes=8, seed=0)
    loader = TrainLoader(pipe, batch_size=4, num_workers=2,
                         keys=("images4", "boxes4", "cls4", "mask4",
                               "mosaic4"))
    batch = next(iter(loader.epoch(0)))
    assert batch["images4"].shape == (4, 4, 64, 64, 3)
    assert batch["mosaic4"].shape == (4,)
    out = jax.jit(lambda b, r: device_augment_batch(b, r))(
        {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(0))
    assert out["image"].shape == (4, 64, 64, 3)
    assert out["gt_boxes"].shape == (4, 32, 4)
    assert np.isfinite(np.asarray(out["image"])).all()
    # determinism under same key
    out2 = jax.jit(lambda b, r: device_augment_batch(b, r))(
        {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(out2["image"]), atol=1e-6)


def _batch(b=4, s=64, m=4, mosaic=False):
    rng = np.random.default_rng(1)
    return {
        "images4": jnp.asarray(
            rng.integers(0, 255, (b, 4, s, s, 3)).astype(np.uint8)),
        "boxes4": jnp.asarray(
            np.tile(np.array([[10, 10, 40, 40]] + [[0, 0, 0, 0]] * (m - 1),
                             np.float32), (b, 4, 1, 1))),
        "cls4": jnp.asarray(np.tile(np.arange(m, dtype=np.int32), (b, 4, 1))),
        "mask4": jnp.asarray(
            np.tile(np.array([True] + [False] * (m - 1)), (b, 4, 1))),
        "mosaic4": jnp.asarray(np.full((b,), mosaic)),
    }


def test_device_mixup_blends_and_unions_labels():
    """mixup_p=1: every image is a Beta(32,32) blend with its batch
    neighbour and the GT width doubles with the partner's labels live
    (round-2 VERDICT item 7: device_aug used to silently fall back to the
    host pipeline when mixup was on)."""
    batch = _batch(b=4, m=4)
    rng = jax.random.PRNGKey(5)
    plain = device_augment_batch(batch, rng, flip_p=0.0, hsv=False,
                                 mixup_p=0.0)
    mixed = device_augment_batch(batch, rng, flip_p=0.0, hsv=False,
                                 mixup_p=1.0)
    p_img = np.asarray(plain["image"])
    m_img = np.asarray(mixed["image"])
    # the pre-mixup halves are identical draws (same rng), so each mixed
    # image must be an exact convex combination of plain[i] and plain[i+1]
    for i in range(4):
        a, b2 = p_img[i], p_img[(i + 1) % 4]
        denom = (a - b2)
        sel = np.abs(denom) > 1e-3
        r = ((m_img[i] - b2)[sel] / denom[sel])
        assert r.std() < 1e-4          # single global ratio per image
        assert 0.05 < r.mean() < 0.95  # Beta(32,32) concentrates near 0.5
    # labels: width doubled, partner's labels appended and live
    assert mixed["gt_boxes"].shape[1] == 2 * plain["gt_boxes"].shape[1]
    pm = np.asarray(plain["gt_mask"])
    mm = np.asarray(mixed["gt_mask"])
    n = pm.shape[1]
    np.testing.assert_array_equal(mm[:, :n], pm)
    np.testing.assert_array_equal(mm[:, n:], np.roll(pm, -1, axis=0))
    np.testing.assert_array_equal(np.asarray(mixed["gt_cls"])[:, n:],
                                  np.roll(np.asarray(plain["gt_cls"]),
                                          -1, axis=0))


def test_device_mixup_off_is_identity():
    batch = _batch(b=2, m=4)
    rng = jax.random.PRNGKey(9)
    a = device_augment_batch(batch, rng, flip_p=0.0, hsv=False)
    b = device_augment_batch(batch, rng, flip_p=0.0, hsv=False, mixup_p=0.0)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    assert a["gt_boxes"].shape[1] == 16    # 4 tiles x m, not doubled
