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
