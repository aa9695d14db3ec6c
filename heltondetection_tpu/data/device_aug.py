"""On-device augmentation — BASELINE.json north-star N7: "the image
preprocessing pipeline (letterbox resize, mosaic/HSV/flip augmentation,
normalization) runs as fused on-device XLA ops feeding HBM-resident
batches".

Host threads only decode JPEGs and letterbox each tile to the square train
size (variable-size resize can't be jitted); everything random — mosaic
composition, horizontal flip, HSV-style color jitter, normalization — runs
inside the jitted train step, PRNG-keyed and batched:

    images4 (B,4,S,S,3) uint8 ─┐
    boxes4  (B,4,M,4) xyxy     ├─ device_mosaic_batch → (B,S,S,3) f32[0,1],
    cls4/mask4 (B,4,M)         ┘    cxcywh targets (B,4M), masks

Mosaic semantics: the four letterboxed tiles are laid out on a 2S canvas
and a random S-crop is taken (uniform offset in [0,S]²) — the same
"random mosaic center" distribution as the host/YOLOv5 version, with
per-tile letterboxing instead of per-tile free resize.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def rgb_jitter(img: jnp.ndarray, rng: jax.Array, *, h_gain: float = 0.015,
               s_gain: float = 0.7, v_gain: float = 0.4) -> jnp.ndarray:
    """HSV-equivalent color jitter in RGB space (float [0,1] in/out):
    value = global scale, saturation = lerp toward luma, hue = channel
    rotation by a small random angle. Matches the *distributional* role of
    the reference's cv2 HSV LUTs (C7) while staying vectorizable."""
    kh, ks, kv = jax.random.split(rng, 3)
    v = 1.0 + jax.random.uniform(kv, (), minval=-v_gain, maxval=v_gain)
    s = 1.0 + jax.random.uniform(ks, (), minval=-s_gain, maxval=s_gain)
    h = jax.random.uniform(kh, (), minval=-h_gain, maxval=h_gain) * jnp.pi * 2
    luma = (0.299 * img[..., 0] + 0.587 * img[..., 1] +
            0.114 * img[..., 2])[..., None]
    out = luma + (img - luma) * s                     # saturation
    # hue: rotate channels around the gray axis (Rodrigues, axis=(1,1,1)/√3)
    cos, sin = jnp.cos(h), jnp.sin(h)
    r, g, b = out[..., 0], out[..., 1], out[..., 2]
    third = (r + g + b) / 3.0
    rr = r * cos + (g - b) * sin * 0.57735 + third * (1 - cos)
    gg = g * cos + (b - r) * sin * 0.57735 + third * (1 - cos)
    bb = b * cos + (r - g) * sin * 0.57735 + third * (1 - cos)
    out = jnp.stack([rr, gg, bb], axis=-1)
    return jnp.clip(out * v, 0.0, 1.0)


def device_mosaic_one(images4: jnp.ndarray, boxes4: jnp.ndarray,
                      cls4: jnp.ndarray, mask4: jnp.ndarray,
                      rng: jax.Array, use_mosaic: jnp.ndarray, *,
                      flip_p: float = 0.5, hsv: bool = True,
                      pad_value: float = 114.0,
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                 jnp.ndarray]:
    """One sample: 4 letterboxed tiles → augmented (S,S,3) f32 + targets.

    boxes4: xyxy in tile coordinates. Returns (img [0,1], gt cxcywh (4M,4),
    cls (4M,), mask (4M,)). ``use_mosaic`` is the per-sample mosaic coin —
    flipped on HOST (DeviceAugPipeline) so tiles 1-3 are only DECODED when
    the mosaic actually fires (halves average image reads at p=0.5; the
    host here can be the bottleneck). When false, tile 0 is used as-is and
    tiles 1-3 are masked out.
    """
    _, s, _, _ = images4.shape
    m = boxes4.shape[1]
    k_oy, k_ox, k_flip, k_hsv = jax.random.split(rng, 4)

    # 2S canvas with the 4 tiles in quadrants
    canvas = jnp.full((2 * s, 2 * s, 3), pad_value, jnp.float32)
    offs = ((0, 0), (0, s), (s, 0), (s, s))
    for i, (oy, ox) in enumerate(offs):
        canvas = jax.lax.dynamic_update_slice(
            canvas, images4[i].astype(jnp.float32), (oy, ox, 0))
    oy = jax.random.randint(k_oy, (), 0, s + 1)
    ox = jax.random.randint(k_ox, (), 0, s + 1)
    crop = jax.lax.dynamic_slice(canvas, (oy, ox, 0), (s, s, 3))

    # mosaic boxes: shift each tile's boxes into canvas coords, minus crop
    shift = jnp.asarray([[0, 0], [0, s], [s, 0], [s, s]], jnp.float32)
    off4 = jnp.concatenate([shift[:, ::-1], shift[:, ::-1]], -1)  # x,y,x,y
    mb = boxes4 + off4[:, None, :]                   # (4, M, 4) canvas
    crop_off = jnp.stack([ox, oy, ox, oy]).astype(jnp.float32)
    mb = (mb - crop_off).reshape(4 * m, 4)
    mb = jnp.clip(mb, 0.0, float(s))
    mcls = cls4.reshape(4 * m)
    mmask = mask4.reshape(4 * m) & ((mb[:, 2] - mb[:, 0]) > 2.0) & \
        ((mb[:, 3] - mb[:, 1]) > 2.0)

    # non-mosaic: tile 0 only
    nb = jnp.zeros((4 * m, 4)).at[:m].set(jnp.clip(boxes4[0], 0.0, float(s)))
    ncls = jnp.zeros((4 * m,), cls4.dtype).at[:m].set(cls4[0])
    nmask = jnp.zeros((4 * m,), bool).at[:m].set(mask4[0])

    img = jnp.where(use_mosaic, crop, images4[0].astype(jnp.float32))
    boxes = jnp.where(use_mosaic, mb, nb)
    cls = jnp.where(use_mosaic, mcls, ncls)
    mask = jnp.where(use_mosaic, mmask, nmask)

    # horizontal flip
    do_flip = jax.random.uniform(k_flip) < flip_p
    img = jnp.where(do_flip, img[:, ::-1, :], img)
    fb = jnp.stack([s - boxes[:, 2], boxes[:, 1],
                    s - boxes[:, 0], boxes[:, 3]], 1)
    boxes = jnp.where(do_flip, fb, boxes)

    img = img / 255.0
    if hsv:
        img = rgb_jitter(img, k_hsv)

    gt = jnp.stack([(boxes[:, 0] + boxes[:, 2]) * 0.5,
                    (boxes[:, 1] + boxes[:, 3]) * 0.5,
                    boxes[:, 2] - boxes[:, 0],
                    boxes[:, 3] - boxes[:, 1]], 1)
    gt = gt * mask[:, None]
    return img, gt, cls, mask


def device_augment_batch(batch: Dict, rng: jax.Array, *,
                         flip_p: float = 0.5, hsv: bool = True,
                         mixup_p: float = 0.0,
                         mixup_beta: float = 32.0) -> Dict:
    """Batch wrapper: batch has images4 (B,4,S,S,3) uint8, boxes4
    (B,4,M,4), cls4 (B,4,M), mask4 (B,4,M), mosaic4 (B,) bool →
    train-step batch dict.

    ``mixup_p > 0`` adds YOLOv5-v6.1-style mixup fully on device: each
    sample blends with its batch neighbour (roll by one — the device
    analog of the host path's random-partner draw; every partner is
    itself fully augmented) at ratio r ~ Beta(32, 32), labels unioned
    unweighted. Doubles the GT target width (4M → 8M) at trace time, so
    it costs nothing when disabled."""
    b = batch["images4"].shape[0]
    rngs = jax.random.split(rng, b)
    img, gt, cls, mask = jax.vmap(
        lambda i4, b4, c4, m4, r, um: device_mosaic_one(
            i4, b4, c4, m4, r, um, flip_p=flip_p, hsv=hsv)
    )(batch["images4"], batch["boxes4"], batch["cls4"], batch["mask4"],
      rngs, batch["mosaic4"])
    if mixup_p > 0:
        k_coin, k_r = jax.random.split(jax.random.fold_in(rng, 0x6D78))
        coin = jax.random.uniform(k_coin, (b,)) < mixup_p
        r = jax.random.beta(k_r, mixup_beta, mixup_beta, (b,))
        r = jnp.where(coin, r, 1.0)[:, None, None, None]
        img = img * r + jnp.roll(img, -1, axis=0) * (1.0 - r)
        gt = jnp.concatenate([gt, jnp.roll(gt, -1, axis=0)], axis=1)
        cls = jnp.concatenate([cls, jnp.roll(cls, -1, axis=0)], axis=1)
        mask = jnp.concatenate(
            [mask, jnp.roll(mask, -1, axis=0) & coin[:, None]], axis=1)
    return {"image": img, "gt_boxes": gt, "gt_cls": cls, "gt_mask": mask}
