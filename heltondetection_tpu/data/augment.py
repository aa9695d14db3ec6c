"""Host-side augmentation pipeline: letterbox, mosaic-4, HSV, flip — C7.

Reference augments (README.md:10 "丰富的数据增强方法"; mosaic probability is a
per-experiment knob in every table, README.md:71-154). Improvements over the
reference's nondeterministic cv2/np.random pipeline (SURVEY.md §4): every
op takes an explicit ``np.random.Generator`` seeded per (epoch, index), so
any batch is exactly reproducible.

Split of labor per BASELINE.json north-star: geometry-light ops that need
raw variable-size images (decode, mosaic compositing, letterbox resize) run
on host; the final normalize (and optional device-side HSV/flip) are fused
XLA ops in the jitted train step (see device_prep in loader.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from heltondetection_tpu.data.readers import drop_ignore_boxes

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def letterbox_np(img: np.ndarray, boxes: np.ndarray, dst: int,
                 pad_value: int = 114) -> Tuple[np.ndarray, np.ndarray, Dict]:
    """Aspect-preserving resize+pad to (dst, dst). Returns (img, boxes, meta)
    with meta = {scale, pad_x, pad_y} matching ops/letterbox.py geometry."""
    h, w = img.shape[:2]
    scale = min(dst / h, dst / w)
    nw, nh = int(round(w * scale)), int(round(h * scale))
    if (nw, nh) != (w, h):
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    top = (dst - nh) // 2
    left = (dst - nw) // 2
    out = np.full((dst, dst, 3), pad_value, img.dtype)
    out[top:top + nh, left:left + nw] = img
    if len(boxes):
        boxes = boxes * scale + np.array([left, top, left, top], np.float32)
    return out, boxes.astype(np.float32),  {
        "scale": scale, "pad_x": float(left), "pad_y": float(top)}


def hsv_params(rng: np.random.Generator, h_gain: float = 0.015,
               s_gain: float = 0.7, v_gain: float = 0.4) -> np.ndarray:
    """HSV jitter gain draws (shared by the Python and native pixel paths)."""
    return rng.uniform(-1, 1, 3) * [h_gain, s_gain, v_gain] + 1


def random_hsv(img: np.ndarray, rng: np.random.Generator,
               h_gain: float = 0.015, s_gain: float = 0.7,
               v_gain: float = 0.4) -> np.ndarray:
    """Ultralytics-style HSV jitter via LUTs (uint8 in, uint8 out)."""
    r = hsv_params(rng, h_gain, s_gain, v_gain)
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
    x = np.arange(256)
    lut_h = ((x * r[0]) % 180).astype(np.uint8)
    lut_s = np.clip(x * r[1], 0, 255).astype(np.uint8)
    lut_v = np.clip(x * r[2], 0, 255).astype(np.uint8)
    hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s),
                     cv2.LUT(val, lut_v)))
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def flip_boxes(boxes: np.ndarray, w: int) -> np.ndarray:
    """Box transform of :func:`horizontal_flip` (shared with native path)."""
    if len(boxes):
        boxes = boxes.copy()
        x1 = boxes[:, 0].copy()
        boxes[:, 0] = w - boxes[:, 2]
        boxes[:, 2] = w - x1
    return boxes


def horizontal_flip(img: np.ndarray, boxes: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
    w = img.shape[1]
    if cv2 is not None:
        img = cv2.flip(img, 1)  # SIMD; ~6x the numpy negative-stride copy
    else:
        img = np.ascontiguousarray(img[:, ::-1])
    return img, flip_boxes(boxes, w)


def mosaic_placement(i: int, nw: int, nh: int, xc: int, yc: int, s: int
                     ) -> Tuple[int, int, int, int, int, int]:
    """Quadrant placement arithmetic shared by the Python pixel path, the
    box transform, and the native C++ core (native/loader_core.cpp keeps an
    identical copy of this function). Returns (x1a, y1a, x2a, y2a, x1b, y1b):
    the canvas rect and the matching origin in the resized tile."""
    if i == 0:   # top-left quadrant, anchored at (xc, yc)
        x1a, y1a = max(xc - nw, 0), max(yc - nh, 0)
        x2a, y2a = xc, yc
    elif i == 1:  # top-right
        x1a, y1a = xc, max(yc - nh, 0)
        x2a, y2a = min(xc + nw, 2 * s), yc
    elif i == 2:  # bottom-left
        x1a, y1a = max(xc - nw, 0), yc
        x2a, y2a = xc, min(yc + nh, 2 * s)
    else:         # bottom-right
        x1a, y1a = xc, yc
        x2a, y2a = min(xc + nw, 2 * s), min(yc + nh, 2 * s)
    cw, ch = x2a - x1a, y2a - y1a
    x1b = nw - cw if i in (0, 2) else 0
    y1b = nh - ch if i in (0, 1) else 0
    return x1a, y1a, x2a, y2a, x1b, y1b


def mosaic_boxes(samples: Sequence[Dict], s: int, xc: int, yc: int,
                 min_box: float = 2.0) -> Tuple[np.ndarray, np.ndarray]:
    """Box/class transform of :func:`mosaic4` (pixel-free — shared with the
    native loader path, which runs the pixels in C++)."""
    all_boxes, all_cls = [], []
    for i, sample in enumerate(samples[:4]):
        boxes = sample["boxes"]
        h, w = sample["image"].shape[:2] if "image" in sample \
            else (sample["height"], sample["width"])
        scale = min(s / h, s / w)
        nw, nh = int(round(w * scale)), int(round(h * scale))
        x1a, y1a, _, _, x1b, y1b = mosaic_placement(i, nw, nh, xc, yc, s)
        if len(boxes):
            b = boxes * scale
            b = b + np.array([x1a - x1b, y1a - y1b, x1a - x1b, y1a - y1b],
                             np.float32)
            all_boxes.append(b)
            all_cls.append(sample["classes"])
    if all_boxes:
        boxes = np.concatenate(all_boxes, 0)
        classes = np.concatenate(all_cls, 0)
    else:
        boxes = np.zeros((0, 4), np.float32)
        classes = np.zeros((0,), np.int32)
    off = s // 2
    if len(boxes):
        boxes -= off
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, s)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, s)
        keep = ((boxes[:, 2] - boxes[:, 0]) > min_box) & \
               ((boxes[:, 3] - boxes[:, 1]) > min_box)
        boxes, classes = boxes[keep], classes[keep]
    return boxes.astype(np.float32), classes


def mosaic4(samples: Sequence[Dict], dst: int, rng: np.random.Generator,
            pad_value: int = 114, min_box: float = 2.0
            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """4-image mosaic (YOLOv5 style): random center on a 2dst canvas, each
    quadrant filled with one resized image, then center-cropped to dst.

    Returns (img (dst,dst,3), boxes_xyxy, classes). Degenerate boxes (clipped
    below ``min_box`` px) are dropped.
    """
    s = dst
    yc = int(rng.uniform(0.5 * s, 1.5 * s))
    xc = int(rng.uniform(0.5 * s, 1.5 * s))
    canvas = np.full((2 * s, 2 * s, 3), pad_value, np.uint8)
    for i, sample in enumerate(samples[:4]):
        img = sample["image"]
        h, w = img.shape[:2]
        scale = min(s / h, s / w)  # letterbox-scale each tile
        nw, nh = int(round(w * scale)), int(round(h * scale))
        if (nw, nh) != (w, h):
            img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        x1a, y1a, x2a, y2a, x1b, y1b = mosaic_placement(i, nw, nh, xc, yc, s)
        cw, ch = x2a - x1a, y2a - y1a
        canvas[y1a:y2a, x1a:x2a] = img[y1b:y1b + ch, x1b:x1b + cw]
    boxes, classes = mosaic_boxes(samples, s, xc, yc, min_box)
    # center crop (s/2 .. 3s/2) → final dst canvas
    off = s // 2
    canvas = canvas[off:off + s, off:off + s]
    return canvas, boxes, classes


def affine_params(rng: np.random.Generator, w: int, h: int, *,
                  degrees: float = 0.0, translate: float = 0.1,
                  scale: float = 0.5, shear: float = 0.0
                  ) -> Tuple[np.ndarray, float]:
    """Random-affine parameter draws (shared by the Python and native pixel
    paths — identical rng consumption). Returns (2x3 forward matrix, scale)."""
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    rot = cv2.getRotationMatrix2D((w / 2, h / 2), a, s)    # 2x3
    rot[0, 2] += rng.uniform(0.5 - translate, 0.5 + translate) * w - w / 2
    rot[1, 2] += rng.uniform(0.5 - translate, 0.5 + translate) * h - h / 2
    if shear:
        sh_x = np.tan(np.radians(rng.uniform(-shear, shear)))
        sh_y = np.tan(np.radians(rng.uniform(-shear, shear)))
        shear_m = np.array([[1, sh_x, 0], [sh_y, 1, 0]], np.float64)
        rot = shear_m @ np.vstack([rot, [0, 0, 1]])
    return rot, s


def affine_boxes(boxes: np.ndarray, classes: np.ndarray, rot: np.ndarray,
                 s: float, w: int, h: int, min_box: float = 2.0):
    """Box transform of :func:`random_affine` (pixel-free — shared with the
    native loader): 4-corner map → axis-aligned hull → candidate filter."""
    if len(boxes) == 0:
        return boxes, classes
    n = len(boxes)
    corners = np.ones((n * 4, 3))
    corners[:, :2] = boxes[:, [0, 1, 2, 1, 2, 3, 0, 3]].reshape(n * 4, 2)
    warped = corners @ rot.T                               # (4n, 2)
    warped = warped.reshape(n, 8)
    xs = warped[:, [0, 2, 4, 6]]
    ys = warped[:, [1, 3, 5, 7]]
    new = np.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)], 1)
    new[:, [0, 2]] = new[:, [0, 2]].clip(0, w)
    new[:, [1, 3]] = new[:, [1, 3]].clip(0, h)
    # candidate filter (lineage box_candidates): size + area ratio
    w_new = new[:, 2] - new[:, 0]
    h_new = new[:, 3] - new[:, 1]
    w_old = (boxes[:, 2] - boxes[:, 0]) * s
    h_old = (boxes[:, 3] - boxes[:, 1]) * s
    ar = np.maximum(w_new / (h_new + 1e-9), h_new / (w_new + 1e-9))
    keep = (w_new > min_box) & (h_new > min_box) & \
           (w_new * h_new / (w_old * h_old + 1e-9) > 0.1) & (ar < 100)
    return new[keep].astype(np.float32), classes[keep]


def random_affine(img: np.ndarray, boxes: np.ndarray, classes: np.ndarray,
                  rng: np.random.Generator, *, degrees: float = 0.0,
                  translate: float = 0.1, scale: float = 0.5,
                  shear: float = 0.0, pad_value: int = 114,
                  min_box: float = 2.0):
    """YOLOv5-style random affine (rotate/scale/translate/shear) applied
    after mosaic (lineage utils/augmentations.py random_perspective; the
    reference's '丰富的数据增强方法' README.md:10). Box labels are transformed by
    mapping all 4 corners and taking the axis-aligned hull, then filtered
    by size and clip like the lineage code."""
    h, w = img.shape[:2]
    rot, s = affine_params(rng, w, h, degrees=degrees, translate=translate,
                           scale=scale, shear=shear)
    out = cv2.warpAffine(img, rot, (w, h),
                         borderValue=(pad_value,) * 3)
    boxes, classes = affine_boxes(boxes, classes, rot, s, w, h, min_box)
    return out, boxes, classes


def mixup_blend(a: np.ndarray, b: np.ndarray, r: float) -> np.ndarray:
    """Pixel blend of two augmented uint8 images (ultralytics mixup: truncate
    after the float mix). Shared by the Python and native-loader paths so
    mixup stays bit-identical between them."""
    return (a.astype(np.float32) * r +
            b.astype(np.float32) * (1.0 - r)).astype(np.uint8)


def mixup_draws(rng: np.random.Generator, mixup_p: float, n: int):
    """The mixup decision draws, in the shared stream order: coin, partner
    index, beta(32,32) weight. Returns (partner_or_None, r). Drawn only when
    the knob is on, so mixup_p=0 reproduces pre-mixup streams exactly; used
    identically by TrainPipeline and NativeTrainPipeline (lockstep)."""
    if mixup_p <= 0.0 or n < 2:
        return None, 1.0
    mix = rng.uniform() < mixup_p
    j = int(rng.integers(0, n))
    r = float(rng.beta(32.0, 32.0))
    return (j if mix else None), r


# seed-sequence tag decoupling a mixup PARTNER's augmentation stream from the
# same index's own per-(seed, epoch, idx) stream
MIXUP_STREAM_TAG = 1


class TrainPipeline:
    """Per-sample train-time augmentation: mosaic(p) → HSV → flip(0.5) →
    letterbox (non-mosaic path) → optional mixup(p) with a second
    fully-augmented sample → cxcywh targets in input pixels."""

    _mixup_trunc_warned = False  # once-per-process truncation notice

    def __init__(self, dataset, img_size: int, *, mosaic_p: float = 0.5,
                 hsv: bool = True, flip_p: float = 0.5, max_boxes: int = 128,
                 seed: int = 0, affine: bool = True,
                 affine_scale: float = 0.5, affine_translate: float = 0.1,
                 degrees: float = 0.0, mixup_p: float = 0.0):
        self.ds = dataset
        self.img_size = img_size
        self.mosaic_p = mosaic_p
        self.hsv = hsv
        self.flip_p = flip_p
        self.max_boxes = max_boxes
        self.seed = seed
        self.affine = affine
        self.affine_scale = affine_scale
        self.affine_translate = affine_translate
        self.degrees = degrees
        self.mixup_p = mixup_p

    def __len__(self):
        return len(self.ds)

    def _augment_one(self, idx: int, rng: np.random.Generator
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One fully-augmented (img, boxes, classes) drawing from ``rng``."""
        s = self.img_size
        if rng.uniform() < self.mosaic_p and len(self.ds) >= 4:
            others = rng.integers(0, len(self.ds), 3)
            samples = [drop_ignore_boxes(self.ds.load(idx))] + [
                drop_ignore_boxes(self.ds.load(int(j))) for j in others]
            img, boxes, classes = mosaic4(samples, s, rng)
            if self.affine:  # lineage: random_perspective follows mosaic
                img, boxes, classes = random_affine(
                    img, boxes, classes, rng, degrees=self.degrees,
                    translate=self.affine_translate,
                    scale=self.affine_scale)
        else:
            raw = drop_ignore_boxes(self.ds.load(idx))
            img, boxes, _ = letterbox_np(raw["image"], raw["boxes"], s)
            classes = raw["classes"]
        if self.hsv:
            img = random_hsv(img, rng)
        if rng.uniform() < self.flip_p:
            img, boxes = horizontal_flip(img, boxes)
        return img, np.asarray(boxes, np.float32).reshape(-1, 4), \
            np.asarray(classes).reshape(-1)

    def sample(self, idx: int, epoch: int = 0) -> Dict:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, idx]))
        partner, r = mixup_draws(rng, self.mixup_p, len(self.ds))
        img, boxes, classes = self._augment_one(idx, rng)
        if partner is not None:
            # blend with a SECOND fully-augmented sample (own mosaic/HSV/flip
            # from a tagged stream) and take the union of the labels — the
            # YOLOv5-v6.1 lineage's mixup (label weights are not used there)
            rng2 = np.random.default_rng(np.random.SeedSequence(
                [self.seed, epoch, partner, MIXUP_STREAM_TAG]))
            img2, boxes2, classes2 = self._augment_one(partner, rng2)
            img = mixup_blend(img, img2, r)
            boxes = np.concatenate([boxes, boxes2], axis=0)
            classes = np.concatenate([classes, classes2], axis=0)
            if len(classes) > self.max_boxes:
                # mixup roughly doubles label counts; truncating the raw
                # concatenation would always drop the PARTNER's trailing
                # boxes first. Shuffle (seeded) so the loss sees an
                # unbiased subset, and tell dense-dataset users once to
                # raise data.max_boxes (round-2 advisor finding).
                perm = rng.permutation(len(classes))
                boxes, classes = boxes[perm], classes[perm]
                if not TrainPipeline._mixup_trunc_warned:
                    TrainPipeline._mixup_trunc_warned = True
                    from heltondetection_tpu.utils.log import get_logger
                    get_logger().warning(
                        "mixup label union (%d boxes) exceeds max_boxes=%d;"
                        " keeping a seeded random subset. Raise "
                        "data.max_boxes if this is frequent.",
                        len(classes), self.max_boxes)
        # fixed-shape targets: cxcywh pixels + mask
        m = self.max_boxes
        gt = np.zeros((m, 4), np.float32)
        cl = np.zeros((m,), np.int32)
        mask = np.zeros((m,), bool)
        n = min(len(classes), m)
        if n:
            b = boxes[:n]
            gt[:n, 0] = (b[:, 0] + b[:, 2]) / 2
            gt[:n, 1] = (b[:, 1] + b[:, 3]) / 2
            gt[:n, 2] = b[:, 2] - b[:, 0]
            gt[:n, 3] = b[:, 3] - b[:, 1]
            cl[:n] = classes[:n]
            mask[:n] = True
        return {"image": img, "gt_boxes": gt, "gt_cls": cl, "gt_mask": mask}


class DeviceAugPipeline:
    """Host half of the on-device augmentation path (device_aug.py): per
    sample, letterbox 4 tiles (self + 3 seeded-random others) to the train
    size and emit raw uint8 stacks; ALL randomness beyond tile choice
    (mosaic coin, crop offset, flip, color jitter) happens on device."""

    def __init__(self, dataset, img_size: int, *, max_boxes: int = 32,
                 seed: int = 0, mosaic_p: float = 1.0):
        self.ds = dataset
        self.img_size = img_size
        self.max_boxes = max_boxes
        self.seed = seed
        # mosaic_p == 0 → the device path always takes the tile-0 branch,
        # so decoding + letterboxing tiles 1-3 would be 4x wasted host work
        self.mosaic_p = mosaic_p

    def __len__(self):
        return len(self.ds)

    def sample(self, idx: int, epoch: int = 0) -> Dict:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, idx]))
        s = self.img_size
        m = self.max_boxes
        # host-side mosaic coin: tiles 1-3 are only decoded when the
        # mosaic fires (image reads dominate host cost; at p=0.5 this
        # halves them). The flag rides the batch into the device aug.
        use_mosaic = bool(rng.uniform() < self.mosaic_p)
        if use_mosaic:
            ids = [idx] + [int(j) for j in rng.integers(0, len(self.ds), 3)]
        else:
            ids = [idx]
        images = np.full((4, s, s, 3), 114, np.uint8)
        boxes4 = np.zeros((4, m, 4), np.float32)
        cls4 = np.zeros((4, m), np.int32)
        mask4 = np.zeros((4, m), bool)
        for t, j in enumerate(ids):
            raw = drop_ignore_boxes(self.ds.load(j))
            img, b, _ = letterbox_np(raw["image"], raw["boxes"], s)
            images[t] = img
            n = min(len(raw["classes"]), m)
            if n:
                boxes4[t, :n] = b[:n]
                cls4[t, :n] = raw["classes"][:n]
                mask4[t, :n] = True
        return {"images4": images, "boxes4": boxes4, "cls4": cls4,
                "mask4": mask4, "mosaic4": np.asarray(use_mosaic)}


class EvalPipeline:
    """Eval-time preprocessing: letterbox only (SURVEY.md §3.2), keeping the
    inverse-transform metadata the evaluator needs."""

    def __init__(self, dataset, img_size: int):
        self.ds = dataset
        self.img_size = img_size

    def __len__(self):
        return len(self.ds)

    def sample(self, idx: int) -> Dict:
        raw = self.ds.load(idx)
        img, _, meta = letterbox_np(raw["image"], np.zeros((0, 4)),
                                    self.img_size)
        h, w = raw["image"].shape[:2]
        return {"image": img, "img_id": raw["img_id"], "scale": meta["scale"],
                "pad_x": meta["pad_x"], "pad_y": meta["pad_y"],
                "orig_hw": (h, w)}
