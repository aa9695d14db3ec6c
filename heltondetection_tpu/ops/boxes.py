"""Core box geometry ops (pure jax.numpy, fully jittable / vmappable).

Rebuild target C17 of the reference (SURVEY.md §2a): coordinate conversions,
IoU/GIoU/DIoU/CIoU (both aligned and full pairwise matrix), box decode for
anchor-based heads, clipping, and letterbox-inverse scaling. The reference
implements these as torch tensor ops (lineage: ultralytics/yolov5
utils/metrics.py bbox_iou); here they are pure functions designed for the VPU:
no data-dependent shapes, everything broadcasts.

Conventions
-----------
* ``xyxy``: (x1, y1, x2, y2) absolute pixels, x right, y down.
* ``cxcywh``: (cx, cy, w, h).
* All functions accept arbitrary leading batch dims; the box dim is last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-7


# ---------------------------------------------------------------------------
# coordinate conversions
# ---------------------------------------------------------------------------

def cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1)


def xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


def xywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    """COCO-style (x_min, y_min, w, h) → xyxy."""
    x, y, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def xyxy_to_xywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def clip_boxes(b: jnp.ndarray, h: float, w: float) -> jnp.ndarray:
    """Clip xyxy boxes to image bounds [0, w] x [0, h]."""
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([
        jnp.clip(x1, 0.0, w), jnp.clip(y1, 0.0, h),
        jnp.clip(x2, 0.0, w), jnp.clip(y2, 0.0, h)], axis=-1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes; negative extents clamp to 0."""
    w = jnp.maximum(b[..., 2] - b[..., 0], 0.0)
    h = jnp.maximum(b[..., 3] - b[..., 1], 0.0)
    return w * h


# ---------------------------------------------------------------------------
# aligned (elementwise) IoU family — used by losses
# ---------------------------------------------------------------------------

def bbox_iou(box1: jnp.ndarray, box2: jnp.ndarray, *, fmt: str = "xyxy",
             kind: str = "iou") -> jnp.ndarray:
    """Elementwise IoU between broadcast-compatible boxes.

    ``kind`` ∈ {iou, giou, diou, ciou}. CIoU follows the YOLOv5-v6.1 formula
    (reference loss C15, SURVEY.md; lineage ultralytics bbox_iou): the
    aspect-ratio term v = (4/π²)(atan(w2/h2) − atan(w1/h1))², with the alpha
    weight treated as a constant w.r.t. gradients is NOT replicated — the
    standard published formulation alpha = v / (1 − iou + v) is used with a
    stop-gradient-free form, matching ultralytics' ``with torch.no_grad()``
    omission in v6.1 (alpha computed in-graph).
    """
    if fmt == "cxcywh":
        box1, box2 = cxcywh_to_xyxy(box1), cxcywh_to_xyxy(box2)

    b1x1, b1y1, b1x2, b1y2 = (box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3])
    b2x1, b2y1, b2x2, b2y2 = (box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3])

    iw = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0.0)
    ih = jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0.0)
    inter = iw * ih

    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1
    union = w1 * h1 + w2 * h2 - inter + EPS
    iou = inter / union
    if kind == "iou":
        return iou

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)  # enclosing box
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    if kind == "giou":
        c_area = cw * ch + EPS
        return iou - (c_area - union) / c_area

    c2 = cw * cw + ch * ch + EPS  # enclosing diagonal²
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 +
            (b2y1 + b2y2 - b1y1 - b1y2) ** 2) * 0.25
    if kind == "diou":
        return iou - rho2 / c2

    if kind == "ciou":
        v = (4.0 / (jnp.pi ** 2)) * (
            jnp.arctan(w2 / (h2 + EPS)) - jnp.arctan(w1 / (h1 + EPS))) ** 2
        alpha = v / (v - iou + (1.0 + EPS))
        return iou - (rho2 / c2 + v * alpha)

    raise ValueError(f"unknown IoU kind: {kind}")


# ---------------------------------------------------------------------------
# pairwise IoU matrix — used by NMS / assigners / eval matching
# ---------------------------------------------------------------------------

def box_iou_matrix(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes: (..., N, 4) x (..., M, 4) → (..., N, M).

    Pure-jnp reference for the Pallas IoU kernel (rebuild target N8,
    SURVEY.md §2b); XLA fuses this fine for moderate N·M.
    """
    a = boxes1[..., :, None, :]  # (..., N, 1, 4)
    b = boxes2[..., None, :, :]  # (..., 1, M, 4)
    iw = jnp.clip(jnp.minimum(a[..., 2], b[..., 2]) -
                  jnp.maximum(a[..., 0], b[..., 0]), 0.0)
    ih = jnp.clip(jnp.minimum(a[..., 3], b[..., 3]) -
                  jnp.maximum(a[..., 1], b[..., 1]), 0.0)
    inter = iw * ih
    area_a = box_area(boxes1)[..., :, None]
    area_b = box_area(boxes2)[..., None, :]
    return inter / (area_a + area_b - inter + EPS)


def iou_matrix_pallas(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                      tile_n: int = 256, tile_m: int = 512) -> jnp.ndarray:
    """Pairwise IoU as a tiled Pallas kernel — rebuild target N8
    (SURVEY.md §2b: the reference leans on CUDA IoU kernels via torch
    tensor ops; BASELINE.json names the IoU matrix as a Pallas target).

    Equivalent to :func:`box_iou_matrix` on (N, 4) × (M, 4) xyxy inputs
    (the jnp version is the semantics oracle). Boxes are consumed
    coordinate-major (4, N) so every pairwise op is a natural
    (sublane, lane) broadcast on the VPU, and each grid program emits one
    (tile_n, tile_m) output tile without materialising intermediates in
    HBM. N must be a multiple of 8 and M of 128 (pad with zero-area boxes,
    which IoU 0 against everything).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, m = boxes1.shape[0], boxes2.shape[0]
    tn = min(tile_n, n)
    tm = min(tile_m, m)
    assert n % tn == 0 and m % tm == 0 and tn % 8 == 0 and tm % 128 == 0, \
        (n, m, tn, tm)

    def kernel(a_ref, b_ref, out_ref):
        ax1, ay1, ax2, ay2 = (a_ref[i, :] for i in range(4))   # (tn,)
        bx1, by1, bx2, by2 = (b_ref[i, :] for i in range(4))   # (tm,)
        iw = jnp.maximum(jnp.minimum(ax2[:, None], bx2[None, :]) -
                         jnp.maximum(ax1[:, None], bx1[None, :]), 0.0)
        ih = jnp.maximum(jnp.minimum(ay2[:, None], by2[None, :]) -
                         jnp.maximum(ay1[:, None], by1[None, :]), 0.0)
        inter = iw * ih
        area_a = jnp.maximum(ax2 - ax1, 0.0) * jnp.maximum(ay2 - ay1, 0.0)
        area_b = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
        out_ref[:, :] = inter / (area_a[:, None] + area_b[None, :] -
                                 inter + EPS)

    a_t = boxes1.T.astype(jnp.float32)                         # (4, N)
    b_t = boxes2.T.astype(jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(n // tn, m // tm),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        in_specs=[pl.BlockSpec((4, tn), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((4, tm), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(a_t, b_t)


def box_ioa_matrix(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection-over-area-of-boxes2 (used for crowd matching in
    COCO eval: pycocotools computes IoU vs gt area only for iscrowd)."""
    a = boxes1[..., :, None, :]
    b = boxes2[..., None, :, :]
    iw = jnp.clip(jnp.minimum(a[..., 2], b[..., 2]) -
                  jnp.maximum(a[..., 0], b[..., 0]), 0.0)
    ih = jnp.clip(jnp.minimum(a[..., 3], b[..., 3]) -
                  jnp.maximum(a[..., 1], b[..., 1]), 0.0)
    inter = iw * ih
    area_a = box_area(boxes1)[..., :, None]
    return inter / (area_a + EPS)


# ---------------------------------------------------------------------------
# delta (anchor-offset) coding — FasterRCNN RPN/RCNN box coder
# ---------------------------------------------------------------------------

def encode_deltas(anchors: jnp.ndarray, gt: jnp.ndarray,
                  weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """xyxy anchors + xyxy gt → (dx, dy, dw, dh) deltas.

    torchvision-style BoxCoder semantics (reference C11/C13 depend on
    torchvision's coder; RCNN uses weights (10,10,5,5), RPN (1,1,1,1)).
    """
    wa = anchors[..., 2] - anchors[..., 0]
    ha = anchors[..., 3] - anchors[..., 1]
    xa = anchors[..., 0] + 0.5 * wa
    ya = anchors[..., 1] + 0.5 * ha
    wg = gt[..., 2] - gt[..., 0]
    hg = gt[..., 3] - gt[..., 1]
    xg = gt[..., 0] + 0.5 * wg
    yg = gt[..., 1] + 0.5 * hg
    wx, wy, ww, wh = weights
    return jnp.stack([
        wx * (xg - xa) / (wa + EPS),
        wy * (yg - ya) / (ha + EPS),
        ww * jnp.log(jnp.maximum(wg, EPS) / (wa + EPS)),
        wh * jnp.log(jnp.maximum(hg, EPS) / (ha + EPS)),
    ], axis=-1)


def decode_deltas(anchors: jnp.ndarray, deltas: jnp.ndarray,
                  weights=(1.0, 1.0, 1.0, 1.0),
                  clamp: float = 4.135166556742356) -> jnp.ndarray:
    """Inverse of :func:`encode_deltas`; clamp = log(1000/16) as torchvision."""
    wa = anchors[..., 2] - anchors[..., 0]
    ha = anchors[..., 3] - anchors[..., 1]
    xa = anchors[..., 0] + 0.5 * wa
    ya = anchors[..., 1] + 0.5 * ha
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, max=clamp)
    dh = jnp.clip(deltas[..., 3] / wh, max=clamp)
    cx = dx * wa + xa
    cy = dy * ha + ya
    w = jnp.exp(dw) * wa
    h = jnp.exp(dh) * ha
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h,
                      cx + 0.5 * w, cy + 0.5 * h], axis=-1)
