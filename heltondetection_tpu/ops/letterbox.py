"""Letterbox (aspect-preserving resize + pad) forward and inverse transforms.

Rebuild target C7 (partial) of the reference (SURVEY.md §2a; README.md:10
lists letterbox among the augmentations). Two halves:

* :func:`letterbox_params` — pure geometry: given (src_h, src_w, dst) compute
  scale + pad. Shared by the host pipeline (cv2 resize) and the coordinate
  math, so the inverse mapping used at eval time is bit-identical to the
  forward used at preprocessing time (SURVEY.md §7 flags letterbox-inverse
  rounding as a mAP-parity hazard).
* :func:`letterbox_image_jax` — on-device letterbox as fused XLA ops
  (resize + pad), per BASELINE.json north-star "preprocessing … as fused
  on-device XLA ops". Requires static src/dst shapes under jit.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LetterboxParams(NamedTuple):
    scale: jnp.ndarray   # float: resize ratio applied to the source image
    pad_x: jnp.ndarray   # float: left pad in destination pixels
    pad_y: jnp.ndarray   # float: top pad in destination pixels
    new_w: jnp.ndarray   # int: resized (pre-pad) width
    new_h: jnp.ndarray   # int: resized (pre-pad) height


def letterbox_params(src_h, src_w, dst_h: int, dst_w: int,
                     *, center: bool = True) -> LetterboxParams:
    """Compute scale/pad mapping src → dst keeping aspect ratio.

    Matches the YOLOv5 letterbox convention (scaleup allowed at train, and the
    reference benchmarks at fixed square sizes README.md:69): ratio =
    min(dst/src), symmetric padding when ``center``.
    Works on python ints or traced arrays.
    """
    src_h = jnp.asarray(src_h, jnp.float32)
    src_w = jnp.asarray(src_w, jnp.float32)
    scale = jnp.minimum(dst_h / src_h, dst_w / src_w)
    new_w = jnp.round(src_w * scale).astype(jnp.int32)
    new_h = jnp.round(src_h * scale).astype(jnp.int32)
    pad_x = (dst_w - new_w).astype(jnp.float32)
    pad_y = (dst_h - new_h).astype(jnp.float32)
    if center:
        pad_x, pad_y = pad_x * 0.5, pad_y * 0.5
    else:
        pad_x, pad_y = jnp.zeros_like(pad_x), jnp.zeros_like(pad_y)
    return LetterboxParams(scale, pad_x, pad_y, new_w, new_h)


def apply_to_boxes(boxes_xyxy: jnp.ndarray, p: LetterboxParams) -> jnp.ndarray:
    """Map source-image xyxy boxes into letterboxed coordinates."""
    sx = jnp.stack([p.scale, p.scale, p.scale, p.scale], axis=-1)
    off = jnp.stack([p.pad_x, p.pad_y, p.pad_x, p.pad_y], axis=-1)
    return boxes_xyxy * sx + off


def invert_boxes(boxes_xyxy: jnp.ndarray, p: LetterboxParams,
                 src_h=None, src_w=None) -> jnp.ndarray:
    """Map letterboxed xyxy boxes back to source-image coordinates,
    optionally clipping to the source bounds (the reference's eval path
    scales dets back through the letterbox inverse, SURVEY.md §3.2)."""
    off = jnp.stack([p.pad_x, p.pad_y, p.pad_x, p.pad_y], axis=-1)
    out = (boxes_xyxy - off) / p.scale
    if src_h is not None:
        x1, y1, x2, y2 = jnp.split(out, 4, axis=-1)
        out = jnp.concatenate([
            jnp.clip(x1, 0.0, src_w), jnp.clip(y1, 0.0, src_h),
            jnp.clip(x2, 0.0, src_w), jnp.clip(y2, 0.0, src_h)], axis=-1)
    return out


def letterbox_image_jax(img: jnp.ndarray, dst_h: int, dst_w: int,
                        pad_value: float = 114.0,
                        ) -> Tuple[jnp.ndarray, LetterboxParams]:
    """On-device letterbox of an HWC image with *static* source shape.

    Uses jax.image bilinear resize then pad — XLA fuses both into the
    downstream normalize. For dynamic source sizes use the host pipeline
    (data/augment.py) which resizes with cv2 before device transfer.
    """
    h, w = img.shape[0], img.shape[1]
    p = letterbox_params(h, w, dst_h, dst_w)
    new_h = int(round(h * min(dst_h / h, dst_w / w)))
    new_w = int(round(w * min(dst_h / h, dst_w / w)))
    resized = jax.image.resize(img, (new_h, new_w, img.shape[2]), "bilinear")
    top = int((dst_h - new_h) // 2)
    left = int((dst_w - new_w) // 2)
    out = jnp.full((dst_h, dst_w, img.shape[2]), pad_value, img.dtype)
    out = jax.lax.dynamic_update_slice(out, resized.astype(img.dtype),
                                       (top, left, 0))
    return out, p
