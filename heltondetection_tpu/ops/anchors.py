"""Anchor generation for dense (YOLOv5) and two-stage (RPN) heads.

Rebuild target: part of C10/C11/C17 (SURVEY.md §2a). All generators return
static-shape arrays for fixed input sizes so everything downstream stays
jittable; grids are built with broadcasted_iota-friendly jnp ops (TPU needs
≥2-D iota).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp

# YOLOv5 v6.1 anchors in input pixels, per level (strides 8/16/32); the
# reference reproduces Ultralytics numbers (README.md:133-135) which pins
# this anchor set (SURVEY.md C10).
YOLOV5_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),      # P3 / stride 8
    ((30, 61), (62, 45), (59, 119)),     # P4 / stride 16
    ((116, 90), (156, 198), (373, 326)), # P5 / stride 32
)
YOLOV5_STRIDES = (8, 16, 32)


def normalize_anchors(anchors) -> Tuple[Tuple[Tuple[float, float], ...], ...]:
    """Config/user anchors (lists, np arrays, tuples) → the canonical
    nested-tuple form. Hashability matters: the fused decode's constant
    tables are lru_cached on the anchor values (ops/postprocess.py)."""
    out = tuple(tuple((float(w), float(h)) for w, h in level)
                for level in anchors)
    for level in out:
        if len(level) != len(out[0]):
            raise ValueError(f"ragged anchors per level: {out}")
    return out


def yolo_grid(h: int, w: int) -> jnp.ndarray:
    """(h, w, 2) grid of cell indices (x, y) — the per-cell offsets added to
    the sigmoid-decoded xy (SURVEY.md §3.4 decode)."""
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    gx = jnp.broadcast_to(xs, (h, w))
    gy = jnp.broadcast_to(ys, (h, w))
    return jnp.stack([gx, gy], axis=-1)


def yolo_level_anchors(level: int,
                       anchors=YOLOV5_ANCHORS) -> jnp.ndarray:
    """(A, 2) anchor (w, h) in pixels for a pyramid level."""
    return jnp.asarray(anchors[level], jnp.float32)


# ---------------------------------------------------------------------------
# RPN anchors (FasterRCNN) — torchvision AnchorGenerator semantics
# ---------------------------------------------------------------------------

def rpn_cell_anchors(sizes: Sequence[float],
                     ratios: Sequence[float]) -> np.ndarray:
    """Zero-centered xyxy anchors for one level: len(sizes)*len(ratios) x 4.

    torchvision convention: h = size*sqrt(ratio), w = size/sqrt(ratio).
    """
    out = []
    for s in sizes:
        for r in ratios:
            h = s * np.sqrt(r)
            w = s / np.sqrt(r)
            out.append([-w / 2, -h / 2, w / 2, h / 2])
    return np.asarray(out, np.float32)


def rpn_level_anchors(feat_h: int, feat_w: int, stride: int,
                      sizes: Sequence[float],
                      ratios: Sequence[float] = (0.5, 1.0, 2.0)) -> np.ndarray:
    """All anchors for one FPN level: (feat_h*feat_w*A, 4) xyxy in input px.

    Anchor centers sit at (x*stride, y*stride) like torchvision (no +0.5
    offset), so ported FasterRCNN weights decode identically. Returns
    NUMPY so results can be cached across jit traces (a jnp build inside a
    trace would leak tracers through caches).
    """
    cell = rpn_cell_anchors(sizes, ratios)            # (A, 4)
    xs = np.arange(feat_w, dtype=np.float32) * stride
    ys = np.arange(feat_h, dtype=np.float32) * stride
    cx, cy = np.meshgrid(xs, ys)                      # (H, W)
    shifts = np.stack([cx, cy, cx, cy], axis=-1).reshape(-1, 1, 4)
    return (shifts + cell[None]).reshape(-1, 4).astype(np.float32)


def rpn_pyramid_anchors(img_size: int,
                        strides: Sequence[int] = (4, 8, 16, 32, 64),
                        base_sizes: Sequence[float] = (32, 64, 128, 256, 512),
                        ratios: Sequence[float] = (0.5, 1.0, 2.0),
                        ) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    """Concatenated anchors over an FPN pyramid for a square input.

    Returns (anchors (N,4), per-level counts). One size per level ×
    3 ratios = 3 anchors/cell (torchvision FPN default; reference C11).
    """
    per_level = []
    counts = []
    for stride, size in zip(strides, base_sizes):
        fh = fw = img_size // stride
        a = rpn_level_anchors(fh, fw, stride, (size,), ratios)
        per_level.append(a)
        counts.append(a.shape[0])
    return jnp.concatenate(per_level, axis=0), tuple(counts)
