"""Visualization (rebuild target C23): labeled-box rendering plus the
per-FPN-level heatmap / objectness score-map panels visible in the
reference's demo images (demo/1.jpg, demo/2.jpg [D], SURVEY.md §2a C23).
Host-side cv2/numpy.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _color(i: int):
    rng = np.random.default_rng(i * 7919 + 13)
    c = rng.integers(64, 255, 3)
    return int(c[0]), int(c[1]), int(c[2])


def draw_boxes(img: np.ndarray, boxes_xyxy: np.ndarray, scores: np.ndarray,
               classes: np.ndarray, class_names: Optional[Sequence[str]] = None,
               thickness: int = 2) -> np.ndarray:
    """Draw class+score labeled boxes (RGB in, RGB out)."""
    out = img.copy()
    for b, s, c in zip(boxes_xyxy, scores, classes):
        c = int(c)
        x1, y1, x2, y2 = (int(round(v)) for v in b)
        color = _color(c)
        cv2.rectangle(out, (x1, y1), (x2, y2), color, thickness)
        name = class_names[c] if class_names and 0 <= c < len(class_names) \
            else str(c)
        label = f"{name} {float(s):.2f}"
        (tw, th), _ = cv2.getTextSize(label, cv2.FONT_HERSHEY_SIMPLEX,
                                      0.5, 1)
        cv2.rectangle(out, (x1, max(y1 - th - 4, 0)), (x1 + tw + 2, y1),
                      color, -1)
        cv2.putText(out, label, (x1 + 1, y1 - 3), cv2.FONT_HERSHEY_SIMPLEX,
                    0.5, (255, 255, 255), 1, cv2.LINE_AA)
    return out


def _colorize(m: np.ndarray, size) -> np.ndarray:
    m = m - m.min()
    m = m / (m.max() + 1e-9)
    m8 = (m * 255).astype(np.uint8)
    cm = cv2.applyColorMap(m8, cv2.COLORMAP_JET)
    cm = cv2.cvtColor(cm, cv2.COLOR_BGR2RGB)
    return cv2.resize(cm, size, interpolation=cv2.INTER_LINEAR)


def feature_heatmaps(img: np.ndarray, feats: Sequence[np.ndarray],
                     alpha: float = 0.5) -> np.ndarray:
    """Per-level mean-activation heatmaps overlaid on the image, tiled
    horizontally (the 3-scale heatmap panel of demo/1.jpg)."""
    h, w = img.shape[:2]
    panels = []
    for f in feats:
        m = np.abs(np.asarray(f)).mean(axis=-1)     # (H_l, W_l)
        hm = _colorize(m, (w, h))
        panels.append((img * (1 - alpha) + hm * alpha).astype(np.uint8))
    return np.concatenate(panels, axis=1)


def objectness_maps(img: np.ndarray, raw_levels: Sequence[np.ndarray],
                    num_classes: int, num_anchors: int = 3,
                    alpha: float = 0.5, kind: str = "obj") -> np.ndarray:
    """Per-level objectness (or max-class-score) maps from raw YOLO head
    outputs — the score-map panel of demo/2.jpg. raw_levels: (H,W,A*(5+C))."""
    h, w = img.shape[:2]

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    panels = []
    for raw in raw_levels:
        r = np.asarray(raw)
        hh, ww = r.shape[:2]
        r = r.reshape(hh, ww, num_anchors, 5 + num_classes)
        if kind == "obj":
            m = sigmoid(r[..., 4]).max(axis=-1)
        else:
            m = (sigmoid(r[..., 4:5]) * sigmoid(r[..., 5:])).max(axis=(-1, -2))
        hm = _colorize(m, (w, h))
        panels.append((img * (1 - alpha) + hm * alpha).astype(np.uint8))
    return np.concatenate(panels, axis=1)


def rpn_objectness_maps(img: np.ndarray, level_hw: Sequence,
                        obj_concat: np.ndarray, a_per_cell: int = 3,
                        alpha: float = 0.5) -> np.ndarray:
    """Per-level RPN objectness panels for the two-stage family — the
    FasterRCNN counterpart of :func:`objectness_maps` (demo/2.jpg style).
    ``obj_concat``: (N,) RPN logits concatenated level-major (the RPNHead
    output layout, models/faster_rcnn.py); ``level_hw``: [(H_l, W_l), ...].
    """
    h, w = img.shape[:2]
    panels = []
    start = 0
    for hh, ww in level_hw:
        n = hh * ww * a_per_cell
        lv = np.asarray(obj_concat[start:start + n]).reshape(hh, ww,
                                                             a_per_cell)
        start += n
        m = 1.0 / (1.0 + np.exp(-lv.max(axis=-1)))
        hm = _colorize(m, (w, h))
        panels.append((img * (1 - alpha) + hm * alpha).astype(np.uint8))
    return np.concatenate(panels, axis=1)


def rcnn_class_score_maps(img: np.ndarray, level_hw: Sequence,
                          strides: Sequence[int], rois: np.ndarray,
                          probs: np.ndarray, valid: np.ndarray,
                          num_pooled: int = 4, canonical_level: int = 2,
                          canonical_size: float = 224.0,
                          alpha: float = 0.5) -> np.ndarray:
    """Second-stage class-score panels for FasterRCNN ``--mode test`` — the
    two-stage analog of the demo's dense per-level class-score maps
    (demo/1.jpg / demo/2.jpg [D]): a one-stage head scores every cell, but
    the box head only scores proposals, so each proposal's max-class
    softmax score is splatted (elementwise max) over its box footprint on
    the pyramid level the RoI head pooled it from (the torchvision
    MultiScaleRoIAlign level rule — ops/roi_align._roi_levels). Panels for
    un-pooled levels (P6) render empty.

    ``rois``: (R, 4) xyxy in input pixels; ``probs``: (R, nc) foreground
    softmax (or (R,) pre-reduced); ``valid``: (R,) proposal validity.
    """
    h, w = img.shape[:2]
    rois = np.asarray(rois, np.float64).reshape(-1, 4)
    score = np.asarray(probs, np.float64)
    if score.ndim == 2:
        score = score.max(axis=-1)
    score = score * np.asarray(valid, np.float64).reshape(-1)
    bw = np.maximum(rois[:, 2] - rois[:, 0], 0.0)
    bh = np.maximum(rois[:, 3] - rois[:, 1], 0.0)
    lvl = np.clip(np.floor(canonical_level +
                           np.log2(np.sqrt(bw * bh) / canonical_size + 1e-8)),
                  0, num_pooled - 1).astype(np.int64)
    panels = []
    for li, (hh, ww) in enumerate(level_hw):
        m = np.zeros((hh, ww), np.float64)
        if li < num_pooled:
            s = float(strides[li])
            for i in np.nonzero((lvl == li) & (score > 0))[0]:
                x1 = int(np.clip(np.floor(rois[i, 0] / s), 0, ww - 1))
                y1 = int(np.clip(np.floor(rois[i, 1] / s), 0, hh - 1))
                x2 = int(np.clip(np.ceil(rois[i, 2] / s), x1 + 1, ww))
                y2 = int(np.clip(np.ceil(rois[i, 3] / s), y1 + 1, hh))
                reg = m[y1:y2, x1:x2]
                np.maximum(reg, score[i], out=reg)
        hm = _colorize(m, (w, h))
        panels.append((img * (1 - alpha) + hm * alpha).astype(np.uint8))
    return np.concatenate(panels, axis=1)
