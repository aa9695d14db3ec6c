"""Fused YOLO postprocess: select-then-decode candidate pipeline.

Rebuild target C18 + N1 (SURVEY.md §2b) — the serve/eval hot path after the
model forward (SURVEY.md §3.2 "decode boxes → class-aware NMS"). The naive
pipeline (decode ALL anchors → rank → NMS) reads the full (B, N≈25k, 85)
head tensor four-plus times; on a v5e that costs more than the whole
convnet forward. This module restructures it TPU-first:

1. one fused pass over the raw head outputs computes per-anchor best-class
   confidence (lane-dim max over class logits, sigmoid applied after the
   max — sigmoid is monotone so the ranking is identical);
2. top-k (exact, or `approx_max_k` which maps to the TPU's bucketed
   PartialReduce) selects ``topk`` candidate anchors;
3. ONLY those rows are gathered (lane-padded bf16 gather) and decoded —
   the v6.1 grid/anchor decode runs on topk rows instead of N;
4. per-candidate class expansion (top ``max_cls_per_box`` classes via
   iterative max over a (C, K)-transposed layout — sublane reductions,
   no 80-wide sort) + flat re-top-k gives multi-label (box, class) pairs;
5. class-aware greedy NMS via the fused Pallas fixpoint kernel
   (ops/nms.py) on TPU, the XLA fixpoint elsewhere.

Semantics match the unfused path (evaluator.make_postprocess ∘ decode_full)
up to top-k tie order; tests pin det-level agreement on clustered synthetic
predictions.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from heltondetection_tpu.ops.anchors import YOLOV5_ANCHORS, YOLOV5_STRIDES
from heltondetection_tpu.ops.nms import (nms_mask_fixpoint,
                                         nms_mask_fixpoint_pallas)

_MAX_WH = 8192.0  # class-offset stride (same constant as ops/nms.py)


@functools.lru_cache(maxsize=16)
def _flat_decode_tables(img_hw: Tuple[int, int],
                        anchors=YOLOV5_ANCHORS,
                        strides=YOLOV5_STRIDES,
                        order: str = "yxa",
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-flat-anchor constants: grid_xy (N, 2), anchor_wh (N, 2),
    stride (N,). ``order="yxa"`` matches decode_full's (level, y, x, a)
    flattening; ``"ayx"`` matches the packed head's anchor-major
    (level, a, y, x) flattening."""
    gxy, awh, st = [], [], []
    h_in, w_in = img_hw
    for lvl, s in enumerate(strides):
        h, w = h_in // s, w_in // s
        a = np.asarray(anchors[lvl], np.float32)          # (A, 2)
        na = len(a)
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        g = np.stack([xs, ys], -1).astype(np.float32)      # (h, w, 2) x,y
        if order == "yxa":
            gxy.append(np.repeat(g.reshape(-1, 2), na, axis=0))
            awh.append(np.tile(a, (h * w, 1)))
        else:                                              # a-major
            gxy.append(np.tile(g.reshape(-1, 2), (na, 1)))
            awh.append(np.repeat(a, h * w, axis=0))
        st.append(np.full((h * w * na,), s, np.float32))
    return (np.concatenate(gxy), np.concatenate(awh), np.concatenate(st))


def _per_candidate_classes(cls_logits: jnp.ndarray, kc: int
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, K, C) logits → per-row top-kc (values (B,K,kc), ids (B,K,kc)).

    Iterative max over a (B, C, K) transposed layout: kc sublane-axis
    reductions instead of a C-wide per-row sort (lax.top_k over an 80-wide
    minor dim lowers to a padded 128-lane bitonic sort — measurably slower
    on TPU than kc max+mask passes for kc ≤ 4).
    """
    b, k, c = cls_logits.shape
    x = jnp.swapaxes(cls_logits, 1, 2)                     # (B, C, K)
    iota_c = jnp.arange(c, dtype=jnp.int32)[None, :, None]
    vals, ids = [], []
    for _ in range(kc):
        a = jnp.argmax(x, axis=1).astype(jnp.int32)        # (B, K)
        m = jnp.max(x, axis=1)                             # (B, K)
        vals.append(m)
        ids.append(a)
        x = jnp.where(iota_c == a[:, None, :], -jnp.inf, x)
    return jnp.stack(vals, -1), jnp.stack(ids, -1)


def _expand_pairs(boxes: jnp.ndarray, obj: jnp.ndarray,
                  cls_logits: jnp.ndarray, *, num_classes: int, topk: int,
                  conf_thres: float, max_cls_per_box: int, approx: bool
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared tail of the fused select paths: per-candidate class
    expansion (top max_cls_per_box classes) + flat re-top-k over the
    (box, class) pairs. ``obj`` is σ(obj) probability; ``cls_logits`` may
    be any float dtype (ranking only — σ is taken in f32)."""
    b, k1 = obj.shape
    kc = min(max_cls_per_box, num_classes)
    v, ci = _per_candidate_classes(cls_logits, kc)         # (B, k1, kc)
    pair_s = obj[..., None] * jax.nn.sigmoid(v.astype(jnp.float32))
    flat_s = jnp.where(pair_s > conf_thres, pair_s, 0.0).reshape(b, k1 * kc)
    k2 = min(topk, k1 * kc)
    if approx and k1 * kc > 2 * k2:
        top_s, top_i = jax.lax.approx_max_k(flat_s, k2)
    else:
        top_s, top_i = jax.lax.top_k(flat_s, k2)
    bi = top_i // kc
    out_b = jnp.take_along_axis(boxes, bi[..., None], axis=1)
    out_c = jnp.take_along_axis(ci.reshape(b, k1 * kc), top_i, axis=1)
    out_c = jnp.where(top_s > 0.0, out_c, -1).astype(jnp.int32)
    if k2 < topk:
        pad = topk - k2
        out_b = jnp.pad(out_b, ((0, 0), (0, pad), (0, 0)))
        top_s = jnp.pad(top_s, ((0, 0), (0, pad)))
        out_c = jnp.pad(out_c, ((0, 0), (0, pad)), constant_values=-1)
    return out_b, top_s, out_c


def fused_select_decode(raw: Sequence[jnp.ndarray], num_classes: int, *,
                        topk: int = 1024, conf_thres: float = 0.001,
                        max_cls_per_box: int = 4, approx: bool = False,
                        anchors=YOLOV5_ANCHORS, strides=YOLOV5_STRIDES,
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Raw head outputs → top-k multi-label candidates, decoded.

    Args:
      raw: per-level (B, H, W, A*(5+C)) head tensors (decode_full's input).
    Returns:
      boxes (B, topk, 4) xyxy pixels f32, scores (B, topk) f32 DESC-sorted,
      classes (B, topk) int32 (−1 on sub-threshold padding rows).
    """
    c = num_classes
    b = raw[0].shape[0]
    img_hw = (raw[0].shape[1] * strides[0], raw[0].shape[2] * strides[0])

    # pass 1: per-anchor best-class confidence, fused per level
    best_parts, flat_parts = [], []
    for lvl, p in enumerate(raw):
        _, h, w, _ = p.shape
        na = len(anchors[lvl])
        p5 = p.reshape(b, h * w * na, 5 + c)
        m = jnp.max(p5[..., 5:], axis=-1)                  # (B, HWA) logits
        best_parts.append(jax.nn.sigmoid(p5[..., 4].astype(jnp.float32)) *
                          jax.nn.sigmoid(m.astype(jnp.float32)))
        flat_parts.append(p5.astype(jnp.bfloat16))
    best = jnp.concatenate(best_parts, axis=1)             # (B, N)
    flat = jnp.concatenate(flat_parts, axis=1)             # (B, N, 5+C) bf16
    # lane-pad the gather payload to a multiple of 128
    pad_c = (-(5 + c)) % 128
    if pad_c:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad_c)))

    # pass 2: top-k anchors by best-class confidence
    n = best.shape[1]
    k1 = min(topk, n)
    if approx and n > 2 * k1:
        _, box_i = jax.lax.approx_max_k(best, k1)
    else:
        _, box_i = jax.lax.top_k(best, k1)

    # pass 3: gather + decode only the selected rows
    rows = jnp.take_along_axis(flat, box_i[..., None], axis=1)
    rows = rows[..., :5 + c].astype(jnp.float32)           # (B, k1, 5+C)
    gxy, awh, st = (jnp.asarray(t) for t in _flat_decode_tables(
        img_hw, anchors, strides))
    g = gxy[box_i]                                         # (B, k1, 2)
    aw = awh[box_i]
    s_ = st[box_i][..., None]
    xy = (jax.nn.sigmoid(rows[..., 0:2]) * 2.0 - 0.5 + g) * s_
    wh = (jax.nn.sigmoid(rows[..., 2:4]) * 2.0) ** 2 * aw
    boxes = jnp.concatenate([xy - wh * 0.5, xy + wh * 0.5], -1)

    # pass 4: multi-label class expansion + flat re-top-k over pairs
    obj = jax.nn.sigmoid(rows[..., 4])                     # (B, k1)
    return _expand_pairs(boxes, obj, rows[..., 5:], num_classes=c,
                         topk=topk, conf_thres=conf_thres,
                         max_cls_per_box=max_cls_per_box, approx=approx)


def fused_select_decode_packed(packed: Sequence[Tuple[jnp.ndarray,
                                                      jnp.ndarray]],
                               num_classes: int, *, topk: int = 1024,
                               conf_thres: float = 0.001,
                               max_cls_per_box: int = 4,
                               approx: bool = False,
                               anchors=YOLOV5_ANCHORS,
                               strides=YOLOV5_STRIDES,
                               ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                          jnp.ndarray]:
    """Packed-head variant of :func:`fused_select_decode`.

    ``packed``: per level ``(pobj (B, A·HW) f32, [pcand_a (B, HW, CP)
    bf16 per anchor], (h, w))`` from ``YOLOv5(packed_head=True)``, flat
    in anchor-major (a, y, x) row order. Stage-1 candidates are
    ranked by σ(obj) alone — Ultralytics v6.1's own candidate pre-filter
    is objectness-thresholded (`prediction[..., 4] > conf_thres`), so this
    is the faithful semantics AND it avoids any reduction over the big
    class tensor. The top-k VALUES are the f32 obj confidences (no second
    gather), and the per-candidate class/box logits come from ONE
    lane-aligned bf16 gather of the packed CP-wide rows.
    """
    from heltondetection_tpu.models.yolov5 import packed_cls_width
    c = num_classes
    cp = packed_cls_width(c)
    b = packed[0][0].shape[0]
    h0, w0 = packed[0][2]
    img_hw = (h0 * strides[0], w0 * strides[0])

    # per-level (pobj (B, A·HW) f32, [pcand_a (B, HW, CP) bf16], (h, w)),
    # anchor-major (a, y, x) row order (models/yolov5.py packed head).
    # The flat candidate tensor is assembled with chained in-place
    # dynamic_update_slices into a fresh buffer — a jnp.concatenate here
    # costs an extra full read+write (~2.7 ms at B=128, 640²)
    obj_logit = jnp.concatenate([p[0] for p in packed], axis=1)   # (B, N)
    n = obj_logit.shape[1]
    cand_flat = jnp.zeros((b, n, cp), jnp.bfloat16)
    off = 0
    for _, pcands, _hw in packed:
        for pc in pcands:
            cand_flat = jax.lax.dynamic_update_slice(cand_flat, pc,
                                                     (0, off, 0))
            off += pc.shape[1]

    k1 = min(topk, n)
    if approx and n > 2 * k1:
        obj_l, box_i = jax.lax.approx_max_k(obj_logit, k1)
    else:
        obj_l, box_i = jax.lax.top_k(obj_logit, k1)
    obj = jax.nn.sigmoid(obj_l)                            # (B, k1) f32

    rows = jnp.take_along_axis(cand_flat, box_i[..., None], axis=1)
    box_rows = rows[..., c:c + 4].astype(jnp.float32)      # (B, k1, 4)
    gxy, awh, st = (jnp.asarray(t) for t in _flat_decode_tables(
        img_hw, anchors, strides, order="ayx"))
    g = gxy[box_i]
    aw = awh[box_i]
    s_ = st[box_i][..., None]
    xy = (jax.nn.sigmoid(box_rows[..., 0:2]) * 2.0 - 0.5 + g) * s_
    wh = (jax.nn.sigmoid(box_rows[..., 2:4]) * 2.0) ** 2 * aw
    boxes = jnp.concatenate([xy - wh * 0.5, xy + wh * 0.5], -1)

    # mask box/pad lanes out of the class top-k; the expansion scans run
    # in bf16 (ranking only — σ of the selected logits is taken in f32)
    lane = jnp.arange(cp)[None, None, :]
    cls_rows = jnp.where(lane < c, rows, jnp.asarray(-1e4, rows.dtype))
    return _expand_pairs(boxes, obj, cls_rows, num_classes=c, topk=topk,
                         conf_thres=conf_thres,
                         max_cls_per_box=max_cls_per_box, approx=approx)


def nms_sorted_candidates(boxes: jnp.ndarray, scores: jnp.ndarray,
                          classes: jnp.ndarray, *, iou_thres: float = 0.65,
                          max_det: int | None = 300,
                          class_aware: bool = True, use_pallas: bool = True,
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                     jnp.ndarray]:
    """Batched class-aware NMS on score-DESC-sorted candidates.

    boxes (B, K, 4), scores (B, K), classes (B, K) → fixed (B, max_det)
    dets (boxes, scores, classes, valid). K must be a multiple of 128 for
    the Pallas path. ``max_det=None`` skips the final compacting top-k
    (a ~3 ms sort at B=128): the (B, K) rows come back in candidate
    order with suppressed/invalid rows masked out — the evaluator only
    reads masked rows, so the sort buys nothing on the eval path.
    """
    b, k, _ = boxes.shape
    valid = scores > 0.0
    if class_aware:
        nb = boxes + classes.astype(jnp.float32)[..., None] * _MAX_WH
    else:
        nb = boxes
    nb = jnp.where(valid[..., None], nb, 0.0)              # inert padding
    if use_pallas and k % 128 == 0:
        keep = nms_mask_fixpoint_pallas(nb, iou_thres=iou_thres)
    else:
        keep = jax.vmap(lambda bx: nms_mask_fixpoint(bx, None, iou_thres))(nb)
    if max_det is None:
        out_valid = keep & valid
        out_s = jnp.where(out_valid, scores, 0.0)
        out_b = jnp.where(out_valid[..., None], boxes, 0.0)
        out_c = jnp.where(out_valid, classes, -1)
        return out_b, out_s, out_c, out_valid
    kept_s = jnp.where(keep & valid, scores, -1.0)
    md = min(max_det, k)
    out_s, oi = jax.lax.top_k(kept_s, md)
    out_valid = out_s > 0.0
    out_b = jnp.where(out_valid[..., None],
                      jnp.take_along_axis(boxes, oi[..., None], axis=1), 0.0)
    out_c = jnp.where(out_valid,
                      jnp.take_along_axis(classes, oi, axis=1), -1)
    out_s = jnp.where(out_valid, out_s, 0.0)
    if md < max_det:
        pad = max_det - md
        out_b = jnp.pad(out_b, ((0, 0), (0, pad), (0, 0)))
        out_s = jnp.pad(out_s, ((0, 0), (0, pad)))
        out_c = jnp.pad(out_c, ((0, 0), (0, pad)), constant_values=-1)
        out_valid = jnp.pad(out_valid, ((0, 0), (0, pad)))
    return out_b, out_s, out_c, out_valid


def make_fused_postprocess(num_classes: int, *, conf_thres: float = 0.001,
                           iou_thres: float = 0.65, pre_nms_topk: int = 1024,
                           max_det: int | None = 300,
                           max_cls_per_box: int = 4,
                           approx: bool = False, class_aware: bool = True,
                           use_pallas: bool | None = None,
                           anchors=YOLOV5_ANCHORS,
                           strides=YOLOV5_STRIDES):
    """Build the jittable fused batch postprocess over RAW head outputs:
    (per-level (B,H,W,A*(5+C)) tensors) → dets (B, max_det, …).

    ``use_pallas=None`` auto-selects the Pallas NMS kernel on TPU backends
    and the XLA fixpoint elsewhere (CPU tests, CPU meshes). ``approx``
    swaps the exact top-k stages for ``lax.approx_max_k`` — measured 2×
    SLOWER end-to-end on v5e via the axon stack (70.2 vs 35.5 ms/batch at
    b128; the PartialReduce lowering loses badly to the exact sort here),
    so leave it OFF; the knob remains for backends where PartialReduce is
    fast.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    def post(raw):
        packed = isinstance(raw[0], (tuple, list))
        select = fused_select_decode_packed if packed else fused_select_decode
        cb, cs, cc = select(
            raw, num_classes, topk=pre_nms_topk, conf_thres=conf_thres,
            max_cls_per_box=max_cls_per_box, approx=approx,
            anchors=anchors, strides=strides)
        return nms_sorted_candidates(cb, cs, cc, iou_thres=iou_thres,
                                     max_det=max_det, class_aware=class_aware,
                                     use_pallas=use_pallas)

    return post
