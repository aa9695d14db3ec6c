"""Weighted Boxes Fusion — rebuild target C19/N9 (SURVEY.md §2a/2b).

The reference fuses TTA predictions with WBF (README.md:19 "添加了TTA策略, 并基于
WBF(Weighted Boxes Fusion)进行Bboxes融合"), using the ensemble-boxes algorithm
(ZFTurbo) on host. Here it is a fixed-shape jnp formulation so TTA fusion
"never leaves the device" (BASELINE.json): a sequential greedy clustering
over score-sorted candidates (fori_loop over N with O(N) vector work per
step), weighted-averaging member boxes by score, final score = mean member
score scaled by min(n_members, n_views)/n_views.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from heltondetection_tpu.ops.boxes import bbox_iou


def weighted_boxes_fusion(boxes: jnp.ndarray, scores: jnp.ndarray,
                          classes: jnp.ndarray, valid: jnp.ndarray, *,
                          n_views: int, iou_thres: float = 0.55,
                          max_out: int = 300,
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                     jnp.ndarray]:
    """Fuse candidates from all TTA views (already concatenated).

    Args:
      boxes (N,4) xyxy, scores (N,), classes (N,), valid (N,): all views'
      dets stacked; N static.
      n_views: number of TTA views (the T in the score rescale).
    Returns fixed-shape (max_out,) fused (boxes, scores, classes, valid),
    sorted by fused score desc.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -1.0))
    b = boxes[order]
    s = jnp.where(valid[order], scores[order], 0.0)
    c = classes[order]
    v = valid[order]

    # cluster state, one potential cluster slot per candidate
    state = {
        "sum_wb": jnp.zeros((n, 4)),      # Σ score·box
        "sum_w": jnp.zeros((n,)),         # Σ score
        "cnt": jnp.zeros((n,)),
        "cls": jnp.full((n,), -1, jnp.int32),
        "active": jnp.zeros((n,), bool),
    }

    def body(i, st):
        bi, si, ci, vi = b[i], s[i], c[i], v[i]
        fused = st["sum_wb"] / jnp.maximum(st["sum_w"], 1e-9)[:, None]
        iou = bbox_iou(fused, bi[None, :])                  # (n,)
        match = st["active"] & (st["cls"] == ci) & (iou > iou_thres)
        has_match = jnp.any(match)
        # best match = highest IoU among matches
        mi = jnp.argmax(jnp.where(match, iou, -1.0))
        slot = jnp.where(has_match, mi, i)
        w = jnp.where(vi, si, 0.0)
        st = dict(st)
        st["sum_wb"] = st["sum_wb"].at[slot].add(w * bi)
        st["sum_w"] = st["sum_w"].at[slot].add(w)
        st["cnt"] = st["cnt"].at[slot].add(jnp.where(vi, 1.0, 0.0))
        st["cls"] = st["cls"].at[slot].set(
            jnp.where(vi, ci, st["cls"][slot]))
        st["active"] = st["active"].at[slot].set(
            st["active"][slot] | vi)
        return st

    st = jax.lax.fori_loop(0, n, body, state)
    fused_boxes = st["sum_wb"] / jnp.maximum(st["sum_w"], 1e-9)[:, None]
    mean_score = st["sum_w"] / jnp.maximum(st["cnt"], 1.0)
    rescale = jnp.minimum(st["cnt"], float(n_views)) / float(n_views)
    fused_scores = jnp.where(st["active"], mean_score * rescale, 0.0)

    k = min(max_out, n)
    out_s, oi = jax.lax.top_k(fused_scores, k)
    out_v = out_s > 0.0
    out_b = jnp.where(out_v[:, None], fused_boxes[oi], 0.0)
    out_c = jnp.where(out_v, st["cls"][oi], -1)
    if k < max_out:
        pad = max_out - k
        out_b = jnp.pad(out_b, ((0, pad), (0, 0)))
        out_s = jnp.pad(out_s, (0, pad))
        out_c = jnp.pad(out_c, (0, pad), constant_values=-1)
        out_v = jnp.pad(out_v, (0, pad))
    return out_b, out_s, out_c, out_v
