"""Fixed-shape class-aware NMS for TPU: jnp reference + Pallas kernel.

Rebuild target N1 (SURVEY.md §2b): the reference calls
``torchvision.ops.nms``/``batched_nms`` (C++/CUDA) from its postprocess (C18)
and RPN (C11). On TPU everything must be static-shape, so the contract here
is: take exactly ``num_boxes`` candidates (score-padded), return a keep mask —
greedy hard-NMS with torchvision-identical suppression semantics (a box is
suppressed iff some higher-scoring *kept* box overlaps it above the IoU
threshold). Class-awareness uses the class-offset trick (shift each class's
boxes to a disjoint coordinate region) exactly like torchvision batched_nms.

Two implementations with identical semantics:

* :func:`nms_mask_jnp` — O(N²) IoU matrix + sequential scan over rows. Pure
  jax.numpy; the correctness oracle and CPU-test path.
* :func:`nms_mask_pallas` — single-program Pallas kernel: IoU matrix is
  computed tile-by-tile on the VPU directly in VMEM and the greedy scan runs
  over rows in-kernel, avoiding the HBM round-trip of the N×N matrix that the
  XLA version materialises.

The public entry :func:`batched_nms` does conf-filter → top-k → NMS → fixed
``max_det`` gather, the whole eval/infer postprocess stage (SURVEY.md §3.2:
"decode boxes → class-aware NMS" on device).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heltondetection_tpu.ops.boxes import box_iou_matrix

_MAX_WH = 8192.0  # class-offset stride; > any supported input size (≤1280²+TTA)


# ---------------------------------------------------------------------------
# greedy keep-mask: jnp reference
# ---------------------------------------------------------------------------

def nms_mask_jnp(boxes: jnp.ndarray, scores: jnp.ndarray,
                 iou_thres: float) -> jnp.ndarray:
    """Greedy NMS keep mask over score-DESC-sorted boxes (N, 4) xyxy.

    Boxes MUST already be sorted by score descending (callers sort once and
    keep the permutation). Padding rows should carry score −inf / zero boxes;
    zero-area boxes never suppress anything (IoU 0) so padding is inert.
    """
    del scores  # order already encodes scores; kept for API symmetry
    n = boxes.shape[0]
    iou = box_iou_matrix(boxes, boxes)
    col = jnp.arange(n)

    def body(i, keep):
        # row i suppresses all later boxes iff box i itself is kept
        sup = (iou[i] > iou_thres) & (col > i) & keep[i]
        return keep & jnp.logical_not(sup)

    keep = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    return keep


def nms_mask_fixpoint(boxes: jnp.ndarray, scores: jnp.ndarray,
                      iou_thres: float) -> jnp.ndarray:
    """Greedy NMS keep mask via fixpoint iteration — EXACT greedy semantics,
    latency-optimal on TPU.

    The sequential scan is f(K)[j] = ¬∃i<j: K[i] ∧ iou(i,j)>thr applied
    left-to-right. Because the (ordered) suppression relation is a DAG,
    iterating K ← f(K) from K=1 converges to the unique greedy fixpoint in
    ≤ suppression-chain-depth steps (typically < 10 for detector outputs),
    and each step is one (N,N)·(N,) masked matvec that XLA maps onto the
    MXU — versus N sequential scalar steps for the scan. Exactness is
    pinned by tests against :func:`nms_mask_jnp` on random data.
    """
    del scores
    n = boxes.shape[0]
    iou = box_iou_matrix(boxes, boxes)
    col = jnp.arange(n)
    sup_mat = ((iou > iou_thres) & (col[None, :] > col[:, None])
               ).astype(jnp.float32)                       # S[i,j]: i sup j

    def cond(carry):
        k_prev, k, it = carry
        return jnp.logical_and(it < n, jnp.any(k_prev != k))

    def body(carry):
        _, k, it = carry
        suppressed = (k @ sup_mat) > 0.5                   # (N,)
        k_new = jnp.where(suppressed, 0.0, 1.0)
        return k, k_new, it + 1

    ones = jnp.ones((n,), jnp.float32)
    _, k, _ = jax.lax.while_loop(cond, body, (jnp.zeros((n,)), ones, 0))
    return k > 0.5


# ---------------------------------------------------------------------------
# greedy keep-mask: Pallas kernel
# ---------------------------------------------------------------------------

def _nms_kernel(boxes_ref, out_ref, iou_buf, *, n: int, iou_thres: float):
    """Single-program kernel: build the N×N IoU matrix in VMEM, then run the
    greedy row scan. N is static and should be a multiple of 128 (lane dim).

    VPU layout: boxes arrive as 4 rows (x1;y1;x2;y2) × N lanes so every
    pairwise op is an (N,N) broadcast on the natural (sublane, lane) tiling.
    """
    x1 = boxes_ref[0, :]
    y1 = boxes_ref[1, :]
    x2 = boxes_ref[2, :]
    y2 = boxes_ref[3, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # (N,)

    # IoU matrix (N, N): rows = suppressor i, cols = candidate j.
    a_x1 = x1[:, None]; a_y1 = y1[:, None]; a_x2 = x2[:, None]; a_y2 = y2[:, None]
    iw = jnp.maximum(jnp.minimum(a_x2, x2[None, :]) -
                     jnp.maximum(a_x1, x1[None, :]), 0.0)
    ih = jnp.maximum(jnp.minimum(a_y2, y2[None, :]) -
                     jnp.maximum(a_y1, y1[None, :]), 0.0)
    inter = iw * ih
    union = area[:, None] + area[None, :] - inter + 1e-7
    iou_buf[:, :] = (inter > iou_thres * union).astype(jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(i, keep):
        # Mosaic can't dynamic-slice a loop-carried value, so the keep bit of
        # row i is extracted with a masked reduce and the IoU row is read
        # from the VMEM scratch ref via pl.ds (both lower cleanly).
        keep_i = jnp.max(jnp.where(col == i, keep, 0.0))
        row = iou_buf[pl.ds(i, 1), :]                     # (1, n)
        sup = (row > 0.5) & (col > i) & (keep_i > 0.5)
        return jnp.where(sup, 0.0, keep)

    keep = jax.lax.fori_loop(0, n, body, jnp.ones((1, n), jnp.float32))
    out_ref[0, :] = keep[0, :]


@functools.partial(jax.jit, static_argnames=("iou_thres",))
def nms_mask_pallas(boxes: jnp.ndarray, scores: jnp.ndarray,
                    iou_thres: float = 0.65) -> jnp.ndarray:
    """Pallas greedy-NMS keep mask; same contract as :func:`nms_mask_jnp`."""
    del scores
    n = boxes.shape[0]
    assert n % 128 == 0, f"NMS size {n} must be a multiple of 128 lanes"
    boxes_t = boxes.T.astype(jnp.float32)  # (4, N): coord-major for the VPU
    out = pl.pallas_call(
        functools.partial(_nms_kernel, n=n, iou_thres=float(iou_thres)),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
    )(boxes_t)
    return out[0] > 0.5


# ---------------------------------------------------------------------------
# fused fixpoint kernel: S-matrix built in VMEM + in-VMEM iteration
# ---------------------------------------------------------------------------

def _nms_fixpoint_kernel(boxes_ref, out_ref, s_buf, *, n: int,
                         iou_thres: float):
    """One image per grid program. Builds the thresholded lower-triangular
    suppression matrix S (i suppresses j, i<j) in VMEM, then iterates
    K ← ¬(K·S) TO CONVERGENCE — entirely on-chip, so the S matrix never
    round-trips to HBM between iterations (the XLA while_loop variant
    re-reads it every pass).

    Exactness: row j only depends on rows <j (S is strictly upper
    triangular), so the fixpoint is unique and equals the sequential
    greedy scan; the while_loop runs until the mask stops changing
    (≤ suppression-chain-depth steps, <10 on detector outputs, worst
    case n). An earlier revision capped this at 32 fixed iterations,
    which silently mis-ranked chains deeper than 32 — tests now pin a
    >32-deep chain against the sequential oracle.
    """
    x1 = boxes_ref[0, 0, :]
    y1 = boxes_ref[0, 1, :]
    x2 = boxes_ref[0, 2, :]
    y2 = boxes_ref[0, 3, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    iw = jnp.maximum(jnp.minimum(x2[:, None], x2[None, :]) -
                     jnp.maximum(x1[:, None], x1[None, :]), 0.0)
    ih = jnp.maximum(jnp.minimum(y2[:, None], y2[None, :]) -
                     jnp.maximum(y1[:, None], y1[None, :]), 0.0)
    inter = iw * ih
    union = area[:, None] + area[None, :] - inter + 1e-7
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    s_buf[:, :] = ((inter > iou_thres * union) & (col > row)
                   ).astype(jnp.float32)

    # init derived from VMEM (a broadcast constant would carry a
    # replicated layout that Mosaic cannot relayout across the loop)
    k0 = s_buf[0:1, :] * 0.0 + 1.0

    def cond(c):
        _, delta, it = c
        return jnp.logical_and(it < n, delta > 0.5)

    def body(c):
        k, _, it = c
        sup = jnp.dot(k, s_buf[:, :],
                      preferred_element_type=jnp.float32)   # (1, n)
        kn = jnp.where(sup > 0.5, 0.0, 1.0)
        return kn, jnp.sum(jnp.abs(kn - k)), it + 1

    keep, _, _ = jax.lax.while_loop(cond, body,
                                    (k0, jnp.asarray(1.0, jnp.float32), 0))
    out_ref[0, 0, :] = keep[0, :]


@functools.partial(jax.jit, static_argnames=("iou_thres",))
def nms_mask_fixpoint_pallas(boxes: jnp.ndarray, iou_thres: float = 0.65
                             ) -> jnp.ndarray:
    """Batched fused fixpoint NMS: boxes (B, N, 4) score-sorted → keep
    (B, N) bool. N must be a multiple of 128. Exact greedy semantics
    (in-kernel convergence loop)."""
    b, n, _ = boxes.shape
    assert n % 128 == 0, f"NMS size {n} must be a multiple of 128 lanes"
    boxes_t = jnp.swapaxes(boxes, 1, 2).astype(jnp.float32)  # (B, 4, N)
    out = pl.pallas_call(
        functools.partial(_nms_fixpoint_kernel, n=n,
                          iou_thres=float(iou_thres)),
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        in_specs=[pl.BlockSpec((1, 4, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
    )(boxes_t)
    return out[:, 0, :] > 0.5


# ---------------------------------------------------------------------------
# public postprocess entry
# ---------------------------------------------------------------------------

def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                classes: jnp.ndarray, *,
                iou_thres: float = 0.65,
                score_thres: float = 0.001,
                pre_nms_topk: int = 1024,
                max_det: int = 300,
                class_aware: bool = True,
                use_pallas: bool = False,
                method: str = "fixpoint",
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full fixed-shape postprocess for ONE image.

    Args:
      boxes: (N, 4) xyxy candidates (N static, e.g. all decoded anchors).
      scores: (N,) confidence (already obj*cls for YOLO).
      classes: (N,) int class ids.

    Returns fixed-shape (max_det,) arrays: boxes (max_det,4), scores, classes,
    valid mask. Invalid rows have score 0. vmap over images for batches.
    """
    score_ok = scores > score_thres
    s = jnp.where(score_ok, scores, -1.0)
    k = min(pre_nms_topk, boxes.shape[0])
    top_s, top_i = jax.lax.top_k(s, k)                     # sorted desc
    top_boxes = boxes[top_i]
    top_cls = classes[top_i]
    valid = top_s > 0.0

    if class_aware:
        off = top_cls.astype(jnp.float32)[:, None] * _MAX_WH
        nms_boxes = top_boxes + off
    else:
        nms_boxes = top_boxes
    # inert padding: collapse invalid rows to zero-area at origin
    nms_boxes = jnp.where(valid[:, None], nms_boxes, 0.0)

    if use_pallas:
        pad = (-k) % 128
        if pad:
            nms_boxes = jnp.pad(nms_boxes, ((0, pad), (0, 0)))
        keep = nms_mask_pallas(nms_boxes, None, iou_thres=iou_thres)[:k]
    elif method == "fixpoint":
        keep = nms_mask_fixpoint(nms_boxes, None, iou_thres)
    else:
        keep = nms_mask_jnp(nms_boxes, None, iou_thres)
    keep = keep & valid

    # gather the top max_det kept rows, preserving score order
    kept_s = jnp.where(keep, top_s, -1.0)
    if k < max_det:  # tiny inputs: fewer candidates than det slots
        pad = max_det - k
        kept_s = jnp.pad(kept_s, (0, pad), constant_values=-1.0)
        top_boxes = jnp.pad(top_boxes, ((0, pad), (0, 0)))
        top_cls = jnp.pad(top_cls, (0, pad), constant_values=-1)
    out_s, oi = jax.lax.top_k(kept_s, max_det)
    out_valid = out_s > 0.0
    out_boxes = jnp.where(out_valid[:, None], top_boxes[oi], 0.0)
    out_cls = jnp.where(out_valid, top_cls[oi], -1)
    out_s = jnp.where(out_valid, out_s, 0.0)
    return out_boxes, out_s, out_cls, out_valid
