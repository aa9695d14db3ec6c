"""YOLOv5 label assignment + loss, as one fixed-shape jittable function.

Rebuild targets C14 + C15 (SURVEY.md §2a): the YOLOv5-v6.1 assigner
(shape-ratio anchor match + cross-grid 3-cell positive expansion) and the
CIoU-box / BCE-obj (per-level balance) / BCE-cls loss, plus the reference's
focal-loss ablation knobs ("focalloss(root)" / "focalloss(root_cls)",
README.md:117-118,143-145 — the dev branch's exact formulas are unpublished,
so these are re-derived as: focal modulation applied to BOTH obj+cls
("root") or cls only ("root_cls"); documented per SURVEY.md §7).

TPU-first shape discipline (SURVEY.md §7 "dynamic shapes under jit"): the
reference's torch assigner emits variable-length index lists; here every gt
expands to a FIXED (A anchors × 3 cells) candidate block with a validity
mask, and the obj target map is built with a scatter-max. Duplicate
(cell, anchor) assignments from overlapping gts all contribute to box/cls
loss, matching Ultralytics' duplicate-keeping index lists.

Semantics pinned to Ultralytics v6.1 because the reference reproduces its
mAP through foreign weights (README.md:133-135): decode in grid units,
xy = 2σ−0.5 + cell, wh = (2σ)²·anchor_grid, anchor_t = 4 ratio filter,
neighbor-cell offset g = 0.5, obj target = detached CIoU clamped ≥0,
per-level obj balance (4.0, 1.0, 0.4), loss gains box 0.05 / obj 1.0 /
cls 0.5 scaled by nc/80 and (img/640)².
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from heltondetection_tpu.ops.anchors import YOLOV5_ANCHORS, YOLOV5_STRIDES
from heltondetection_tpu.ops.boxes import bbox_iou


class YoloLossConfig(NamedTuple):
    num_classes: int = 80
    img_size: int = 640
    box_gain: float = 0.05
    obj_gain: float = 1.0
    cls_gain: float = 0.5
    anchor_t: float = 4.0
    balance: Tuple[float, ...] = (4.0, 1.0, 0.4)
    cls_pw: float = 1.0          # BCE positive weight (cls)
    obj_pw: float = 1.0
    label_smoothing: float = 0.0
    focal: str = "none"          # none | root (obj+cls) | root_cls (cls only)
    fl_gamma: float = 1.5
    fl_alpha: float = 0.25
    anchors: Optional[Tuple] = None   # per-level ((w,h)×A)×L pixel anchors;
    # None = YOLOV5_ANCHORS (set from cfg.model.anchors / autoanchor)


def _bce_logits(logits, targets, pos_weight=1.0):
    """Elementwise BCE-with-logits, torch semantics incl. pos_weight."""
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_np)


def _focal_bce(logits, targets, gamma, alpha, pos_weight=1.0):
    """Ultralytics FocalLoss wrapper around BCEWithLogits."""
    loss = _bce_logits(logits, targets, pos_weight)
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_t = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_t * (1.0 - p_t) ** gamma


def build_level_targets(gt_cxcywh: jnp.ndarray, gt_cls: jnp.ndarray,
                        gt_mask: jnp.ndarray, level: int, feat_hw: Tuple[int, int],
                        cfg: YoloLossConfig,
                        anchors=YOLOV5_ANCHORS, strides=YOLOV5_STRIDES):
    """Fixed-shape assignment for one pyramid level.

    Args:
      gt_cxcywh: (B, M, 4) in input pixels. gt_cls: (B, M). gt_mask: (B, M).
    Returns dict of (B, M, A, O=3, ...) candidate targets + valid mask, with
    cell indices clamped in-range (invalid entries masked out of every loss).
    """
    stride = strides[level]
    h, w = feat_hw
    anc = jnp.asarray(anchors[level], jnp.float32) / stride   # (A,2) grid units
    a_n = anc.shape[0]

    gxy = gt_cxcywh[..., 0:2] / stride                        # (B,M,2)
    gwh = gt_cxcywh[..., 2:4] / stride

    # anchor shape-ratio filter: max(w/aw, aw/w, h/ah, ah/h) < anchor_t
    r = gwh[:, :, None, :] / anc[None, None, :, :]            # (B,M,A,2)
    ratio = jnp.maximum(r, 1.0 / jnp.maximum(r, 1e-9)).max(-1)  # (B,M,A)
    m_anchor = (ratio < cfg.anchor_t) & gt_mask[:, :, None]

    gx, gy = gxy[..., 0], gxy[..., 1]                          # (B,M)
    fx, fy = gx % 1.0, gy % 1.0
    cx0, cy0 = jnp.floor(gx), jnp.floor(gy)

    # offset cells (Ultralytics g=0.5): center always; one x-, one y-neighbor
    dx = jnp.where(fx < 0.5, -1.0, 1.0)
    dy = jnp.where(fy < 0.5, -1.0, 1.0)
    x_ok = jnp.where(fx < 0.5, gx > 1.0, gx < (w - 1.0)) & (fx != 0.5)
    y_ok = jnp.where(fy < 0.5, gy > 1.0, gy < (h - 1.0)) & (fy != 0.5)

    # O = 3: [center, x-neighbor, y-neighbor]
    cell_x = jnp.stack([cx0, cx0 + dx, cx0], axis=-1)          # (B,M,3)
    cell_y = jnp.stack([cy0, cy0, cy0 + dy], axis=-1)
    off_ok = jnp.stack([jnp.ones_like(x_ok), x_ok, y_ok], axis=-1)

    valid = m_anchor[:, :, :, None] & off_ok[:, :, None, :]    # (B,M,A,O)
    # clamp for safe gathers; validity already excludes out-of-range
    cell_x = jnp.clip(cell_x, 0, w - 1).astype(jnp.int32)
    cell_y = jnp.clip(cell_y, 0, h - 1).astype(jnp.int32)

    # regression target in grid units, relative to each assigned cell
    txy = gxy[:, :, None, :] - jnp.stack([cell_x, cell_y], -1).astype(jnp.float32)
    # (B,M,O,2); target box per (anchor,offset): same wh for all anchors
    return {
        "cell_x": cell_x, "cell_y": cell_y,                    # (B,M,O)
        "txy": txy,                                            # (B,M,O,2)
        "twh": gwh,                                            # (B,M,2)
        "tcls": gt_cls,                                        # (B,M)
        "valid": valid,                                        # (B,M,A,O)
        "anchors_grid": anc,                                   # (A,2)
    }


def yolo_loss(raw_outputs: Sequence[jnp.ndarray], gt_cxcywh: jnp.ndarray,
              gt_cls: jnp.ndarray, gt_mask: jnp.ndarray,
              cfg: YoloLossConfig,
              anchors=YOLOV5_ANCHORS, strides=YOLOV5_STRIDES
              ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total YOLOv5 loss over all levels. Returns (loss, metrics dict).

    ``raw_outputs``: per-level (B, H, W, A*(5+C)) logits from the head.
    Loss is scaled by batch size like Ultralytics (loss.sum() * bs upstream
    semantics: per-element means, then total * batch_size).
    """
    if cfg.anchors is not None:
        anchors = cfg.anchors
    nc = cfg.num_classes
    nl = len(raw_outputs)
    b = raw_outputs[0].shape[0]
    cp = 1.0 - 0.5 * cfg.label_smoothing
    cn = 0.5 * cfg.label_smoothing

    lbox = jnp.zeros(()); lobj = jnp.zeros(()); lcls = jnp.zeros(())
    for lvl, raw in enumerate(raw_outputs):
        _, h, w, _ = raw.shape
        a_n = len(anchors[lvl])
        p = raw.reshape(b, h, w, a_n, 5 + nc)
        t = build_level_targets(gt_cxcywh, gt_cls, gt_mask, lvl, (h, w), cfg,
                                anchors, strides)
        valid = t["valid"]                                    # (B,M,A,O)
        vf = valid.astype(jnp.float32)
        n_pos = jnp.maximum(vf.sum(), 1.0)

        # gather predictions at assigned (cell, anchor) slots
        bi = jnp.arange(b)[:, None, None, None]               # (B,1,1,1)
        cy = t["cell_y"][:, :, None, :]                       # (B,M,1,O)
        cx = t["cell_x"][:, :, None, :]
        ai = jnp.arange(a_n)[None, None, :, None]             # (1,1,A,1)
        sel = p[bi, cy, cx, ai]                               # (B,M,A,O,5+nc)

        # decode in grid units
        pxy = jax.nn.sigmoid(sel[..., 0:2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(sel[..., 2:4]) * 2.0) ** 2 \
            * t["anchors_grid"][None, None, :, None, :]
        pbox = jnp.concatenate([pxy, pwh], axis=-1)           # (B,M,A,O,4)
        tbox = jnp.concatenate([
            jnp.broadcast_to(t["txy"][:, :, None, :, :], pxy.shape),
            jnp.broadcast_to(t["twh"][:, :, None, None, :], pwh.shape)],
            axis=-1)
        ciou = bbox_iou(pbox, tbox, fmt="cxcywh", kind="ciou")  # (B,M,A,O)
        lbox = lbox + ((1.0 - ciou) * vf).sum() / n_pos

        # objectness target map: scatter-max of detached clamped iou
        iou_d = jnp.clip(jax.lax.stop_gradient(ciou), 0.0) * vf
        tobj = jnp.zeros((b, h, w, a_n))
        bix = jnp.broadcast_to(bi, valid.shape)
        cyx = jnp.broadcast_to(cy, valid.shape)
        cxx = jnp.broadcast_to(cx, valid.shape)
        aix = jnp.broadcast_to(ai, valid.shape)
        tobj = tobj.at[bix, cyx, cxx, aix].max(iou_d)
        obj_logits = p[..., 4]
        if cfg.focal == "root":
            obj_l = _focal_bce(obj_logits, tobj, cfg.fl_gamma, cfg.fl_alpha,
                               cfg.obj_pw)
        else:
            obj_l = _bce_logits(obj_logits, tobj, cfg.obj_pw)
        lobj = lobj + obj_l.mean() * cfg.balance[lvl]

        # classification
        if nc > 1:
            tc = jax.nn.one_hot(t["tcls"], nc) * (cp - cn) + cn  # (B,M,nc)
            tc = jnp.broadcast_to(tc[:, :, None, None, :],
                                  (*valid.shape, nc))
            cls_logits = sel[..., 5:]
            if cfg.focal in ("root", "root_cls"):
                cls_l = _focal_bce(cls_logits, tc, cfg.fl_gamma, cfg.fl_alpha,
                                   cfg.cls_pw)
            else:
                cls_l = _bce_logits(cls_logits, tc, cfg.cls_pw)
            lcls = lcls + (cls_l * vf[..., None]).sum() / (n_pos * nc)

    scale = 3.0 / nl
    lbox = lbox * cfg.box_gain * scale
    lobj = lobj * cfg.obj_gain * scale * (cfg.img_size / 640.0) ** 2
    lcls = lcls * cfg.cls_gain * scale * (nc / 80.0)
    total = (lbox + lobj + lcls) * b
    return total, {"box": lbox, "obj": lobj, "cls": lcls, "total": total}


def yolo_loss_packed(packed_outputs, gt_cxcywh: jnp.ndarray,
                     gt_cls: jnp.ndarray, gt_mask: jnp.ndarray,
                     cfg: YoloLossConfig,
                     anchors=YOLOV5_ANCHORS, strides=YOLOV5_STRIDES
                     ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """:func:`yolo_loss` on packed TRAIN head outputs — identical math.

    ``packed_outputs``: per level ``(pobj (B,HW,A), f2 (B,HW,cin) f32,
    [(ka (cin,CP), ba (CP)) per anchor], (h,w))`` from
    ``YOLOv5(packed_train=True)``, lanes ``[cls₀..cls_{C-1}, tx, ty, tw,
    th, obj, pad]``. The box/cls head matmul is applied AFTER gathering
    the assigned feature rows (selection commutes with a 1×1 conv): one
    cin-wide row gather shared by all anchors + one small GEMM, so both
    the forward candidate maps and their backward gather-VJP scatters
    shrink from (B,HW,·) to the candidate set. The objectness target
    scatter still runs on lane-aligned flat rows, avoiding the whole-map
    (B,H,W,A,5+C) relayout the standard layout forces on TPU.
    """
    if cfg.anchors is not None:
        anchors = cfg.anchors
    nc = cfg.num_classes
    nl = len(packed_outputs)
    b = packed_outputs[0][0].shape[0]
    cp = 1.0 - 0.5 * cfg.label_smoothing
    cn = 0.5 * cfg.label_smoothing

    lbox = jnp.zeros(()); lobj = jnp.zeros(()); lcls = jnp.zeros(())
    for lvl, (pobj, f2, wblocks, (h, w)) in enumerate(packed_outputs):
        a_n = len(anchors[lvl])
        t = build_level_targets(gt_cxcywh, gt_cls, gt_mask, lvl, (h, w), cfg,
                                anchors, strides)
        valid = t["valid"]                                    # (B,M,A,O)
        vf = valid.astype(jnp.float32)
        n_pos = jnp.maximum(vf.sum(), 1.0)
        m = gt_cxcywh.shape[1]
        o_n = t["cell_x"].shape[-1]

        flat = (t["cell_y"] * w + t["cell_x"]).reshape(b, m * o_n)  # (B,MO)
        fsel = jnp.take_along_axis(f2, flat[..., None], axis=1)  # (B,MO,cin)
        kcat = jnp.concatenate([ka for ka, _ in wblocks], axis=1)
        bcat = jnp.concatenate([ba for _, ba in wblocks], axis=0)
        cand = fsel @ kcat + bcat                          # (B, MO, A*CP)
        sel = cand.reshape(b, m, o_n, a_n, -1).transpose(0, 1, 3, 2, 4)
        # sel: (B, M, A, O, CP); lanes [cls..., tx, ty, tw, th, obj, pad]
        pxy = jax.nn.sigmoid(sel[..., nc:nc + 2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(sel[..., nc + 2:nc + 4]) * 2.0) ** 2 \
            * t["anchors_grid"][None, None, :, None, :]
        pbox = jnp.concatenate([pxy, pwh], axis=-1)           # (B,M,A,O,4)
        tbox = jnp.concatenate([
            jnp.broadcast_to(t["txy"][:, :, None, :, :], pxy.shape),
            jnp.broadcast_to(t["twh"][:, :, None, None, :], pwh.shape)],
            axis=-1)
        ciou = bbox_iou(pbox, tbox, fmt="cxcywh", kind="ciou")  # (B,M,A,O)
        lbox = lbox + ((1.0 - ciou) * vf).sum() / n_pos

        # objectness target map on flat (B, HW, A) rows
        iou_d = jnp.clip(jax.lax.stop_gradient(ciou), 0.0) * vf
        bix = jnp.broadcast_to(jnp.arange(b)[:, None, None, None],
                               valid.shape)
        fix = jnp.broadcast_to((t["cell_y"] * w + t["cell_x"])
                               [:, :, None, :], valid.shape)
        aix = jnp.broadcast_to(jnp.arange(a_n)[None, None, :, None],
                               valid.shape)
        tobj = jnp.zeros((b, h * w, a_n)).at[bix, fix, aix].max(iou_d)
        if cfg.focal == "root":
            obj_l = _focal_bce(pobj, tobj, cfg.fl_gamma, cfg.fl_alpha,
                               cfg.obj_pw)
        else:
            obj_l = _bce_logits(pobj, tobj, cfg.obj_pw)
        lobj = lobj + obj_l.mean() * cfg.balance[lvl]

        if nc > 1:
            tc = jax.nn.one_hot(t["tcls"], nc) * (cp - cn) + cn
            tc = jnp.broadcast_to(tc[:, :, None, None, :],
                                  (*valid.shape, nc))
            cls_logits = sel[..., :nc]
            if cfg.focal in ("root", "root_cls"):
                cls_l = _focal_bce(cls_logits, tc, cfg.fl_gamma, cfg.fl_alpha,
                                   cfg.cls_pw)
            else:
                cls_l = _bce_logits(cls_logits, tc, cfg.cls_pw)
            lcls = lcls + (cls_l * vf[..., None]).sum() / (n_pos * nc)

    scale = 3.0 / nl
    lbox = lbox * cfg.box_gain * scale
    lobj = lobj * cfg.obj_gain * scale * (cfg.img_size / 640.0) ** 2
    lcls = lcls * cfg.cls_gain * scale * (nc / 80.0)
    total = (lbox + lobj + lcls) * b
    return total, {"box": lbox, "obj": lobj, "cls": lcls, "total": total}
