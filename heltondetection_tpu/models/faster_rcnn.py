"""FasterRCNN: backbone ⊕ FPN/PAFPNv8 ⊕ RPN ⊕ RoIAlign ⊕ RCNN head.

Rebuild targets C11/C12/C13 + the two-stage stack of SURVEY.md §3.5:

    imgs → backbone (ResNet50 default; registry-swappable) → C2..C5
    → FPN(+P6) / PAFPNv8 → P2..P6
    → RPN: per-level objectness+deltas → decode → level-aware NMS → top-k
    → MultiScale RoIAlign (or RoIPool ablation) → RCNN head (coupled or
      Decoupled/YOLOX-style, README.md:75-76 +1.1 mAP) → cls + per-class
      deltas → decode → class-aware NMS

Everything fixed-shape under jit (SURVEY.md §7 "two-stage FasterRCNN under
jit" is called out as the hardest part): proposal counts, sampled-rows
counts, and det counts are static with validity masks; the random pos/neg
proposal subsampling is a branch-free top-k over randomized priorities with
dynamic *quotas* but static shapes.

Semantics follow torchvision's FasterRCNN defaults (the reference lineage:
bubbliiiing/faster-rcnn-pytorch + mmdet, SURVEY.md §0): RPN fg/bg IoU
0.7/0.3, batch 256 @ 0.5 pos; box head fg 0.5, batch 512 @ 0.25 pos; coder
weights RPN (1,1,1,1), RCNN (10,10,5,5); smooth-L1 beta=1/9.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from heltondetection_tpu.models.necks import FPN, PAFPNv8
from heltondetection_tpu.ops.anchors import rpn_level_anchors
from heltondetection_tpu.ops.boxes import (box_iou_matrix, clip_boxes,
                                           decode_deltas, encode_deltas)
from heltondetection_tpu.ops.nms import batched_nms
from heltondetection_tpu.ops.roi_align import multilevel_roi_align


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------

class RCNNConfig(NamedTuple):
    num_classes: int = 80               # foreground classes (bg is extra)
    img_size: int = 832                 # reference default (README.md:69)
    neck: str = "fpn"                   # fpn | pafpn_v8
    head: str = "coupled"               # coupled | decoupled
    roi_method: str = "align"           # align | pool (README.md:73 ablation)
    # RPN
    rpn_pre_nms_topk: int = 1000        # per level
    rpn_post_nms_topk: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_fg_iou: float = 0.7
    rpn_bg_iou: float = 0.3
    rpn_batch: int = 256
    rpn_pos_frac: float = 0.5
    # box head
    box_fg_iou: float = 0.5
    box_batch: int = 512
    box_pos_frac: float = 0.25
    # inference
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    max_det: int = 100
    max_gt: int = 64
    backbone: str = "resnet50"  # models/backbones.py registry name
    # (swappable backbones README.md:8-9; timm swap demo README.md:120)
    dropblock_p: float = 0.0   # DropBlock on pooled head features
    # (reference DDP_dropBlock0.5 ablation, README.md:97)
    roi_levels: int = 4        # pyramid levels the box head pools from;
    # 1 = the reference's "P2" variants (head uses only P2, README.md:65)
    backbone_norm_eval: bool = True   # FrozenBN during training — the
    # torchvision FasterRCNN (FrozenBatchNorm2d) / mmdet (norm_eval=True)
    # default for pretrained-backbone fine-tuning. False = full SyncBN
    # training (for from-scratch runs).
    backbone_frozen_stages: int = 1   # stem+layer1 stop-gradient —
    # torchvision trainable_backbone_layers=3 / mmdet frozen_stages=1
    # default. 0 trains the whole backbone.
    remat: bool = False        # checkpoint the backbone blocks (see
    # models/resnet.py): ~1/3 extra backbone FLOPs for O(block-boundary)
    # activation memory — for HBM-bound high-resolution training


STRIDES = (4, 8, 16, 32, 64)            # P2..P6
ANCHOR_SIZES = (32, 64, 128, 256, 512)
RATIOS = (0.5, 1.0, 2.0)
A_PER_CELL = len(RATIOS)


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------

class RPNHead(nn.Module):
    """Shared 3x3 conv + objectness/delta 1x1 convs over every level."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        conv = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                       name="conv")
        # predictor 1x1s run in the compute dtype too (params stay f32):
        # an f32 cast of the full hidden maps costs a (B,HW,256) f32
        # materialization per level; outputs are cast to f32 for the
        # decode/loss math instead
        cls = nn.Conv(A_PER_CELL, (1, 1), dtype=self.dtype, name="cls")
        reg = nn.Conv(A_PER_CELL * 4, (1, 1), dtype=self.dtype, name="reg")
        logits, deltas = [], []
        for f in feats:
            t = nn.relu(conv(f))
            b = t.shape[0]
            logits.append(cls(t).astype(jnp.float32).reshape(b, -1))
            deltas.append(reg(t).astype(jnp.float32).reshape(b, -1, 4))
        return jnp.concatenate(logits, 1), jnp.concatenate(deltas, 1)


class CoupledBoxHead(nn.Module):
    """torchvision TwoMLPHead + predictor: flatten → fc1024 → fc1024 →
    (cls nc+1, per-class deltas)."""
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (R, 7, 7, C)
        r = x.shape[0]
        x = x.reshape(r, -1).astype(self.dtype)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc2")(x))
        x = x.astype(jnp.float32)
        scores = nn.Dense(self.num_classes + 1, name="cls")(x)
        deltas = nn.Dense(self.num_classes * 4, name="reg")(x)
        return scores, deltas.reshape(r, self.num_classes, 4)


class DecoupledBoxHead(nn.Module):
    """Reference's DecoupledHead (README.md:75-76, +1.1 mAP): separate
    YOLOX-style conv branches for cls and reg before the predictors."""
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (R, 7, 7, C)
        r = x.shape[0]
        dt = self.dtype
        xc = x.astype(dt)
        for i in range(2):
            xc = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=dt,
                                 name=f"cls_conv{i}")(xc))
        xr = x.astype(dt)
        for i in range(2):
            xr = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=dt,
                                 name=f"reg_conv{i}")(xr))
        xc = xc.reshape(r, -1).astype(jnp.float32)
        xr = xr.reshape(r, -1).astype(jnp.float32)
        xc = nn.relu(nn.Dense(1024, name="cls_fc")(xc))
        xr = nn.relu(nn.Dense(1024, name="reg_fc")(xr))
        scores = nn.Dense(self.num_classes + 1, name="cls")(xc)
        deltas = nn.Dense(self.num_classes * 4, name="reg")(xr)
        return scores, deltas.reshape(r, self.num_classes, 4)


class FasterRCNN(nn.Module):
    cfg: RCNNConfig
    dtype: Any = jnp.float32

    def setup(self):
        from heltondetection_tpu.models.backbones import build_backbone
        # flax setup() derives the submodule name from the attribute
        self.backbone = build_backbone(
            self.cfg.backbone, dtype=self.dtype, module_name=None,
            norm_eval=self.cfg.backbone_norm_eval,
            frozen_stages=self.cfg.backbone_frozen_stages,
            remat=self.cfg.remat)
        if self.cfg.neck == "fpn":
            self.neck = FPN(256, dtype=self.dtype, extra_pool=True,
                            name="neck")
        else:
            self.neck = PAFPNv8(256, dtype=self.dtype, extra_pool=True,
                                name="neck")
        self.rpn = RPNHead(dtype=self.dtype, name="rpn")
        head_cls = (CoupledBoxHead if self.cfg.head == "coupled"
                    else DecoupledBoxHead)
        self.box_head = head_cls(self.cfg.num_classes, dtype=self.dtype,
                                 name="box_head")

    def features(self, images, train: bool = False):
        feats = self.backbone(images, train)[-4:]   # C2..C5
        return self.neck(feats, train)      # P2..P6 list

    def __call__(self, images, train: bool = False,
                 with_head_init: bool = False):
        """Feature + RPN pass; full pipelines live in the pure functions
        below so proposal logic stays jit-composable. ``with_head_init``
        additionally traces the box head on dummy rois so ``model.init``
        creates its params (use :func:`init_faster_rcnn`)."""
        pyr = self.features(images, train)
        obj, deltas = self.rpn(pyr)
        if with_head_init:
            dummy = jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 4)
            self.run_box_head([p[0] for p in pyr], dummy)
        return pyr, obj, deltas

    def run_box_head(self, pyr, rois, train: bool = False):
        """Pooled features → head outputs.

        Accepts either ONE image ((H,W,C) pyr entries + (R,4) rois) or a
        batch ((B,H,W,C) + (B,R,4)); batching the head keeps the box-head
        matmuls one big (B·R, ...) GEMM. P6 is excluded from pooling like
        torchvision MultiScaleRoIAlign (featmap_names P2..P5 only).
        """
        nl = self.cfg.roi_levels
        batched = rois.ndim == 3
        if batched:
            b, r = rois.shape[:2]
            crops = jax.vmap(lambda ps, rs: multilevel_roi_align(
                list(ps[:nl]), rs, STRIDES[:nl], out_size=7,
                method=self.cfg.roi_method))([p for p in pyr], rois)
            crops = crops.reshape(b * r, *crops.shape[2:])
        else:
            crops = multilevel_roi_align(list(pyr[:nl]), rois, STRIDES[:nl],
                                         out_size=7,
                                         method=self.cfg.roi_method)
        if self.cfg.dropblock_p > 0:
            from heltondetection_tpu.models.dropblock import DropBlock
            crops = DropBlock(self.cfg.dropblock_p, block_size=3,
                              name="head_dropblock")(
                crops, deterministic=not train)
        scores, deltas = self.box_head(crops)
        if batched:
            scores = scores.reshape(b, r, *scores.shape[1:])
            deltas = deltas.reshape(b, r, *deltas.shape[1:])
        return scores, deltas


def init_faster_rcnn(model: FasterRCNN, rng, img_size: int,
                     batch_size: int = 1):
    """Init ALL params (incl. box head) with a dummy forward (jitted —
    eager init pays per-op dispatch latency through the device tunnel)."""
    x = jnp.zeros((batch_size, img_size, img_size, 3), jnp.float32)
    return jax.jit(functools.partial(model.init, train=False,
                                     with_head_init=True))(rng, x)


# ---------------------------------------------------------------------------
# anchors / proposals (pure functions)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def pyramid_anchors(img_size: int):
    """NOTE: returns NUMPY (cached across jit traces — caching jnp arrays
    would leak tracers when first called inside a trace)."""
    import numpy as np
    per, counts = [], []
    for stride, size in zip(STRIDES, ANCHOR_SIZES):
        fh = fw = img_size // stride
        a = np.asarray(rpn_level_anchors(fh, fw, stride, (size,), RATIOS))
        per.append(a)
        counts.append(a.shape[0])
    return np.concatenate(per, 0), tuple(counts)


def generate_proposals(obj_logits: jnp.ndarray, deltas: jnp.ndarray,
                       anchors: jnp.ndarray, level_counts: Tuple[int, ...],
                       img_size: int, cfg: RCNNConfig,
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-image proposal generation (vmap over batch).

    obj_logits (N,), deltas (N,4) over ALL levels concatenated. Returns
    (proposals (P,4), scores (P,), valid (P,)) with P = rpn_post_nms_topk.
    torchvision semantics: top-k per level pre-NMS, joint NMS with
    level-offset (NMS never crosses levels), joint top-k post-NMS.
    """
    anchors = jnp.asarray(anchors)
    # NMS never crosses levels (torchvision batched_nms with level ids), so
    # run it PER LEVEL instead of jointly with level offsets: identical keep
    # sets, but 4 S-matrices of k² instead of one of (4k)² — 4× less
    # fixpoint-NMS work (the RPN NMS was ~12 ms of the 91 ms 832² b8 batch).
    # Survivors ranked past rpn_post_nms_topk within their own level can
    # never make the joint top-k, so each level is capped there too.
    # (r5 rejected design: vmap-batching the equal-k per-level NMS into
    # one (4, k, k) fixpoint measured a WASH — 7.9 vs 7.3 ms for the
    # whole proposals slice, within run noise; the sequential loop stays
    # for simplicity. See PERF_NOTES "RPN stage attack".)
    boxes_all, scores_all = [], []
    start = 0
    for lvl, cnt in enumerate(level_counts):
        sl = slice(start, start + cnt)
        start += cnt
        k = min(cfg.rpn_pre_nms_topk, cnt)
        s, i = jax.lax.top_k(obj_logits[sl], k)
        b = decode_deltas(anchors[sl][i], deltas[sl][i])
        b = clip_boxes(b, img_size, img_size)
        # drop degenerate boxes (torchvision min_size=1e-3)
        ok = ((b[:, 2] - b[:, 0]) > 1e-3) & ((b[:, 3] - b[:, 1]) > 1e-3)
        s = jnp.where(ok, jax.nn.sigmoid(s), 0.0)
        lb, ls, _, lv = batched_nms(b, s, jnp.zeros((k,), jnp.int32),
                                    iou_thres=cfg.rpn_nms_thresh,
                                    score_thres=0.0,
                                    pre_nms_topk=k,
                                    max_det=min(k, cfg.rpn_post_nms_topk),
                                    class_aware=False)
        boxes_all.append(lb)
        scores_all.append(ls)
    boxes = jnp.concatenate(boxes_all, 0)
    scores = jnp.concatenate(scores_all, 0)
    k = min(cfg.rpn_post_nms_topk, scores.shape[0])
    ps, oi = jax.lax.top_k(scores, k)                      # joint top-k
    pb = boxes[oi]
    if k < cfg.rpn_post_nms_topk:   # tiny configs: fewer candidates than P
        pad = cfg.rpn_post_nms_topk - k
        pb = jnp.pad(pb, ((0, pad), (0, 0)))
        ps = jnp.pad(ps, (0, pad))
    pv = ps > 0.0
    return pb, ps, pv


# ---------------------------------------------------------------------------
# training-time assignment + sampling (pure functions, per image)
# ---------------------------------------------------------------------------

def _top_quota_mask(pri: jnp.ndarray, mask: jnp.ndarray, quota,
                    max_quota: int) -> jnp.ndarray:
    """Select the ``quota`` highest-priority entries of ``mask`` (quota may
    be a dynamic scalar ≤ max_quota) WITHOUT materializing full ranks: the
    quota-th top value is the selection threshold. Priorities are iid
    uniforms; f32 uniforms CAN collide (~2⁻²⁴ per pair), in which case
    ``pri >= thr`` selects quota+1 rows on a tie — benign here, because
    every caller feeds the mask into a final fixed-(batch,) top_k gather
    that absorbs the extra row. The win: a (k)-top-k replaces the full
    argsort + (n)-scatter rank materialization (~16 ms/step of the RCNN
    832² b8 train step across the vmapped RPN sampling)."""
    if max_quota <= 0:  # e.g. pos_frac = 0: statically select nothing
        return jnp.zeros_like(mask)
    kth = jax.lax.top_k(pri, max_quota)[0][
        jnp.clip(quota - 1, 0, max_quota - 1)]
    thr = jnp.where(quota > 0, kth, jnp.inf)
    return mask & (pri >= thr)


def _sample_balanced(fg: jnp.ndarray, bg: jnp.ndarray, batch: int,
                     pos_frac: float, rng: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random subsample with a fg quota: returns (idx (batch,), is_fg,
    valid). Fixed shapes; quotas are dynamic scalars.

    Matches torchvision BalancedPositiveNegativeSampler semantics: up to
    batch*pos_frac random fg, remainder random bg.
    """
    n = fg.shape[0]
    batch = min(batch, n)
    kf, kb, kg = jax.random.split(rng, 3)
    fg_pri = jnp.where(fg, jax.random.uniform(kf, (n,)), -1.0)
    bg_pri = jnp.where(bg, jax.random.uniform(kb, (n,)), -1.0)
    max_fg = int(batch * pos_frac)
    sel_fg = _top_quota_mask(fg_pri, fg, jnp.asarray(max_fg), max_fg)
    n_fg = jnp.sum(sel_fg)
    bg_quota = batch - n_fg
    sel_bg = _top_quota_mask(bg_pri, bg, bg_quota, batch)
    # gather the selected rows into a fixed (batch,) index set
    pri = sel_fg * 2.0 + sel_bg * 1.0 + jax.random.uniform(kg, (n,)) * 1e-3
    _, idx = jax.lax.top_k(pri, batch)
    is_fg = sel_fg[idx]
    valid = (sel_fg | sel_bg)[idx]
    return idx, is_fg, valid


def assign_rpn_targets(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                       gt_mask: jnp.ndarray, cfg: RCNNConfig, rng: jnp.ndarray):
    """Per-image RPN assignment (torchvision Matcher semantics incl.
    allow_low_quality: every gt's best anchor is positive). Returns sampled
    (idx, labels (1 fg / 0 bg), valid, matched_gt_idx)."""
    anchors = jnp.asarray(anchors)
    iou = box_iou_matrix(anchors, gt_boxes)               # (N, M)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)                     # (N,)
    best_iou = jnp.max(iou, axis=1)
    fg = best_iou >= cfg.rpn_fg_iou
    bg = best_iou < cfg.rpn_bg_iou  # incl. the no-gt case (iou = −1)
    # low-quality matches: anchors that are argmax for some gt become fg
    # (ties included via == max, torchvision behavior). The comparison
    # carries a RELATIVE slack of ~8 ulps: XLA may recompute the IoU inside
    # the max's fusion with different FMA contraction (observed 1-ulp drift
    # between sharding layouts), and an EXACT == would then drop every
    # low-quality match for that gt. The slack must be relative — an
    # absolute epsilon goes non-positive for a gt whose best IoU is tiny
    # (a sliver box after crop/clip) and would promote every anchor with
    # any positive overlap to fg
    gt_best_iou = jnp.max(iou, axis=0)                    # (M,)
    thr = gt_best_iou * (1.0 - 1e-6)
    low_q = jnp.any((iou >= thr[None, :]) & gt_mask[None, :] &
                    (iou > 0), axis=1)
    fg = fg | low_q
    bg = bg & ~fg
    no_gt = ~jnp.any(gt_mask)
    fg = fg & ~no_gt
    idx, is_fg, valid = _sample_balanced(fg, bg, cfg.rpn_batch,
                                         cfg.rpn_pos_frac, rng)
    return idx, is_fg, valid, best_gt[idx]


def assign_box_targets(proposals: jnp.ndarray, prop_valid: jnp.ndarray,
                       gt_boxes: jnp.ndarray, gt_cls: jnp.ndarray,
                       gt_mask: jnp.ndarray, cfg: RCNNConfig,
                       rng: jnp.ndarray):
    """Per-image second-stage assignment: append gts to proposals
    (torchvision add_gt_to_proposals), match at fg 0.5 / bg [0, 0.5),
    sample 512 @ 25% fg. Returns (rois, labels (0=bg else cls+1),
    reg_targets, is_fg, valid)."""
    m = gt_boxes.shape[0]
    props = jnp.concatenate([proposals, gt_boxes], 0)     # (P+M, 4)
    pvalid = jnp.concatenate([prop_valid, gt_mask], 0)
    iou = box_iou_matrix(props, gt_boxes)
    iou = jnp.where(gt_mask[None, :] & pvalid[:, None], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    fg = (best_iou >= cfg.box_fg_iou) & pvalid
    bg = (best_iou < cfg.box_fg_iou) & pvalid & ~fg  # incl. no-gt (iou −1)
    idx, is_fg, valid = _sample_balanced(fg, bg, cfg.box_batch,
                                         cfg.box_pos_frac, rng)
    rois = props[idx]
    matched = best_gt[idx]
    labels = jnp.where(is_fg, gt_cls[matched] + 1, 0)
    reg_t = encode_deltas(rois, gt_boxes[matched], (10.0, 10.0, 5.0, 5.0))
    return rois, labels, reg_t, is_fg, valid


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def smooth_l1(x: jnp.ndarray, beta: float = 1.0 / 9.0) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def _rpn_loss_body(logits, reg, anchors, idx, is_fg, valid, matched,
                   gt_boxes):
    """Shared RPN loss math given the SAMPLED logits/deltas (K,)/(K,4)."""
    vf = valid.astype(jnp.float32)
    n = jnp.maximum(vf.sum(), 1.0)
    tgt = is_fg.astype(jnp.float32)
    obj_l = (jnp.maximum(logits, 0) - logits * tgt +
             jnp.log1p(jnp.exp(-jnp.abs(logits))))        # stable BCE
    l_obj = (obj_l * vf).sum() / n
    reg_t = encode_deltas(anchors[idx], gt_boxes[matched])
    fgf = (is_fg & valid).astype(jnp.float32)
    l_reg = (smooth_l1(reg - reg_t).sum(-1) * fgf).sum() / n
    return l_obj, l_reg


def rpn_loss(obj_logits, deltas, anchors, gt_boxes, gt_mask, cfg, rng):
    """Per-image RPN loss (vmap over batch outside) — dense-gather form."""
    anchors = jnp.asarray(anchors)
    idx, is_fg, valid, matched = assign_rpn_targets(anchors, gt_boxes,
                                                    gt_mask, cfg, rng)
    return _rpn_loss_body(obj_logits[idx], deltas[idx], anchors, idx,
                          is_fg, valid, matched, gt_boxes)


def rpn_logits_at(rpn_params, pyr, idx, level_hw, dtype=jnp.float32):
    """Recompute the RPN head's (obj (K,), deltas (K,4)) at ``idx`` (flat
    all-level anchor indices of ONE image) from gathered 3x3 feature
    patches — the exact math of the dense head restricted to the sampled
    positions.

    Why: the train loss reads only rpn_batch (256) of the ~173k dense
    positions, but gathering from the dense maps makes XLA backprop the
    full 3x3x256x256 conv over every level (~9 ms of the 832² b8 step —
    >60% of the RPN head's fwd+bwd cost, for a 0.15% utilization of its
    output gradient). Recomputing the sampled logits from patches keeps
    the dense maps under stop_gradient (proposals need values only), so
    the backward is a 9-row-gather matmul + row scatter into the pyramid
    cotangent — row-count-bound at K rows, like ops/roi_align.py.

    ``pyr``: per-level (H, W, C) features of one image (grads flow);
    ``level_hw``: static (H, W) per level. SAME zero padding is realized
    by masking out-of-bounds taps.
    """
    c = pyr[0].shape[-1]
    a_per = A_PER_CELL
    hws = [int(h) * int(w) for h, w in level_hw]
    bounds = [0]
    for hw in hws:
        bounds.append(bounds[-1] + hw * a_per)
    row_base = [0]
    for hw in hws[:-1]:
        row_base.append(row_base[-1] + hw)
    flat = jnp.concatenate([p.reshape(-1, c) for p in pyr], axis=0)
    lvl = jnp.sum(idx[:, None] >= jnp.asarray(bounds[1:-1])[None, :],
                  axis=1)
    pos = idx - jnp.asarray(bounds[:-1])[lvl]
    cell = pos // a_per
    a_idx = pos % a_per
    hs = jnp.asarray([h for h, _ in level_hw])[lvl]
    ws = jnp.asarray([w for _, w in level_hw])[lvl]
    y = cell // ws
    x = cell % ws
    base = jnp.asarray(row_base)[lvl]
    taps = []
    for dy in (-1, 0, 1):                   # (kh, kw) row-major == HWIO
        for dx in (-1, 0, 1):
            yy, xx = y + dy, x + dx
            ok = (yy >= 0) & (yy < hs) & (xx >= 0) & (xx < ws)
            row = base + jnp.clip(yy, 0, hs - 1) * ws + \
                jnp.clip(xx, 0, ws - 1)
            taps.append(jnp.where(ok[:, None], flat[row], 0))
    patch = jnp.stack(taps, axis=1).reshape(idx.shape[0], 9 * c)
    conv = rpn_params["conv"]
    t = jnp.dot(patch.astype(dtype),
                jnp.asarray(conv["kernel"]).reshape(9 * c, -1).astype(dtype),
                preferred_element_type=jnp.float32)
    t = nn.relu(t + jnp.asarray(conv["bias"])).astype(dtype)
    cls_p, reg_p = rpn_params["cls"], rpn_params["reg"]
    obj = (jnp.dot(t, jnp.asarray(cls_p["kernel"]).reshape(-1, a_per)
                   .astype(dtype), preferred_element_type=jnp.float32)
           + jnp.asarray(cls_p["bias"])).astype(jnp.float32)
    reg = (jnp.dot(t, jnp.asarray(reg_p["kernel"]).reshape(-1, a_per * 4)
                   .astype(dtype), preferred_element_type=jnp.float32)
           + jnp.asarray(reg_p["bias"])).astype(jnp.float32)
    obj_k = jnp.take_along_axis(obj, a_idx[:, None], axis=1)[:, 0]
    reg_k = jnp.take_along_axis(reg.reshape(-1, a_per, 4),
                                a_idx[:, None, None].repeat(4, -1),
                                axis=1)[:, 0]
    return obj_k, reg_k


def rpn_loss_sparse(rpn_params, pyr_img, anchors, gt_boxes, gt_mask, cfg,
                    rng, level_hw, dtype=jnp.float32):
    """Per-image RPN loss with the sparse patch-recompute backward (see
    :func:`rpn_logits_at`); numerically equal to :func:`rpn_loss` up to
    conv-vs-matmul reduction order."""
    anchors = jnp.asarray(anchors)
    idx, is_fg, valid, matched = assign_rpn_targets(anchors, gt_boxes,
                                                    gt_mask, cfg, rng)
    obj_k, reg_k = rpn_logits_at(rpn_params, pyr_img, idx, level_hw,
                                 dtype=dtype)
    return _rpn_loss_body(obj_k, reg_k, anchors, idx, is_fg, valid,
                          matched, gt_boxes)


def box_head_loss(scores, deltas, labels, reg_targets, is_fg, valid):
    """torchvision fastrcnn_loss: CE over nc+1; smooth-L1 on the matched
    class's deltas, normalized by the number of sampled rows."""
    vf = valid.astype(jnp.float32)
    n = jnp.maximum(vf.sum(), 1.0)
    logp = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    l_cls = (ce * vf).sum() / n
    cls_idx = jnp.maximum(labels - 1, 0)
    d = jnp.take_along_axis(deltas, cls_idx[:, None, None].repeat(4, -1),
                            axis=1)[:, 0]
    fgf = (is_fg & valid).astype(jnp.float32)
    l_reg = (smooth_l1(d - reg_targets).sum(-1) * fgf).sum() / n
    return l_cls, l_reg


# ---------------------------------------------------------------------------
# end-to-end train loss / inference (batched)
# ---------------------------------------------------------------------------

def faster_rcnn_loss(model: FasterRCNN, variables, images, gt_boxes_xyxy,
                     gt_cls, gt_mask, cfg: RCNNConfig, rng,
                     train: bool = True):
    """Full two-stage training loss for a batch. Returns (loss, metrics,
    new_batch_stats)."""
    anchors, counts = pyramid_anchors(cfg.img_size)

    if train:
        (pyr, obj, deltas), new_vars = model.apply(
            variables, images, True, mutable=["batch_stats"],
            method=FasterRCNN.__call__)
    else:
        pyr, obj, deltas = model.apply(variables, images, False,
                                       method=FasterRCNN.__call__)
        new_vars = {}

    b = images.shape[0]
    rngs = jax.random.split(rng, 2 * b)

    # proposals consume VALUES only (rois are stop-gradient'd below), and
    # the RPN loss recomputes its 256 sampled logits from feature patches
    # (rpn_logits_at) — so the dense obj/delta maps carry no gradient
    # consumers and XLA drops the full-pyramid 3x3x256x256 conv backward
    # (~9 ms of the 832² b8 step for 0.15% output-gradient utilization)
    obj_sg = jax.lax.stop_gradient(obj)
    deltas_sg = jax.lax.stop_gradient(deltas)
    props, pscores, pvalid = jax.vmap(
        lambda o, d: generate_proposals(o, d, anchors, counts,
                                        cfg.img_size, cfg))(obj_sg,
                                                            deltas_sg)

    level_hw = tuple((p.shape[1], p.shape[2]) for p in pyr)
    rpn_params = variables["params"]["rpn"]
    l_obj, l_reg = jax.vmap(
        lambda p, g, m, r: rpn_loss_sparse(
            rpn_params, p, anchors, g, m, cfg, r, level_hw,
            dtype=model.dtype)
    )([p for p in pyr], gt_boxes_xyxy, gt_mask, rngs[:b])

    rois, labels, reg_t, is_fg, valid = jax.vmap(
        lambda p, pv, g, c, m, r: assign_box_targets(
            jax.lax.stop_gradient(p), pv, g, c, m, cfg, r)
    )(props, pvalid, gt_boxes_xyxy, gt_cls, gt_mask, rngs[b:])

    kd = jax.random.fold_in(rng, 17)

    scores, head_deltas = model.apply(
        variables, [p for p in pyr], rois, train,
        method=FasterRCNN.run_box_head,
        rngs={"dropout": kd} if train else {})

    l_cls, l_box = jax.vmap(box_head_loss)(scores, head_deltas, labels,
                                           reg_t, is_fg, valid)
    total = (l_obj.mean() + l_reg.mean() + l_cls.mean() + l_box.mean())
    metrics = {"rpn_obj": l_obj.mean(), "rpn_reg": l_reg.mean(),
               "cls": l_cls.mean(), "box": l_box.mean(), "total": total}
    return total, metrics, new_vars.get("batch_stats", None)


def faster_rcnn_infer(model: FasterRCNN, variables, images,
                      cfg: RCNNConfig):
    """Batched inference → fixed-shape dets (B, max_det, ...)."""
    anchors, counts = pyramid_anchors(cfg.img_size)
    pyr, obj, deltas = model.apply(variables, images, False,
                                   method=FasterRCNN.__call__)
    props, pscores, pvalid = jax.vmap(
        lambda o, d: generate_proposals(o, d, anchors, counts,
                                        cfg.img_size, cfg))(obj, deltas)

    all_scores, all_deltas = model.apply(variables, [p for p in pyr], props,
                                         method=FasterRCNN.run_box_head)

    def infer_one(scores, head_deltas, rois_img, valid_img):
        probs = jax.nn.softmax(scores, -1)[:, 1:]          # (R, nc)
        boxes = decode_deltas(rois_img[:, None, :], head_deltas,
                              (10.0, 10.0, 5.0, 5.0))      # (R, nc, 4)
        boxes = clip_boxes(boxes, cfg.img_size, cfg.img_size)
        probs = probs * valid_img[:, None]
        r, nc = probs.shape
        flat_s = probs.reshape(-1)
        flat_b = boxes.reshape(-1, 4)
        flat_c = jnp.broadcast_to(jnp.arange(nc, dtype=jnp.int32)[None],
                                  (r, nc)).reshape(-1)
        return batched_nms(flat_b, flat_s, flat_c,
                           iou_thres=cfg.nms_thresh,
                           score_thres=cfg.score_thresh,
                           pre_nms_topk=min(flat_s.shape[0], 2048),
                           max_det=cfg.max_det)

    return jax.vmap(infer_one)(all_scores, all_deltas, props, pvalid)
