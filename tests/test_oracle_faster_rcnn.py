"""Composed two-stage FasterRCNN oracle: the ENTIRE post-backbone
inference pipeline — RPN decode → per-level NMS → joint top-k proposals →
multilevel RoIAlign → box head GEMMs → per-class decode → class-aware
NMS → fixed-shape dets — pinned against a sequential, trivially-correct
numpy implementation driven by the SAME weights and feature maps.

Unit tests (test_faster_rcnn, test_roi_align, test_nms) pin each stage
alone; this catches the bugs that live BETWEEN stages — fixed-shape
padding leaking into later stages, vmap/reshape wiring in the batched
box head, level-capping in generate_proposals, valid-mask propagation —
which is exactly where a branch-free jit formulation can silently
diverge from the reference semantics (two-stage stack of SURVEY.md §3.5,
/root/reference/README.md:8).

The backbone→neck numerics are pinned separately against torch
(test_oracle_full_network), so the shared trusted input here is the
pyramid + RPN maps from one flax forward; everything downstream is
recomputed independently in numpy.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_nms import _greedy_nms_numpy
from torch_refs import roi_align_numpy

from heltondetection_tpu.models.faster_rcnn import (
    FasterRCNN, RCNNConfig, STRIDES, faster_rcnn_infer, init_faster_rcnn,
    pyramid_anchors)

CFG = RCNNConfig(
    num_classes=6, img_size=128, neck="fpn", head="coupled",
    backbone="resnet18", roi_levels=4,
    rpn_pre_nms_topk=192, rpn_post_nms_topk=96,
    score_thresh=0.05, nms_thresh=0.5, max_det=16,
)
CLAMP = float(np.log(1000.0 / 16.0))
EPS = 1e-7


# ---------------------------------------------------------------------------
# sequential numpy reference (float64)
# ---------------------------------------------------------------------------

def _np_decode(anchors, deltas, weights=(1.0, 1.0, 1.0, 1.0)):
    anchors = anchors.astype(np.float64)
    deltas = deltas.astype(np.float64)
    wa = anchors[..., 2] - anchors[..., 0]
    ha = anchors[..., 3] - anchors[..., 1]
    xa = anchors[..., 0] + 0.5 * wa
    ya = anchors[..., 1] + 0.5 * ha
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = np.minimum(deltas[..., 2] / ww, CLAMP)
    dh = np.minimum(deltas[..., 3] / wh, CLAMP)
    cx = dx * wa + xa
    cy = dy * ha + ya
    w = np.exp(dw) * wa
    h = np.exp(dh) * ha
    return np.stack([cx - 0.5 * w, cy - 0.5 * h,
                     cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def _np_clip(b, size):
    return np.clip(b, 0.0, float(size))


def _np_proposals(obj, deltas, anchors, counts, cfg):
    """Sequential torchvision-semantics proposal generation for one image."""
    cand_boxes, cand_scores = [], []
    start = 0
    for cnt in counts:
        sl = slice(start, start + cnt)
        start += cnt
        k = min(cfg.rpn_pre_nms_topk, cnt)
        order = np.argsort(-obj[sl], kind="stable")[:k]
        b = _np_decode(anchors[sl][order], deltas[sl][order])
        b = _np_clip(b, cfg.img_size)
        ok = ((b[:, 2] - b[:, 0]) > 1e-3) & ((b[:, 3] - b[:, 1]) > 1e-3)
        s = np.where(ok, 1.0 / (1.0 + np.exp(-obj[sl][order].astype(
            np.float64))), 0.0)
        live = s > 0.0
        keep = _greedy_nms_numpy(b[live], s[live], cfg.rpn_nms_thresh)
        kb, ks = b[live][keep], s[live][keep]
        cap = np.argsort(-ks, kind="stable")[:cfg.rpn_post_nms_topk]
        cand_boxes.append(kb[cap])
        cand_scores.append(ks[cap])
    boxes = np.concatenate(cand_boxes, 0)
    scores = np.concatenate(cand_scores, 0)
    order = np.argsort(-scores, kind="stable")[:cfg.rpn_post_nms_topk]
    pb, ps = boxes[order], scores[order]
    pad = cfg.rpn_post_nms_topk - pb.shape[0]
    if pad:
        pb = np.pad(pb, ((0, pad), (0, 0)))
        ps = np.pad(ps, (0, pad))
    return pb, ps, ps > 0.0


def _np_roi_levels(rois, n_lvl, canonical_level=2, canonical_size=224.0):
    areas = np.maximum(rois[:, 2] - rois[:, 0], 0.0) * \
        np.maximum(rois[:, 3] - rois[:, 1], 0.0)
    tgt = np.floor(canonical_level +
                   np.log2(np.sqrt(areas) / canonical_size + 1e-8))
    return np.clip(tgt, 0, n_lvl - 1).astype(np.int64)


def _np_box_head(crops, params):
    """Coupled head: flatten → fc1 → fc2 → (cls, per-class deltas)."""
    def dense(x, p):
        return x @ np.asarray(p["kernel"], np.float64) + \
            np.asarray(p["bias"], np.float64)
    x = crops.reshape(crops.shape[0], -1).astype(np.float64)
    x = np.maximum(dense(x, params["fc1"]), 0.0)
    x = np.maximum(dense(x, params["fc2"]), 0.0)
    scores = dense(x, params["cls"])
    deltas = dense(x, params["reg"]).reshape(x.shape[0], -1, 4)
    return scores, deltas


def _np_final_dets(scores, deltas, rois, valid, cfg):
    """softmax → per-class decode → score filter → class-aware NMS →
    top max_det, mirroring faster_rcnn_infer.infer_one sequentially."""
    e = np.exp(scores - scores.max(axis=-1, keepdims=True))
    probs = (e / e.sum(axis=-1, keepdims=True))[:, 1:]     # (R, nc)
    boxes = _np_decode(rois[:, None, :], deltas, (10.0, 10.0, 5.0, 5.0))
    boxes = _np_clip(boxes, cfg.img_size)
    probs = probs * valid[:, None]
    r, nc = probs.shape
    flat_s = probs.reshape(-1)
    flat_b = boxes.reshape(-1, 4)
    flat_c = np.broadcast_to(np.arange(nc)[None], (r, nc)).reshape(-1)
    live = flat_s > cfg.score_thresh
    fb, fs, fc = flat_b[live], flat_s[live], flat_c[live]
    out = []
    for c in np.unique(fc):
        m = fc == c
        keep = _greedy_nms_numpy(fb[m], fs[m], cfg.nms_thresh)
        for i in keep:
            out.append((fs[m][i], fb[m][i], c))
    out.sort(key=lambda t: -t[0])
    out = out[:cfg.max_det]
    db = np.stack([o[1] for o in out]) if out else np.zeros((0, 4))
    ds = np.asarray([o[0] for o in out])
    dc = np.asarray([o[2] for o in out])
    return db, ds, dc


# ---------------------------------------------------------------------------
# shared flax forward
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def setup():
    model = FasterRCNN(CFG)
    variables = init_faster_rcnn(model, jax.random.PRNGKey(11),
                                 CFG.img_size)
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.uniform(-1, 1, (2, CFG.img_size, CFG.img_size,
                                              3)).astype(np.float32))
    pyr, obj, deltas = jax.jit(
        lambda v, x: model.apply(v, x, False, method=FasterRCNN.__call__)
    )(variables, images)
    return model, variables, images, pyr, obj, deltas


def _proposal_sets(setup):
    model, variables, images, pyr, obj, deltas = setup
    anchors, counts = pyramid_anchors(CFG.img_size)
    from heltondetection_tpu.models.faster_rcnn import generate_proposals
    props, pscores, pvalid = jax.vmap(
        lambda o, d: generate_proposals(o, d, jnp.asarray(anchors), counts,
                                        CFG.img_size, CFG))(obj, deltas)
    return anchors, counts, (np.asarray(props), np.asarray(pscores),
                             np.asarray(pvalid))


def test_proposals_match_numpy(setup):
    """generate_proposals (fixed-shape per-level NMS + level caps + joint
    top-k) vs the sequential numpy pipeline, as score-ordered sets."""
    _, _, _, _, obj, deltas = setup
    anchors, counts, (props, pscores, pvalid) = _proposal_sets(setup)
    for i in range(obj.shape[0]):
        wb, ws, wv = _np_proposals(np.asarray(obj[i]),
                                   np.asarray(deltas[i]),
                                   anchors, counts, CFG)
        assert pvalid[i].sum() == wv.sum()
        n = int(wv.sum())
        # both sides emit score-descending rows (ties impossible: scores
        # are distinct sigmoids of distinct logits)
        np.testing.assert_allclose(pscores[i][:n], ws[:n], atol=1e-5)
        np.testing.assert_allclose(props[i][:n], wb[:n], atol=5e-3)


def test_composed_infer_matches_numpy(setup):
    """faster_rcnn_infer (batched, jitted, fixed-shape) vs the full
    sequential numpy pipeline from the same pyramid."""
    model, variables, images, pyr, obj, deltas = setup
    db, ds, dc, dv = jax.jit(
        lambda v, x: faster_rcnn_infer(model, v, x, CFG))(variables, images)
    db, ds, dc, dv = map(np.asarray, (db, ds, dc, dv))

    anchors, counts, (props, pscores, pvalid) = _proposal_sets(setup)
    head_params = jax.tree.map(np.asarray, variables["params"]["box_head"])
    feats_np = [np.asarray(p) for p in pyr]
    nl = CFG.roi_levels

    for i in range(images.shape[0]):
        rois = props[i].astype(np.float64)
        lv = _np_roi_levels(rois, nl)
        crops = np.stack([
            roi_align_numpy(feats_np[lv[r]][i], rois[r:r + 1], out_size=7,
                            spatial_scale=1.0 / STRIDES[lv[r]],
                            sampling_ratio=2)[0]
            for r in range(rois.shape[0])])
        scores, hd = _np_box_head(crops, head_params)
        wb, ws, wc = _np_final_dets(scores, hd, rois, pvalid[i], CFG)

        n = int(dv[i].sum())
        assert n == len(ws), (n, len(ws))
        # flax dets come out score-descending already
        np.testing.assert_allclose(ds[i][:n], ws, atol=1e-4)
        assert (dc[i][:n] == wc).all()
        np.testing.assert_allclose(db[i][:n], wb, atol=5e-3)
        assert n >= 4  # the random head must actually produce detections
