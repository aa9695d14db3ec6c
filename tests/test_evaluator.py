"""End-to-end eval pipeline test: raw-map synthesis → decode → NMS →
letterbox inverse → COCO mAP. If any stage's geometry is off, mAP ≠ 1."""

import numpy as np
import jax.numpy as jnp

from heltondetection_tpu.engine.evaluator import Evaluator
from heltondetection_tpu.models.yolov5 import decode_full
from heltondetection_tpu.ops.anchors import YOLOV5_ANCHORS, YOLOV5_STRIDES


def _logit(p):
    return float(np.log(p / (1 - p)))


def synth_raw_maps(gt_boxes_cxcywh, gt_classes, img_size=64, nc=8):
    """Paint gt boxes into raw YOLO head maps via the decode inverse."""
    raws = []
    for lvl, stride in enumerate(YOLOV5_STRIDES):
        s = img_size // stride
        raws.append(np.full((1, s, s, 3 * (5 + nc)), -12.0, np.float32))
    for (cx, cy, w, h), c in zip(gt_boxes_cxcywh, gt_classes):
        # pick the level+anchor whose size best matches (and satisfies
        # wh < 4*anchor so sigma stays in range)
        best = None
        for lvl, anchors in enumerate(YOLOV5_ANCHORS):
            for ai, (aw, ah) in enumerate(anchors):
                if w < 4 * aw and h < 4 * ah:
                    err = abs(np.log(w / aw)) + abs(np.log(h / ah))
                    if best is None or err < best[0]:
                        best = (err, lvl, ai, aw, ah)
        _, lvl, ai, aw, ah = best
        stride = YOLOV5_STRIDES[lvl]
        gx, gy = int(cx / stride), int(cy / stride)
        sig_x = (cx / stride - gx + 0.5) / 2.0
        sig_y = (cy / stride - gy + 0.5) / 2.0
        sig_w = np.sqrt(w / aw) / 2.0
        sig_h = np.sqrt(h / ah) / 2.0
        assert 0 < sig_x < 1 and 0 < sig_y < 1 and 0 < sig_w < 1 and 0 < sig_h < 1
        base = ai * (5 + len(raws) and 5 + 8)  # A*(5+nc) layout
        base = ai * (5 + 8)
        vals = [_logit(sig_x), _logit(sig_y), _logit(sig_w), _logit(sig_h), 9.0]
        raw = raws[lvl]
        raw[0, gy, gx, base:base + 5] = vals
        raw[0, gy, gx, base + 5 + int(c)] = 9.0
    return [jnp.asarray(r) for r in raws]


def test_eval_pipeline_perfect_synthetic():
    nc = 8
    img_size = 64
    gts = [(20.0, 20.0, 12.0, 16.0), (44.0, 40.0, 30.0, 24.0),
           (32.0, 52.0, 8.0, 8.0)]
    classes = [0, 3, 5]
    raws = synth_raw_maps(gts, classes, img_size, nc)

    def forward_fn(images):
        del images
        return decode_full(raws, nc)

    ev = Evaluator(forward_fn, nc, conf_thres=0.1, pre_nms_topk=128,
                   max_det=32)
    batch = {
        "image": jnp.zeros((1, img_size, img_size, 3)),
        "img_id": [1],
        "scale": [1.0], "pad_x": [0.0], "pad_y": [0.0],
        "orig_hw": [(img_size, img_size)],
    }
    det = __import__("heltondetection_tpu.utils.cocoeval",
                     fromlist=["DetEval"]).DetEval(nc)
    xywh = [(cx - w / 2, cy - h / 2, w, h) for cx, cy, w, h in gts]
    det.add_gt(1, xywh, classes)
    stats = ev.run([batch], det_eval=det)
    assert stats["AP"] > 0.99, stats
    assert stats["AP50"] > 0.99


def test_eval_pipeline_letterbox_inverse():
    # same dets but the "original" image was 128x96 letterboxed into 64²:
    # scale=0.5, pad_x=8 → gt in orig coords must still score 1.0
    nc = 8
    gts_lb = [(20.0, 20.0, 12.0, 16.0), (44.0, 40.0, 30.0, 24.0)]
    classes = [0, 3]
    raws = synth_raw_maps(gts_lb, classes, 64, nc)

    def forward_fn(images):
        del images
        return decode_full(raws, nc)

    ev = Evaluator(forward_fn, nc, conf_thres=0.1, pre_nms_topk=128,
                   max_det=32)
    scale, px, py = 0.5, 8.0, 0.0
    batch = {
        "image": jnp.zeros((1, 64, 64, 3)),
        "img_id": "img0",
        "img_id": ["img0"],
        "scale": [scale], "pad_x": [px], "pad_y": [py],
        "orig_hw": [(128, 96)],
    }
    from heltondetection_tpu.utils.cocoeval import DetEval
    det = DetEval(nc)
    xywh = []
    for cx, cy, w, h in gts_lb:
        x1 = np.clip((cx - w / 2 - px) / scale, 0, 96)
        y1 = np.clip((cy - h / 2 - py) / scale, 0, 128)
        x2 = np.clip((cx + w / 2 - px) / scale, 0, 96)
        y2 = np.clip((cy + h / 2 - py) / scale, 0, 128)
        xywh.append((x1, y1, x2 - x1, y2 - y1))
    det.add_gt("img0", xywh, classes)
    stats = ev.run([batch], det_eval=det)
    assert stats["AP"] > 0.99, stats
