"""Hand-computed oracle tests for the from-scratch COCOeval implementation.

pycocotools is not installed in this environment (SURVEY.md assumed it was),
so the reference semantics are pinned by hand-derived cases that exercise the
101-point interpolation, IoU threshold sweep, crowd/ignore handling, area
ranges, and maxDets slicing — the behaviors that shift mAP if wrong.
"""

import numpy as np
import pytest

from heltondetection_tpu.utils.cocoeval import DetEval, format_summary


def test_perfect_detection():
    ev = DetEval(num_classes=3)
    ev.add_gt("im1", [[0, 0, 10, 10], [20, 20, 30, 30]], [0, 1])
    ev.add_det("im1", [[0, 0, 10, 10], [20, 20, 30, 30]], [0.9, 0.8], [0, 1])
    s = ev.summarize()
    assert abs(s["AP"] - 1.0) < 1e-6
    assert abs(s["AP50"] - 1.0) < 1e-6
    assert abs(s["AR100"] - 1.0) < 1e-6


def test_iou_threshold_sweep():
    # det IoU with gt = 0.6 → matches at thr {0.5, 0.55, 0.6} → AP = 3/10
    ev = DetEval(num_classes=1)
    ev.add_gt("im1", [[0, 0, 10, 10]], [0])
    ev.add_det("im1", [[0, 0, 10, 6]], [0.9], [0])
    s = ev.summarize()
    assert abs(s["AP"] - 0.3) < 1e-6
    assert abs(s["AP50"] - 1.0) < 1e-6
    assert abs(s["AP75"] - 0.0) < 1e-6


def test_fp_halves_precision():
    # 2 gts, 1 TP @0.9 + 1 disjoint FP @0.8 → recall 0.5 at precision 1.0
    ev = DetEval(num_classes=1)
    ev.add_gt("im1", [[0, 0, 10, 10], [50, 50, 10, 10]], [0, 0])
    ev.add_det("im1", [[0, 0, 10, 10], [100, 100, 5, 5]], [0.9, 0.8], [0, 0])
    s = ev.summarize()
    expect = 51 / 101  # precision 1.0 for recall thresholds 0.00..0.50
    assert abs(s["AP50"] - expect) < 1e-6
    assert abs(s["AP"] - expect) < 1e-6


def test_score_order_matters():
    # FP scored ABOVE the TP: raw pr curve [0, 0.5]; the monotone envelope
    # lifts interpolated precision to 0.5 at every recall point → AP50 = 0.5
    ev = DetEval(num_classes=1)
    ev.add_gt("im1", [[0, 0, 10, 10]], [0])
    ev.add_det("im1", [[100, 100, 5, 5], [0, 0, 10, 10]], [0.95, 0.9], [0, 0])
    s = ev.summarize()
    assert abs(s["AP50"] - 0.5) < 1e-6
    # FP scored BELOW the TP (cut off by the envelope at recall 1) → AP50 = 1
    ev2 = DetEval(num_classes=1)
    ev2.add_gt("im1", [[0, 0, 10, 10]], [0])
    ev2.add_det("im1", [[0, 0, 10, 10], [100, 100, 5, 5]], [0.95, 0.9], [0, 0])
    assert abs(ev2.summarize()["AP50"] - 1.0) < 1e-6


def test_crowd_gt_absorbs_extra_dets():
    # det overlapping a crowd gt is ignored (not a FP)
    ev = DetEval(num_classes=1)
    # det [55,55,10,10] sits fully inside the crowd region: crowd-IoU
    # (inter/det-area) = 1.0 → ignored; normal IoU = 100/400 = 0.25 → FP
    ev.add_gt("im1", [[0, 0, 10, 10], [50, 50, 20, 20]], [0, 0],
              iscrowd=[0, 1])
    ev.add_det("im1", [[0, 0, 10, 10], [55, 55, 10, 10]], [0.9, 0.8], [0, 0])
    s = ev.summarize()
    assert abs(s["AP"] - 1.0) < 1e-6  # crowd det ignored; single real gt TP

    # same det without the crowd flag → FP → AP50 drops below 1
    ev2 = DetEval(num_classes=1)
    ev2.add_gt("im1", [[0, 0, 10, 10], [50, 50, 20, 20]], [0, 0])
    ev2.add_det("im1", [[0, 0, 10, 10], [55, 55, 10, 10]], [0.9, 0.8], [0, 0])
    s2 = ev2.summarize()
    assert s2["AP50"] < 1.0


def test_area_ranges():
    # one small (16 px²) one large (128² px²) gt, both detected
    ev = DetEval(num_classes=1)
    ev.add_gt("im1", [[0, 0, 4, 4], [100, 100, 128, 128]], [0, 0])
    ev.add_det("im1", [[0, 0, 4, 4], [100, 100, 128, 128]], [0.9, 0.8], [0, 0])
    s = ev.summarize()
    assert abs(s["AP_small"] - 1.0) < 1e-6
    assert abs(s["AP_large"] - 1.0) < 1e-6
    assert s["AP_medium"] == -1.0  # no medium gt → excluded


def test_maxdets_slicing():
    # 5 gts, 5 TPs → AR1 sees only the best det → recall 0.2
    ev = DetEval(num_classes=1)
    boxes = [[i * 50, 0, 10, 10] for i in range(5)]
    ev.add_gt("im1", boxes, [0] * 5)
    ev.add_det("im1", boxes, [0.9, 0.8, 0.7, 0.6, 0.5], [0] * 5)
    s = ev.summarize()
    assert abs(s["AR1"] - 0.2) < 1e-6
    assert abs(s["AR10"] - 1.0) < 1e-6
    assert abs(s["AP"] - 1.0) < 1e-6


def test_multi_image_multi_class_mean():
    # class 0 perfect, class 1 all missed → mAP = mean(1, 0) = 0.5
    ev = DetEval(num_classes=2)
    ev.add_gt("im1", [[0, 0, 10, 10]], [0])
    ev.add_det("im1", [[0, 0, 10, 10]], [0.9], [0])
    ev.add_gt("im2", [[0, 0, 10, 10]], [1])
    s = ev.summarize()
    assert abs(s["AP"] - 0.5) < 1e-6


def test_duplicate_det_is_fp():
    # two dets on one gt: second is FP (gt already matched)
    ev = DetEval(num_classes=1)
    ev.add_gt("im1", [[0, 0, 10, 10]], [0])
    ev.add_det("im1", [[0, 0, 10, 10], [0, 0, 10, 10]], [0.9, 0.8], [0, 0])
    s = ev.summarize()
    # rc=[1,1], pr=[1,0.5] → envelope keeps 1.0 at recall≤1 → AP=1
    assert abs(s["AP"] - 1.0) < 1e-6


def test_ignored_gt_not_counted():
    ev = DetEval(num_classes=1)
    ev.add_gt("im1", [[0, 0, 10, 10], [50, 50, 10, 10]], [0, 0],
              ignore=[0, 1])
    ev.add_det("im1", [[0, 0, 10, 10]], [0.9], [0])
    s = ev.summarize()
    assert abs(s["AP"] - 1.0) < 1e-6  # ignored gt doesn't hurt recall


def test_format_summary_runs():
    ev = DetEval(num_classes=1)
    ev.add_gt("im1", [[0, 0, 10, 10]], [0])
    ev.add_det("im1", [[0, 0, 10, 10]], [0.9], [0])
    out = format_summary(ev.summarize())
    assert "IoU=0.50:0.95" in out and "0.50:0.95" in out


def test_per_class_ap_classwise_table():
    """per_class_ap (mmdet classwise lineage): class 0 perfect → AP 1.0,
    class 1 all-missed → AP 0.0, a class with gt but never predicted and
    one with no gt at all: absent classes stay out / -1 never pollutes the
    present classes' entries."""
    ev = DetEval(num_classes=4)
    ev.add_gt("im1", [[0, 0, 10, 10]], [0])          # class 0: perfect
    ev.add_gt("im1", [[20, 20, 10, 10]], [1])        # class 1: missed
    ev.add_det("im1", [[0, 0, 10, 10]], [0.9], [0])
    ev.add_det("im1", [[90, 90, 4, 4]], [0.8], [2])  # class 2: FP, no gt
    pc = ev.per_class_ap()
    assert abs(pc[0]["AP"] - 1.0) < 1e-6
    assert abs(pc[0]["AP50"] - 1.0) < 1e-6
    assert abs(pc[1]["AP"] - 0.0) < 1e-6
    assert pc[2]["AP"] == -1.0            # no gt anywhere → masked, like
    # pycocotools' -1 entries (never averaged into the headline AP)
    assert 3 not in pc                    # never seen in gts or dets
    # the masked per-class mean over present classes reproduces summarize()
    s = ev.summarize()
    present = [v["AP"] for v in pc.values() if v["AP"] > -1]
    assert abs(np.mean(present) - s["AP"]) < 1e-6


def test_to_coco_json_submission_format():
    """to_coco_json: standard pycocotools-loadRes results list, labels
    mapped back to original category ids."""
    ev = DetEval(num_classes=2)
    ev.add_det("im1", [[1.0, 2.0, 10.0, 20.0]], [0.9], [0])
    ev.add_det(7, [[3.0, 4.0, 5.0, 6.0]], [0.5], [1])
    res = ev.to_coco_json(label_to_cat={0: 11, 1: 42})
    assert sorted(r["category_id"] for r in res) == [11, 42]
    r0 = next(r for r in res if r["image_id"] == "im1")
    assert r0["bbox"] == [1.0, 2.0, 10.0, 20.0] and r0["score"] == 0.9
    # identity without a mapping; json-serializable throughout
    import json
    assert json.loads(json.dumps(ev.to_coco_json()))[0]["category_id"] in (0, 1)


def test_confusion_matrix_semantics(tmp_path):
    """Ultralytics val-time confusion matrix: TP on the diagonal,
    misclassification off-diagonal, FN in the background row, FP in the
    background column; sub-conf dets and ignore-gt matches are dropped."""
    ev = DetEval(num_classes=3)
    ev.add_gt("im1", [[0, 0, 10, 10], [20, 20, 10, 10], [40, 40, 10, 10]],
              [0, 1, 2])
    # TP class 0; class-1 gt predicted as class 2 (misclass at same box);
    # class-2 gt missed; plus one FP far away and one sub-conf det (dropped)
    ev.add_det("im1", [[0, 0, 10, 10], [20, 20, 10, 10], [70, 70, 5, 5],
                       [0, 0, 10, 10]],
               [0.9, 0.8, 0.7, 0.1], [0, 2, 1, 1])
    # an ignore gt matched by a det: neither TP nor FP
    ev.add_gt("im2", [[0, 0, 10, 10]], [0], ignore=[1])
    ev.add_det("im2", [[0, 0, 10, 10]], [0.9], [0])
    m = ev.confusion_matrix(conf_thres=0.25, iou_thres=0.45)
    assert m[0, 0] == 1          # TP class 0
    assert m[2, 1] == 1          # gt class 1 predicted as class 2
    assert m[3, 2] == 1          # class-2 gt missed → background row
    assert m[1, 3] == 1          # stray class-1 det → background column
    assert m.sum() == 4          # ignore match + sub-conf det contributed 0
    # the PNG renderer runs end-to-end
    from heltondetection_tpu.utils.cocoeval import save_confusion_png
    p = str(tmp_path / "cm.png")
    save_confusion_png(m, ["a", "b", "c"], p)
    import os
    assert os.path.getsize(p) > 1000


def test_confusion_matrix_ignore_no_steal_and_crowd_absorbs():
    """An ignore/crowd gt must not steal a match from an overlapping real
    gt, and a crowd region absorbs unlimited dets (none become FPs)."""
    ev = DetEval(num_classes=2)
    # real gt + same-spot ignore gt: the det must match the REAL one
    ev.add_gt("im1", [[0, 0, 10, 10]], [0])
    ev.add_gt("im1", [[0, 0, 12, 12]], [0], ignore=[1])
    ev.add_det("im1", [[0, 0, 10, 10]], [0.9], [0])
    # crowd region absorbing TWO dets: neither is an FP
    ev.add_gt("im2", [[50, 50, 30, 30]], [1], iscrowd=[1])
    ev.add_det("im2", [[52, 52, 10, 10], [60, 60, 10, 10]], [0.9, 0.8],
               [1, 1])
    m = ev.confusion_matrix()
    assert m[0, 0] == 1          # real gt got its TP
    assert m[2, 0] == 0          # ...and is not an FN
    assert m[1, 2] == 0          # crowd absorbed both dets: no FPs
    assert m.sum() == 1


def test_pr_curves_png(tmp_path):
    """PR-curve artifact renders for both the ≤8-class colored regime and
    the many-class gray+mean regime."""
    from heltondetection_tpu.utils.cocoeval import save_pr_curves_png
    import os
    ev = DetEval(num_classes=2)
    ev.add_gt("im1", [[0, 0, 10, 10], [30, 30, 8, 8]], [0, 1])
    ev.add_det("im1", [[0, 0, 10, 10], [31, 31, 8, 8]], [0.9, 0.7], [0, 1])
    p = str(tmp_path / "pr_small.png")
    save_pr_curves_png(ev, ["cat", "dog"], p)
    assert os.path.getsize(p) > 1000
    ev2 = DetEval(num_classes=12)
    for c in range(12):
        ev2.add_gt(f"im{c}", [[0, 0, 10, 10]], [c])
        ev2.add_det(f"im{c}", [[0, 0, 10, 10]], [0.9], [c])
    p2 = str(tmp_path / "pr_big.png")
    save_pr_curves_png(ev2, None, p2)
    assert os.path.getsize(p2) > 1000


def test_prf_at_conf_semantics(tmp_path):
    """P/R/F1 vs confidence: analytic check — 2 gts, one TP at 0.9, one FP
    at 0.6 → at conf ≤ 0.6: P=0.5, R=0.5; at conf in (0.6, 0.9]: P=1, R=0.5;
    above 0.9: no dets → P defined as 1, R=0."""
    ev = DetEval(num_classes=1)
    ev.add_gt("im1", [[0, 0, 10, 10], [40, 40, 10, 10]], [0, 0])
    ev.add_det("im1", [[0, 0, 10, 10], [80, 80, 5, 5]], [0.9, 0.6], [0, 0])
    c = ev.prf_at_conf(conf_grid=np.array([0.0, 0.5, 0.7, 0.95]))[0]
    np.testing.assert_allclose(c["P"], [0.5, 0.5, 1.0, 1.0])
    np.testing.assert_allclose(c["R"], [0.5, 0.5, 0.5, 0.0])
    np.testing.assert_allclose(c["F1"][2], 2 * 1.0 * 0.5 / 1.5)
    # threshold exactly at a det's score includes it (>= semantics)
    c2 = ev.prf_at_conf(conf_grid=np.array([0.6, 0.9]))[0]
    np.testing.assert_allclose(c2["P"], [0.5, 1.0])
    # renderer end-to-end
    from heltondetection_tpu.utils.cocoeval import save_prf_curves_png
    import os
    p = str(tmp_path / "prf.png")
    save_prf_curves_png(ev, ["thing"], p)
    assert os.path.getsize(p) > 1000


def test_format_classwise_runs():
    from heltondetection_tpu.utils.cocoeval import format_classwise
    ev = DetEval(num_classes=2)
    ev.add_gt("im1", [[0, 0, 10, 10]], [0])
    ev.add_det("im1", [[0, 0, 10, 10]], [0.9], [0])
    out = format_classwise(ev.per_class_ap(), ["cat", "dog"])
    assert "cat" in out and "AP50" in out
