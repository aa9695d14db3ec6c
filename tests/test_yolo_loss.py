import numpy as np
import jax
import jax.numpy as jnp
import pytest

from heltondetection_tpu.train.yolo_loss import (YoloLossConfig,
                                                 build_level_targets,
                                                 yolo_loss)


def _mk_gt(boxes, classes, M=8):
    """Pad gt lists to fixed M."""
    b = np.zeros((1, M, 4), np.float32)
    c = np.zeros((1, M), np.int32)
    m = np.zeros((1, M), bool)
    for i, (box, cl) in enumerate(zip(boxes, classes)):
        b[0, i] = box
        c[0, i] = cl
        m[0, i] = True
    return jnp.asarray(b), jnp.asarray(c), jnp.asarray(m)


def test_assigner_center_and_neighbors():
    cfg = YoloLossConfig(num_classes=8, img_size=64)
    # gt at cx=20.8, cy=36.0 → level0 (stride 8): gx=2.6, gy=4.5
    gt, cls, mask = _mk_gt([(20.8, 36.0, 12.0, 14.0)], [2])
    t = build_level_targets(gt, cls, mask, 0, (8, 8), cfg)
    v = np.asarray(t["valid"][0, 0])          # (A, O)
    # anchors (10,13),(16,30),(33,23): ratios vs (12,14):
    # a0: max(12/10,14/13)=1.2 ✓; a1: max(16/12... ) r=(12/16,14/30)
    #   → max(16/12≈1.33, 30/14≈2.14) ✓ <4; a2: (33/12=2.75, 23/14=1.64) ✓
    assert v[:, 0].all()                      # center cell for all 3 anchors
    # fx=0.6>0.5 → x-neighbor = cell 3 (right); fy=0.5 exactly → NO y-neighbor
    assert v[:, 1].all() and not v[:, 2].any()
    cx = np.asarray(t["cell_x"][0, 0])
    cy = np.asarray(t["cell_y"][0, 0])
    assert cx[0] == 2 and cy[0] == 4          # center
    assert cx[1] == 3 and cy[1] == 4          # x-neighbor right
    # txy for center cell: (0.6, 0.5)
    np.testing.assert_allclose(np.asarray(t["txy"][0, 0, 0]), [0.6, 0.5],
                               atol=1e-5)
    # txy for x-neighbor: gxy - cell = (2.6-3, 0.5) = (-0.4, 0.5)
    np.testing.assert_allclose(np.asarray(t["txy"][0, 0, 1]), [-0.4, 0.5],
                               atol=1e-5)


def test_assigner_ratio_filter():
    cfg = YoloLossConfig(num_classes=8, img_size=64)
    # tiny 2x2 box: ratio vs anchor (10,13) = max(5, 6.5) > 4 → no anchors
    gt, cls, mask = _mk_gt([(32.0, 32.0, 2.0, 2.0)], [0])
    t = build_level_targets(gt, cls, mask, 0, (8, 8), cfg)
    assert not np.asarray(t["valid"]).any()


def test_assigner_mask_excludes_padding():
    cfg = YoloLossConfig(num_classes=8, img_size=64)
    gt, cls, mask = _mk_gt([], [])
    t = build_level_targets(gt, cls, mask, 0, (8, 8), cfg)
    assert not np.asarray(t["valid"]).any()


def _rand_raw(b=2, img=64, nc=8, seed=0):
    rng = jax.random.PRNGKey(seed)
    shapes = [(b, img // 8, img // 8, 3 * (5 + nc)),
              (b, img // 16, img // 16, 3 * (5 + nc)),
              (b, img // 32, img // 32, 3 * (5 + nc))]
    keys = jax.random.split(rng, 3)
    return [jax.random.normal(k, s) * 0.1 for k, s in zip(keys, shapes)]


def test_loss_finite_and_jittable():
    cfg = YoloLossConfig(num_classes=8, img_size=64)
    raw = _rand_raw()
    gt, cls, mask = _mk_gt([(20.0, 20.0, 12.0, 14.0), (40.0, 40.0, 30.0, 30.0)],
                           [1, 3])
    gt2 = jnp.concatenate([gt, gt], 0)
    cls2 = jnp.concatenate([cls, cls], 0)
    mask2 = jnp.concatenate([mask, mask], 0)
    f = jax.jit(lambda r, g, c, m: yolo_loss(r, g, c, m, cfg))
    loss, metrics = f(raw, gt2, cls2, mask2)
    assert np.isfinite(float(loss))
    for k in ("box", "obj", "cls"):
        assert np.isfinite(float(metrics[k])) and float(metrics[k]) >= 0


def test_loss_zero_gt_only_obj():
    cfg = YoloLossConfig(num_classes=8, img_size=64)
    raw = _rand_raw(b=1)
    gt, cls, mask = _mk_gt([], [])
    loss, metrics = yolo_loss(raw, gt, cls, mask, cfg)
    assert float(metrics["box"]) == 0.0
    assert float(metrics["cls"]) == 0.0
    assert float(metrics["obj"]) > 0.0


def test_loss_gradients_flow():
    cfg = YoloLossConfig(num_classes=8, img_size=64)
    raw = _rand_raw(b=1)
    gt, cls, mask = _mk_gt([(20.0, 20.0, 12.0, 14.0)], [1])

    def f(r):
        return yolo_loss(r, gt, cls, mask, cfg)[0]

    grads = jax.grad(f)(raw)
    total = sum(float(jnp.abs(g).sum()) for g in grads)
    assert total > 0 and np.isfinite(total)


def test_focal_variants():
    for focal in ("root", "root_cls"):
        cfg = YoloLossConfig(num_classes=8, img_size=64, focal=focal)
        raw = _rand_raw(b=1)
        gt, cls, mask = _mk_gt([(20.0, 20.0, 12.0, 14.0)], [1])
        loss, _ = yolo_loss(raw, gt, cls, mask, cfg)
        assert np.isfinite(float(loss))


def test_perfect_prediction_low_box_loss():
    # single-anchor-per-level custom set with 10x level gaps so the gt is
    # assigned to exactly ONE slot; paint logits that decode to the gt there
    # → CIoU = 1 → box loss ≈ 0
    nc = 8
    anchors = (((10, 13),), ((100, 130),), ((400, 520),))
    cfg = YoloLossConfig(num_classes=nc, img_size=64)
    # gt wh == anchor0; gxy = (2.5, 2.5) → fx=fy=0.5 → center cell only
    gt, cls, mask = _mk_gt([(20.0, 20.0, 10.0, 13.0)], [1])
    lvl0 = np.full((1, 8, 8, 1 * (5 + nc)), -10.0, np.float32)
    # σ=0.5 (logit 0): pxy = 0.5 = txy ✓; pwh = anchor_grid = gwh ✓
    lvl0[0, 2, 2, 0:4] = 0.0
    lvl0[0, 2, 2, 4] = 10.0
    lvl0[0, 2, 2, 5 + 1] = 10.0
    raw = [jnp.asarray(lvl0),
           jnp.full((1, 4, 4, 1 * (5 + nc)), -10.0),
           jnp.full((1, 2, 2, 1 * (5 + nc)), -10.0)]
    loss, m = yolo_loss(raw, gt, cls, mask, cfg, anchors=anchors)
    assert float(m["box"]) < 1e-3, float(m["box"])
    assert float(m["cls"]) < 1e-3, float(m["cls"])
    # and a deliberately WRONG box prediction raises box loss
    lvl0_bad = lvl0.copy()
    lvl0_bad[0, 2, 2, 0:4] = [3.0, -3.0, 2.0, -2.0]
    raw_bad = [jnp.asarray(lvl0_bad), raw[1], raw[2]]
    _, m_bad = yolo_loss(raw_bad, gt, cls, mask, cfg, anchors=anchors)
    assert float(m_bad["box"]) > float(m["box"]) + 0.01


def test_packed_train_head_loss_and_grad_parity():
    """The packed train head (models/yolov5._PackedDetect) must be a pure
    relayout: same param tree, same loss value, same gradients as the
    standard conv head + yolo_loss."""
    import dataclasses
    import jax.tree_util as jtu
    from heltondetection_tpu.models.yolov5 import YOLOv5
    from heltondetection_tpu.train.yolo_loss import (YoloLossConfig,
                                                     yolo_loss,
                                                     yolo_loss_packed)
    nc, S, M, B = 7, 64, 16, 2
    model = YOLOv5(num_classes=nc, width_multiple=0.25)
    model_p = dataclasses.replace(model, packed_train=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    vp = model_p.init(jax.random.PRNGKey(0), x, train=False)
    ka = [jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(v)[0]]
    kb = [jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(vp)[0]]
    assert ka == kb

    gtb = jnp.asarray(rng.uniform(8, 56, (B, M, 4)).astype(np.float32))
    gtc = jnp.asarray(rng.integers(0, nc, (B, M)).astype(np.int32))
    gtm = jnp.asarray(rng.uniform(0, 1, (B, M)) < 0.5)
    cfg = YoloLossConfig(num_classes=nc, img_size=S)

    def loss_std(params):
        outs = model.apply({"params": params,
                            "batch_stats": v["batch_stats"]}, x, train=False)
        return yolo_loss(outs, gtb, gtc, gtm, cfg)[0]

    def loss_pk(params):
        outs = model_p.apply({"params": params,
                              "batch_stats": v["batch_stats"]}, x,
                             train=False)
        return yolo_loss_packed(outs, gtb, gtc, gtm, cfg)[0]

    la, ga = jax.value_and_grad(loss_std)(v["params"])
    lb, gb = jax.value_and_grad(loss_pk)(v["params"])
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for a, b in zip(jtu.tree_leaves(ga), jtu.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
