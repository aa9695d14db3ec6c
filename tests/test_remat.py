"""Backbone rematerialization (cfg.model.remat) — the TPU answer to
HBM-bound high-resolution training (SURVEY.md §5 notes the reference
scales spatially, to 1280²; jax.checkpoint trades ~1/3 extra backbone
FLOPs for O(stage-boundary) activation memory).

remat must be a pure execution-plan change: same param tree, same loss,
same gradients, same BN stats — pinned here for both detector families
and through the config layer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tree_allclose(a, b, atol=0.0):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol,
                                   rtol=0)


def test_yolo_remat_identical_loss_grads_stats():
    from heltondetection_tpu.models.yolov5 import YOLOv5
    from heltondetection_tpu.train.yolo_loss import YoloLossConfig, yolo_loss

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    gt_boxes = jnp.asarray(rng.uniform(16, 48, (2, 4, 4)), jnp.float32)
    gt_cls = jnp.asarray(rng.integers(0, 3, (2, 4)), jnp.int32)
    gt_mask = jnp.ones((2, 4), bool)
    cfg = YoloLossConfig(num_classes=3, img_size=64)

    def run(remat):
        m = YOLOv5(num_classes=3, depth_multiple=0.33, width_multiple=0.125,
                   remat=remat)
        v = m.init(jax.random.PRNGKey(0), x, train=True)

        def loss_fn(p, bs):
            outs, mut = m.apply({"params": p, "batch_stats": bs}, x,
                                train=True, mutable=["batch_stats"])
            loss, _ = yolo_loss(outs, gt_boxes, gt_cls, gt_mask, cfg)
            return loss, mut["batch_stats"]

        (loss, stats), grads = jax.jit(jax.value_and_grad(
            loss_fn, has_aux=True))(v["params"], v["batch_stats"])
        return v, float(loss), grads, stats

    v0, l0, g0, s0 = run(False)
    v1, l1, g1, s1 = run(True)
    # remat is param-transparent: identical init tree from the same key
    assert (jax.tree_util.tree_structure(v0["params"]) ==
            jax.tree_util.tree_structure(v1["params"]))
    _tree_allclose(v0["params"], v1["params"])
    assert l0 == pytest.approx(l1, abs=1e-6)
    _tree_allclose(g0, g1, atol=1e-6)
    _tree_allclose(s0, s1, atol=1e-6)


def test_rcnn_remat_identical_loss_and_grads():
    from heltondetection_tpu.models.faster_rcnn import (FasterRCNN,
                                                        RCNNConfig,
                                                        faster_rcnn_loss,
                                                        init_faster_rcnn)

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    x1 = rng.uniform(0, 40, (2, 4, 2))
    wh = rng.uniform(8, 24, (2, 4, 2))
    boxes = jnp.asarray(np.concatenate([x1, x1 + wh], -1), jnp.float32)
    cls = jnp.asarray(rng.integers(0, 3, (2, 4)), jnp.int32)
    mask = jnp.ones((2, 4), bool)

    def run(remat):
        cfg = RCNNConfig(num_classes=3, img_size=64, rpn_pre_nms_topk=64,
                         rpn_post_nms_topk=32, rpn_batch=16, box_batch=16,
                         backbone="resnet18", remat=remat)
        m = FasterRCNN(cfg)
        v = init_faster_rcnn(m, jax.random.PRNGKey(0), 64)

        def loss_fn(p):
            loss, metrics, _ = faster_rcnn_loss(
                m, {"params": p, "batch_stats": v["batch_stats"]},
                img, boxes, cls, mask, cfg, jax.random.PRNGKey(7),
                train=True)
            return loss

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(v["params"])
        return v, float(loss), grads

    v0, l0, g0 = run(False)
    v1, l1, g1 = run(True)
    assert (jax.tree_util.tree_structure(v0["params"]) ==
            jax.tree_util.tree_structure(v1["params"]))
    _tree_allclose(v0["params"], v1["params"])
    assert l0 == pytest.approx(l1, abs=1e-5)
    _tree_allclose(g0, g1, atol=1e-5)


def test_remat_through_config_layer():
    """cfg.model.remat reaches both families via build_model."""
    from heltondetection_tpu.configs.base import ModelConfig
    from heltondetection_tpu.engine.runner import build_model

    my = build_model(ModelConfig(family="yolov5", variant="n",
                                 num_classes=3, img_size=64, remat=True), 3)
    assert my.remat is True
    mr = build_model(ModelConfig(family="faster_rcnn", backbone="resnet18",
                                 num_classes=3, img_size=64, remat=True), 3)
    assert mr.cfg.remat is True
    # and a rematted forward actually runs
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = my.init(jax.random.PRNGKey(0), x, train=False)
    outs = my.apply(v, x, train=False)
    assert all(bool(jnp.isfinite(o).all()) for o in outs)
