"""Trainer tests: overfit sanity (SURVEY.md §4 'overfit-10-images') and
data-parallel equivalence on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from heltondetection_tpu.models.yolov5 import YOLOv5
from heltondetection_tpu.parallel.mesh import (create_mesh, replicate,
                                               shard_batch)
from heltondetection_tpu.train.schedule import make_optimizer, warmup_cosine
from heltondetection_tpu.train.trainer import (TrainState, create_train_state,
                                               make_train_step)
from heltondetection_tpu.train.yolo_loss import YoloLossConfig


def _tiny_model(nc=4):
    return YOLOv5(num_classes=nc, depth_multiple=0.33, width_multiple=0.125)


def _synthetic_batch(bsz=2, img=64, M=8, nc=4, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.uniform(0, 1, (bsz, img, img, 3)).astype(np.float32)
    gt = np.zeros((bsz, M, 4), np.float32)
    cls = np.zeros((bsz, M), np.int32)
    mask = np.zeros((bsz, M), bool)
    for b in range(bsz):
        n = 2
        for i in range(n):
            cx, cy = rng.uniform(12, img - 12, 2)
            w, h = rng.uniform(8, 24, 2)
            gt[b, i] = (cx, cy, w, h)
            cls[b, i] = rng.integers(0, nc)
            mask[b, i] = True
    return {"image": jnp.asarray(images), "gt_boxes": jnp.asarray(gt),
            "gt_cls": jnp.asarray(cls), "gt_mask": jnp.asarray(mask)}


def test_warmup_cosine_shape():
    s = warmup_cosine(1e-3, 100, 10)
    assert abs(float(s(0))) < 1e-9
    assert abs(float(s(10)) - 1e-3) < 1e-5
    assert float(s(99)) < 2.1e-4  # decays toward lrf*lr0 = 1e-4


def test_overfit_loss_decreases():
    nc = 4
    model = _tiny_model(nc)
    cfg = YoloLossConfig(num_classes=nc, img_size=64)
    tx = make_optimizer(2e-3, total_steps=60, warmup_steps=5, grad_clip=10.0)
    state = create_train_state(model, jax.random.PRNGKey(0), 64, tx)
    step = jax.jit(make_train_step(model, tx, cfg))
    batch = _synthetic_batch()
    first = None
    last = None
    for i in range(60):
        state, metrics = step(state, batch)
        if i == 0:
            first = float(metrics["total"])
        last = float(metrics["total"])
    assert np.isfinite(last)
    assert last < first * 0.5, (first, last)
    assert int(state.step) == 60


def test_bf16_train_step_mixed_precision():
    """The shipped COCO configs train with dtype="bfloat16" (MXU compute
    dtype); params must stay f32 masters, the loss must track the f32
    model's, and training must still converge. Pins the mixed-precision
    train path the production configs actually run."""
    nc = 4
    cfg = YoloLossConfig(num_classes=nc, img_size=64)
    batch = _synthetic_batch()
    tx = make_optimizer(2e-3, total_steps=40, warmup_steps=2, grad_clip=10.0)

    losses = {}
    states = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        model = YOLOv5(num_classes=nc, depth_multiple=0.33,
                       width_multiple=0.125, dtype=dtype)
        state = create_train_state(model, jax.random.PRNGKey(0), 64, tx)
        step = jax.jit(make_train_step(model, tx, cfg))
        state, metrics = step(state, batch)
        losses[dtype] = float(metrics["total"])
        states[dtype] = state
    # f32 master params regardless of compute dtype
    for leaf in jax.tree_util.tree_leaves(states[jnp.bfloat16].params):
        assert leaf.dtype == jnp.float32, leaf.dtype
    # same init → bf16 compute tracks the f32 loss to bf16 rounding
    assert abs(losses[jnp.bfloat16] - losses[jnp.float32]) < \
        0.05 * abs(losses[jnp.float32]) + 0.05, losses

    # and it still overfits: loss halves within 40 steps
    model = YOLOv5(num_classes=nc, depth_multiple=0.33, width_multiple=0.125,
                   dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0), 64, tx)
    step = jax.jit(make_train_step(model, tx, cfg))
    first = last = None
    for i in range(40):
        state, metrics = step(state, batch)
        first = float(metrics["total"]) if i == 0 else first
        last = float(metrics["total"])
    assert np.isfinite(last) and last < first * 0.6, (first, last)


def test_ema_tracks_params():
    nc = 4
    model = _tiny_model(nc)
    cfg = YoloLossConfig(num_classes=nc, img_size=64)
    tx = make_optimizer(1e-3, total_steps=20, warmup_steps=2)
    state = create_train_state(model, jax.random.PRNGKey(0), 64, tx)
    step = jax.jit(make_train_step(model, tx, cfg))
    batch = _synthetic_batch()
    for _ in range(3):
        state, _ = step(state, batch)
    # early steps: EMA decay ≈ 0 → EMA ≈ current params
    p = jax.tree_util.tree_leaves(state.params)[0]
    e = jax.tree_util.tree_leaves(state.ema_params)[0]
    np.testing.assert_allclose(np.asarray(e), np.asarray(p), atol=1e-2)


def test_data_parallel_8dev_matches_single():
    """Same global batch on a 1-device and an 8-device mesh → same loss and
    same updated params (the DDP-equivalence property, SURVEY.md §2c)."""
    nc = 4
    model = _tiny_model(nc)
    cfg = YoloLossConfig(num_classes=nc, img_size=64)
    tx = make_optimizer(1e-3, total_steps=10, warmup_steps=1, grad_clip=None)
    state = create_train_state(model, jax.random.PRNGKey(0), 64, tx)
    step = jax.jit(make_train_step(model, tx, cfg))
    batch = _synthetic_batch(bsz=8)

    # single device
    s1, m1 = step(state, batch)

    # 8-device mesh: batch sharded, state replicated
    mesh = create_mesh(8)
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    s8, m8 = step(state_r, batch_s)

    assert abs(float(m1["total"]) - float(m8["total"])) < 1e-3
    p1 = jax.tree_util.tree_leaves(s1.params)
    p8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)
    # batch_stats must also match (global-batch BN semantics)
    bs1 = jax.tree_util.tree_leaves(s1.batch_stats)
    bs8 = jax.tree_util.tree_leaves(s8.batch_stats)
    for a, b in zip(bs1, bs8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_rcnn_data_parallel_8dev_matches_single():
    """North-star config 5 (FasterRCNN multi-chip DP training): the two-
    stage train step — proposal sampling rng included — on a 1-device vs an
    8-device mesh.

    Unlike the dense YOLO path (exact equivalence above), the two-stage
    model is only equivalent up to GLOBAL-batch-BN reduction order: the
    epsilon difference in batch stats feeds DISCRETE selections (proposal
    top-k order, NMS keeps, fg/bg threshold sampling), so a near-tie can
    route a different roi through the box head. Dense components must still
    match tightly; the sampled second-stage losses within a coarse bound
    (measured divergence ~0.03 on this fixture; a plumbing bug — wrong
    sharding, missing all-reduce, desynced rng — shows up orders of
    magnitude larger)."""
    from heltondetection_tpu.models.faster_rcnn import (FasterRCNN,
                                                        RCNNConfig,
                                                        init_faster_rcnn)
    from heltondetection_tpu.train.trainer import (TrainState,
                                                   make_rcnn_train_step)
    cfg = RCNNConfig(num_classes=4, img_size=64, rpn_pre_nms_topk=64,
                     rpn_post_nms_topk=32, rpn_batch=16, box_batch=16)
    model = FasterRCNN(cfg)
    v = init_faster_rcnn(model, jax.random.PRNGKey(0), cfg.img_size)
    tx = make_optimizer(1e-3, total_steps=10, warmup_steps=1, grad_clip=None)
    state = TrainState(v["params"], v["batch_stats"], tx.init(v["params"]),
                       jnp.zeros((), jnp.int32), v["params"])
    step = jax.jit(make_rcnn_train_step(model, tx, cfg))
    rng = np.random.default_rng(0)
    bsz, M = 8, 8
    x1 = rng.uniform(0, 40, (bsz, M, 2)); wh = rng.uniform(8, 24, (bsz, M, 2))
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (bsz, 64, 64, 3)),
                             jnp.float32),
        "gt_boxes_xyxy": jnp.asarray(np.concatenate([x1, x1 + wh], -1),
                                     jnp.float32),
        "gt_cls": jnp.asarray(rng.integers(0, 4, (bsz, M)), jnp.int32),
        "gt_mask": jnp.asarray(rng.uniform(0, 1, (bsz, M)) < 0.7),
    }
    key = jax.random.PRNGKey(3)
    s1, m1 = step(state, batch, key)

    mesh = create_mesh(8)
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    s8, m8 = step(state_r, batch_s, key)
    # dense components: tight
    assert abs(float(m1["rpn_obj"]) - float(m8["rpn_obj"])) < 1e-3
    assert abs(float(m1["rpn_reg"]) - float(m8["rpn_reg"])) < 1e-3
    # sampled second-stage: bounded by the discreteness described above
    assert abs(float(m1["total"]) - float(m8["total"])) < 0.2
    # params move identically up to AdamW's reaction to the few swapped rois
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
