"""Gradient accumulation (cfg.train.grad_accum) — micro-batch scan with a
single optimizer/EMA update per step (trainer._accum_grads).

Semantics pinned here:
* with k identical micro-batches, the accumulated gradient equals the
  monolithic full-batch gradient EXACTLY (the loss is batch-size-scaled,
  Ultralytics ``loss * bs`` — sums of micro-batch losses reproduce it);
* BN stats chain through the scan (k running-stat updates per step);
* composes with the data-parallel mesh (micro-batches shard over devices);
* the runner validates divisibility.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _make_yolo(nc=3, img=64):
    from heltondetection_tpu.models.yolov5 import YOLOv5
    from heltondetection_tpu.train.schedule import make_optimizer
    from heltondetection_tpu.train.trainer import (create_train_state,
                                                   make_train_step)
    from heltondetection_tpu.train.yolo_loss import YoloLossConfig

    model = YOLOv5(num_classes=nc, depth_multiple=0.33, width_multiple=0.125)
    cfg = YoloLossConfig(num_classes=nc, img_size=img)
    tx = make_optimizer(1e-3, total_steps=10, warmup_steps=1)
    state = create_train_state(model, jax.random.PRNGKey(0), img, tx,
                               batch_size=2)
    return model, tx, cfg, state


def _micro_batch(rng, m, img=64, nc=3, M=6):
    return {
        "image": jnp.asarray(rng.uniform(0, 1, (m, img, img, 3)),
                             jnp.float32),
        "gt_boxes": jnp.asarray(rng.uniform(16, 48, (m, M, 4)), jnp.float32),
        "gt_cls": jnp.asarray(rng.integers(0, nc, (m, M)), jnp.int32),
        "gt_mask": jnp.ones((m, M), bool),
    }


def _tile(batch, k):
    # micro-batch i is the INTERLEAVED rows i::k (trainer._accum_grads —
    # keeps micro-batches evenly sharded under the data mesh), so repeat
    # each row k times consecutively: every micro-batch then equals the
    # original batch exactly
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, k, axis=0), batch)


def test_accum_identical_microbatches_matches_monolithic():
    """k interleaved copies of one micro-batch: accumulated grads == the
    monolithic step's grads on the tiled batch (identical data → identical
    BN normalization → the sum-of-losses decomposition is exact)."""
    from heltondetection_tpu.train.trainer import make_train_step

    model, tx, cfg, state = _make_yolo()
    rng = np.random.default_rng(0)
    micro = _micro_batch(rng, 4)
    full = _tile(micro, 2)

    step1 = jax.jit(make_train_step(model, tx, cfg, use_ema=False))
    stepk = jax.jit(make_train_step(model, tx, cfg, use_ema=False,
                                    accum_steps=2))
    s1, m1 = step1(state, full)
    sk, mk = stepk(state, full)
    assert float(m1["total"]) == pytest.approx(float(mk["total"]), rel=1e-5)
    # identical update → identical params
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(sk.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6,
                                   rtol=0)
    assert int(sk.step) == 1   # ONE optimizer step per accumulated batch


def test_accum_chains_bn_stats():
    """The scan carries batch_stats: k micro-batch updates per step (same
    as k real small-batch steps), NOT one update on the first micro-batch."""
    from heltondetection_tpu.train.trainer import make_train_step

    model, tx, cfg, state = _make_yolo()
    rng = np.random.default_rng(1)
    b1 = _micro_batch(rng, 4)
    b2 = _micro_batch(rng, 4)
    # rows alternate b1[j], b2[j] so the interleaved split (rows i::2)
    # yields micro 0 == b1 and micro 1 == b2
    both = jax.tree_util.tree_map(
        lambda x, y: jnp.stack([x, y], axis=1).reshape(
            2 * x.shape[0], *x.shape[1:]), b1, b2)

    stepk = jax.jit(make_train_step(model, tx, cfg, use_ema=False,
                                    accum_steps=2))
    _, _ = stepk(state, both)   # warm compile
    sk, _ = stepk(state, both)

    # two sequential plain steps on b1 then b2 starting from the same
    # stats, WITHOUT applying updates in between, produce the same stats
    from heltondetection_tpu.train.yolo_loss import yolo_loss

    def stats_after(stats, batch):
        _, mut = model.apply({"params": state.params, "batch_stats": stats},
                             batch["image"], train=True,
                             mutable=["batch_stats"])
        return mut["batch_stats"]

    ref = stats_after(stats_after(state.batch_stats, b1), b2)
    for a, b in zip(jax.tree_util.tree_leaves(sk.batch_stats),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   rtol=0)


def test_accum_composes_with_data_parallel_mesh():
    from heltondetection_tpu.parallel.mesh import (create_mesh, replicate,
                                                   shard_batch)
    from heltondetection_tpu.train.trainer import make_train_step

    model, tx, cfg, state = _make_yolo()
    rng = np.random.default_rng(2)
    batch = _micro_batch(rng, 16)
    stepk = jax.jit(make_train_step(model, tx, cfg, use_ema=False,
                                    accum_steps=2))
    s0, m0 = stepk(state, batch)

    mesh = create_mesh(8)
    sm, mm = stepk(replicate(state, mesh), shard_batch(batch, mesh))
    assert float(m0["total"]) == pytest.approx(float(mm["total"]), rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(sm.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=0)


def test_accum_mean_convention_exact():
    """loss_is_batch_scaled=False (the faster_rcnn convention: loss is a
    batch MEAN): accumulated gradients must equal the full-batch gradient
    EXACTLY on a deterministic quadratic toy loss — guards against the
    k-times gradient inflation a plain sum would produce."""
    from heltondetection_tpu.train.trainer import _accum_grads

    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(5,)), jnp.float32)
    X = jnp.asarray(rng.normal(size=(8, 5)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(8,)), jnp.float32)

    def loss_fn(params, stats, batch, aux):
        pred = batch["x"] @ params
        loss = jnp.mean((pred - batch["y"]) ** 2)   # batch mean
        return loss, ({"total": loss}, stats)

    full_grad = jax.grad(
        lambda p: loss_fn(p, {}, {"x": X, "y": y}, None)[0])(w)
    metrics, _, grads = _accum_grads(
        loss_fn, w, {}, {"x": X, "y": y}, lambda i: None, 4,
        loss_is_batch_scaled=False)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(full_grad),
                               atol=1e-6, rtol=0)
    full_loss = float(loss_fn(w, {}, {"x": X, "y": y}, None)[0])
    assert float(metrics["total"]) == pytest.approx(full_loss, rel=1e-6)


def test_rcnn_accum_step_runs_finite():
    from heltondetection_tpu.models.faster_rcnn import (FasterRCNN,
                                                        RCNNConfig,
                                                        init_faster_rcnn)
    from heltondetection_tpu.train.schedule import make_optimizer
    from heltondetection_tpu.train.trainer import (TrainState,
                                                   make_rcnn_train_step)

    rcfg = RCNNConfig(num_classes=3, img_size=64, rpn_pre_nms_topk=64,
                      rpn_post_nms_topk=32, rpn_batch=16, box_batch=16,
                      backbone="resnet18")
    model = FasterRCNN(rcfg)
    v = init_faster_rcnn(model, jax.random.PRNGKey(0), 64)
    tx = make_optimizer(1e-3, total_steps=10, warmup_steps=1)
    state = TrainState(v["params"], v["batch_stats"], tx.init(v["params"]),
                       jnp.zeros((), jnp.int32), None)
    step = jax.jit(make_rcnn_train_step(model, tx, rcfg, use_ema=False,
                                        accum_steps=2))
    rng = np.random.default_rng(3)
    x1 = rng.uniform(0, 40, (4, 4, 2))
    wh = rng.uniform(8, 24, (4, 4, 2))
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)), jnp.float32),
        "gt_boxes_xyxy": jnp.asarray(np.concatenate([x1, x1 + wh], -1),
                                     jnp.float32),
        "gt_cls": jnp.asarray(rng.integers(0, 3, (4, 4)), jnp.int32),
        "gt_mask": jnp.ones((4, 4), bool),
    }
    s, m = step(state, batch, jax.random.PRNGKey(5))
    assert bool(jnp.isfinite(m["total"]))
    assert int(s.step) == 1


def test_runner_validates_divisibility(tmp_path):
    from heltondetection_tpu.configs.base import (DataConfig, EvalConfig,
                                                  ExperimentConfig,
                                                  ModelConfig, TestConfig,
                                                  TrainConfig)
    from heltondetection_tpu.engine.runner import run_train

    cfg = ExperimentConfig(
        name="bad_accum", work_dir=str(tmp_path),
        data=DataConfig(format="coco", train_ann="x", train_imgs="y"),
        model=ModelConfig(family="yolov5", variant="n", num_classes=3,
                          img_size=64),
        train=TrainConfig(epochs=1, batch_size=6, grad_accum=4),
        eval=EvalConfig(), test=TestConfig())
    with pytest.raises(ValueError, match="divisible by grad_accum"):
        run_train(cfg)
