"""Spatial partitioning (parallel/spatial.py): sharding the image H axis
over the mesh must reproduce the unsharded forward — GSPMD inserts the conv
halo exchanges (SURVEY.md §5's large-resolution scaling path)."""

import jax
import jax.numpy as jnp
import numpy as np

from heltondetection_tpu.models.yolov5 import YOLOv5
from heltondetection_tpu.parallel.spatial import (create_spatial_mesh,
                                                  image_sharding,
                                                  replicate_vars,
                                                  shard_images_spatial,
                                                  spatial_forward)


def _model_and_input(seed=0, hw=256, bsz=2):
    model = YOLOv5(num_classes=4, depth_multiple=0.33, width_multiple=0.25)
    x = jnp.asarray(np.random.default_rng(seed).uniform(0, 1,
                                                        (bsz, hw, hw, 3)),
                    jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    return model, v, x


def test_spatial_sharded_forward_matches_unsharded():
    model, v, x = _model_and_input()
    mesh = create_spatial_mesh(1, 8)
    fwd, imgs = spatial_forward(model, replicate_vars(v, mesh), mesh)
    outs_sp = fwd(shard_images_spatial(x, mesh))
    outs_1 = jax.jit(lambda xx: model.apply(v, xx, train=False))(x)
    for a, b in zip(jax.tree_util.tree_leaves(outs_sp),
                    jax.tree_util.tree_leaves(outs_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_data_by_spatial_mesh():
    """2-D (data × spatial) mesh: batch AND height sharded together."""
    model, v, x = _model_and_input(bsz=4)
    mesh = create_spatial_mesh(4, 2)
    fwd, imgs = spatial_forward(model, replicate_vars(v, mesh), mesh)
    outs_sp = fwd(jax.device_put(x, imgs))
    outs_1 = jax.jit(lambda xx: model.apply(v, xx, train=False))(x)
    for a, b in zip(jax.tree_util.tree_leaves(outs_sp),
                    jax.tree_util.tree_leaves(outs_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_spatial_train_step_matches_single_device():
    """The 2-D data×spatial TRAIN step (the path run_train takes with
    cfg.train.spatial_shards>1) must reproduce the single-device step:
    same loss and same updated params — GSPMD's conv halo exchanges and
    gradient reductions are a pure implementation detail."""
    from heltondetection_tpu.parallel.mesh import replicate, shard_batch
    from heltondetection_tpu.train.schedule import make_optimizer
    from heltondetection_tpu.train.trainer import (create_train_state,
                                                   make_train_step)
    from heltondetection_tpu.train.yolo_loss import YoloLossConfig
    from test_trainer import _synthetic_batch, _tiny_model

    model = _tiny_model(4)
    cfg = YoloLossConfig(num_classes=4, img_size=64)
    tx = make_optimizer(1e-3, total_steps=10, warmup_steps=1, grad_clip=None)
    state = create_train_state(model, jax.random.PRNGKey(0), 64, tx)
    step = jax.jit(make_train_step(model, tx, cfg))
    batch = _synthetic_batch(bsz=4)

    s1, m1 = step(state, batch)

    mesh = create_spatial_mesh(4, 2)            # 4 data x 2 spatial
    s2, m2 = step(replicate(state, mesh), shard_batch(batch, mesh))
    # image really is spatially sharded (not silently replicated)
    # (shard_batch keys on the dict entry name "image")
    sharded = shard_batch(batch, mesh)
    spec = sharded["image"].sharding.spec
    assert tuple(spec) == ("data", "spatial"), spec

    assert abs(float(m1["total"]) - float(m2["total"])) < 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_rcnn_spatial_train_step_matches_single_device():
    """The TWO-STAGE train step over a 2-D data×spatial mesh: the RoIAlign
    row gathers, fixed-shape NMS and top-k all read the H-sharded pyramid
    through XLA-inserted collectives. Like the RCNN DP-equivalence test
    (test_trainer), exactness is bounded by discrete resampling: conv/BN
    reduction-order epsilons can flip near-tie proposal selections, so
    every loss must sit inside the envelope and params stay close.

    Unlike the DP test (where per-shard tensor layouts are unchanged, so
    forward numerics are bit-stable and dense metrics match to 1e-3),
    spatial sharding changes per-conv/fusion SHAPES: XLA re-contracts FMAs
    and the IoU matrix drifts by ~1 ulp, which flips near-threshold
    fg/bg memberships → the RANDOM SAMPLED SETS differ → the sampled RPN
    losses move by O(1/sample_count), not O(ulp). Measured drift on this
    fixture ~0.03; a real plumbing bug (wrong halo, missing collective)
    shows up orders of magnitude larger."""
    from heltondetection_tpu.models.faster_rcnn import (FasterRCNN,
                                                        RCNNConfig,
                                                        init_faster_rcnn)
    from heltondetection_tpu.parallel.mesh import replicate, shard_batch
    from heltondetection_tpu.train.schedule import make_optimizer
    from heltondetection_tpu.train.trainer import (TrainState,
                                                   make_rcnn_train_step)

    cfg = RCNNConfig(num_classes=4, img_size=64, rpn_pre_nms_topk=64,
                     rpn_post_nms_topk=32, rpn_batch=16, box_batch=16,
                     backbone="resnet18")
    model = FasterRCNN(cfg)
    v = init_faster_rcnn(model, jax.random.PRNGKey(0), cfg.img_size)
    tx = make_optimizer(1e-3, total_steps=10, warmup_steps=1,
                        grad_clip=None)
    state0 = TrainState(v["params"], v["batch_stats"], tx.init(v["params"]),
                        jnp.zeros((), jnp.int32), v["params"])
    step = jax.jit(make_rcnn_train_step(model, tx, cfg))

    rng = np.random.default_rng(0)
    bsz, M = 4, 8
    x1 = rng.uniform(0, 40, (bsz, M, 2))
    wh = rng.uniform(8, 24, (bsz, M, 2))
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (bsz, 64, 64, 3)),
                             jnp.float32),
        "gt_boxes_xyxy": jnp.asarray(np.concatenate([x1, x1 + wh], -1),
                                     jnp.float32),
        "gt_cls": jnp.asarray(rng.integers(0, 4, (bsz, M)), jnp.int32),
        "gt_mask": jnp.asarray(rng.uniform(0, 1, (bsz, M)) < 0.7),
    }
    keys = [jax.random.PRNGKey(3), jax.random.PRNGKey(7)]

    # two steps: warmup lr is 0 at step 0, so single-step param
    # comparisons would be vacuous
    s1 = state0
    for k in keys:
        s1, m1 = step(s1, batch, k)

    mesh = create_spatial_mesh(4, 2)
    s2 = replicate(state0, mesh)
    sb = shard_batch(batch, mesh)
    assert tuple(sb["image"].sharding.spec) == ("data", "spatial")
    for k in keys:
        s2, m2 = step(s2, sb, k)

    for k2 in ("rpn_obj", "rpn_reg", "cls", "box"):
        assert abs(float(m1[k2]) - float(m2[k2])) < 0.1, (k2, m1[k2], m2[k2])
    assert abs(float(m1["total"]) - float(m2["total"])) < 0.2
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_run_train_spatial_shards_config(tmp_path):
    """cfg.train.spatial_shards drives a real run_train epoch on the
    8-virtual-device CPU mesh (4 data x 2 spatial) end-to-end."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synth_data import build_coco_dataset

    from heltondetection_tpu.configs.base import (DataConfig, EvalConfig,
                                                  ExperimentConfig,
                                                  ModelConfig, TestConfig,
                                                  TrainConfig)
    from heltondetection_tpu.engine.runner import run_train

    root = str(tmp_path)
    ann, imgs = build_coco_dataset(root, n_images=8, hw=(96, 128),
                                   num_classes=4)
    cfg = ExperimentConfig(
        name="tiny_spatial", work_dir=os.path.join(root, "runs"),
        data=DataConfig(format="coco", train_ann=ann, train_imgs=imgs,
                        val_ann=ann, val_imgs=imgs, max_boxes=16),
        model=ModelConfig(family="yolov5", variant="n", num_classes=4,
                          img_size=64),
        train=TrainConfig(epochs=2, batch_size=8, lr=1e-3, mosaic_p=0.0,
                          hsv=False, flip_p=0.0, warmup_epochs=1,
                          num_workers=2, eval_interval=1000,
                          ckpt_interval=2, spatial_shards=2),
        eval=EvalConfig(batch_size=4, conf_thres=0.05, max_det=32),
        test=TestConfig())
    run_train(cfg, resume=False)
    assert os.listdir(os.path.join(root, "runs", "tiny_spatial", "ckpt"))
