"""Full-stack FasterRCNN integration: synthetic COCO → loader → two-stage
train (RPN assign/sample + proposal NMS + RoIAlign + box head) → EMA eval →
class NMS → letterbox inverse → COCO mAP. The YOLO twin lives in
test_e2e.py; this pins the TWO-STAGE training math end-to-end — a wrong
sign anywhere in the RPN/RoI/box-head chain cannot overfit 8 images
(SURVEY.md §4 'overfit-10-images sanity', reference FasterRCNN rows
README.md:65-99)."""

import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from synth_data import build_coco_dataset
from heltondetection_tpu.data.augment import EvalPipeline, TrainPipeline
from heltondetection_tpu.data.loader import EvalLoader, TrainLoader
from heltondetection_tpu.data.readers import COCODataset
from heltondetection_tpu.engine.evaluator import Evaluator
from heltondetection_tpu.models.faster_rcnn import (FasterRCNN, RCNNConfig,
                                                    faster_rcnn_infer,
                                                    init_faster_rcnn)
from heltondetection_tpu.train.schedule import make_optimizer
from heltondetection_tpu.train.trainer import (TrainState,
                                               make_rcnn_train_step)
from heltondetection_tpu.utils.cocoeval import DetEval


def test_rcnn_overfit_train_then_eval_map():
    root = tempfile.mkdtemp()
    ann, imgs = build_coco_dataset(root, n_images=8, hw=(96, 128))
    ds = COCODataset(ann, imgs)
    nc = ds.num_classes
    img_size = 64
    # from-scratch trainable config: no FrozenBN / frozen stages (those
    # are the pretrained-fine-tune defaults) and tiny proposal budgets
    cfg = RCNNConfig(num_classes=nc, img_size=img_size, backbone="resnet18",
                     rpn_pre_nms_topk=64, rpn_post_nms_topk=32,
                     rpn_batch=32, box_batch=32, max_gt=16,
                     backbone_norm_eval=False, backbone_frozen_stages=0)
    model = FasterRCNN(cfg, dtype=jnp.float32)
    v = init_faster_rcnn(model, jax.random.PRNGKey(0), img_size)
    steps = 300
    tx = make_optimizer(1e-3, total_steps=steps, warmup_steps=20)
    state = TrainState(v["params"], v["batch_stats"], tx.init(v["params"]),
                       jnp.zeros((), jnp.int32), v["params"])
    step_fn = jax.jit(make_rcnn_train_step(model, tx, cfg))
    pipe = TrainPipeline(ds, img_size, mosaic_p=0.0, hsv=False, flip_p=0.0,
                         max_boxes=16, seed=0)
    loader = TrainLoader(pipe, batch_size=8, num_workers=2)
    rng = jax.random.PRNGKey(7)
    i = 0
    first = last = None
    try:
        while i < steps:
            for batch in loader.epoch(i):
                # cxcywh → xyxy on host, like engine/runner._train_epochs
                bb = np.asarray(batch.pop("gt_boxes"), np.float32)
                half = bb[..., 2:] * 0.5
                batch["gt_boxes_xyxy"] = np.concatenate(
                    [bb[..., :2] - half, bb[..., :2] + half], axis=-1)
                batch = {k: jnp.asarray(x) for k, x in batch.items()}
                rng, sub = jax.random.split(rng)
                state, m = step_fn(state, batch, sub)
                if first is None:
                    first = float(m["total"])
                last = float(m["total"])
                i += 1
                if i >= steps:
                    break
    finally:
        loader.close()
    assert last < first * 0.5, (first, last)

    variables = {"params": state.ema_params,
                 "batch_stats": state.batch_stats}

    def fwd(images):
        images = images.astype(jnp.float32) / 255.0
        ob, os_, oc, ov = faster_rcnn_infer(model, variables, images, cfg)
        # (boxes, obj, one-hot cls) eval contract, like runner's eval path
        cls = jax.nn.one_hot(jnp.maximum(oc, 0), nc) * ov[..., None]
        return ob, os_, cls

    ev = Evaluator(fwd, nc, conf_thres=0.01, pre_nms_topk=64, max_det=16)
    det = DetEval(nc)
    ds.gt_for_eval(det)
    stats = ev.run(EvalLoader(EvalPipeline(ds, img_size), batch_size=4,
                              num_workers=2), det_eval=det)
    assert stats["AP50"] > 0.5, stats
