"""Full-stack integration: synthetic COCO → augment → loader → train →
EMA eval → NMS → letterbox inverse → COCO mAP (SURVEY.md §4
'overfit-10-images sanity'). Exercises every layer L1-L4 together."""

import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from synth_data import build_coco_dataset
from heltondetection_tpu.data.augment import EvalPipeline, TrainPipeline
from heltondetection_tpu.data.loader import (EvalLoader, TrainLoader,
                                             device_prep)
from heltondetection_tpu.data.readers import COCODataset
from heltondetection_tpu.engine.evaluator import Evaluator
from heltondetection_tpu.models.yolov5 import YOLOv5, decode_full
from heltondetection_tpu.train.schedule import make_optimizer
from heltondetection_tpu.train.trainer import (create_train_state,
                                               make_train_step)
from heltondetection_tpu.train.yolo_loss import YoloLossConfig
from heltondetection_tpu.utils.cocoeval import DetEval


def test_overfit_train_then_eval_map():
    root = tempfile.mkdtemp()
    ann, imgs = build_coco_dataset(root, n_images=8, hw=(96, 128))
    ds = COCODataset(ann, imgs)
    nc = ds.num_classes
    img_size = 64
    model = YOLOv5(num_classes=nc, depth_multiple=0.33, width_multiple=0.125)
    cfg = YoloLossConfig(num_classes=nc, img_size=img_size)
    steps = 300
    tx = make_optimizer(5e-3, total_steps=steps, warmup_steps=20)
    state = create_train_state(model, jax.random.PRNGKey(0), img_size, tx,
                               batch_size=8)
    step_fn = jax.jit(make_train_step(model, tx, cfg))
    pipe = TrainPipeline(ds, img_size, mosaic_p=0.0, hsv=False, flip_p=0.0,
                         max_boxes=16, seed=0)
    loader = TrainLoader(pipe, batch_size=8, num_workers=2)
    i = 0
    first = last = None
    while i < steps:
        for batch in loader.epoch(i):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            batch["image"] = device_prep(batch["image"])
            state, m = step_fn(state, batch)
            if first is None:
                first = float(m["total"])
            last = float(m["total"])
            i += 1
            if i >= steps:
                break
    assert last < first * 0.2, (first, last)

    variables = {"params": state.ema_params, "batch_stats": state.batch_stats}

    def fwd(images):
        outs = model.apply(variables, device_prep(images), train=False)
        return decode_full(outs, nc)

    ev = Evaluator(fwd, nc, conf_thres=0.01, pre_nms_topk=256, max_det=32)
    det = DetEval(nc)
    ds.gt_for_eval(det)
    stats = ev.run(EvalLoader(EvalPipeline(ds, img_size), batch_size=4,
                              num_workers=2), det_eval=det)
    assert stats["AP50"] > 0.8, stats
    assert stats["AP"] > 0.5, stats
