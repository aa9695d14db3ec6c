"""End-to-end steady-state throughput: loader + jitted step OVERLAPPED
(VERDICT r1 item 3) — the composed numbers the step-only benches omit.

Measures on synthetic COCO JPEGs (no real dataset in this environment):
  a) YOLOv5s 640² training: native loader feeding the production jitted
     train step (packed head, AdamW+EMA), steady-state img/s;
  b) FasterRCNN-R50 832² training, same composition at b8;
  c) eval: full Evaluator.run loop (device step + host letterbox-inverse +
     DetEval accumulate) at b128 on the packed serve path.

Usage: PYTHONPATH=.:/root/.axon_site python tools/bench_e2e.py [yolo|rcnn|eval]...
Run on an idle host — the 1-core VM makes loader numbers swing 2-3x under load.
"""
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from tests.synth_data import build_coco_dataset  # noqa: E402

MODES = [m for m in sys.argv[1:] if not m.startswith("-")] or \
    ["yolo", "rcnn", "eval"]


def synth(n_images, hw):
    root = tempfile.mkdtemp()
    return build_coco_dataset(root, n_images=n_images, hw=hw, ext="jpg")


def sync(tree):
    # fetch-sync: block_until_ready is unreliable through the axon tunnel
    leaf = jax.tree_util.tree_leaves(tree)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])


def bench_train(family: str, img_size: int, batch: int, n_images: int,
                epochs: int = 3):
    from heltondetection_tpu.configs.base import (DataConfig,
                                                  ExperimentConfig,
                                                  ModelConfig, TrainConfig)
    from heltondetection_tpu.data.readers import CachedDataset, COCODataset
    from heltondetection_tpu.data.native_loader import (NativeTrainPipeline,
                                                        native_loader_available)
    from heltondetection_tpu.data.augment import TrainPipeline
    from heltondetection_tpu.data.loader import TrainLoader
    from heltondetection_tpu.engine.runner import build_model
    from heltondetection_tpu.train.schedule import make_optimizer
    from heltondetection_tpu.ops.boxes import cxcywh_to_xyxy

    hw = (int(img_size * 0.75), img_size)
    ann, imgs = synth(n_images, hw)
    ds = CachedDataset(COCODataset(ann, imgs))
    nc = ds.num_classes

    mc = ModelConfig(family=family, num_classes=nc, img_size=img_size,
                     variant="s")
    model = build_model(mc, nc)
    tx = make_optimizer(1e-3, total_steps=1000, warmup_steps=10)

    if native_loader_available():
        pipe = NativeTrainPipeline(ds, img_size, mosaic_p=0.5, seed=0)
    else:
        pipe = TrainPipeline(ds, img_size, mosaic_p=0.5, seed=0)
    loader = TrainLoader(pipe, batch, seed=0)

    is_rcnn = family == "faster_rcnn"
    if is_rcnn:
        from heltondetection_tpu.models.faster_rcnn import init_faster_rcnn
        from heltondetection_tpu.train.trainer import (TrainState,
                                                       make_rcnn_train_step)
        v = init_faster_rcnn(model, jax.random.PRNGKey(0), img_size)
        state = TrainState(v["params"], v["batch_stats"],
                           tx.init(v["params"]), jnp.zeros((), jnp.int32),
                           v["params"])
        step_fn = jax.jit(make_rcnn_train_step(model, tx, model.cfg))
    else:
        import dataclasses
        from heltondetection_tpu.train.trainer import (create_train_state,
                                                       make_train_step)
        from heltondetection_tpu.train.yolo_loss import YoloLossConfig
        state = create_train_state(model, jax.random.PRNGKey(0), img_size,
                                   tx)
        step_fn = jax.jit(make_train_step(
            dataclasses.replace(model, packed_train=True), tx,
            YoloLossConfig(num_classes=nc, img_size=img_size)))

    rng = jax.random.PRNGKey(1)
    steps = loader.steps_per_epoch()
    t_epoch = []
    for epoch in range(epochs):
        t0 = time.perf_counter()
        for bi, batch_np in enumerate(loader.epoch(epoch)):
            b = {k: jnp.asarray(v) for k, v in batch_np.items()}
            if is_rcnn:
                b["gt_boxes_xyxy"] = cxcywh_to_xyxy(b.pop("gt_boxes"))
                rng, sub = jax.random.split(rng)
                state, metrics = step_fn(state, b, sub)
            else:
                state, metrics = step_fn(state, b)
        sync(metrics)   # one fetch-sync per epoch: steps stay pipelined
        t_epoch.append(time.perf_counter() - t0)
        n = steps * batch
        print(f"  {family} epoch {epoch}: {n / t_epoch[-1]:.1f} img/s "
              f"({t_epoch[-1]:.1f}s, {steps} steps x b{batch})"
              + ("  [warmup+compile]" if epoch == 0 else ""), flush=True)
    # epochs=1 has no post-compile epoch; fall back to the only sample
    warm = steps * batch / min(t_epoch[1:] if len(t_epoch) > 1 else t_epoch)
    print(f"E2E TRAIN {family} {img_size}^2 b{batch}: {warm:.1f} img/s "
          f"steady-state (loader+step overlapped)")
    loader.close()
    return warm


def bench_eval(img_size: int = 640, batch: int = 128, n_images: int = 512):
    from heltondetection_tpu.data.readers import CachedDataset, COCODataset
    from heltondetection_tpu.data.native_loader import (NativeEvalPipeline,
                                                        native_loader_available)
    from heltondetection_tpu.data.augment import EvalPipeline
    from heltondetection_tpu.data.loader import EvalLoader
    from heltondetection_tpu.engine.evaluator import (Evaluator,
                                                      make_packed_serve_step)
    from heltondetection_tpu.models.yolov5 import build_yolov5
    from heltondetection_tpu.utils.cocoeval import DetEval

    hw = (480, 640)
    ann, imgs = synth(n_images, hw)
    ds = CachedDataset(COCODataset(ann, imgs))
    nc = ds.num_classes
    model = build_yolov5("s", nc, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, img_size, img_size, 3)), train=False)
    step = make_packed_serve_step(model, variables, nc, conf_thres=0.001,
                                  iou_thres=0.65)
    ev = Evaluator(None, nc, step_fn=step)
    if native_loader_available():
        pipe = NativeEvalPipeline(ds, img_size)
    else:
        pipe = EvalPipeline(ds, img_size)
    for rnd in range(3):
        det = DetEval(nc)
        ds.gt_for_eval(det)
        with EvalLoader(pipe, batch) as loader:
            t0 = time.perf_counter()
            stats = ev.run(loader, det_eval=det)
            dt = time.perf_counter() - t0
        print(f"  eval round {rnd}: {stats['num_images'] / dt:.1f} img/s "
              f"end-to-end ({stats['images_per_sec']:.1f} in-loop)"
              + ("  [warmup+compile]" if rnd == 0 else ""), flush=True)
    print(f"E2E EVAL yolov5s {img_size}^2 b{batch}: "
          f"{stats['num_images'] / dt:.1f} img/s incl. summarize")
    return stats


if __name__ == "__main__":
    if "yolo" in MODES:
        bench_train("yolov5", 640, 16, n_images=512)
    if "rcnn" in MODES:
        bench_train("faster_rcnn", 832, 8, n_images=128, epochs=3)
    if "eval" in MODES:
        bench_eval()
