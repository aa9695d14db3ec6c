"""Headline benchmark: YOLOv5s 640² eval-path throughput on one chip,
including v6.1 decode + multi-label class-aware NMS (the BASELINE.json
north-star metric: "COCO val2017 images/sec/chip (YOLOv5s 640²) incl. NMS").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes NO throughput numbers (BASELINE.md), so
the denominator is the public Ultralytics figure for YOLOv5s on A100
(TensorRT FP16 batch-32 ≈ 0.8 ms/img ≈ 1250 img/s, ultralytics/yolov5 v6.1
release table). vs_baseline = ours / 1250; the north-star target is ≥ 2.0.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_IMG_S = 1250.0  # Ultralytics YOLOv5s TensorRT FP16 A100 b32
BATCH = 128  # throughput batch: the axon tunnel has ~18 ms/dispatch
             # latency, so small batches are dispatch-bound
WARMUP = 3
ITERS = 20


def main():
    from heltondetection_tpu.models.yolov5 import build_yolov5
    from heltondetection_tpu.engine.evaluator import make_packed_serve_step

    nc = 80
    model = build_yolov5("s", num_classes=nc, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 640, 640, 3), jnp.uint8)
    variables = model.init(jax.random.PRNGKey(0),
                           x0.astype(jnp.float32), train=False)
    # fused packed-head serve path: the same step the evaluator runs
    step = make_packed_serve_step(model, variables, nc, conf_thres=0.001,
                                  iou_thres=0.65, pre_nms_topk=1024)

    def serve_fn(images_u8):
        # returns a scalar so the end-of-run fetch forces completion of the
        # whole pipelined run (block_until_ready is unreliable through the
        # axon tunnel; a data fetch is the only trustworthy sync)
        dets = step(images_u8)
        return dets[1].astype(jnp.float32).sum()

    # let XLA pick the input layout (saves the ~2 ms/batch relayout copy
    # the default NHWC row-major layout forces before the stem conv);
    # inputs are staged into that format on transfer, as a host loader would
    from jax.experimental.layout import Format, Layout
    lowered = jax.jit(serve_fn, in_shardings=Format(Layout.AUTO)).lower(
        jax.ShapeDtypeStruct((BATCH, 640, 640, 3), jnp.uint8))
    compiled = lowered.compile()
    in_fmt = compiled.input_formats[0][0]
    serve = compiled

    rng = np.random.default_rng(0)
    inputs = [jax.device_put(
        rng.integers(0, 255, (BATCH, 640, 640, 3)).astype(np.uint8), in_fmt)
        for _ in range(4)]

    # warmup rounds (compile + tunnel stabilisation), each fully synced
    for w in range(WARMUP):
        acc = jnp.zeros(())
        for k in range(4):
            acc = acc + serve(inputs[k])
        float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for k in range(ITERS):
        acc = acc + serve(inputs[k % 4])
    float(acc)  # single sync at the end of the pipelined run
    dt = (time.perf_counter() - t0) / ITERS
    img_s = BATCH / dt

    print(json.dumps({
        "metric": f"YOLOv5s 640^2 fwd+decode+NMS images/sec/chip "
                  f"(bf16, b{BATCH})",
        "value": round(img_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_s / A100_BASELINE_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
