"""YOLOv5s 640² serve throughput: bf16 vs W8A8 int8 (ops/quant.py), b128.

Same methodology as bench.py (auto input layout, pipelined dispatches, one
trailing data fetch as the sync barrier — block_until_ready returns early
through the axon relay). Calibration images are random; activation scale
values don't change the compiled program's speed.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
WARMUP = 3
ITERS = 20
V5E_PEAK_BF16 = 197.0


def bench(step):
    def serve_fn(images_u8):
        dets = step(images_u8)
        return dets[1].astype(jnp.float32).sum()

    from jax.experimental.layout import Format, Layout
    compiled = jax.jit(serve_fn, in_shardings=Format(Layout.AUTO)).lower(
        jax.ShapeDtypeStruct((BATCH, 640, 640, 3), jnp.uint8)).compile()
    in_fmt = compiled.input_formats[0][0]
    rng = np.random.default_rng(0)
    inputs = [jax.device_put(
        rng.integers(0, 255, (BATCH, 640, 640, 3)).astype(np.uint8), in_fmt)
        for _ in range(4)]
    for _ in range(WARMUP):
        acc = jnp.zeros(())
        for k in range(4):
            acc = acc + compiled(inputs[k])
        float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for k in range(ITERS):
        acc = acc + compiled(inputs[k % 4])
    float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
    except Exception:
        flops = float("nan")
    return BATCH / dt, dt, flops / dt / 1e12


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "s"
    from heltondetection_tpu.models.yolov5 import build_yolov5
    from heltondetection_tpu.engine.evaluator import make_packed_serve_step
    from heltondetection_tpu.ops.quant import quantize_yolo, \
        quantize_yolo_flow

    from heltondetection_tpu.ops.quant import YOLO_INT8_SKIP_PRESETS

    presets = (sys.argv[2].split(",") if len(sys.argv) > 2
               else ["none", "balanced", "accuracy"])
    nc = 80
    model = build_yolov5(variant, num_classes=nc, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 640, 640, 3), jnp.float32),
                           train=False)
    rng = np.random.default_rng(1)
    calib = rng.integers(0, 255, (8, 640, 640, 3)).astype(np.uint8)
    cases = [("bf16", None)]
    for p in presets:
        skip = YOLO_INT8_SKIP_PRESETS[p]
        t0 = time.perf_counter()
        cases.append((f"int8[{p}]",
                      quantize_yolo(model, variables, calib, skip=skip)))
        cases.append((f"int8flow[{p}]",
                      quantize_yolo_flow(model, variables, calib, skip=skip)))
        print(f"{p} calibration+fold x2: {time.perf_counter() - t0:.1f}s",
              flush=True)

    for name, quant in cases:
        step = make_packed_serve_step(model, variables, nc, conf_thres=0.001,
                                      iou_thres=0.65, pre_nms_topk=1024,
                                      quant=quant)
        img_s, dt, tflops = bench(step)
        print(f"yolov5{variant} 640² b{BATCH} {name}: {img_s:7.1f} img/s  "
              f"{dt * 1e3:.1f} ms/batch  {tflops:.1f} TFLOP/s "
              f"({100 * tflops / V5E_PEAK_BF16:.1f}% of bf16 peak)",
              flush=True)


if __name__ == "__main__":
    main()
