"""Serving LATENCY benchmark: per-dispatch wall time at small batches.

Every PERF_NOTES row so far is throughput (b128/b8 pipelined); production
serving also cares about the b1/b4/b8 tail — one camera frame in, boxes
out. Measures the fused packed-head serve path (the same program bench.py
and the evaluator run) end-to-end per dispatch: H2D put of the uint8
frame(s), forward+decode+NMS, D2H fetch of the fixed-shape det arrays.

Two columns are reported per batch size:
  * dispatch_ms  — synced per-call wall time (put → step → fetch); on this
    dev host it includes the axon tunnel's ~18 ms round trip, which a
    production PCIe host does not pay.
  * device_ms    — the jitted step alone, inputs pre-staged, fetch-synced
    over ITERS pipelined calls (amortizes the tunnel; the closest proxy
    for on-host device latency available through the tunnel).

Usage: python tools/bench_latency.py [variant=s] [img=640]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

WARMUP = 5
ITERS = 30


def _measure(fn, frames, label: str):
    """One row of the latency table for a jitted step over ``frames``:
    synced-dispatch median/p99 (put → step → fetch per call) plus the
    pre-staged pipelined device time. Shared by every model family so the
    sync/timing methodology can never drift between benchmarks."""
    b = frames.shape[0]

    # ---- dispatch latency: full put→step→fetch per call, synced ----
    for _ in range(WARMUP):
        out = fn(jnp.asarray(frames))
        np.asarray(out[0])
    t = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = fn(jnp.asarray(frames))
        np.asarray(out[0])   # fetch = the only trustworthy sync (axon)
        t.append(time.perf_counter() - t0)
    disp_ms = 1e3 * float(np.median(t))
    p99_ms = 1e3 * float(np.quantile(t, 0.99))

    # ---- device time: pre-staged input, pipelined, one end fetch ----
    x = jax.device_put(frames)
    for _ in range(WARMUP):
        np.asarray(fn(x)[0])
    t0 = time.perf_counter()
    acc = None
    for _ in range(ITERS):
        acc = fn(x)
    np.asarray(acc[0])
    dev_ms = 1e3 * (time.perf_counter() - t0) / ITERS

    print(f"{label} b{b:<3d} dispatch {disp_ms:7.2f} ms "
          f"(p99 {p99_ms:7.2f})   device {dev_ms:7.2f} ms "
          f"({1e3 * b / dev_ms:7.1f} img/s)")
    return b, disp_ms, p99_ms, dev_ms


def bench_variant(variant: str, img: int, batches=(1, 4, 8)):
    from heltondetection_tpu.engine.evaluator import make_packed_serve_step
    from heltondetection_tpu.models.yolov5 import build_yolov5

    nc = 80
    model = build_yolov5(variant, num_classes=nc, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, img, img, 3), jnp.float32),
                           train=False)
    step = make_packed_serve_step(model, variables, nc, conf_thres=0.25,
                                  iou_thres=0.45, pre_nms_topk=1024)

    rows = []
    rng = np.random.default_rng(0)
    for b in batches:
        frames = rng.integers(0, 255, (b, img, img, 3)).astype(np.uint8)
        rows.append(_measure(jax.jit(step), frames, f"yolov5{variant} {img}²"))
    return rows


def bench_rcnn(img: int = 832, batches=(1, 4, 8)):
    """FasterRCNN-R50-FPN latency (full two-stage infer incl. RPN NMS,
    RoIAlign, box head, final class-aware NMS)."""
    from heltondetection_tpu.models.faster_rcnn import (FasterRCNN,
        RCNNConfig, faster_rcnn_infer, init_faster_rcnn)

    cfg = RCNNConfig(num_classes=80, img_size=img)
    model = FasterRCNN(cfg, dtype=jnp.bfloat16)
    variables = init_faster_rcnn(model, jax.random.PRNGKey(0), img)

    def step(images_u8):
        images = images_u8.astype(jnp.float32) / 255.0
        return faster_rcnn_infer(model, variables, images, cfg)

    rows = []
    rng = np.random.default_rng(0)
    for b in batches:
        frames = rng.integers(0, 255, (b, img, img, 3)).astype(np.uint8)
        rows.append(_measure(jax.jit(step), frames, f"rcnn-r50 {img}²"))
    return rows


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "s"
    img = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    print("devices:", jax.devices())
    if variant == "rcnn":
        bench_rcnn(img)
    else:
        bench_variant(variant, img)


if __name__ == "__main__":
    main()
