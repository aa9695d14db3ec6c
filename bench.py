"""Headline benchmark: YOLOv5s 640² eval-path throughput on one chip,
including v6.1 decode + multi-label class-aware NMS (the BASELINE.json
north-star metric: "COCO val2017 images/sec/chip (YOLOv5s 640²) incl. NMS").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", plus
honesty fields: "baseline_source" (the denominator is the PUBLIC
Ultralytics A100 figure, not a local measurement — no A100 exists in this
environment, and TRT figures exclude NMS while ours includes it, so the
ratio is conservative), "achieved_tflops" and "mfu_pct" (XLA cost-analysis
FLOPs / measured time / 197 TFLOP/s v5e bf16 peak) so the perf claim does
not rest on a cross-vendor ratio alone."""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Backend-init retry policy: the axon tunnel raises UNAVAILABLE transiently
# (it voided round 2's perf record); a bounded retry-with-backoff makes one
# transient failure non-fatal while still finishing in well under the
# driver's budget. Hung inits are the driver's timeout to bound — killing a
# mid-init TPU process can wedge the tunnel for hours.
INIT_ATTEMPTS = 4
INIT_BACKOFF_S = (30.0, 90.0, 180.0)


def _init_backend_with_retry():
    """jax.devices() with bounded retries; returns the device list or exits
    after printing the one-line JSON error record the driver expects."""
    last_err = None
    for attempt in range(INIT_ATTEMPTS):
        try:
            return jax.devices()
        except Exception as e:  # UNAVAILABLE surfaces as RuntimeError
            last_err = e
            sys.stderr.write(f"bench: backend init attempt {attempt + 1}/"
                             f"{INIT_ATTEMPTS} failed: {e}\n")
            if attempt < INIT_ATTEMPTS - 1:
                from jax.extend import backend as jexb
                try:
                    jexb.clear_backends()  # drop the cached init failure
                except Exception:
                    pass
                time.sleep(INIT_BACKOFF_S[attempt])
    print(json.dumps({
        "metric": "YOLOv5s 640^2 fwd+decode+NMS images/sec/chip",
        "value": None, "unit": "img/s", "vs_baseline": None,
        "error": f"backend init failed after {INIT_ATTEMPTS} attempts: "
                 f"{type(last_err).__name__}: {last_err}"}))
    sys.exit(0)

A100_BASELINE_IMG_S = 1250.0  # Ultralytics YOLOv5s TensorRT FP16 A100 b32
BASELINE_SOURCE = ("public Ultralytics YOLOv5s v6.1 A100 TensorRT-FP16 b32 "
                   "figure (~0.8 ms/img); reference publishes no img/s, no "
                   "A100 in this environment to measure")
V5E_PEAK_TFLOPS = 197.0  # bf16 peak per chip (public v5e spec)
BATCH = 128  # throughput batch: the axon tunnel has ~18 ms/dispatch
             # latency, so small batches are dispatch-bound
WARMUP = 3
ITERS = 20


def main():
    _init_backend_with_retry()
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

    # MFU from XLA's own cost model of the exact compiled program
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
    except Exception:
        flops = float("nan")
    achieved_tflops = flops / dt / 1e12
    mfu = 100.0 * achieved_tflops / V5E_PEAK_TFLOPS

    rec = {
        "metric": f"YOLOv5s 640^2 fwd+decode+NMS images/sec/chip "
                  f"(bf16, b{BATCH})",
        "value": round(img_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_s / A100_BASELINE_IMG_S, 3),
        "baseline_source": BASELINE_SOURCE,
        "achieved_tflops": round(achieved_tflops, 2),
        "mfu_pct": round(mfu, 2),
    }
    # embed the latest multi-path record (tools/bench_full.py) so the
    # driver-captured bench line tracks EVERY headline path + baseline
    # per round, not just serve (VERDICT r4 item 3). bench_full runs
    # separately (~25 min); its rows carry their own measurement date.
    try:
        import os
        p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_FULL_LATEST.json")
        with open(p) as f:
            rec["paths"] = json.load(f)
        rec["paths_recorded"] = time.strftime(
            "%Y-%m-%d", time.localtime(os.path.getmtime(p)))
    except Exception:
        pass
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
