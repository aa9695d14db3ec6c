"""Serving-layer throughput/latency bench: BatchingDetector on the chip.

Measures the request-level path production actually runs — K client
threads each submitting single RGB frames into the dynamic batcher, which
groups them onto the static-batch compiled step with max_in_flight
pipelining — versus the raw step-only ceiling from bench.py. On this dev
host the composed number is tunnel-bound (~30-52 MB/s H2D, PERF_NOTES);
the interesting outputs are (a) that the batcher SUSTAINS the tunnel
bound (batching/pipelining adds no serialization) and (b) the request
p50/p99 under concurrent load.

Usage: python tools/bench_serve.py [variant=s] [img=640] [batch=16]
       [clients=8] [n_frames=256] [buckets=] (e.g. "4,16" enables the
       adaptive batch bucket; empty = single compiled batch)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "s"
    img = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    clients = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    n_frames = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    buckets = (tuple(int(b) for b in sys.argv[6].split(","))
               if len(sys.argv) > 6 and sys.argv[6] else None)

    from heltondetection_tpu.engine.evaluator import make_packed_serve_step
    from heltondetection_tpu.engine.infer import Detector
    from heltondetection_tpu.engine.serve import BatchingDetector
    from heltondetection_tpu.models.yolov5 import build_yolov5

    nc = 80
    model = build_yolov5(variant, num_classes=nc, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, img, img, 3), jnp.float32),
                           train=False)
    # the production serving program: fused packed-head step (what
    # load_detector builds for yolov5 configs)
    step = make_packed_serve_step(model, variables, nc, conf_thres=0.25,
                                  iou_thres=0.45, multi_label=False)
    det = Detector(None, nc, img, conf_thres=0.25, detect_fn=step)
    rng = np.random.default_rng(0)
    # pre-decoded source frames (camera-shaped, letterboxed per request)
    frames = [rng.integers(0, 255, (img * 3 // 4, img, 3)).astype(np.uint8)
              for _ in range(16)]

    with BatchingDetector(det, batch_size=batch, max_wait_ms=5.0,
                          max_in_flight=2, batch_buckets=buckets) as bd:
        # warm: compile every bucket + caches (a full device batch even
        # when batch > len(frames))
        bd.warmup()
        for i in range(batch):
            bd.submit(frames[i % len(frames)])
        bd.detect(frames[0])
        bd.reset_stats()   # fill/padding %s reflect the measured window only

        lat = []
        lat_lock = threading.Lock()
        per_client = n_frames // clients
        t0 = time.perf_counter()

        def client(k):
            for i in range(per_client):
                f = frames[(k + i) % len(frames)]
                t1 = time.perf_counter()
                bd.detect(f, timeout=300)
                with lat_lock:
                    lat.append(time.perf_counter() - t1)

        threads = [threading.Thread(target=client, args=(k,))
                   for k in range(clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        stats = bd.stats()

    done = clients * per_client
    lat_ms = np.sort(np.asarray(lat)) * 1e3
    print(f"yolov5{variant} {img}² serve batch={batch} clients={clients}: "
          f"{done / wall:7.1f} req/s  p50 {lat_ms[len(lat_ms) // 2]:.1f} ms  "
          f"p99 {np.quantile(lat_ms, 0.99):.1f} ms")
    disp = stats.get("dispatched_slots") or stats["batches"] * batch
    print(f"batches {stats['batches']}  buckets {bd.batch_buckets}  fill "
          f"{1 - stats['padded_slots'] / disp:.2%}")


if __name__ == "__main__":
    main()
