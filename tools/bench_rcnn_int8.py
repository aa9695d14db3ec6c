"""FasterRCNN-R50-FPN 832^2 inference: bf16 vs W8A8 int8 backbone+neck.

Measures the quantize_rcnn (ops/quant.py) serving path on the real chip.
Unlike YOLOv5s at 640^2 (memory-bound layers — int8 measured ~1.00x end
to end, see PERF_NOTES), the ResNet50 backbone at 832^2 has deep-channel
(256-2048) convs that are MXU-bound, where the int8 double-rate path can
actually pay.

Usage: python tools/bench_rcnn_int8.py [batch]   (default 8)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run from anywhere)
import time, sys
import numpy as np, jax, jax.numpy as jnp
from heltondetection_tpu.models.faster_rcnn import (FasterRCNN, RCNNConfig,
    init_faster_rcnn, faster_rcnn_infer)
from heltondetection_tpu.ops.quant import quantize_rcnn

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
cfg = RCNNConfig(num_classes=80, img_size=832)
model = FasterRCNN(cfg, dtype=jnp.bfloat16)
t0 = time.perf_counter()
variables = init_faster_rcnn(model, jax.random.PRNGKey(0), cfg.img_size)
print(f"init {time.perf_counter()-t0:.0f}s", flush=True)
rng = np.random.default_rng(0)

t0 = time.perf_counter()
calib = rng.integers(0, 255, (8, 832, 832, 3)).astype(np.uint8)
q = quantize_rcnn(model, variables, calib, batch_size=4)
print(f"calibration+fold {time.perf_counter()-t0:.0f}s", flush=True)

imgs = jnp.asarray(rng.uniform(0, 1, (B, 832, 832, 3)).astype(np.float32))
from heltondetection_tpu.utils.flops import mfu_of

for name, v in (("bf16", variables), ("int8", {**variables, "quant": q})):
    t0 = time.perf_counter()
    inf = jax.jit(lambda vv, im: faster_rcnn_infer(model, vv, im, cfg)[1]
                  .astype(jnp.float32).sum()).lower(v, imgs).compile()
    float(inf(v, imgs))
    print(f"{name} compile {time.perf_counter()-t0:.0f}s", flush=True)
    for _ in range(2):
        acc = jnp.zeros(())
        for _ in range(5):
            acc = acc + inf(v, imgs)
        float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(10):
        acc = acc + inf(v, imgs)
    float(acc)
    dt = (time.perf_counter() - t0) / 10
    tfl, pct = mfu_of(inf, dt)
    print(f"rcnn 832^2 b{B} {name}: {dt*1e3:.1f} ms/batch  {B/dt:.1f} img/s"
          f"  {tfl:.1f} TFLOP/s ({pct:.1f}% of v5e bf16 peak)", flush=True)
