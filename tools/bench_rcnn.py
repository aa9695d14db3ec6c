"""FasterRCNN-R50-FPN 832^2 inference benchmark on the local TPU chip.

Usage: python tools/bench_rcnn.py [batch]   (default 8; b16+ can exceed
the tunnel compiler's program limit)

Run from the repo root (the axon TPU plugin resolves only there).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run from anywhere)
import time, sys
import numpy as np, jax, jax.numpy as jnp
from heltondetection_tpu.models.faster_rcnn import (FasterRCNN, RCNNConfig,
    init_faster_rcnn, faster_rcnn_infer)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
cfg = RCNNConfig(num_classes=80, img_size=832)
model = FasterRCNN(cfg, dtype=jnp.bfloat16)
t0 = time.perf_counter()
variables = init_faster_rcnn(model, jax.random.PRNGKey(0), cfg.img_size)
print(f"init {time.perf_counter()-t0:.0f}s", flush=True)
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(0, 1, (B, 832, 832, 3)).astype(np.float32))
t0 = time.perf_counter()
inf = jax.jit(lambda v, im: faster_rcnn_infer(model, v, im, cfg)[1]
              .astype(jnp.float32).sum()).lower(variables, imgs).compile()
float(inf(variables, imgs))
print(f"compile {time.perf_counter()-t0:.0f}s", flush=True)
for _ in range(2):
    acc = jnp.zeros(())
    for _ in range(5):
        acc = acc + inf(variables, imgs)
    float(acc)
t0 = time.perf_counter()
acc = jnp.zeros(())
for _ in range(10):
    acc = acc + inf(variables, imgs)
float(acc)
dt = (time.perf_counter() - t0) / 10
from heltondetection_tpu.utils.flops import mfu_of
tfl, pct = mfu_of(inf, dt)
print(f"rcnn 832^2 b{B}: {dt*1e3:.1f} ms/batch  {B/dt:.1f} img/s  "
      f"{tfl:.1f} TFLOP/s ({pct:.1f}% of v5e bf16 peak)", flush=True)
