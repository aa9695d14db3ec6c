"""Measure the remat and grad_accum memory levers on the real chip
(VERDICT r2 item 4: replace the analytic "~1/3 extra backbone FLOPs" remat
claim and the grad_accum overhead claim with measured ms/step + HBM rows).

Usage: python tools/bench_remat.py [batch] [img] [accum] [remat:0|1]
  (defaults 8 1280 1 0)

Prints ms/step, img/s, XLA temp + peak HBM of the compiled step, and MFU.
Run from the repo root (the axon TPU plugin resolves only there).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run from anywhere)
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from heltondetection_tpu.models.yolov5 import build_yolov5
from heltondetection_tpu.train.schedule import make_optimizer
from heltondetection_tpu.train.trainer import (create_train_state,
                                               make_train_step)
from heltondetection_tpu.train.yolo_loss import YoloLossConfig
from heltondetection_tpu.utils.flops import mfu_of

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
S = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
ACCUM = int(sys.argv[3]) if len(sys.argv) > 3 else 1
REMAT = bool(int(sys.argv[4])) if len(sys.argv) > 4 else False
nc, M = 80, 128

model = build_yolov5("s", num_classes=nc, dtype=jnp.bfloat16)
model = dataclasses.replace(model, packed_train=True, remat=REMAT)
tx = make_optimizer(1e-3, total_steps=1000, warmup_steps=10)
state = create_train_state(model, jax.random.PRNGKey(0), S, tx)
cfg = YoloLossConfig(num_classes=nc, img_size=S)
step_fn = make_train_step(model, tx, cfg, use_ema=True, accum_steps=ACCUM)

rng = np.random.default_rng(0)
batch = {
    "image": jnp.asarray(rng.integers(0, 255, (B, S, S, 3)).astype(np.uint8)),
    "gt_boxes": jnp.asarray(rng.uniform(0, S, (B, M, 4)).astype(np.float32)),
    "gt_cls": jnp.asarray(rng.integers(0, nc, (B, M)).astype(np.int32)),
    "gt_mask": jnp.asarray(rng.uniform(0, 1, (B, M)) < 0.2),
}
t0 = time.perf_counter()
step = jax.jit(step_fn).lower(state, batch).compile()
mem = step.memory_analysis()
state, m = step(state, batch)
float(m["total"])
print(f"compile {time.perf_counter() - t0:.0f}s", flush=True)
for _ in range(3):
    state, m = step(state, batch)
float(m["total"])
t0 = time.perf_counter()
N = 10
for _ in range(N):
    state, m = step(state, batch)
float(m["total"])
dt = (time.perf_counter() - t0) / N
tfl, pct = mfu_of(step, dt)
print(f"yolov5s train {S}^2 b{B} accum={ACCUM} remat={int(REMAT)}: "
      f"{dt * 1e3:.1f} ms/step  {B / dt:.1f} img/s  "
      f"temp HBM {mem.temp_size_in_bytes / 2**30:.2f} GiB  "
      f"peak {mem.peak_memory_in_bytes / 2**30:.2f} GiB  "
      f"{tfl:.1f} TFLOP/s ({pct:.1f}% peak)", flush=True)
