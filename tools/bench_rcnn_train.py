"""FasterRCNN-R50 832^2 training-step benchmark on the local TPU chip.

Usage: python tools/bench_rcnn_train.py [batch] [img]   (defaults 8, 832)
Run from the repo root (the axon TPU plugin resolves only there).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run from anywhere)
import sys, time
import numpy as np, jax, jax.numpy as jnp
from heltondetection_tpu.models.faster_rcnn import (FasterRCNN, RCNNConfig,
                                                    init_faster_rcnn)
from heltondetection_tpu.train.schedule import make_optimizer
from heltondetection_tpu.train.trainer import TrainState, make_rcnn_train_step

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
S = int(sys.argv[2]) if len(sys.argv) > 2 else 832
M = 64
cfg = RCNNConfig(num_classes=80, img_size=S)
model = FasterRCNN(cfg, dtype=jnp.bfloat16)
v = init_faster_rcnn(model, jax.random.PRNGKey(0), S)
tx = make_optimizer(1e-3, total_steps=1000, warmup_steps=10)
state = TrainState(v["params"], v["batch_stats"], tx.init(v["params"]),
                   jnp.zeros((), jnp.int32), v["params"])
step_fn = make_rcnn_train_step(model, tx, cfg)
rng = np.random.default_rng(0)
x1 = rng.uniform(0, S - 80, (B, M, 2)); wh = rng.uniform(16, 80, (B, M, 2))
batch = {
    "image": jnp.asarray(rng.integers(0, 255, (B, S, S, 3)).astype(np.uint8)),  # production contract: u8 batches, /255 fused in-step
    "gt_boxes_xyxy": jnp.asarray(
        np.concatenate([x1, x1 + wh], -1).astype(np.float32)),
    "gt_cls": jnp.asarray(rng.integers(0, 80, (B, M)).astype(np.int32)),
    "gt_mask": jnp.asarray(rng.uniform(0, 1, (B, M)) < 0.5),
}
key = jax.random.PRNGKey(1)
t0 = time.perf_counter()
step = jax.jit(step_fn).lower(state, batch, key).compile()
state, m = step(state, batch, key)
print(f"compile {time.perf_counter()-t0:.0f}s", flush=True)
for _ in range(3):
    state, m = step(state, batch, key)
float(m["total"])
t0 = time.perf_counter()
N = 10
for _ in range(N):
    state, m = step(state, batch, key)
float(m["total"])
dt = (time.perf_counter() - t0) / N
from heltondetection_tpu.utils.flops import mfu_of
tfl, pct = mfu_of(step, dt)
print(f"rcnn train {S}^2 b{B}: {dt*1e3:.1f} ms/step  {B/dt:.1f} img/s  "
      f"{tfl:.1f} TFLOP/s ({pct:.1f}% of v5e bf16 peak)", flush=True)
