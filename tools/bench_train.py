"""YOLOv5 640^2 training-step benchmark on the local TPU chip.

Usage: python tools/bench_train.py [batch] [packed] [variant=s]
(packed = the production packed-train head; identical math, see
models/yolov5.py)

Run from the repo root (the axon TPU plugin resolves only there).
"""
import os, time, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from heltondetection_tpu.models.yolov5 import build_yolov5
from heltondetection_tpu.train.schedule import make_optimizer
from heltondetection_tpu.train.trainer import create_train_state, make_train_step
from heltondetection_tpu.train.yolo_loss import YoloLossConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
VARIANT = sys.argv[3] if len(sys.argv) > 3 else "s"
S, nc, M = 640, 80, 128
import dataclasses
model = build_yolov5(VARIANT, num_classes=nc, dtype=jnp.bfloat16)
if len(sys.argv) > 2 and sys.argv[2] == "packed":
    model = dataclasses.replace(model, packed_train=True)
tx = make_optimizer(1e-3, total_steps=1000, warmup_steps=10)
state = create_train_state(model, jax.random.PRNGKey(0), S, tx)
cfg = YoloLossConfig(num_classes=nc, img_size=S)
step_fn = make_train_step(model, tx, cfg, use_ema=True)

rng = np.random.default_rng(0)
# uint8 image: the PRODUCTION step contract (run_train transfers uint8 and
# the jitted step fuses the /255 normalize, runner.py; an f32 feed adds a
# full-map f32→bf16 convert + relayout the real path never pays)
batch = {
    "image": jnp.asarray(rng.integers(0, 255, (B, S, S, 3)), jnp.uint8),
    "gt_boxes": jnp.asarray(rng.uniform(0, S, (B, M, 4)).astype(np.float32)),
    "gt_cls": jnp.asarray(rng.integers(0, nc, (B, M)).astype(np.int32)),
    "gt_mask": jnp.asarray(rng.uniform(0, 1, (B, M)) < 0.2),
}
t0 = time.perf_counter()
step = jax.jit(step_fn).lower(state, batch).compile()
state, m = step(state, batch)
print(f"compile {time.perf_counter()-t0:.0f}s", flush=True)
for _ in range(3):
    state, m = step(state, batch)
float(m["total"])
t0 = time.perf_counter()
N = 10
for _ in range(N):
    state, m = step(state, batch)
float(m["total"])
dt = (time.perf_counter() - t0) / N
from heltondetection_tpu.utils.flops import mfu_of
tfl, pct = mfu_of(step, dt)
print(f"yolov5{VARIANT} train b{B}: {dt*1e3:.1f} ms/step  {B/dt:.0f} img/s  "
      f"{tfl:.1f} TFLOP/s ({pct:.1f}% of v5e bf16 peak)", flush=True)

