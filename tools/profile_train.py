"""Capture a jax.profiler trace of the packed YOLOv5 train step.

Usage: python tools/profile_train.py [batch] [variant=s] ; writes
/tmp/jaxtrace_train.
Parse with tools/xplane_top.py. Run from the repo root (the axon TPU
plugin resolves only there).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run from anywhere)
import glob, sys
import numpy as np, jax, jax.numpy as jnp
import dataclasses
from heltondetection_tpu.models.yolov5 import build_yolov5
from heltondetection_tpu.train.schedule import make_optimizer
from heltondetection_tpu.train.trainer import create_train_state, make_train_step
from heltondetection_tpu.train.yolo_loss import YoloLossConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
VARIANT = sys.argv[2] if len(sys.argv) > 2 else "s"
S, nc, M = 640, 80, 128
model = dataclasses.replace(build_yolov5(VARIANT, num_classes=nc,
                                         dtype=jnp.bfloat16),
                            packed_train=True)
tx = make_optimizer(1e-3, total_steps=1000, warmup_steps=10)
state = create_train_state(model, jax.random.PRNGKey(0), S, tx)
cfg = YoloLossConfig(num_classes=nc, img_size=S)
step = jax.jit(make_train_step(model, tx, cfg, use_ema=True))

rng = np.random.default_rng(0)
batch = {
    "image": jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32)),
    "gt_boxes": jnp.asarray(rng.uniform(0, S, (B, M, 4)).astype(np.float32)),
    "gt_cls": jnp.asarray(rng.integers(0, nc, (B, M)).astype(np.int32)),
    "gt_mask": jnp.asarray(rng.uniform(0, 1, (B, M)) < 0.2),
}
for _ in range(4):
    state, m = step(state, batch)
float(m["total"])

jax.profiler.start_trace("/tmp/jaxtrace_train")
for _ in range(3):
    state, m = step(state, batch)
float(m["total"])
jax.profiler.stop_trace()
print(glob.glob("/tmp/jaxtrace_train/**/*.xplane.pb", recursive=True))
