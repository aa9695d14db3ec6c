"""Capture a jax.profiler trace of FasterRCNN 832^2 inference.

Usage: python tools/profile_rcnn.py [batch]; writes /tmp/jaxtrace_rcnn.
Parse with tools/xplane_top.py. Run from the repo root.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run from anywhere)
import glob, sys
import numpy as np, jax, jax.numpy as jnp
from heltondetection_tpu.models.faster_rcnn import (FasterRCNN, RCNNConfig,
    init_faster_rcnn, faster_rcnn_infer)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
cfg = RCNNConfig(num_classes=80, img_size=832)
model = FasterRCNN(cfg, dtype=jnp.bfloat16)
variables = init_faster_rcnn(model, jax.random.PRNGKey(0), cfg.img_size)
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(0, 1, (B, 832, 832, 3)).astype(np.float32))
inf = jax.jit(lambda v, im: faster_rcnn_infer(model, v, im, cfg)[1]
              .astype(jnp.float32).sum())
float(inf(variables, imgs))
for _ in range(3):
    float(inf(variables, imgs))

jax.profiler.start_trace("/tmp/jaxtrace_rcnn")
acc = jnp.zeros(())
for _ in range(3):
    acc = acc + inf(variables, imgs)
float(acc)
jax.profiler.stop_trace()
print(glob.glob("/tmp/jaxtrace_rcnn/**/*.xplane.pb", recursive=True))
