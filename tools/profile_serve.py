"""Capture a jax.profiler trace of the fused serve step (5 batches).

Writes /tmp/jaxtrace; parse the .xplane.pb with
tensorflow.tsl.profiler.protobuf.xplane_pb2 (see git history for a
ready-made parser) or load it in TensorBoard's profile plugin.

Run from the repo root (the axon TPU plugin resolves only there).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run from anywhere)
import glob, time
import numpy as np, jax, jax.numpy as jnp
from heltondetection_tpu.models.yolov5 import build_yolov5
from heltondetection_tpu.engine.evaluator import make_packed_serve_step

B, nc = 128, 80
model = build_yolov5("s", num_classes=nc, dtype=jnp.bfloat16)
x0 = jnp.zeros((1, 640, 640, 3), jnp.uint8)
variables = model.init(jax.random.PRNGKey(0), x0.astype(jnp.float32), train=False)
from jax.experimental.layout import Format, Layout
step = make_packed_serve_step(model, variables, nc)
g = jax.jit(lambda u8: step(u8)[1].sum(),
            in_shardings=Format(Layout.AUTO)).lower(
    jax.ShapeDtypeStruct((B, 640, 640, 3), jnp.uint8)).compile()
rng = np.random.default_rng(0)
inp = jax.device_put(rng.integers(0, 255, (B, 640, 640, 3)).astype(np.uint8),
                     g.input_formats[0][0])
float(g(inp))
for _ in range(3):
    float(g(inp))

jax.profiler.start_trace("/tmp/jaxtrace")
acc = jnp.zeros(())
for _ in range(5):
    acc = acc + g(inp)
float(acc)
jax.profiler.stop_trace()
print(glob.glob("/tmp/jaxtrace/**/*.xplane.pb", recursive=True))
