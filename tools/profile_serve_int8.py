"""Capture jax.profiler traces of the fused serve step, bf16 AND W8A8.

Writes /tmp/jaxtrace_serve_bf16 and /tmp/jaxtrace_serve_int8; read with
tools/xplane_top.py. Decides WHERE the int8 conv gain goes in the composed
program (tools/bench_serve_int8.py measured parity end-to-end while the
isolated conv chain of tools/bench_int8.py measures 1.8-1.9x).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run from anywhere)
import glob

import numpy as np, jax, jax.numpy as jnp
from heltondetection_tpu.models.yolov5 import build_yolov5
from heltondetection_tpu.engine.evaluator import make_packed_serve_step
from heltondetection_tpu.ops.quant import quantize_yolo

B, nc = 128, 80
model = build_yolov5("s", num_classes=nc, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 640, 640, 3), jnp.float32), train=False)
rng = np.random.default_rng(0)
calib = rng.integers(0, 255, (8, 640, 640, 3)).astype(np.uint8)
q = quantize_yolo(model, variables, calib)

from jax.experimental.layout import Format, Layout

for name, quant in (("bf16", None), ("int8", q)):
    step = make_packed_serve_step(model, variables, nc, conf_thres=0.001,
                                  iou_thres=0.65, pre_nms_topk=1024,
                                  quant=quant)
    g = jax.jit(lambda u8: step(u8)[1].astype(jnp.float32).sum(),
                in_shardings=Format(Layout.AUTO)).lower(
        jax.ShapeDtypeStruct((B, 640, 640, 3), jnp.uint8)).compile()
    inp = jax.device_put(
        rng.integers(0, 255, (B, 640, 640, 3)).astype(np.uint8),
        g.input_formats[0][0])
    for _ in range(3):
        float(g(inp))
    out = f"/tmp/jaxtrace_serve_{name}"
    jax.profiler.start_trace(out)
    acc = jnp.zeros(())
    for _ in range(5):
        acc = acc + g(inp)
    float(acc)
    jax.profiler.stop_trace()
    print(name, glob.glob(f"{out}/**/*.xplane.pb", recursive=True))
