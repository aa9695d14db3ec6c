"""W8A8 post-training quantization for the serving path.

Beyond-reference capability (the reference's fastest serve path is
TensorRT-FP16-style half precision; README.md:23 exports ONNX for
onnxruntime): TPU v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 peak
(394 TOPS vs 197 TFLOPs), and tools/bench_int8.py measures 1.8-1.9x on
chained YOLO-shaped convs INCLUDING the per-layer quantize/dequantize
elementwise cost (which XLA fuses into neighbours). This module turns a
trained float checkpoint into a "quant" variables collection that
models/common.ConvBnAct consumes:

* BatchNorm is folded into the conv (serving runs on running stats, so BN
  is an affine per-channel transform: w' = w * g, b' = beta - mean * g with
  g = gamma / sqrt(var + eps)).
* Weights are quantized per-output-channel symmetric int8
  (s_w[c] = amax_c / 127).
* Activations are quantized per-tensor symmetric int8 with STATIC scales
  calibrated by running a few batches through the float model while every
  ConvBnAct sows its input abs-max (models/common.calibration_mode).
* The head (detect convs) and the 3-channel stem stay float: the head's
  logits are precision-sensitive (models/yolov5.py keeps them f32 even in
  bf16 serving) and the stem is <0.3% of the FLOPs.

Usage::

    qtree = quantize_yolo(model, variables, calib_images)   # (N,S,S,3) u8
    step = make_packed_serve_step(model, variables, nc, quant=qtree)

Only convs present in the quant tree run int8; everything else falls back
to the float path, so partial quantization (``skip=``) is free.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from heltondetection_tpu.models.common import calibration_mode

BN_EPS = 1e-3   # models/common.ConvBnAct BatchNorm epsilon


def _is_convbn(sub) -> bool:
    return (isinstance(sub, dict) and "conv" in sub and "bn" in sub
            and isinstance(sub["conv"], dict) and "kernel" in sub["conv"])


def calibrate_amax(model, variables, batches: Iterable[np.ndarray], *,
                   normalize: bool = True) -> Dict[str, Any]:
    """Run calibration batches through the float model; return the tree of
    per-ConvBnAct input abs-max values (host numpy, module-path nested).

    ``batches`` yields (B,S,S,3) images in the SERVING input convention:
    raw 0-255 when ``normalize`` (the serve step owns /255), else already
    scaled. Static activation scales come from the max over all batches.
    """
    @jax.jit
    def _one(v, im):
        if normalize:
            im = im.astype(jnp.float32) / 255.0
        _, mut = model.apply(v, im, train=False, mutable=["quant_stats"])
        return mut["quant_stats"]

    amax: Optional[Dict[str, Any]] = None
    with calibration_mode():
        for b in batches:
            stats = jax.tree.map(np.asarray, _one(variables, jnp.asarray(b)))
            amax = stats if amax is None else jax.tree.map(
                np.maximum, amax, stats)
    if amax is None:
        raise ValueError("calibration needs at least one batch")
    return amax


def _quant_one(convbn: Dict[str, Any], bstats: Dict[str, Any],
               in_amax: float) -> Optional[Dict[str, jnp.ndarray]]:
    kernel = np.asarray(convbn["conv"]["kernel"], np.float32)  # (k,k,ci,co)
    gamma = np.asarray(convbn["bn"]["scale"], np.float32)
    beta = np.asarray(convbn["bn"]["bias"], np.float32)
    mean = np.asarray(bstats["bn"]["mean"], np.float32)
    var = np.asarray(bstats["bn"]["var"], np.float32)
    g = gamma / np.sqrt(var + BN_EPS)
    w = kernel * g                          # fold BN scale into the conv
    bias = beta - mean * g
    s_in = float(in_amax) / 127.0
    if s_in <= 0.0:                         # conv never saw data — skip
        return None
    s_w = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0   # per-out-channel
    s_w = np.where(s_w > 0, s_w, 1.0)
    w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
    return {
        "w_q": jnp.asarray(w_q),
        "out_scale": jnp.asarray((s_in * s_w).astype(np.float32)),
        "bias": jnp.asarray(bias.astype(np.float32)),
        "inv_in_scale": jnp.asarray(np.float32(1.0 / s_in)),
    }


def build_quant_tree(variables, amax_tree: Dict[str, Any], *,
                     skip: Sequence[str] = ()) -> Dict[str, Any]:
    """Fold+quantize every calibrated ConvBnAct into a "quant" collection
    mirroring the params tree's module paths. ``skip`` holds '/'-joined
    path prefixes to leave in float (e.g. "backbone/stem")."""
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    def _walk(p, b, a, path: Tuple[str, ...]):
        out = {}
        for k, sub in p.items():
            cur = path + (k,)
            dotted = "/".join(cur)
            if _is_convbn(sub):
                if any(dotted == s or dotted.startswith(s + "/")
                       for s in skip):
                    continue
                if not (isinstance(a, dict) and k in a
                        and isinstance(b, dict) and k in b):
                    continue        # never calibrated (e.g. unused branch)
                q = _quant_one(sub, b[k], np.asarray(a[k]["in_amax"]))
                if q is not None:
                    out[k] = q
            elif isinstance(sub, dict):
                w = _walk(sub, b.get(k, {}) if isinstance(b, dict) else {},
                          a.get(k, {}) if isinstance(a, dict) else {}, cur)
                if w:
                    out[k] = w
        return out

    return _walk(params, bstats, amax_tree, ())


def quantize_yolo(model, variables, calib_images, *, normalize: bool = True,
                  batch_size: int = 8,
                  skip: Sequence[str] = ("backbone/stem",)
                  ) -> Dict[str, Any]:
    """One-call PTQ for a YOLOv5-family model: calibrate activation scales
    on ``calib_images`` ((N,S,S,3) uint8 array or an iterable of batches),
    then fold+quantize every backbone/neck ConvBnAct. Returns the "quant"
    tree for ``make_packed_serve_step(..., quant=...)`` /
    ``model.apply({**variables, "quant": qtree}, ...)``."""
    if isinstance(calib_images, np.ndarray) or hasattr(calib_images, "shape"):
        arr = np.asarray(calib_images)
        batches = [arr[i:i + batch_size]
                   for i in range(0, arr.shape[0], batch_size)]
    else:
        batches = calib_images
    amax = calibrate_amax(model, variables, batches, normalize=normalize)
    return build_quant_tree(variables, amax, skip=skip)
