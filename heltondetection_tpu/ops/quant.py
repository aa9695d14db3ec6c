"""W8A8 post-training quantization for the serving path.

Beyond-reference capability (the reference's fastest serve path is
TensorRT-FP16-style half precision; README.md:23 exports ONNX for
onnxruntime): TPU v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 peak
(394 TOPS vs 197 TFLOPs), and tools/bench_int8.py measures 1.8-1.9x on
chained YOLO-shaped convs INCLUDING the per-layer quantize/dequantize
elementwise cost (which XLA fuses into neighbours). This module turns a
trained float checkpoint into a "quant" variables collection that
models/common.conv_bn_maybe_quant consumes:

* BatchNorm is folded into the conv (serving runs on running stats, so BN
  is an affine per-channel transform: w' = w * g, b' = beta - mean * g with
  g = gamma / sqrt(var + eps)).
* Weights are quantized per-output-channel symmetric int8
  (s_w[c] = amax_c / 127).
* Activations are quantized per-tensor symmetric int8 with STATIC scales
  calibrated by running a few batches through the float model while every
  conv sows its input [amax, p999] (models/common.calibration_mode). The
  default activation clip is the 99.9th percentile — one activation
  outlier must not set the scale for the whole tensor.
* The detect/RPN/box heads and the 3-channel stems stay float: head logits
  are precision-sensitive (models/yolov5.py keeps them f32 even in bf16
  serving) and the stems are <0.3% of the FLOPs.

Two conv+BN layouts are recognized (both flow through the same
``conv_bn_maybe_quant`` serving hook):

* ConvBnAct modules (YOLO family, PAFPN necks): params
  ``{mod: {conv: {kernel}, bn: {scale, bias}}}`` -> quant entries nested
  at ``{mod: {w_q, out_scale, bias, inv_in_scale}}``.
* Sibling pairs (ResNet blocks): params ``{convN: {kernel}, bnN: ...}``
  with the BN partner named ``convN.replace("conv", "bn")`` -> flat quant
  entries ``{convN_w_q, convN_out_scale, ...}`` beside the submodules.

Usage::

    qtree = quantize_yolo(model, variables, calib_images)   # (N,S,S,3) u8
    step = make_packed_serve_step(model, variables, nc, quant=qtree)

    qtree = quantize_rcnn(model, variables, calib_images)   # FasterRCNN
    dets = faster_rcnn_infer(model, {**variables, "quant": qtree}, ...)

Only convs present in the quant tree run int8; everything else falls back
to the float path, so partial quantization (``skip=``) is free.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from heltondetection_tpu.models.common import calibration_mode
from heltondetection_tpu.utils.log import get_logger

BN_EPS_CONVBN = 1e-3   # models/common.ConvBnAct BatchNorm epsilon
BN_EPS_PAIR = 1e-5     # models/resnet.py (torchvision) BatchNorm epsilon


def _is_convbn(sub) -> bool:
    return (isinstance(sub, dict) and "conv" in sub and "bn" in sub
            and isinstance(sub["conv"], dict) and "kernel" in sub["conv"])


def _is_pair(p: Dict, k: str) -> bool:
    """ResNet-style sibling layout: conv params at ``k``, BN partner at
    ``k.replace("conv", "bn")`` in the same module."""
    partner = k.replace("conv", "bn")
    return ("conv" in k and k != "conv" and partner != k
            and isinstance(p.get(k), dict) and "kernel" in p[k]
            and isinstance(p.get(partner), dict) and "scale" in p[partner])


def calibrate_amax(model, variables, batches: Iterable[np.ndarray], *,
                   normalize: bool = True) -> Dict[str, Any]:
    """Run calibration batches through the float model; return the tree of
    per-conv input ``[amax, p999]`` stats (host numpy, module-path nested).

    ``batches`` yields (B,S,S,3) images in the SERVING input convention:
    raw 0-255 when ``normalize`` (the serve step owns /255), else already
    scaled. Static activation scales come from the elementwise max over
    all batches (p999-of-batch maxed across batches is a conservative
    estimate of the global 99.9th percentile).
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


def _act_scale(stats, act_clip: str) -> Tuple[float, float, float]:
    """(s_in numerator, amax, p999) PER TENSOR from a sown stats entry
    (``models.common._act_stats`` emits (2, C) = [amax_c, p999_c]; the
    per-layer mode reduces with a channel max). Accepts the legacy
    scalar / (2,) forms (cached trees from earlier rounds)."""
    s = np.asarray(stats, np.float32)
    if s.ndim >= 1 and s.shape[0] == 2:
        s = s.reshape(2, -1)
        amax, p999 = float(s[0].max()), float(s[1].max())
    else:
        amax = p999 = float(s.max())
    return (p999 if act_clip == "p999" else amax), amax, p999


def _act_scale_vec(stats, act_clip: str, *,
                   per_channel: bool = False) -> np.ndarray:
    """Activation scale vector (C,) = clip_value / 127 for the int8-flow
    mode.

    Default is the PER-TENSOR value broadcast over channels: the flow
    mode folds these scales into the consumer's weights per input
    channel, and genuinely per-channel scales (often spanning orders of
    magnitude — dead channels, BN spread) inflate the folded weights'
    per-out-channel range so badly that small-scale channels' weights
    quantize to zero. A broadcast scalar keeps the fold benign (scale
    variation enters only blockwise at concat joins, bounded by the
    ratio of the joined tensors' scales). ``per_channel=True`` keeps the
    raw vector for experimentation."""
    s = np.asarray(stats, np.float32).reshape(2, -1)
    v = s[1] if act_clip == "p999" else s[0]
    v = np.where(v > 0, v, s[0])        # dead-channel guard: fall back
    v = np.where(v > 0, v, 1.0)         # to amax, then to 1.0
    if not per_channel:
        v = np.full_like(v, v.max())
    return (v / 127.0).astype(np.float32)


def _quant_one(kernel, gamma, beta, mean, var, eps: float,
               in_val: float) -> Optional[Dict[str, jnp.ndarray]]:
    kernel = np.asarray(kernel, np.float32)        # (k,k,ci,co)
    g = np.asarray(gamma, np.float32) / np.sqrt(
        np.asarray(var, np.float32) + eps)
    w = kernel * g                          # fold BN scale into the conv
    bias = np.asarray(beta, np.float32) - np.asarray(mean, np.float32) * g
    s_in = in_val / 127.0
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
                     skip: Sequence[str] = (),
                     act_clip: str = "p999") -> Dict[str, Any]:
    """Fold+quantize every calibrated conv+BN into a "quant" collection
    mirroring the params tree's module paths. ``skip`` holds '/'-joined
    path prefixes to leave in float (e.g. "backbone/stem").

    ``act_clip``: "p999" (default — clip activations at the calibrated
    99.9th percentile) or "amax" (plain abs-max). Logs the quantized /
    skipped counts and flags outlier layers (amax >> p999) so a silent
    path-mismatch regression or a scale-crushing layer is visible.
    """
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    logger = get_logger()
    counts = {"quantized": 0, "skip_list": 0, "uncalibrated": 0}
    outliers = []

    def _emit(dotted: str, q, amax: float, p999: float):
        counts["quantized"] += 1
        ratio = amax / max(p999, 1e-12)
        logger.debug("int8 %s: s_in=%.5g (amax=%.4g p999=%.4g)", dotted,
                     1.0 / float(q["inv_in_scale"]), amax, p999)
        if ratio > 2.0:
            outliers.append((dotted, ratio))

    def _walk(p, b, a, path: Tuple[str, ...]):
        out = {}
        for k, sub in p.items():
            cur = path + (k,)
            dotted = "/".join(cur)
            if _is_convbn(sub):
                if any(dotted == s or dotted.startswith(s + "/")
                       for s in skip):
                    counts["skip_list"] += 1
                    continue
                if not (isinstance(a, dict) and k in a
                        and isinstance(b, dict) and k in b):
                    counts["uncalibrated"] += 1
                    continue        # never calibrated (e.g. unused branch)
                in_val, amax, p999 = _act_scale(a[k]["in_amax"], act_clip)
                q = _quant_one(sub["conv"]["kernel"], sub["bn"]["scale"],
                               sub["bn"]["bias"], b[k]["bn"]["mean"],
                               b[k]["bn"]["var"], BN_EPS_CONVBN, in_val)
                if q is None:
                    counts["uncalibrated"] += 1
                else:
                    out[k] = q
                    _emit(dotted, q, amax, p999)
            elif _is_pair(p, k):
                partner = k.replace("conv", "bn")
                if any(dotted == s or dotted.startswith(s + "/")
                       for s in skip):
                    counts["skip_list"] += 1
                    continue
                sk = k + "_in_amax"
                if not (isinstance(a, dict) and sk in a
                        and isinstance(b, dict) and partner in b):
                    counts["uncalibrated"] += 1
                    continue
                in_val, amax, p999 = _act_scale(a[sk], act_clip)
                q = _quant_one(sub["kernel"], p[partner]["scale"],
                               p[partner]["bias"], b[partner]["mean"],
                               b[partner]["var"], BN_EPS_PAIR, in_val)
                if q is None:
                    counts["uncalibrated"] += 1
                else:
                    for qk, qv in q.items():
                        out[f"{k}_{qk}"] = qv
                    _emit(dotted, q, amax, p999)
            elif isinstance(sub, dict) and "kernel" not in sub:
                w = _walk(sub, b.get(k, {}) if isinstance(b, dict) else {},
                          a.get(k, {}) if isinstance(a, dict) else {}, cur)
                if w:
                    out[k] = w
        return out

    tree = _walk(params, bstats, amax_tree, ())
    logger.info(
        "int8 PTQ: quantized %d convs (%d on skip list, %d uncalibrated, "
        "act_clip=%s)", counts["quantized"], counts["skip_list"],
        counts["uncalibrated"], act_clip)
    if counts["quantized"] == 0:
        logger.warning("int8 PTQ produced an EMPTY quant tree — the model "
                       "will silently serve float (path mismatch between "
                       "calibration stats and params?)")
    elif counts["uncalibrated"] > counts["quantized"]:
        logger.warning(
            "int8 PTQ: more convs uncalibrated (%d) than quantized (%d) — "
            "check that calibration ran through the same forward path",
            counts["uncalibrated"], counts["quantized"])
    for dotted, ratio in outliers:
        logger.info("int8 PTQ outlier layer %s: amax/p999=%.1f "
                    "(p999 clip is protecting its resolution)",
                    dotted, ratio)
    return tree


def _batched(calib_images, batch_size: int):
    if isinstance(calib_images, np.ndarray) or hasattr(calib_images, "shape"):
        arr = np.asarray(calib_images)
        return [arr[i:i + batch_size]
                for i in range(0, arr.shape[0], batch_size)]
    return calib_images


def quantize_yolo(model, variables, calib_images, *, normalize: bool = True,
                  batch_size: int = 8,
                  skip: Sequence[str] = ("backbone/stem",),
                  act_clip: str = "p999") -> Dict[str, Any]:
    """One-call PTQ for a YOLOv5-family model: calibrate activation scales
    on ``calib_images`` ((N,S,S,3) uint8 array or an iterable of batches),
    then fold+quantize every backbone/neck ConvBnAct. Returns the "quant"
    tree for ``make_packed_serve_step(..., quant=...)`` /
    ``model.apply({**variables, "quant": qtree}, ...)``."""
    amax = calibrate_amax(model, variables, _batched(calib_images,
                                                     batch_size),
                          normalize=normalize)
    return build_quant_tree(variables, amax, skip=skip, act_clip=act_clip)


# Head-boundary convs of the YOLOv5 PAFPN: their outputs feed the detect
# head (float, precision-sensitive), so the flow mode emits them float
# instead of paying a requant+dequant round trip at the boundary.
YOLO_FLOW_FLOAT_OUT = ("neck/td3/cv3", "neck/bu4/cv3", "neck/bu6/cv3")

# Float-tail presets (tools/sweep_int8_sensitivity.py, PERF_NOTES int8
# sensitivity entry): the PTQ AP cost concentrates in the HIGH-RESOLUTION
# early backbone stages and the top-down neck path feeding P3 (the
# small-box level) — quantizing only the rest is nearly free in AP.
# Overfit-protocol AP50-95 (float 0.9841): all-quantized 0.8915/0.8920
# (layer/flow); "balanced" 0.9653/0.9694; "accuracy" 0.9790/0.9731
# (1.0000/0.9923 of float with act_clip="amax").
YOLO_INT8_SKIP_PRESETS = {
    "none": ("backbone/stem",),
    "balanced": ("backbone/stem", "backbone/down1", "backbone/c3_1",
                 "neck/lat4", "neck/td3"),
    "accuracy": ("backbone/stem", "backbone/down1", "backbone/c3_1",
                 "backbone/down2", "backbone/c3_2", "neck/lat5", "neck/td4",
                 "neck/lat4", "neck/td3"),
}


def build_flow_tree(variables, amax_tree: Dict[str, Any], *,
                    skip: Sequence[str] = (),
                    float_out: Sequence[str] = (),
                    act_clip: str = "p999") -> Dict[str, Any]:
    """Build the int8 ACTIVATION-FLOW "quant" collection (ConvBnAct
    modules only — the YOLO family's building block).

    Unlike :func:`build_quant_tree` (per-layer W8A8: activations stay
    bf16 between convs — measured byte-neutral end to end, PERF_NOTES),
    the flow tree makes every quantized conv EMIT int8: activations live
    in HBM at 1 byte/element, halving the traffic the composed models are
    actually bound by. Per conv the tree stores the BN-folded FLOAT
    weights (``w_f``), ``bias``, a per-channel ``in_scale`` (used only at
    the float→int8 boundary), and a per-channel ``out_scale`` (omitted
    for ``float_out`` paths, which then emit float for the head). The
    consumer folds its input QT's per-channel scales into ``w_f`` at
    trace time and quantizes per output channel — XLA constant-folds the
    whole fold when the variables are closed over (the serve path), so
    the runtime cost is zero. Residual adds requantize with their own
    calibrated ``res_scale``.
    """
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    logger = get_logger()
    n_q, n_float_out = 0, 0

    def _walk(p, b, a, path: Tuple[str, ...]):
        nonlocal n_q, n_float_out
        out = {}
        if isinstance(a, dict) and "res_amax" in a:
            out["res_scale"] = jnp.asarray(
                _act_scale_vec(a["res_amax"], act_clip))
        for k, sub in p.items():
            cur = path + (k,)
            dotted = "/".join(cur)
            if _is_convbn(sub):
                if any(dotted == s or dotted.startswith(s + "/")
                       for s in skip):
                    continue
                if not (isinstance(a, dict) and k in a
                        and "in_amax" in a[k]
                        and isinstance(b, dict) and k in b):
                    continue
                kernel = np.asarray(sub["conv"]["kernel"], np.float32)
                g = np.asarray(sub["bn"]["scale"], np.float32) / np.sqrt(
                    np.asarray(b[k]["bn"]["var"], np.float32)
                    + BN_EPS_CONVBN)
                w_f = kernel * g
                bias = (np.asarray(sub["bn"]["bias"], np.float32)
                        - np.asarray(b[k]["bn"]["mean"], np.float32) * g)
                entry = {
                    "w_f": jnp.asarray(w_f),
                    "bias": jnp.asarray(bias),
                    "in_scale": jnp.asarray(
                        _act_scale_vec(a[k]["in_amax"], act_clip)),
                }
                is_float_out = any(dotted == s for s in float_out)
                if not is_float_out and "out_amax" in a[k]:
                    entry["out_scale"] = jnp.asarray(
                        _act_scale_vec(a[k]["out_amax"], act_clip))
                else:
                    n_float_out += 1
                out[k] = entry
                n_q += 1
            elif isinstance(sub, dict) and "kernel" not in sub:
                w = _walk(sub, b.get(k, {}) if isinstance(b, dict) else {},
                          a.get(k, {}) if isinstance(a, dict) else {}, cur)
                if w:
                    out[k] = w
        return out

    tree = _walk(params, bstats, amax_tree, ())
    logger.info("int8 flow PTQ: %d convs in the int8 stream "
                "(%d emit float at the head boundary, act_clip=%s)",
                n_q, n_float_out, act_clip)
    if n_q == 0:
        logger.warning("int8 flow PTQ produced an EMPTY tree — the model "
                       "will silently serve float")
    return tree


def quantize_yolo_flow(model, variables, calib_images, *,
                       normalize: bool = True, batch_size: int = 8,
                       skip: Sequence[str] = ("backbone/stem",),
                       float_out: Sequence[str] = YOLO_FLOW_FLOAT_OUT,
                       act_clip: str = "p999") -> Dict[str, Any]:
    """One-call int8-ACTIVATION-FLOW PTQ for a YOLOv5-family model: the
    throughput-oriented sibling of :func:`quantize_yolo` (same calibration
    pass, different execution strategy — see :func:`build_flow_tree`)."""
    amax = calibrate_amax(model, variables, _batched(calib_images,
                                                     batch_size),
                          normalize=normalize)
    return build_flow_tree(variables, amax, skip=skip, float_out=float_out,
                           act_clip=act_clip)


def quantize_rcnn(model, variables, calib_images, *, normalize: bool = True,
                  batch_size: int = 4,
                  skip: Sequence[str] = ("backbone/stem_conv",),
                  act_clip: str = "p999") -> Dict[str, Any]:
    """One-call PTQ for a FasterRCNN model: calibrate through the default
    forward (backbone -> neck -> RPN maps), then fold+quantize the
    backbone's conv+BN pairs and the neck's ConvBnActs. The RPN conv and
    the box head stay float (no BN to fold; precision-sensitive logits).

    The two-stage family's ideal PTQ case: ``backbone_norm_eval=True``
    (configs/base.py) keeps BN affine at train AND serve, so the fold is
    exact against the checkpoint's running stats. Convs are ~60-65% of the
    RCNN step (PERF_NOTES.md) — the int8 MXU path halves that portion.
    """
    amax = calibrate_amax(model, variables, _batched(calib_images,
                                                     batch_size),
                          normalize=normalize)
    return build_quant_tree(variables, amax, skip=skip, act_clip=act_clip)
