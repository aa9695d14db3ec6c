"""Model export — rebuild target C24/N6: the reference exports YOLOv5 to
ONNX and runs it under onnxruntime (README.md:23). The TPU-native
equivalent of "portable serialized inference graph" is jax.export
(StableHLO): serialize the jitted forward(+decode+NMS) with its weights
baked in, reload and execute without the model-building code.
"""

from __future__ import annotations

import os
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_serving_fn(fn: Callable, example_args: Tuple, path: str) -> None:
    """Serialize ``jit(fn)`` for the example arg shapes to ``path``."""
    exp = jax_export.export(jax.jit(fn))(*example_args)
    blob = exp.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)


def load_serving_fn(path: str) -> Callable:
    with open(path, "rb") as f:
        blob = f.read()
    exp = jax_export.deserialize(blob)
    return lambda *args: exp.call(*args)


def export_yolov5(model, variables, num_classes: int, img_size: int,
                  path: str, *, batch_size: int = 1,
                  conf_thres: float = 0.25, iou_thres: float = 0.45,
                  max_det: int = 300, anchors=None, quant=None) -> None:
    """One-stop YOLOv5 serving-graph export: uint8 image batch in →
    (boxes, scores, classes, valid) out, weights baked as constants
    (mirrors the reference's ONNX graph which also embeds weights).
    ``quant`` (ops/quant.py tree) bakes the W8A8 int8 program instead —
    the deploy-time analog of the reference's half-precision ONNX
    (README.md:23), one notch further."""
    if quant is not None:
        variables = {**variables, "quant": quant}
    from heltondetection_tpu.engine.evaluator import make_postprocess
    from heltondetection_tpu.models.yolov5 import decode_full

    post = make_postprocess(num_classes, conf_thres=conf_thres,
                            iou_thres=iou_thres, max_det=max_det,
                            multi_label=False)

    def serve(images_u8):
        images = images_u8.astype(jnp.float32) / 255.0
        outs = model.apply(variables, images, train=False)
        if anchors is not None:
            boxes, obj, cls = decode_full(outs, num_classes,
                                          anchors=anchors)
        else:
            boxes, obj, cls = decode_full(outs, num_classes)
        return post(boxes, obj, cls)

    x = jnp.zeros((batch_size, img_size, img_size, 3), jnp.uint8)
    export_serving_fn(serve, (x,), path)


def export_faster_rcnn(model, variables, img_size: int, path: str, *,
                       batch_size: int = 1, quant=None) -> None:
    """FasterRCNN serving-graph export: uint8 batch → (boxes, scores,
    classes, valid) fixed-shape dets, the same ``faster_rcnn_infer``
    pipeline the evaluator runs (RPN → RoIAlign → box head → class NMS).
    The reference scopes ONNX export to YOLOv5 only (README.md:23); the
    StableHLO path covers both families."""
    from heltondetection_tpu.models.faster_rcnn import faster_rcnn_infer

    if quant is not None:
        variables = {**variables, "quant": quant}

    def serve(images_u8):
        images = images_u8.astype(jnp.float32) / 255.0
        return faster_rcnn_infer(model, variables, images, model.cfg)

    x = jnp.zeros((batch_size, img_size, img_size, 3), jnp.uint8)
    export_serving_fn(serve, (x,), path)


def export_model(cfg, model, variables, path: str) -> None:
    """Family dispatch for the CLI ``--mode export``. ``test.int8``
    exports the QUANTIZED program (weights baked as int8 constants)."""
    quant = None
    if getattr(cfg.test, "int8", False):
        from heltondetection_tpu.engine.runner import _int8_quant_tree
        quant = _int8_quant_tree(cfg, model, variables)
    if cfg.model.family == "yolov5":
        from heltondetection_tpu.engine.runner import _cfg_anchors
        export_yolov5(model, variables, cfg.model.num_classes,
                      cfg.model.img_size, path,
                      conf_thres=cfg.test.conf_thres,
                      iou_thres=cfg.test.iou_thres,
                      anchors=_cfg_anchors(cfg), quant=quant)
    elif cfg.model.family == "faster_rcnn":
        export_faster_rcnn(model, variables, cfg.model.img_size, path,
                           quant=quant)
    else:
        raise ValueError(f"no export path for family {cfg.model.family!r}")
