"""heltondetection_tpu — TPU-native object-detection framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
Scienthusiasts/HeltonDetection (reference README.md:2 "build a deep-learning
object detection framework from scratch"): two detector families (YOLOv5,
FasterRCNN), config-driven train/eval/test CLI, COCO/YOLO/DOTA readers,
mosaic/HSV/flip/letterbox augmentation, warmup+cosine AdamW training,
COCOeval mAP scoring, TTA+WBF, image/video inference, export, and
multi-chip data-parallel training over a jax.sharding.Mesh.

Design stance (TPU-first, not a port):
  * pure-function flax models, NHWC layout, bfloat16-friendly
  * fixed static shapes everywhere (padded boxes + validity masks)
  * postprocess (decode / IoU / class-aware NMS / RoIAlign / WBF) on device,
    with Pallas kernels for the hot paths
  * data parallelism = shard_map/pjit over a Mesh with psum over ICI,
    replacing the reference's DDP/NCCL (reference README.md:29)
"""

__version__ = "0.1.0"

__all__ = ["load_detector", "BatchingDetector", "serve_http"]


def __getattr__(name):
    # lazy: importing the package must stay cheap (no jax/flax import cost
    # until a detector is actually constructed)
    if name == "load_detector":
        from heltondetection_tpu.engine.runner import load_detector
        return load_detector
    if name in ("BatchingDetector", "serve_http"):
        from heltondetection_tpu.engine import serve
        return getattr(serve, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
