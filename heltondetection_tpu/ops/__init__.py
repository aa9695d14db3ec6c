from heltondetection_tpu.ops import boxes, letterbox, anchors  # noqa: F401
