"""YOLOv5s VisDrone2019 1280² (README.md:143: AP50 32.210 / mAP
17.681)."""

import dataclasses as _dc

from heltondetection_tpu.configs.yolov5_l_visdrone_1280_focal import \
    config as _base

config = _dc.replace(
    _base, name="yolov5_s_visdrone_1280",
    model=_dc.replace(_base.model, variant="s"),
    train=_dc.replace(_base.train, batch_size=16, focal="none"))
