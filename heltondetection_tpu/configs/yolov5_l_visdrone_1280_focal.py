"""YOLOv5l-focalloss(root) VisDrone2019 1280² — the reference's best
VisDrone row (README.md:145: AP50 39.029 / mAP 22.589; focal 'root'
variant per README.md:143-145)."""

from heltondetection_tpu.configs.base import (DataConfig, EvalConfig,
                                              ExperimentConfig, ModelConfig,
                                              TestConfig, TrainConfig)

config = ExperimentConfig(
    name="yolov5_l_visdrone_1280_focal_root",
    data=DataConfig(
        format="coco",
        train_ann="datasets/visdrone/annotations/train.json",
        train_imgs="datasets/visdrone/images/train",
        val_ann="datasets/visdrone/annotations/val.json",
        val_imgs="datasets/visdrone/images/val",
    ),
    model=ModelConfig(family="yolov5", variant="l", num_classes=10,
                      img_size=1280, dtype="bfloat16"),
    train=TrainConfig(epochs=48, batch_size=8, lr=1e-3, mosaic_p=0.5,
                      focal="root"),
    eval=EvalConfig(batch_size=8),
    test=TestConfig(),
)
