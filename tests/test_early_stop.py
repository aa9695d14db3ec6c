"""Early stopping (train.patience): stop after `patience` epochs without
val-AP improvement, write a final checkpoint, and log the decision."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_run_train_early_stop(tmp_path):
    from tests.synth_data import build_coco_dataset
    from heltondetection_tpu.configs.base import ExperimentConfig
    from heltondetection_tpu.engine.runner import run_train

    ann, imgs = build_coco_dataset(str(tmp_path / "d"), n_images=8,
                                   hw=(96, 128))
    cfg = ExperimentConfig(name="earlystop")
    cfg.work_dir = str(tmp_path / "run")
    cfg.data.format = "coco"
    cfg.data.train_ann = cfg.data.val_ann = ann
    cfg.data.train_imgs = cfg.data.val_imgs = imgs
    cfg.data.max_boxes = 16
    cfg.model.variant = "n"
    cfg.model.num_classes = 4
    cfg.model.img_size = 64
    cfg.train.epochs = 8
    cfg.train.batch_size = 8
    cfg.train.num_workers = 1
    cfg.train.native_loader = False
    cfg.train.mosaic_p = 0.0
    cfg.train.hsv = False
    cfg.train.flip_p = 0.0
    cfg.train.warmup_epochs = 1
    cfg.train.eval_interval = 1
    cfg.train.ckpt_interval = 100     # final save must come from the stop
    cfg.train.patience = 2
    # an untrained yolov5n never clears conf 0.9, so val AP is pinned at 0:
    # the FIRST eval sets best (0 > -1), no later eval improves → stop at
    # epoch 3 (epoch(2) - best_epoch(0) >= patience(2))
    cfg.eval.conf_thres = 0.9

    run_train(cfg, resume=False)

    log = open(os.path.join(cfg.log_dir, "train.log")).read()
    assert "early stop at epoch 3" in log
    assert "epoch 4/8" not in log
    # the stop wrote the final weights even though ckpt_interval never hit
    from heltondetection_tpu.utils import ckpt as ckpt_io
    assert ckpt_io.latest_step(cfg.ckpt_dir) is not None
