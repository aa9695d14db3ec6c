"""Smoke tier (VERDICT r2 item 3): the fast per-commit e2e slice.

One tiny YOLO run through the PUBLIC one-command CLI covering the paths
that historically broke between full-suite runs: train loop + async ckpt +
best snapshot, eval restore (opt-state-free), --mode test rendering,
export round-trip, and resume. No quality gates (2 epochs learn nothing) —
this tier checks that the pipelines RUN; the overfit AP gates live in the
full suite (test_e2e.py, test_cli.py).

Run with `python -m pytest -m smoke -q` (< 5 min on 1 core); the RCNN
restore/test path is covered by the smoke-marked
test_infer.py::test_run_test_rcnn_heatmaps.
"""

import json
import os
import textwrap

import pytest

from synth_data import build_coco_dataset
from heltondetection_tpu.cli import main as cli_main

pytestmark = pytest.mark.smoke


def test_smoke_yolo_cli_train_eval_test_export_resume(tmp_path):
    root = str(tmp_path)
    ann, imgs = build_coco_dataset(root, n_images=8, hw=(96, 128))
    cfg_path = os.path.join(root, "cfg.py")
    with open(cfg_path, "w") as f:
        f.write(textwrap.dedent(f"""
            from heltondetection_tpu.configs.base import (
                DataConfig, EvalConfig, ExperimentConfig, ModelConfig,
                TestConfig, TrainConfig)

            config = ExperimentConfig(
                name="smoke",
                work_dir={os.path.join(root, 'runs')!r},
                data=DataConfig(format="coco", train_ann={ann!r},
                                train_imgs={imgs!r}, val_ann={ann!r},
                                val_imgs={imgs!r}, max_boxes=16),
                model=ModelConfig(family="yolov5", variant="n",
                                  num_classes=4, img_size=64),
                train=TrainConfig(epochs=2, batch_size=8, lr=5e-3,
                                  mosaic_p=0.0, hsv=False, flip_p=0.0,
                                  warmup_epochs=1, num_workers=1,
                                  eval_interval=1, ckpt_interval=1),
                eval=EvalConfig(batch_size=4, conf_thres=0.05, max_det=16),
                test=TestConfig(conf_thres=0.0),
            )
        """))
    run_dir = os.path.join(root, "runs", "smoke")

    # train: epoch loop + async ckpt + in-loop eval + best snapshot
    assert cli_main(["--mode", "train", "--config", cfg_path]) == 0
    assert os.listdir(os.path.join(run_dir, "ckpt"))
    assert any(x.isdigit() for x in os.listdir(os.path.join(run_dir,
                                                            "ckpt_best")))
    assert json.load(open(os.path.join(run_dir, "best.json")))["step"] >= 1

    # eval: opt-state-free restore + COCOeval + results-JSON dump
    res_json = os.path.join(root, "results.json")
    assert cli_main(["--mode", "eval", "--config", cfg_path,
                     "--out", res_json]) == 0
    assert os.path.exists(res_json)

    # test: restore + letterbox + decode/NMS + rendering
    img_path = os.path.join(imgs, sorted(os.listdir(imgs))[0])
    out_path = os.path.join(root, "out.png")
    assert cli_main(["--mode", "test", "--config", cfg_path,
                     "--source", img_path, "--out", out_path]) == 0
    assert os.path.exists(out_path)

    # export: StableHLO round-trip executes with the det contract
    export_path = os.path.join(root, "model.stablehlo")
    assert cli_main(["--mode", "export", "--config", cfg_path,
                     "--out", export_path]) == 0
    import jax.numpy as jnp
    from heltondetection_tpu.engine.export import load_serving_fn
    dets = load_serving_fn(export_path)(jnp.zeros((1, 64, 64, 3), jnp.uint8))
    assert dets[0].shape[0] == 1 and dets[0].shape[-1] == 4

    # resume: a second train call restores instead of restarting
    assert cli_main(["--mode", "train", "--config", cfg_path]) == 0
