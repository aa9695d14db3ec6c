"""CLI end-to-end: config file → train (tiny) → eval → test on synthetic
data, all through the public one-command entry (README.md:12 parity)."""

import os
import sys
import tempfile
import textwrap

import numpy as np
import pytest

from synth_data import build_coco_dataset
from heltondetection_tpu.cli import main as cli_main


@pytest.fixture(scope="module")
def workspace():
    root = tempfile.mkdtemp()
    ann, imgs = build_coco_dataset(root, n_images=8, hw=(96, 128))
    cfg_path = os.path.join(root, "cfg.py")
    with open(cfg_path, "w") as f:
        f.write(textwrap.dedent(f"""
            from heltondetection_tpu.configs.base import (
                DataConfig, EvalConfig, ExperimentConfig, ModelConfig,
                TestConfig, TrainConfig)

            config = ExperimentConfig(
                name="tiny_synth",
                work_dir={os.path.join(root, 'runs')!r},
                data=DataConfig(format="coco", train_ann={ann!r},
                                train_imgs={imgs!r}, val_ann={ann!r},
                                val_imgs={imgs!r}, max_boxes=16),
                model=ModelConfig(family="yolov5", variant="n",
                                  num_classes=4, img_size=64),
                train=TrainConfig(epochs=160, batch_size=8, lr=5e-3,
                                  mosaic_p=0.0, hsv=False, flip_p=0.0,
                                  warmup_epochs=10, num_workers=2,
                                  eval_interval=1000, ckpt_interval=40),
                eval=EvalConfig(batch_size=4, conf_thres=0.05, max_det=32),
                test=TestConfig(conf_thres=0.2),
            )
        """))
    return root, ann, imgs, cfg_path


def test_cli_train_eval_test(workspace):
    root, ann, imgs, cfg_path = workspace
    assert cli_main(["--mode", "train", "--config", cfg_path]) == 0
    ckpt_dir = os.path.join(root, "runs", "tiny_synth", "ckpt")
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)

    res_json = os.path.join(root, "results.json")
    assert cli_main(["--mode", "eval", "--config", cfg_path,
                     "--out", res_json]) == 0
    # --out at eval writes the COCO submission-format results list with
    # original category ids (the synthetic ann uses ids 1..4 → labels 0..3)
    import json
    results = json.load(open(res_json))
    assert results and {"image_id", "category_id", "bbox", "score"} <= \
        set(results[0])
    with open(ann) as f:
        valid_cats = {c["id"] for c in json.load(f)["categories"]}
    assert {r["category_id"] for r in results} <= valid_cats
    # quality gate through the public runner: 160 overfit epochs on 8
    # synthetic images must reach high AP50 (catches silent train/eval
    # pipeline skew, e.g. normalization mismatches)
    from heltondetection_tpu.configs.base import load_config
    from heltondetection_tpu.engine.runner import run_eval
    stats = run_eval(load_config(cfg_path), verbose=False)
    assert stats["AP50"] > 0.6, stats

    # the final in-loop eval wrote the best-val-AP snapshot (lineage
    # best.pt); eval.ckpt="best" loads it through the public runner
    import dataclasses
    best_dir = os.path.join(root, "runs", "tiny_synth", "ckpt_best")
    assert os.path.isdir(best_dir) and \
        any(x.isdigit() for x in os.listdir(best_dir))
    cfg_b = load_config(cfg_path)
    cfg_b = dataclasses.replace(
        cfg_b, eval=dataclasses.replace(cfg_b.eval, ckpt="best"))
    assert run_eval(cfg_b, verbose=False)["AP50"] > 0.6

    img_path = os.path.join(imgs, sorted(os.listdir(imgs))[0])
    out_path = os.path.join(root, "out.png")
    assert cli_main(["--mode", "test", "--config", cfg_path,
                     "--source", img_path, "--out", out_path]) == 0
    assert os.path.exists(out_path)

    # --mode test on a DIRECTORY renders every image into the out dir
    out_dir = os.path.join(root, "test_out")
    assert cli_main(["--mode", "test", "--config", cfg_path,
                     "--source", imgs, "--out", out_dir]) == 0
    assert len(os.listdir(out_dir)) == len(os.listdir(imgs))


def test_cli_resume(workspace):
    """Second train call resumes from the saved checkpoint (SURVEY.md §5
    checkpoint/resume)."""
    root, ann, imgs, cfg_path = workspace
    assert cli_main(["--mode", "train", "--config", cfg_path]) == 0


def test_cli_export(workspace, tmp_path):
    root, ann, imgs, cfg_path = workspace
    out = str(tmp_path / "model.stablehlo")
    assert cli_main(["--mode", "export", "--config", cfg_path,
                     "--out", out]) == 0
    assert os.path.getsize(out) > 1000
    # reload + execute the serialized graph
    import jax.numpy as jnp
    from heltondetection_tpu.engine.export import load_serving_fn
    fn = load_serving_fn(out)
    dets = fn(jnp.zeros((1, 64, 64, 3), jnp.uint8))
    assert dets[0].shape == (1, 300, 4)


def test_export_faster_rcnn_roundtrip(tmp_path):
    """--mode export family dispatch (VERDICT r1 item 6): the FasterRCNN
    serving graph exports and the reloaded StableHLO executes with the
    fixed det contract."""
    import jax
    import jax.numpy as jnp
    from heltondetection_tpu.configs.base import (ExperimentConfig,
                                                  ModelConfig)
    from heltondetection_tpu.engine.export import (export_model,
                                                   load_serving_fn)
    from heltondetection_tpu.engine.runner import build_model
    from heltondetection_tpu.models.faster_rcnn import init_faster_rcnn

    cfg = ExperimentConfig(
        name="rcnn_export",
        model=ModelConfig(family="faster_rcnn", backbone="resnet18",
                          num_classes=4, img_size=64))
    model = build_model(cfg.model, cfg.model.num_classes)
    variables = init_faster_rcnn(model, jax.random.PRNGKey(0), 64)
    out = str(tmp_path / "rcnn.stablehlo")
    export_model(cfg, model, variables, out)
    assert os.path.getsize(out) > 1000
    fn = load_serving_fn(out)
    boxes, scores, classes, valid = fn(jnp.zeros((1, 64, 64, 3), jnp.uint8))
    assert boxes.shape == (1, model.cfg.max_det, 4)
    assert valid.shape == (1, model.cfg.max_det)


def test_cli_faster_rcnn_train_eval_test(tmp_path):
    """The two-stage family through the SAME public one-command path the
    YOLO fixture exercises above (train → eval → test+heatmaps). Round 1
    shipped an export crash precisely because no CLI e2e ran FasterRCNN;
    this closes that class of gap. Uses the ModelConfig proposal-budget
    knobs (torchvision constructor equivalents) to keep the tiny run fast."""
    root = str(tmp_path)
    ann, imgs = build_coco_dataset(root, n_images=8, hw=(96, 128))
    cfg_path = os.path.join(root, "cfg.py")
    with open(cfg_path, "w") as f:
        f.write(textwrap.dedent(f"""
            from heltondetection_tpu.configs.base import (
                DataConfig, EvalConfig, ExperimentConfig, ModelConfig,
                TestConfig, TrainConfig)

            config = ExperimentConfig(
                name="tiny_rcnn",
                work_dir={os.path.join(root, 'runs')!r},
                data=DataConfig(format="coco", train_ann={ann!r},
                                train_imgs={imgs!r}, val_ann={ann!r},
                                val_imgs={imgs!r}, max_boxes=16),
                model=ModelConfig(family="faster_rcnn", backbone="resnet18",
                                  num_classes=4, img_size=64,
                                  rpn_pre_nms_topk=64, rpn_post_nms_topk=32,
                                  rpn_batch=16, box_batch=16),
                train=TrainConfig(epochs=2, batch_size=4, lr=1e-4,
                                  mosaic_p=0.0, hsv=False, flip_p=0.0,
                                  warmup_epochs=1, num_workers=2,
                                  eval_interval=1000, ckpt_interval=1),
                eval=EvalConfig(batch_size=4, conf_thres=0.05, max_det=16),
                test=TestConfig(conf_thres=0.05, save_heatmaps=True),
            )
        """))
    assert cli_main(["--mode", "train", "--config", cfg_path]) == 0
    ckpt_dir = os.path.join(root, "runs", "tiny_rcnn", "ckpt")
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)

    assert cli_main(["--mode", "eval", "--config", cfg_path]) == 0

    img_path = os.path.join(imgs, sorted(os.listdir(imgs))[0])
    out_path = os.path.join(root, "out.png")
    assert cli_main(["--mode", "test", "--config", cfg_path,
                     "--source", img_path, "--out", out_path]) == 0
    assert os.path.exists(out_path)
    # demo-parity per-level FPN + RPN-objectness panels for the two-stage
    # family (demo/1.jpg [D] heatmap rows)
    stem = os.path.splitext(out_path)[0]
    assert os.path.exists(stem + "_heatmaps.png")
    assert os.path.exists(stem + "_objmaps.png")


def test_all_shipped_configs_load_and_build():
    """Every experiment config mirrors a reference table row (SURVEY.md §6)
    and must construct a model (catches stale field names/backbones)."""
    import importlib
    import pathlib
    from heltondetection_tpu.engine.runner import build_model
    cfg_dir = (pathlib.Path(__file__).parent.parent /
               "heltondetection_tpu" / "configs")
    n = 0
    for p in sorted(cfg_dir.glob("*.py")):
        if p.stem in ("__init__", "base"):
            continue
        mod = importlib.import_module(
            f"heltondetection_tpu.configs.{p.stem}")
        cfg = mod.config
        model = build_model(cfg.model, cfg.model.num_classes)
        assert model is not None
        n += 1
    assert n >= 30   # full per-table-row matrix (README.md:71-154)
