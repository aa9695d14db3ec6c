"""Mesh-sharded eval equals single-device eval on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from heltondetection_tpu.engine.evaluator import Evaluator
from heltondetection_tpu.models.yolov5 import YOLOv5, decode_full
from heltondetection_tpu.parallel.mesh import create_mesh
from heltondetection_tpu.utils.cocoeval import DetEval


def test_sharded_eval_matches_single():
    nc = 4
    model = YOLOv5(num_classes=nc, depth_multiple=0.33, width_multiple=0.125)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)

    def fwd(images):
        outs = model.apply(variables, images / 255.0, train=False)
        return decode_full(outs, nc)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (8, 64, 64, 3)).astype(np.uint8)
    batch = {
        "image": jnp.asarray(imgs.astype(np.float32)),
        "img_id": list(range(8)),
        "scale": [1.0] * 8, "pad_x": [0.0] * 8, "pad_y": [0.0] * 8,
        "orig_hw": [(64, 64)] * 8,
    }

    def run(mesh):
        ev = Evaluator(fwd, nc, conf_thres=0.05, pre_nms_topk=128,
                       max_det=16, mesh=mesh)
        det = DetEval(nc)
        for i in range(8):
            det.add_gt(i, [[5, 5, 20, 20]], [0])
        return ev.run([batch], det_eval=det)

    s1 = run(None)
    s8 = run(create_mesh(8))
    for k in ("AP", "AP50", "AR100"):
        assert abs(s1[k] - s8[k]) < 1e-9, (k, s1[k], s8[k])


def test_run_eval_uses_mesh_when_divisible(tmp_path):
    """run_eval wires the data mesh itself when eval.batch_size divides the
    device count (multi-chip CLI eval — beats the reference's rank-0-only
    DDP eval)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synth_data import build_coco_dataset

    from heltondetection_tpu.configs.base import (DataConfig, EvalConfig,
                                                  ExperimentConfig,
                                                  ModelConfig, TestConfig,
                                                  TrainConfig)
    from heltondetection_tpu.engine.runner import (build_model, run_eval)
    from heltondetection_tpu.models.yolov5 import build_yolov5

    root = str(tmp_path)
    ann, imgs = build_coco_dataset(root, n_images=8, hw=(96, 128),
                                   num_classes=4)
    cfg = ExperimentConfig(
        name="tiny_eval_mesh", work_dir=os.path.join(root, "runs"),
        data=DataConfig(format="coco", train_ann=ann, train_imgs=imgs,
                        val_ann=ann, val_imgs=imgs, max_boxes=16),
        model=ModelConfig(family="yolov5", variant="n", num_classes=4,
                          img_size=64),
        train=TrainConfig(epochs=1, batch_size=8, num_workers=2),
        eval=EvalConfig(batch_size=8, conf_thres=0.05, max_det=32),
        test=TestConfig())
    import jax
    import jax.numpy as jnp
    model = build_model(cfg.model, 4)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           train=False)
    stats = run_eval(cfg, variables=variables, model=model, verbose=False)
    # untrained net: mAP ≈ 0 but the sharded loop must complete and report
    assert "AP" in stats and stats["AP"] >= 0.0
