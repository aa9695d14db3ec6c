"""Round-3 review-finding regressions in the train/eval runner:

* a dataset smaller than the global batch must FAIL, not silently train
  zero steps per epoch while checkpointing/evaluating the init;
* best.json seeds `best` even when a restart lands on start_epoch 0 (crash
  before the first rotating ckpt), so the one-slot ckpt_best/ snapshot is
  never overwritten by a worse post-restart eval;
* run_eval's `_reuse` dict (the in-loop eval path) must give identical
  stats to the from-scratch construction while reusing the parsed dataset,
  the GT-registered DetEval, and the jitted step across calls.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synth_data import build_coco_dataset
from heltondetection_tpu.configs.base import (DataConfig, EvalConfig,
                                              ExperimentConfig, ModelConfig,
                                              TrainConfig)
from heltondetection_tpu.engine.runner import (_write_best_json, build_model,
                                               run_eval, run_train)
from heltondetection_tpu.train.schedule import make_optimizer
from heltondetection_tpu.train.trainer import TrainState
from heltondetection_tpu.utils import ckpt as ckpt_io


def _tiny_cfg(root, work, **train_kw):
    ann, imgs = build_coco_dataset(root, n_images=4, hw=(96, 128))
    kw = dict(epochs=1, batch_size=2, lr=0.01, warmup_epochs=0,
              num_workers=0, eval_interval=1, native_loader=False)
    kw.update(train_kw)
    return ExperimentConfig(
        name="guards", work_dir=work,
        data=DataConfig(format="coco", train_ann=ann, train_imgs=imgs,
                        val_ann=ann, val_imgs=imgs, max_boxes=16),
        model=ModelConfig(family="yolov5", variant="n", num_classes=4,
                          img_size=64),
        train=TrainConfig(**kw),
        eval=EvalConfig(batch_size=2, conf_thres=0.01))


def test_zero_steps_per_epoch_raises(tmp_path):
    cfg = _tiny_cfg(tempfile.mkdtemp(), str(tmp_path),
                    batch_size=64)   # 4 images < batch 64 → 0 steps
    with pytest.raises(ValueError, match="0 steps"):
        run_train(cfg)


def test_best_seeded_on_fresh_start(tmp_path):
    """A restart with no rotating checkpoint (start_epoch 0) must still
    read best.json: the new run's first (worse) eval may not overwrite the
    surviving ckpt_best snapshot."""
    cfg = _tiny_cfg(tempfile.mkdtemp(), str(tmp_path))
    os.makedirs(os.path.join(str(tmp_path), "guards"), exist_ok=True)
    _write_best_json(cfg, {"AP": 0.93, "AP50": 0.95}, 999)
    best = run_train(cfg)   # 1 epoch from scratch: val AP ≈ 0 < 0.93
    assert best["AP"] == 0.93 and best["step"] == 999
    # and the one-slot best snapshot was never written by this run
    assert ckpt_io.latest_step(cfg.best_ckpt_dir) is None


def test_run_eval_reuse_matches_fresh(tmp_path):
    """_reuse path: same verdicts as the from-scratch path, with the
    dataset / DetEval / jitted step objects persisting across calls."""
    cfg = _tiny_cfg(tempfile.mkdtemp(), str(tmp_path))
    model = build_model(cfg.model, 4)
    v = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    variables = {"params": v["params"],
                 "batch_stats": v.get("batch_stats", {})}

    fresh = run_eval(cfg, variables=variables, model=model, verbose=False)
    reuse: dict = {}
    first = run_eval(cfg, variables=variables, model=model, verbose=False,
                     _reuse=reuse)
    ds, det, jfn = reuse["ds"], reuse["det"], reuse["jfn"]
    second = run_eval(cfg, variables=variables, model=model, verbose=False,
                      _reuse=reuse)
    # identical verdicts, and the cached objects were actually reused
    for k in ("AP", "AP50", "AP75"):
        assert fresh[k] == first[k] == second[k], (k, fresh, first, second)
    assert reuse["ds"] is ds and reuse["det"] is det and reuse["jfn"] is jfn

    # changed variables flow through the SAME jitted step (no rebuild)
    v2 = jax.tree_util.tree_map(lambda x: x * 1.5, variables)
    third = run_eval(cfg, variables=v2, model=model, verbose=False,
                     _reuse=reuse)
    assert reuse["jfn"] is jfn
    assert "num_images" in third and third["num_images"] == 4


def test_config_num_classes_sources(tmp_path):
    """_config_num_classes derives the class count the way run_train does
    (annotation-driven when available) so test/export-time model
    construction matches the checkpoint training wrote: explicit
    class_names win, else the annotations' category count, else
    cfg.model.num_classes (review finding: load_detector built an 80-class
    decode over a ds-derived head)."""
    from heltondetection_tpu.engine.runner import _config_num_classes

    # annotation-derived: 4 categories beat the default num_classes=80
    cfg = _tiny_cfg(tempfile.mkdtemp(), str(tmp_path))
    cfg.model.num_classes = 80
    assert _config_num_classes(cfg) == 4
    # explicit class_names beat everything
    cfg.data.class_names = ["a", "b", "c"]
    assert _config_num_classes(cfg) == 3
    # no data reachable → config value, with a log instead of a crash
    cfg.data.class_names = None
    cfg.data.val_ann = os.path.join(str(tmp_path), "missing.json")
    cfg.data.train_ann = ""
    assert _config_num_classes(cfg) == 80


def test_load_detector_annotation_derived_classes(tmp_path):
    """load_detector on a config whose annotations define fewer classes
    than cfg.model.num_classes must restore the trained head (the class
    count run_train actually used), not a mis-shaped config-width one."""
    import heltondetection_tpu
    from heltondetection_tpu.train.trainer import TrainState
    from heltondetection_tpu.train.schedule import make_optimizer

    cfg = _tiny_cfg(tempfile.mkdtemp(), str(tmp_path))
    cfg.model.num_classes = 80     # stale config value; annotations say 4
    model = build_model(cfg.model, 4)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    tx = make_optimizer(1e-3, total_steps=10, warmup_steps=1)
    state = TrainState(v["params"], v.get("batch_stats", {}),
                       tx.init(v["params"]), jnp.zeros((), jnp.int32),
                       v["params"])
    ckpt_io.save_state(cfg.ckpt_dir, jax.device_get(state), 1)

    det = heltondetection_tpu.load_detector(cfg)
    assert det.num_classes == 4
    img = np.random.default_rng(5).integers(0, 255, (96, 128, 3)) \
        .astype(np.uint8)
    boxes, scores, classes = det.detect_image(img)
    assert (classes < 4).all()
