"""Tests for the round-2 FasterRCNN fine-tune semantics: FrozenBN
(backbone_norm_eval), frozen stages (stop-gradient + optimizer masking via
path-prefix freezing), and the batch_stats overlay in the RCNN train step.

These mirror the torchvision FrozenBatchNorm2d / trainable_backbone_layers
and mmdet norm_eval/frozen_stages defaults of the reference's FasterRCNN
lineage (/root/reference/README.md:65 — pretrained-ResNet50 fine-tuning).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from heltondetection_tpu.models.backbones import (build_backbone,
                                                  frozen_stage_prefixes)
from heltondetection_tpu.models.faster_rcnn import (FasterRCNN, RCNNConfig,
                                                    init_faster_rcnn)
from heltondetection_tpu.train.schedule import make_optimizer
from heltondetection_tpu.train.trainer import (TrainState, _overlay_stats,
                                               make_rcnn_train_step)


def small_cfg(**kw):
    d = dict(num_classes=4, img_size=128, rpn_pre_nms_topk=64,
             rpn_post_nms_topk=64, rpn_batch=32, box_batch=32, max_det=16,
             max_gt=8)
    d.update(kw)
    return RCNNConfig(**d)


def _rcnn_batch(b=2, img=128, max_gt=8, seed=0):
    rng = np.random.default_rng(seed)
    gt = np.zeros((b, max_gt, 4), np.float32)
    cls = np.zeros((b, max_gt), np.int32)
    mask = np.zeros((b, max_gt), bool)
    for i in range(b):
        gt[i, 0] = [20, 20, 70, 80]
        gt[i, 1] = [60, 50, 110, 100]
        cls[i, :2] = [0, 2]
        mask[i, :2] = True
    return {
        "image": jnp.asarray(
            rng.integers(0, 255, (b, img, img, 3)).astype(np.uint8)),
        "gt_boxes_xyxy": jnp.asarray(gt), "gt_cls": jnp.asarray(cls),
        "gt_mask": jnp.asarray(mask)}


def _step_state(cfg, **model_kw):
    model = FasterRCNN(cfg, **model_kw)
    v = init_faster_rcnn(model, jax.random.PRNGKey(0), cfg.img_size)
    tx = make_optimizer(1e-2, total_steps=100, warmup_steps=0,
                        frozen_prefixes=frozen_stage_prefixes(
                            cfg.backbone, cfg.backbone_frozen_stages)
                        if cfg.backbone_frozen_stages else ())
    state = TrainState(v["params"], v["batch_stats"], tx.init(v["params"]),
                       jnp.zeros((), jnp.int32), v["params"])
    return model, tx, state


def test_frozen_stage_prefixes_match_real_param_paths():
    """The prefixes must actually select the stem+layerN subtrees of the
    initialized model (guards against silent renames)."""
    for name in ("resnet50", "cspdarknet_s"):
        mod = build_backbone(name)
        v = mod.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 64, 64, 3), jnp.float32))
        paths = ["backbone/" + "/".join(p)
                 for p in _collect_paths(v["params"])]
        prefs = frozen_stage_prefixes(name, 1)
        assert prefs, name
        for pref in prefs:
            assert any(p.startswith(pref) for p in paths), (name, pref)
        # and at least one param must remain trainable
        assert any(not any(p.startswith(pref) for pref in prefs)
                   for p in paths), name


def _collect_paths(tree, pre=()):
    if isinstance(tree, dict):
        out = []
        for k, v in tree.items():
            out += _collect_paths(v, pre + (k,))
        return out
    return [pre]


def test_frozen_stages_stop_gradient_and_optimizer_mask():
    """frozen_stages=1 → stem/layer1 grads exactly zero (stop_gradient)
    AND their params bit-unchanged after an optimizer step (incl. AdamW
    weight decay, which a grad-only mask would leak)."""
    cfg = small_cfg()           # defaults: norm_eval=True, frozen_stages=1
    assert cfg.backbone_norm_eval and cfg.backbone_frozen_stages == 1
    model, tx, state = _step_state(cfg)
    step = jax.jit(make_rcnn_train_step(model, tx, cfg, use_ema=False))
    # two steps: the warmup schedule gives lr=0 at optimizer count 0
    new_state, metrics = step(state, _rcnn_batch(max_gt=cfg.max_gt),
                              jax.random.PRNGKey(3))
    new_state, metrics = step(new_state, _rcnn_batch(max_gt=cfg.max_gt),
                              jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["total"]))

    prefs = frozen_stage_prefixes(cfg.backbone, 1)
    n_frozen = n_train = 0
    for path in _collect_paths(state.params):
        joined = "/".join(path)
        old = state.params
        new = new_state.params
        for k in path:
            old, new = old[k], new[k]
        if any(joined.startswith(p) for p in prefs):
            assert np.array_equal(np.asarray(old), np.asarray(new)), joined
            n_frozen += 1
        elif joined.startswith("backbone/layer3"):
            assert not np.array_equal(np.asarray(old), np.asarray(new)), \
                joined
            n_train += 1
    assert n_frozen > 5 and n_train > 5


def test_unfrozen_backbone_trains_everywhere():
    cfg = small_cfg(backbone_frozen_stages=0, backbone_norm_eval=False)
    model, tx, state = _step_state(cfg)
    step = jax.jit(make_rcnn_train_step(model, tx, cfg, use_ema=False))
    new_state, _ = step(state, _rcnn_batch(max_gt=cfg.max_gt),
                        jax.random.PRNGKey(3))
    new_state, _ = step(new_state, _rcnn_batch(max_gt=cfg.max_gt),
                        jax.random.PRNGKey(4))
    old = state.params["backbone"]["stem_conv"]["kernel"]
    new = new_state.params["backbone"]["stem_conv"]["kernel"]
    assert not np.array_equal(np.asarray(old), np.asarray(new))


def test_norm_eval_preserves_backbone_running_stats():
    """With norm_eval (the RCNN default) backbone BN running stats must
    survive a train step bit-identically; with norm_eval=False they must
    move. Guards the _overlay_stats merge in the train step."""
    for norm_eval in (True, False):
        cfg = small_cfg(backbone_norm_eval=norm_eval,
                        backbone_frozen_stages=0)
        model, tx, state = _step_state(cfg)
        step = jax.jit(make_rcnn_train_step(model, tx, cfg, use_ema=False))
        new_state, _ = step(state, _rcnn_batch(max_gt=cfg.max_gt),
                            jax.random.PRNGKey(3))
        old = state.batch_stats["backbone"]["stem_bn"]["mean"]
        new = new_state.batch_stats["backbone"]["stem_bn"]["mean"]
        same = np.array_equal(np.asarray(old), np.asarray(new))
        assert same == norm_eval, norm_eval
        # the stats tree keeps its full structure either way (resume +
        # eval paths read it wholesale)
        assert (jax.tree_util.tree_structure(new_state.batch_stats) ==
                jax.tree_util.tree_structure(state.batch_stats))


def test_make_optimizer_prefix_freezing_unit():
    params = {"backbone": {"stem_conv": {"kernel": jnp.ones((3, 3))},
                           "layer1_0": {"kernel": jnp.ones((2, 2))},
                           "layer2_0": {"kernel": jnp.ones((2, 2))}},
              "head": {"kernel": jnp.ones((4,))}}
    tx = make_optimizer(1e-1, total_steps=10, warmup_steps=0,
                        weight_decay=0.1,
                        frozen_prefixes=("backbone/stem_",
                                         "backbone/layer1_"))
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    _, st = tx.update(grads, st, params)     # count 0: warmup lr is 0
    upd, _ = tx.update(grads, st, params)
    assert np.all(np.asarray(upd["backbone"]["stem_conv"]["kernel"]) == 0)
    assert np.all(np.asarray(upd["backbone"]["layer1_0"]["kernel"]) == 0)
    assert np.any(np.asarray(upd["backbone"]["layer2_0"]["kernel"]) != 0)
    assert np.any(np.asarray(upd["head"]["kernel"]) != 0)


def test_overlay_stats_merge_semantics():
    old = {"backbone": {"bn": {"mean": 1, "var": 2}},
           "neck": {"bn": {"mean": 3}}}
    assert _overlay_stats(old, None) is old
    assert _overlay_stats(old, {}) is old
    merged = _overlay_stats(old, {"neck": {"bn": {"mean": 9}}})
    assert merged["neck"]["bn"]["mean"] == 9
    assert merged["backbone"]["bn"]["mean"] == 1
    # non-dict new replaces wholesale
    assert _overlay_stats({"a": 1}, 5) == 5
