"""FasterRCNN unit + integration tests (small img_size for CPU speed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from heltondetection_tpu.models.faster_rcnn import (
    FasterRCNN, RCNNConfig, _sample_balanced, assign_box_targets,
    assign_rpn_targets, box_head_loss, faster_rcnn_infer, faster_rcnn_loss,
    generate_proposals, init_faster_rcnn, pyramid_anchors, rpn_loss,
    smooth_l1)


def small_cfg(**kw):
    d = dict(num_classes=4, img_size=128, rpn_pre_nms_topk=64,
             rpn_post_nms_topk=64, rpn_batch=32, box_batch=32, max_det=16,
             max_gt=8)
    d.update(kw)
    return RCNNConfig(**d)


def test_smooth_l1():
    x = jnp.asarray([0.0, 0.05, 1.0])
    out = np.asarray(smooth_l1(x, beta=1 / 9))
    assert abs(out[0]) < 1e-9
    assert abs(out[1] - 0.5 * 0.05 ** 2 / (1 / 9)) < 1e-6
    assert abs(out[2] - (1.0 - 0.5 / 9)) < 1e-6


def test_sample_balanced_quota():
    rng = jax.random.PRNGKey(0)
    n = 200
    fg = jnp.asarray(np.arange(n) < 10)           # 10 fg
    bg = jnp.asarray(np.arange(n) >= 100)         # 100 bg
    idx, is_fg, valid = _sample_balanced(fg, bg, 64, 0.25, rng)
    assert idx.shape == (64,)
    n_fg = int((is_fg & valid).sum())
    n_bg = int((~is_fg & valid).sum())
    assert n_fg == 10                              # all fg (< quota 16)
    assert n_fg + n_bg == 64                       # bg fills the remainder
    # fg-rich case: quota caps at 16
    fg2 = jnp.asarray(np.arange(n) < 100)
    bg2 = jnp.asarray(np.arange(n) >= 100)
    _, is_fg2, valid2 = _sample_balanced(fg2, bg2, 64, 0.25, rng)
    assert int((is_fg2 & valid2).sum()) == 16


def test_rpn_assigner_fg_bg():
    cfg = small_cfg()
    anchors = jnp.asarray([[0, 0, 32, 32], [100, 100, 116, 116],
                           [0, 0, 30, 34], [64, 64, 96, 96]], jnp.float32)
    gt = jnp.zeros((8, 4), jnp.float32).at[0].set(
        jnp.asarray([0, 0, 32, 32.0]))
    mask = jnp.zeros((8,), bool).at[0].set(True)
    idx, is_fg, valid, matched = assign_rpn_targets(
        anchors, gt, mask, cfg, jax.random.PRNGKey(1))
    sel = {int(i) for i, f, v in zip(idx, is_fg, valid) if v and f}
    assert 0 in sel          # exact-overlap anchor is fg
    assert 1 not in sel      # disjoint anchor is bg


def test_rpn_assigner_low_quality_match():
    # no anchor reaches 0.7 IoU, but the best one must still become fg
    cfg = small_cfg()
    anchors = jnp.asarray([[0, 0, 20, 20], [50, 50, 80, 80]], jnp.float32)
    gt = jnp.zeros((4, 4), jnp.float32).at[0].set(
        jnp.asarray([0, 0, 40, 40.0]))   # IoU with anchor0 = 400/1600 = .25
    mask = jnp.zeros((4,), bool).at[0].set(True)
    idx, is_fg, valid, _ = assign_rpn_targets(anchors, gt, mask, cfg,
                                              jax.random.PRNGKey(0))
    fg_set = {int(i) for i, f, v in zip(idx, is_fg, valid) if v and f}
    assert fg_set == {0}


def test_generate_proposals_shapes():
    cfg = small_cfg()
    anchors, counts = pyramid_anchors(cfg.img_size)
    n = int(sum(counts))
    rng = np.random.default_rng(0)
    obj = jnp.asarray(rng.normal(0, 1, (n,)).astype(np.float32))
    deltas = jnp.asarray(rng.normal(0, 0.1, (n, 4)).astype(np.float32))
    pb, ps, pv = generate_proposals(obj, deltas, anchors, counts,
                                    cfg.img_size, cfg)
    assert pb.shape == (64, 4)
    assert bool(pv.any())
    b = np.asarray(pb)[np.asarray(pv)]
    assert (b >= 0).all() and (b <= cfg.img_size).all()


def test_box_head_loss_perfect_prediction():
    r, nc = 8, 4
    labels = jnp.asarray([1, 2, 0, 0, 3, 0, 1, 0], jnp.int32)
    reg_t = jnp.asarray(np.random.default_rng(0).normal(0, 1, (r, 4)),
                        jnp.float32)
    scores = jax.nn.one_hot(labels, nc + 1) * 20.0
    deltas = jnp.broadcast_to(reg_t[:, None, :], (r, nc, 4))
    is_fg = labels > 0
    valid = jnp.ones((r,), bool)
    l_cls, l_reg = box_head_loss(scores, deltas, labels, reg_t, is_fg, valid)
    assert float(l_cls) < 1e-3 and float(l_reg) < 1e-6


@pytest.fixture(scope="module")
def rcnn_setup():
    cfg = small_cfg()
    model = FasterRCNN(cfg)
    variables = init_faster_rcnn(model, jax.random.PRNGKey(0), cfg.img_size)
    return cfg, model, variables


def test_forward_pyramid_shapes(rcnn_setup):
    cfg, model, variables = rcnn_setup
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    pyr, obj, deltas = model.apply(variables, x, False)
    assert len(pyr) == 5
    assert pyr[0].shape == (1, 32, 32, 256)     # P2 stride 4
    assert pyr[4].shape == (1, 2, 2, 256)       # P6 stride 64
    n_anchors = sum((128 // s) ** 2 * 3 for s in (4, 8, 16, 32, 64))
    assert obj.shape == (1, n_anchors)
    assert deltas.shape == (1, n_anchors, 4)


def test_faster_rcnn_train_loss_and_grads(rcnn_setup):
    cfg, model, variables = rcnn_setup
    rng = np.random.default_rng(0)
    b = 2
    images = jnp.asarray(rng.uniform(0, 1, (b, 128, 128, 3)), jnp.float32)
    gt = np.zeros((b, cfg.max_gt, 4), np.float32)
    cls = np.zeros((b, cfg.max_gt), np.int32)
    mask = np.zeros((b, cfg.max_gt), bool)
    for i in range(b):
        gt[i, 0] = [20, 20, 70, 80]
        gt[i, 1] = [60, 50, 110, 100]
        cls[i, :2] = [0, 2]
        mask[i, :2] = True
    gt, cls, mask = jnp.asarray(gt), jnp.asarray(cls), jnp.asarray(mask)

    def loss_fn(params):
        loss, metrics, _ = faster_rcnn_loss(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            images, gt, cls, mask, cfg, jax.random.PRNGKey(3))
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss)), metrics
    for k in ("rpn_obj", "rpn_reg", "cls", "box"):
        assert np.isfinite(float(metrics[k])), (k, metrics)
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_faster_rcnn_infer_shapes(rcnn_setup):
    cfg, model, variables = rcnn_setup
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    ob, os_, oc, ov = jax.jit(
        lambda v, im: faster_rcnn_infer(model, v, im, cfg))(variables, x)
    assert ob.shape == (2, cfg.max_det, 4)
    assert os_.shape == (2, cfg.max_det)
    assert np.isfinite(np.asarray(ob)).all()


def test_p2_only_head_variant():
    """roi_levels=1 → the reference's FPNP2 head (README.md:65,74)."""
    cfg = small_cfg(roi_levels=1)
    model = FasterRCNN(cfg)
    variables = init_faster_rcnn(model, jax.random.PRNGKey(0), cfg.img_size)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    out = faster_rcnn_infer(model, variables, x, cfg)
    assert out[0].shape == (1, cfg.max_det, 4)


def test_decoupled_head_variant():
    cfg = small_cfg(head="decoupled", neck="pafpn_v8")
    model = FasterRCNN(cfg)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = init_faster_rcnn(model, jax.random.PRNGKey(0), cfg.img_size)
    out = faster_rcnn_infer(model, variables, x, cfg)
    assert out[0].shape == (1, cfg.max_det, 4)


def test_sample_balanced_zero_fg_quota():
    """pos_frac=0 (or batch*pos_frac < 1) must select only background —
    regression for the threshold-top-k rewrite (top_k with k=0)."""
    import jax
    from heltondetection_tpu.models.faster_rcnn import _sample_balanced
    fg = jnp.asarray(np.array([1, 1, 0, 0, 0, 0], bool))
    bg = ~fg
    idx, is_fg, valid = jax.jit(
        lambda r: _sample_balanced(fg, bg, 4, 0.0, r)
    )(jax.random.PRNGKey(0))
    assert not bool(is_fg.any())
    assert int(valid.sum()) == 4


def test_generate_proposals_fewer_candidates_than_post_topk():
    """Tiny inputs: total per-level candidates < rpn_post_nms_topk must pad
    instead of failing top_k at trace time."""
    import jax
    from heltondetection_tpu.models.faster_rcnn import (RCNNConfig,
                                                        generate_proposals,
                                                        pyramid_anchors)
    cfg = RCNNConfig(num_classes=4, img_size=64)
    anchors, counts = pyramid_anchors(cfg.img_size)
    n = anchors.shape[0]
    assert sum(min(cfg.rpn_pre_nms_topk, c) for c in counts) >= 1
    rng = np.random.default_rng(0)
    obj = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    deltas = jnp.asarray(0.1 * rng.normal(size=(n, 4)).astype(np.float32))
    pb, ps, pv = jax.jit(
        lambda o, d: generate_proposals(o, d, anchors, counts,
                                        cfg.img_size, cfg))(obj, deltas)
    assert pb.shape == (cfg.rpn_post_nms_topk, 4)
    assert bool(pv.any())


def test_rpn_logits_at_matches_dense(rcnn_setup):
    """The sparse patch-recompute path (rpn_logits_at) must reproduce the
    dense RPN head's gathered logits/deltas — same math restricted to the
    sampled positions (conv-vs-matmul reduction order only)."""
    import numpy as np

    from heltondetection_tpu.models.faster_rcnn import (FasterRCNN,
                                                        pyramid_anchors,
                                                        rpn_logits_at)
    cfg, model, variables = rcnn_setup
    x = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (1, cfg.img_size, cfg.img_size, 3)).astype(np.float32))
    pyr, obj, deltas = model.apply(variables, x, False,
                                   method=FasterRCNN.__call__)
    anchors, counts = pyramid_anchors(cfg.img_size)
    n = int(sum(counts))
    rng = np.random.default_rng(3)
    idx = jnp.asarray(np.sort(rng.choice(n, size=64, replace=False))
                      .astype(np.int32))
    level_hw = tuple((p.shape[1], p.shape[2]) for p in pyr)
    obj_k, reg_k = rpn_logits_at(variables["params"]["rpn"],
                                 [p[0] for p in pyr], idx, level_hw)
    np.testing.assert_allclose(np.asarray(obj_k),
                               np.asarray(obj[0])[np.asarray(idx)],
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(reg_k),
                               np.asarray(deltas[0])[np.asarray(idx)],
                               atol=2e-4, rtol=2e-4)


def test_rpn_loss_sparse_matches_dense(rcnn_setup):
    """Full per-image loss parity: rpn_loss_sparse == rpn_loss on the same
    rng (same sampled rows, recomputed vs gathered logits)."""
    import numpy as np

    from heltondetection_tpu.models.faster_rcnn import (FasterRCNN,
                                                        pyramid_anchors,
                                                        rpn_loss,
                                                        rpn_loss_sparse)
    cfg, model, variables = rcnn_setup
    x = jnp.asarray(np.random.default_rng(2).uniform(
        0, 1, (1, cfg.img_size, cfg.img_size, 3)).astype(np.float32))
    pyr, obj, deltas = model.apply(variables, x, False,
                                   method=FasterRCNN.__call__)
    anchors, counts = pyramid_anchors(cfg.img_size)
    rng = np.random.default_rng(5)
    m = 8
    x1 = rng.uniform(0, cfg.img_size - 24, (m, 2)).astype(np.float32)
    wh = rng.uniform(8, 24, (m, 2)).astype(np.float32)
    gt = jnp.asarray(np.concatenate([x1, x1 + wh], -1))
    gt_mask = jnp.asarray(rng.uniform(0, 1, (m,)) < 0.8)
    key = jax.random.PRNGKey(11)
    lo_d, lr_d = rpn_loss(obj[0], deltas[0], anchors, gt, gt_mask, cfg,
                          key)
    level_hw = tuple((p.shape[1], p.shape[2]) for p in pyr)
    lo_s, lr_s = rpn_loss_sparse(variables["params"]["rpn"],
                                 [p[0] for p in pyr], anchors, gt,
                                 gt_mask, cfg, key, level_hw)
    np.testing.assert_allclose(float(lo_s), float(lo_d), rtol=1e-4)
    np.testing.assert_allclose(float(lr_s), float(lr_d), rtol=1e-4)
