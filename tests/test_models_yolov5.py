import numpy as np
import jax
import jax.numpy as jnp

from heltondetection_tpu.models.yolov5 import (build_yolov5, decode_full,
                                               decode_predictions)


def _init(variant="s", img=64, nc=80):
    model = build_yolov5(variant, num_classes=nc)
    x = jnp.zeros((1, img, img, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


def test_forward_shapes():
    model, variables, x = _init(img=64)
    outs = model.apply(variables, x, train=False)
    assert len(outs) == 3
    # strides 8/16/32, A*(5+C) = 3*85
    assert outs[0].shape == (1, 8, 8, 255)
    assert outs[1].shape == (1, 4, 4, 255)
    assert outs[2].shape == (1, 2, 2, 255)


def test_param_count_matches_yolov5s():
    # Ultralytics YOLOv5s v6.1 = 7,235,389 params (641 tensors incl BN stats).
    # Conv/BN params (weights+biases+scale+bias) must match exactly for the
    # weight-port oracle (SURVEY.md §4) to be possible.
    model, variables, _ = _init(img=64)
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(variables["params"]))
    n_stats = sum(np.prod(p.shape) for p in
                  jax.tree_util.tree_leaves(variables["batch_stats"]))
    assert int(n_params) == 7_235_389, int(n_params)


def test_decode_geometry():
    # zero logits → sigmoid 0.5 → xy = (2*0.5-0.5+grid)*stride = (grid+0.5)*s
    # wh = (2*0.5)^2 * anchor = anchor
    nc = 80
    raw = [jnp.zeros((1, 2, 2, 255)), jnp.zeros((1, 1, 1, 255)),
           jnp.zeros((1, 1, 1, 255))]
    boxes, scores, classes = decode_predictions(raw, nc)
    assert boxes.shape == (1, (4 + 1 + 1) * 3, 4)
    b = np.asarray(boxes[0])
    # first candidate: level0 cell (0,0) anchor (10,13), center (0.5*8, 0.5*8)
    cx, cy, w, h = 4.0, 4.0, 10.0, 13.0
    np.testing.assert_allclose(b[0], [cx - w/2, cy - h/2, cx + w/2, cy + h/2],
                               atol=1e-4)
    # scores = 0.5 (obj) * 0.5 (cls) = 0.25
    np.testing.assert_allclose(np.asarray(scores), 0.25, atol=1e-5)


def test_decode_full_consistency():
    rng = jax.random.PRNGKey(1)
    raw = [jax.random.normal(rng, (2, 2, 2, 255)),
           jax.random.normal(rng, (2, 1, 1, 255)),
           jax.random.normal(rng, (2, 1, 1, 255))]
    b1, s1, c1 = decode_predictions(raw, 80)
    b2, obj, cls = decode_full(raw, 80)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)
    conf = np.asarray(obj)[..., None] * np.asarray(cls)
    np.testing.assert_allclose(conf.max(-1), np.asarray(s1), atol=1e-5)
    np.testing.assert_array_equal(conf.argmax(-1), np.asarray(c1))


def test_variants_scale():
    m_s, v_s, _ = _init("s", img=32)
    m_n, v_n, _ = _init("n", img=32)
    p_s = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(v_s["params"]))
    p_n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(v_n["params"]))
    assert p_n < p_s


def test_jit_forward_and_bf16():
    model = build_yolov5("n", num_classes=20, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    f = jax.jit(lambda v, xx: model.apply(v, xx, train=False))
    outs = f(variables, x)
    assert outs[0].dtype == jnp.float32  # head forced to fp32
    assert np.isfinite(np.asarray(outs[0])).all()
