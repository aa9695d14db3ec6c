import numpy as np
import jax
import jax.numpy as jnp

from heltondetection_tpu.ops.wbf import weighted_boxes_fusion


def _fuse(boxes, scores, classes, valid=None, n_views=2, **kw):
    n = len(scores)
    valid = np.ones(n, bool) if valid is None else valid
    return weighted_boxes_fusion(
        jnp.asarray(np.asarray(boxes, np.float32)),
        jnp.asarray(np.asarray(scores, np.float32)),
        jnp.asarray(np.asarray(classes, np.int32)),
        jnp.asarray(valid), n_views=n_views, **kw)


def test_two_overlapping_boxes_fuse_weighted():
    # two views of the same object → one fused box at the score-weighted avg
    b, s, c, v = _fuse([[10, 10, 50, 50], [14, 14, 54, 54]], [0.8, 0.4],
                       [0, 0], n_views=2, max_out=8)
    v = np.asarray(v)
    assert v.sum() == 1
    fused = np.asarray(b)[0]
    expect = (0.8 * np.array([10, 10, 50, 50]) +
              0.4 * np.array([14, 14, 54, 54])) / 1.2
    np.testing.assert_allclose(fused, expect, atol=1e-4)
    # score = mean(0.8, 0.4) * min(2,2)/2 = 0.6
    assert abs(float(np.asarray(s)[0]) - 0.6) < 1e-5


def test_single_view_box_downweighted():
    # a box seen by only 1 of 3 views gets score * 1/3
    b, s, c, v = _fuse([[10, 10, 50, 50]], [0.9], [0], n_views=3, max_out=4)
    assert abs(float(np.asarray(s)[0]) - 0.3) < 1e-5


def test_different_classes_not_fused():
    b, s, c, v = _fuse([[10, 10, 50, 50], [12, 12, 52, 52]], [0.8, 0.7],
                       [0, 1], n_views=2, max_out=8)
    assert np.asarray(v).sum() == 2
    assert sorted(np.asarray(c)[np.asarray(v)].tolist()) == [0, 1]


def test_disjoint_boxes_not_fused():
    b, s, c, v = _fuse([[0, 0, 20, 20], [100, 100, 150, 150]], [0.8, 0.7],
                       [0, 0], n_views=2, max_out=8)
    assert np.asarray(v).sum() == 2


def test_invalid_rows_ignored():
    b, s, c, v = _fuse([[10, 10, 50, 50], [0, 0, 1, 1]], [0.8, 0.9],
                       [0, 0], valid=np.array([True, False]), max_out=4)
    assert np.asarray(v).sum() == 1
    np.testing.assert_allclose(np.asarray(b)[0], [10, 10, 50, 50], atol=1e-4)


def test_jit_and_shapes():
    rng = np.random.default_rng(0)
    n = 64
    xy = rng.uniform(0, 100, (n, 2))
    boxes = np.concatenate([xy, xy + rng.uniform(5, 40, (n, 2))], 1)
    scores = rng.uniform(0.1, 1, n)
    classes = rng.integers(0, 4, n)
    f = jax.jit(lambda b, s, c, v: weighted_boxes_fusion(
        b, s, c, v, n_views=2, max_out=32))
    ob, os_, oc, ov = f(jnp.asarray(boxes, jnp.float32),
                        jnp.asarray(scores, jnp.float32),
                        jnp.asarray(classes, jnp.int32),
                        jnp.ones((n,), bool))
    assert ob.shape == (32, 4)
    s = np.asarray(os_)
    assert (np.diff(s[np.asarray(ov)]) <= 1e-6).all()
