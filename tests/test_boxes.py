import numpy as np
import jax.numpy as jnp
import pytest

from heltondetection_tpu.ops import boxes as B

# box-op oracle spot-checks are cheap — whole module in the smoke tier
pytestmark = pytest.mark.smoke


def test_coord_roundtrip():
    rng = np.random.default_rng(0)
    b = rng.uniform(0, 100, (32, 4)).astype(np.float32)
    b = np.concatenate([np.minimum(b[:, :2], b[:, 2:]),
                        np.maximum(b[:, :2], b[:, 2:])], axis=1)
    out = B.cxcywh_to_xyxy(B.xyxy_to_cxcywh(jnp.asarray(b)))
    np.testing.assert_allclose(out, b, atol=1e-4)
    out2 = B.xywh_to_xyxy(B.xyxy_to_xywh(jnp.asarray(b)))
    np.testing.assert_allclose(out2, b, atol=1e-4)


def test_iou_hand_computed():
    a = jnp.array([0.0, 0.0, 10.0, 10.0])
    b = jnp.array([5.0, 5.0, 15.0, 15.0])
    # inter 25, union 175
    assert abs(float(B.bbox_iou(a, b)) - 25 / 175) < 1e-5
    # identical boxes
    assert abs(float(B.bbox_iou(a, a)) - 1.0) < 1e-5
    # disjoint
    c = jnp.array([20.0, 20.0, 30.0, 30.0])
    assert float(B.bbox_iou(a, c)) < 1e-6


def test_giou_diou_ciou_bounds():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 50, (100, 2))
    a = np.concatenate([x, x + rng.uniform(1, 50, (100, 2))], 1).astype(np.float32)
    y = rng.uniform(0, 50, (100, 2))
    c = np.concatenate([y, y + rng.uniform(1, 50, (100, 2))], 1).astype(np.float32)
    for kind in ("giou", "diou", "ciou"):
        v = np.asarray(B.bbox_iou(jnp.asarray(a), jnp.asarray(c), kind=kind))
        assert (v <= 1.0 + 1e-5).all() and (v >= -1.0 - 1e-5).all()
        # identical boxes → 1
        same = np.asarray(B.bbox_iou(jnp.asarray(a), jnp.asarray(a), kind=kind))
        np.testing.assert_allclose(same, 1.0, atol=1e-4)


def test_iou_matrix_matches_elementwise():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 50, (16, 2))
    a = np.concatenate([x, x + rng.uniform(1, 50, (16, 2))], 1).astype(np.float32)
    y = rng.uniform(0, 50, (24, 2))
    c = np.concatenate([y, y + rng.uniform(1, 50, (24, 2))], 1).astype(np.float32)
    m = np.asarray(B.box_iou_matrix(jnp.asarray(a), jnp.asarray(c)))
    for i in range(16):
        for j in range(24):
            expect = float(B.bbox_iou(jnp.asarray(a[i]), jnp.asarray(c[j])))
            assert abs(m[i, j] - expect) < 1e-5


def test_delta_coder_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 400, (64, 2))
    anchors = np.concatenate([x, x + rng.uniform(8, 128, (64, 2))], 1).astype(np.float32)
    y = rng.uniform(0, 400, (64, 2))
    gt = np.concatenate([y, y + rng.uniform(8, 128, (64, 2))], 1).astype(np.float32)
    for w in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
        d = B.encode_deltas(jnp.asarray(anchors), jnp.asarray(gt), w)
        back = B.decode_deltas(jnp.asarray(anchors), d, w)
        np.testing.assert_allclose(np.asarray(back), gt, atol=1e-2)


def test_decode_deltas_matches_torchvision():
    """vs the vendored numpy port of torchvision BoxCoder.decode_single
    (tests/torch_refs.py), always runnable offline."""
    from torch_refs import decode_deltas_numpy
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 400, (32, 2))
    anchors = np.concatenate([x, x + rng.uniform(8, 128, (32, 2))], 1).astype(np.float32)
    deltas = rng.normal(0, 0.5, (32, 4)).astype(np.float32)
    ref = decode_deltas_numpy(deltas=deltas, anchors=anchors,
                              weights=(10.0, 10.0, 5.0, 5.0))
    ours = np.asarray(B.decode_deltas(jnp.asarray(anchors), jnp.asarray(deltas),
                                      (10.0, 10.0, 5.0, 5.0)))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_iou_matrix_pallas_matches_jnp():
    """Pallas tiled IoU kernel (rebuild N8) vs the jnp oracle; runs in
    interpret mode on CPU, natively on TPU."""
    from jax.experimental.pallas import tpu as pltpu
    from heltondetection_tpu.ops.boxes import box_iou_matrix, iou_matrix_pallas
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 64, (64, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + rng.uniform(1, 30, (64, 2))
    b = rng.uniform(0, 64, (256, 4)).astype(np.float32)
    b[:, 2:] = b[:, :2] + rng.uniform(1, 30, (256, 2))
    a[5] = 0  # zero-area padding boxes stay inert
    with pltpu.force_tpu_interpret_mode():
        got = iou_matrix_pallas(jnp.asarray(a), jnp.asarray(b),
                                tile_n=32, tile_m=128)
    want = box_iou_matrix(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    assert (np.asarray(got)[5] == 0).all()
