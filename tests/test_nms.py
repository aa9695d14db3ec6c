import numpy as np
import jax
import jax.numpy as jnp
import pytest

from heltondetection_tpu.ops import nms as N


def _rand_boxes(n, seed=0, size=640):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, size * 0.8, (n, 2))
    wh = rng.uniform(4, size * 0.3, (n, 2))
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes, scores


def _greedy_nms_numpy(boxes, scores, thr):
    """Trivially-correct O(N^2) python greedy NMS (torchvision semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for idx in order:
        if suppressed[idx]:
            continue
        keep.append(idx)
        bx = boxes[idx]
        for jdx in order:
            if suppressed[jdx] or jdx == idx:
                continue
            if scores[jdx] > scores[idx]:
                continue
            ix1 = max(bx[0], boxes[jdx][0]); iy1 = max(bx[1], boxes[jdx][1])
            ix2 = min(bx[2], boxes[jdx][2]); iy2 = min(bx[3], boxes[jdx][3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            a1 = (bx[2] - bx[0]) * (bx[3] - bx[1])
            a2 = (boxes[jdx][2] - boxes[jdx][0]) * (boxes[jdx][3] - boxes[jdx][1])
            if inter / (a1 + a2 - inter + 1e-7) > thr:
                suppressed[jdx] = True
    return sorted(keep)


def test_nms_mask_jnp_matches_python_oracle():
    boxes, scores = _rand_boxes(64, seed=1)
    order = np.argsort(-scores, kind="stable")
    sorted_boxes = boxes[order]
    keep_mask = np.asarray(N.nms_mask_jnp(jnp.asarray(sorted_boxes), None, 0.5))
    ours = sorted(order[i] for i in range(64) if keep_mask[i])
    expect = _greedy_nms_numpy(boxes, scores, 0.5)
    assert ours == expect


@pytest.mark.smoke   # oracle spot-check
def test_nms_mask_matches_torchvision_semantics():
    """vs the vendored numpy port of torchvision.ops.nms (strict `iou > thr`
    suppression, no epsilon — tests/torch_refs.py), so the oracle always
    runs (torchvision itself is not installed here)."""
    from torch_refs import nms_numpy
    for seed in range(3):
        boxes, scores = _rand_boxes(128, seed=seed)
        ref = sorted(nms_numpy(boxes, scores, 0.5))
        order = np.argsort(-scores, kind="stable")
        keep_mask = np.asarray(N.nms_mask_jnp(jnp.asarray(boxes[order]), None, 0.5))
        ours = sorted(int(order[i]) for i in range(len(boxes)) if keep_mask[i])
        assert ours == ref


def test_nms_fixpoint_matches_sequential():
    """The MXU fixpoint NMS must be bit-identical to the sequential greedy
    scan — on dense random boxes (long suppression chains) and sparse ones."""
    for seed in range(6):
        n = 256
        boxes, scores = _rand_boxes(n, seed=seed, size=200 if seed % 2 else 2000)
        order = np.argsort(-scores, kind="stable")
        sb = jnp.asarray(boxes[order])
        seq = np.asarray(N.nms_mask_jnp(sb, None, 0.5))
        fix = np.asarray(N.nms_mask_fixpoint(sb, None, 0.5))
        np.testing.assert_array_equal(fix, seq)


def test_nms_fixpoint_under_vmap():
    bs = []
    for seed in range(4):
        boxes, scores = _rand_boxes(128, seed=seed, size=300)
        order = np.argsort(-scores, kind="stable")
        bs.append(boxes[order])
    batch = jnp.asarray(np.stack(bs))
    got = np.asarray(jax.vmap(lambda b: N.nms_mask_fixpoint(b, None, 0.5))(batch))
    for i in range(4):
        expect = np.asarray(N.nms_mask_jnp(batch[i], None, 0.5))
        np.testing.assert_array_equal(got[i], expect)


def test_nms_fixpoint_pallas_matches_sequential_interpret():
    from jax.experimental.pallas import tpu as pltpu
    bs = []
    for seed in range(4):
        boxes, scores = _rand_boxes(128, seed=seed, size=250)
        order = np.argsort(-scores, kind="stable")
        bs.append(boxes[order])
    batch = jnp.asarray(np.stack(bs))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(N.nms_mask_fixpoint_pallas(batch, 0.5))
    for i in range(4):
        expect = np.asarray(N.nms_mask_jnp(batch[i], None, 0.5))
        np.testing.assert_array_equal(got[i], expect)


def test_nms_pallas_matches_jnp_interpret():
    from jax.experimental.pallas import tpu as pltpu
    boxes, scores = _rand_boxes(128, seed=3)
    order = np.argsort(-scores, kind="stable")
    sb = jnp.asarray(boxes[order])
    expect = np.asarray(N.nms_mask_jnp(sb, None, 0.5))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(N.nms_mask_pallas(sb, None, iou_thres=0.5))
    np.testing.assert_array_equal(got, expect)


def test_batched_nms_class_aware():
    # same coords, different classes → both kept; same class → one suppressed
    boxes = jnp.asarray(np.tile(np.array([[10, 10, 50, 50]], np.float32), (8, 1)))
    scores = jnp.asarray(np.linspace(0.9, 0.3, 8, dtype=np.float32))
    classes = jnp.asarray(np.array([0, 1, 2, 3, 0, 1, 2, 3], np.int32))
    b, s, c, v = N.batched_nms(boxes, scores, classes, iou_thres=0.5,
                               pre_nms_topk=8, max_det=8)
    v = np.asarray(v)
    assert v.sum() == 4  # one survivor per class
    assert sorted(np.asarray(c)[v].tolist()) == [0, 1, 2, 3]


def test_batched_nms_fixed_shapes_and_padding():
    boxes, scores = _rand_boxes(256, seed=5)
    classes = np.random.default_rng(5).integers(0, 10, 256).astype(np.int32)
    b, s, c, v = N.batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                               jnp.asarray(classes), score_thres=0.5,
                               pre_nms_topk=128, max_det=32)
    assert b.shape == (32, 4) and s.shape == (32,) and v.shape == (32,)
    s = np.asarray(s); v = np.asarray(v)
    # scores sorted desc among valid; invalid rows zeroed
    assert (np.diff(s[v]) <= 1e-6).all()
    assert (s[~v] == 0).all()
    # jit-compiles with no retrace surprises
    f = jax.jit(lambda bb, ss, cc: N.batched_nms(bb, ss, cc, pre_nms_topk=128,
                                                 max_det=32))
    f(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes))


@pytest.mark.smoke   # oracle spot-check
def test_batched_nms_matches_torchvision_batched():
    """vs the vendored numpy port of torchvision.ops.batched_nms (class-
    offset trick + plain NMS), always runnable offline."""
    from torch_refs import batched_nms_numpy
    boxes, scores = _rand_boxes(200, seed=7)
    classes = np.random.default_rng(7).integers(0, 5, 200).astype(np.int64)
    ref_keep = batched_nms_numpy(boxes, scores, classes, 0.5)
    ref_set = [(tuple(boxes[i]), classes[i]) for i in ref_keep]
    b, s, c, v = N.batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                               jnp.asarray(classes.astype(np.int32)),
                               iou_thres=0.5, score_thres=0.0,
                               pre_nms_topk=256, max_det=256)
    v = np.asarray(v)
    ours = [(tuple(np.asarray(b)[i]), int(np.asarray(c)[i]))
            for i in range(256) if v[i]]
    assert len(ours) == len(ref_set)
    assert {(tuple(np.round(x, 2)), k) for x, k in ours} == \
           {(tuple(np.round(np.asarray(x), 2)), k) for x, k in ref_set}


def test_fixpoint_pallas_deep_suppression_chain():
    """Regression: the fixpoint kernel must iterate to convergence — a
    fixed iteration cap silently breaks suppression chains deeper than the
    cap. Construct a >100-deep alternating chain (each box suppresses only
    its immediate neighbor) and pin against the sequential greedy scan."""
    from jax.experimental.pallas import tpu as pltpu
    import heltondetection_tpu.ops.nms as N
    n = 256
    boxes = np.zeros((1, n, 4), np.float32)
    for i in range(n):
        # stride 2, width 10: iou(i, i+1) = 8/12 ≈ 0.67 > 0.65 → each kept
        # box suppresses the next, which un-suppresses the one after, ...
        boxes[0, i] = [i * 2.0, 0.0, i * 2.0 + 10.0, 10.0]
    bj = jnp.asarray(boxes)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(N.nms_mask_fixpoint_pallas(bj, 0.65))[0]
    want = np.asarray(N.nms_mask_jnp(bj[0], None, 0.65))
    assert want.sum() == n // 2          # alternating keep pattern
    np.testing.assert_array_equal(got, want)
