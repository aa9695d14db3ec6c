"""C++ matching core vs numpy fallback: bit-identical on randomized data."""

import numpy as np
import pytest

from heltondetection_tpu.native import get_cocoeval_lib, match_dets_native
from heltondetection_tpu.utils.cocoeval import IOU_THRS, DetEval


def _numpy_match(iou_thrs, ious, g_ig, g_crowd):
    """Inline copy of the numpy matcher (the DetEval fallback path)."""
    T = len(iou_thrs)
    D, G = ious.shape
    dtm = np.zeros((T, D), np.int64) - 1
    dt_ig = np.zeros((T, D), np.int64)
    nonig = g_ig == 0
    crowd = g_crowd == 1
    for t in range(T):
        thr = min(iou_thrs[t], 1 - 1e-10)
        gtm_t = np.full(G, -1, np.int64)
        for d in range(D):
            iou_d = ious[d]
            avail = (gtm_t < 0) | crowd
            cand = avail & (iou_d >= thr)
            pool = cand & nonig
            if not pool.any():
                pool = cand & ~nonig
            if not pool.any():
                continue
            vals = np.where(pool, iou_d, -1.0)
            m = int(np.flatnonzero(vals == vals.max())[-1])
            dtm[t, d] = m
            dt_ig[t, d] = g_ig[m]
            gtm_t[m] = d
    return dtm, dt_ig


def test_native_lib_builds():
    assert get_cocoeval_lib() is not None, "g++ build failed"


@pytest.mark.parametrize("seed", range(5))
def test_native_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    D, G = rng.integers(1, 40), rng.integers(1, 15)
    ious = rng.uniform(0, 1, (D, G))
    # quantized IoUs to force plenty of exact ties
    ious = np.round(ious * 8) / 8
    g_ig = np.sort(rng.integers(0, 2, G)).astype(np.int64)  # ignored last
    g_crowd = (g_ig & rng.integers(0, 2, G)).astype(np.int64)
    native = match_dets_native(IOU_THRS, ious, g_ig, g_crowd)
    assert native is not None
    ref = _numpy_match(IOU_THRS, ious, g_ig, g_crowd)
    np.testing.assert_array_equal(native[0], ref[0])
    np.testing.assert_array_equal(native[1], ref[1])


def test_deteval_same_results_with_native():
    """End-to-end DetEval parity: random dets/gts scored with the native
    path (auto-used) must match a pure-python run (forced fallback)."""
    import heltondetection_tpu.native as native_mod

    def run():
        rng = np.random.default_rng(7)
        ev = DetEval(num_classes=3)
        for img in range(6):
            ng, nd = rng.integers(1, 8), rng.integers(1, 15)
            gxy = rng.uniform(0, 80, (ng, 2))
            gwh = rng.uniform(5, 40, (ng, 2))
            ev.add_gt(img, np.concatenate([gxy, gwh], 1),
                      rng.integers(0, 3, ng),
                      iscrowd=rng.integers(0, 2, ng) * (rng.uniform(size=ng) < .2))
            dxy = rng.uniform(0, 80, (nd, 2))
            dwh = rng.uniform(5, 40, (nd, 2))
            ev.add_det(img, np.concatenate([dxy, dwh], 1),
                       rng.uniform(0, 1, nd), rng.integers(0, 3, nd))
        return ev.summarize()

    with_native = run()
    # force fallback
    saved = native_mod._LIB, native_mod._TRIED
    native_mod._LIB, native_mod._TRIED = None, True
    try:
        without = run()
    finally:
        native_mod._LIB, native_mod._TRIED = saved
    for k in with_native:
        assert abs(with_native[k] - without[k]) < 1e-12, k
