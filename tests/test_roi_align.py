import numpy as np
import jax
import jax.numpy as jnp

from heltondetection_tpu.ops.roi_align import (multilevel_roi_align,
                                               roi_align, roi_pool)


def test_constant_map():
    feat = jnp.full((16, 16, 4), 3.5)
    rois = jnp.asarray([[2.0, 2.0, 10.0, 10.0], [0.0, 0.0, 16.0, 16.0]])
    out = roi_align(feat, rois, out_size=7)
    assert out.shape == (2, 7, 7, 4)
    np.testing.assert_allclose(np.asarray(out), 3.5, atol=1e-5)


def test_linear_ramp_center_values():
    # f(y,x) = x: bilinear sampling of a linear function is exact, so each
    # output bin = mean of its sample x-coords = bin center x
    h = w = 32
    xs = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :, None],
                          (h, w, 1))
    roi = jnp.asarray([[4.0, 4.0, 20.0, 20.0]])   # w=16 → bin 2px
    out = roi_align(xs, roi, out_size=8, sampling_ratio=2)
    # bin i center x = 4 + (i+0.5)*2
    expect = 4 + (np.arange(8) + 0.5) * 2
    np.testing.assert_allclose(np.asarray(out)[0, 0, :, 0], expect, atol=1e-4)


def test_linearity():
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.normal(0, 1, (16, 16, 8)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(0, 1, (16, 16, 8)).astype(np.float32))
    rois = jnp.asarray(rng.uniform(0, 10, (5, 4)).astype(np.float32))
    rois = rois.at[:, 2:].set(rois[:, :2] + 5.0)
    a, b = 2.0, -0.7
    lhs = roi_align(a * f1 + b * f2, rois)
    rhs = a * roi_align(f1, rois) + b * roi_align(f2, rois)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_spatial_scale():
    # same roi in input coords sampled from a 2x-downsampled map
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.normal(0, 1, (16, 16, 2)).astype(np.float32))
    roi_in = jnp.asarray([[8.0, 8.0, 24.0, 24.0]])   # input coords
    out1 = roi_align(feat, roi_in, spatial_scale=0.5)
    roi_feat = jnp.asarray([[4.0, 4.0, 12.0, 12.0]])  # feature coords
    out2 = roi_align(feat, roi_feat, spatial_scale=1.0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_roi_pool_max_vs_align_avg():
    # peaked feature: pool (max) must exceed align (avg)
    feat = np.zeros((16, 16, 1), np.float32)
    feat[7:10, 7:10, 0] = 10.0
    feat = jnp.asarray(feat)
    roi = jnp.asarray([[4.0, 4.0, 12.0, 12.0]])
    mx = float(roi_pool(feat, roi, out_size=2).max())
    av = float(roi_align(feat, roi, out_size=2).max())
    assert mx > av


def test_multilevel_selection():
    rng = np.random.default_rng(2)
    img = 256
    feats = [jnp.asarray(rng.normal(0, 1, (img // s, img // s, 4))
                         .astype(np.float32)) for s in (4, 8, 16, 32)]
    # small roi (32²) → 2+log2(32/224) ≈ -0.8 → level 0
    # large roi (224²) → level 2; huge (448²→ level 3)
    rois = jnp.asarray([[0, 0, 32, 32], [0, 0, 224, 224], [0, 0, 448, 448]],
                       jnp.float32)
    out = multilevel_roi_align(feats, rois, (4, 8, 16, 32), out_size=7)
    lvl0 = roi_align(feats[0], rois[:1], out_size=7, spatial_scale=0.25)
    lvl2 = roi_align(feats[2], rois[1:2], out_size=7, spatial_scale=1 / 16)
    lvl3 = roi_align(feats[3], rois[2:3], out_size=7, spatial_scale=1 / 32)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(lvl0[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(lvl2[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(lvl3[0]), atol=1e-5)


def test_jit_and_grad():
    rng = np.random.default_rng(3)
    feat = jnp.asarray(rng.normal(0, 1, (16, 16, 4)).astype(np.float32))
    rois = jnp.asarray([[2.0, 2.0, 12.0, 12.0]])
    f = jax.jit(lambda ft: roi_align(ft, rois).sum())
    g = jax.grad(lambda ft: roi_align(ft, rois).sum())(feat)
    assert np.isfinite(float(f(feat)))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_roi_align_matches_numpy_torchvision_oracle():
    """vs the vendored double-loop torchvision `aligned=False` oracle
    (tests/torch_refs.py) — catches half-pixel / clamp-convention drift the
    analytic-property tests above cannot (VERDICT r1 weak-1)."""
    from torch_refs import roi_align_numpy
    rng = np.random.default_rng(7)
    feat = rng.normal(0, 1, (24, 20, 6)).astype(np.float32)
    # mix of in-bounds, boundary-straddling, sub-bin-size, and fully
    # out-of-range rois (input-coord boxes over a 1/4-scale map)
    rois = np.asarray([
        [8.0, 8.0, 40.0, 56.0],
        [-12.0, -6.0, 30.0, 30.0],
        [60.0, 70.0, 61.5, 71.5],       # sub-pixel roi → min-size-1 clamp
        [70.0, 88.0, 140.0, 160.0],     # extends past the map edge
        [-40.0, -40.0, -40.5, -39.0],   # degenerate, fully outside
    ], np.float32)
    for sampling in (1, 2):
        want = roi_align_numpy(feat, rois, out_size=7, spatial_scale=0.25,
                               sampling_ratio=sampling, aligned=False)
        got = roi_align(jnp.asarray(feat), jnp.asarray(rois), out_size=7,
                        spatial_scale=0.25, sampling_ratio=sampling)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5,
                                   err_msg=f"sampling_ratio={sampling}")


def test_multilevel_roi_align_matches_numpy_oracle():
    """The production quad-shift gather path vs the numpy oracle, per
    assigned level (torchvision MultiScaleRoIAlign semantics)."""
    from torch_refs import roi_align_numpy
    from heltondetection_tpu.ops.roi_align import _roi_levels
    rng = np.random.default_rng(8)
    strides = (4, 8, 16, 32)
    feats_np = [rng.normal(0, 1, (128 // s, 96 // s, 8)).astype(np.float32)
                for s in strides]
    n = 12
    x1 = rng.uniform(-10, 60, n); y1 = rng.uniform(-10, 80, n)
    w = rng.uniform(6, 400, n); h = rng.uniform(6, 300, n)
    rois = np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)
    got = multilevel_roi_align([jnp.asarray(f) for f in feats_np],
                               jnp.asarray(rois), strides, out_size=7,
                               sampling_ratio=2)
    lv = np.asarray(_roi_levels(jnp.asarray(rois), 4, 2, 224.0))
    assert len(set(lv.tolist())) >= 3   # the size spread must hit ≥3 levels
    for i in range(n):
        want = roi_align_numpy(feats_np[lv[i]], rois[i:i + 1], out_size=7,
                               spatial_scale=1.0 / strides[lv[i]],
                               sampling_ratio=2)
        np.testing.assert_allclose(np.asarray(got[i]), want[0], atol=1e-5,
                                   err_msg=f"roi {i} level {lv[i]}")


def test_multilevel_roi_align_custom_vjp_matches_autodiff():
    """The direct-scatter backward (ops/roi_align._mlra_weighted_gather)
    must match autodiff of the naive compute-every-level reference."""
    import jax
    import jax.numpy as jnp
    from heltondetection_tpu.ops.roi_align import (_roi_levels,
                                                   multilevel_roi_align,
                                                   roi_align)
    rng = np.random.default_rng(3)
    strides = (4, 8, 16)
    feats = [jnp.asarray(rng.normal(
        size=(64 // (2 ** l), 80 // (2 ** l), 8)).astype(np.float32))
        for l in range(3)]
    # spread roi sizes so every level gets assignments
    n = 18
    x1 = rng.uniform(0, 100, n); y1 = rng.uniform(0, 80, n)
    w = rng.uniform(8, 250, n); h = rng.uniform(8, 200, n)
    rois = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], 1)
                       .astype(np.float32))

    def f(fs):
        return (multilevel_roi_align(list(fs), rois, strides,
                                     out_size=7) ** 2).sum()

    def f_ref(fs):
        tgt = _roi_levels(rois, 3, 2, 224.0)
        outs = jnp.stack([roi_align(fs[l], rois, out_size=7,
                                    spatial_scale=1.0 / strides[l])
                          for l in range(3)])
        return (outs[tgt, jnp.arange(n)] ** 2).sum()

    np.testing.assert_allclose(float(f(tuple(feats))),
                               float(f_ref(tuple(feats))), rtol=1e-5)
    g1 = jax.grad(f)(tuple(feats))
    g2 = jax.grad(f_ref)(tuple(feats))
    nonzero = 0
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        nonzero += int(np.abs(np.asarray(b)).max() > 0)
    assert nonzero >= 2  # the roi size spread must exercise >1 level
