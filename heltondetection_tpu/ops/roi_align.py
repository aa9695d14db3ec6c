"""RoIAlign — rebuild target N2 (SURVEY.md §2b): the reference uses
torchvision.ops.roi_align (C++/CUDA) for FasterRCNN second-stage feature
extraction (C12, README.md:65 "RoIAlign(默认)"); RoIPooling is the ablated
alternative (−2.1 mAP, README.md:73-74) and is provided too.

Pure-jnp gather formulation designed for TPU: for a fixed (N_roi, out, out,
sampling²) sample grid, bilinear interpolation is 4 gathers + weighted sum,
batched over channels — XLA turns this into vectorized dynamic-gathers with
no data-dependent shapes. Semantics match torchvision (aligned=False default:
no half-pixel shift; sampling_ratio fixed; max-pool variant = RoIPool grid
quantization).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
                     ) -> jnp.ndarray:
    """feat (H,W,C); ys/xs arbitrary same-shape float sample coords →
    (..., C) bilinear values with zero padding outside (torchvision clamps
    coords to [-1, H] then zeroes out-of-range samples)."""
    h, w = feat.shape[0], feat.shape[1]
    valid = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    ly = ys - y0
    lx = xs - x0
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    v00 = feat[y0i, x0i]
    v01 = feat[y0i, x1i]
    v10 = feat[y1i, x0i]
    v11 = feat[y1i, x1i]
    out = (v00 * ((1 - ly) * (1 - lx))[..., None] +
           v01 * ((1 - ly) * lx)[..., None] +
           v10 * (ly * (1 - lx))[..., None] +
           v11 * (ly * lx)[..., None])
    return out * valid[..., None]


def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, *, out_size: int = 7,
              spatial_scale: float = 1.0, sampling_ratio: int = 2,
              aligned: bool = False) -> jnp.ndarray:
    """RoIAlign over one feature map.

    Args:
      feat: (H, W, C) feature map (single image; vmap for batches).
      rois: (N, 4) xyxy boxes in INPUT-image coordinates.
    Returns (N, out_size, out_size, C).
    """
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - offset
    y1 = rois[:, 1] * spatial_scale - offset
    x2 = rois[:, 2] * spatial_scale - offset
    y2 = rois[:, 3] * spatial_scale - offset
    if not aligned:  # torchvision legacy: rois clamped to min size 1
        rw = jnp.maximum(x2 - x1, 1.0)
        rh = jnp.maximum(y2 - y1, 1.0)
    else:
        rw = x2 - x1
        rh = y2 - y1
    bin_h = rh / out_size                                  # (N,)
    bin_w = rw / out_size
    s = sampling_ratio
    # sample grid: per bin, s×s regular samples at (i+0.5)/s fractions
    gy = (jnp.arange(out_size * s) + 0.5) / s              # (out*s,) in bins
    ys = y1[:, None] + gy[None, :] * bin_h[:, None]        # (N, out*s)
    xs = x1[:, None] + gy[None, :] * bin_w[:, None]
    yy = jnp.broadcast_to(ys[:, :, None], (rois.shape[0], out_size * s,
                                           out_size * s))
    xx = jnp.broadcast_to(xs[:, None, :], yy.shape)
    vals = _bilinear_gather(feat, yy, xx)                  # (N, os, os, C)
    n, _, _, c = vals.shape
    vals = vals.reshape(n, out_size, s, out_size, s, c)
    return vals.mean(axis=(2, 4))


def roi_pool(feat: jnp.ndarray, rois: jnp.ndarray, *, out_size: int = 7,
             spatial_scale: float = 1.0) -> jnp.ndarray:
    """RoIPooling (quantized max-pool) — the reference's ablated variant
    (README.md:73, −2.1 mAP vs RoIAlign). Approximated with a fixed 2-sample
    max per bin on the quantized grid (exact torchvision RoIPool enumerates
    a data-dependent number of cells, which cannot be static-shaped; the
    ablation direction max≠avg is preserved)."""
    x1 = jnp.round(rois[:, 0] * spatial_scale)
    y1 = jnp.round(rois[:, 1] * spatial_scale)
    x2 = jnp.round(rois[:, 2] * spatial_scale)
    y2 = jnp.round(rois[:, 3] * spatial_scale)
    rw = jnp.maximum(x2 - x1 + 1, 1.0)
    rh = jnp.maximum(y2 - y1 + 1, 1.0)
    s = 4  # samples per bin edge for the max
    gy = (jnp.arange(out_size * s) + 0.5) / s / out_size   # fraction of roi
    ys = y1[:, None] + gy[None, :] * rh[:, None]
    xs = x1[:, None] + gy[None, :] * rw[:, None]
    yy = jnp.broadcast_to(ys[:, :, None], (rois.shape[0], out_size * s,
                                           out_size * s))
    xx = jnp.broadcast_to(xs[:, None, :], yy.shape)
    h, w = feat.shape[0], feat.shape[1]
    vals = feat[jnp.clip(yy, 0, h - 1).astype(jnp.int32),
                jnp.clip(xx, 0, w - 1).astype(jnp.int32)]
    n, _, _, c = vals.shape
    vals = vals.reshape(n, out_size, s, out_size, s, c)
    return vals.max(axis=(2, 4))


def _quad_flat(feats, c: int) -> jnp.ndarray:
    """Quad-shifted flattened pyramid: each level concatenated channel-wise
    with its x-, y-, and xy-rolled copies (see multilevel_roi_align)."""
    def quad(f):
        fx = jnp.roll(f, -1, axis=1)
        fy = jnp.roll(f, -1, axis=0)
        fxy = jnp.roll(fx, -1, axis=0)
        return jnp.concatenate([f, fx, fy, fxy], axis=-1)
    return jnp.concatenate([quad(f).reshape(-1, 4 * c) for f in feats],
                           axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _wgather_pool(shape, dtype_name, ss, flat, idx, w4):
    """Gather quad rows at ``idx`` (R,), weight the four taps by ``w4``
    (R, 4, with any 1/ss pooling scale pre-folded in), and sum each group
    of ``ss`` consecutive rows → (R/ss, c) pooled bins."""
    c = flat.shape[-1] // 4
    rows = flat[idx]                                       # (R, 4c)
    w = (rows[:, 0 * c:1 * c] * w4[:, 0:1] +
         rows[:, 1 * c:2 * c] * w4[:, 1:2] +
         rows[:, 2 * c:3 * c] * w4[:, 2:3] +
         rows[:, 3 * c:4 * c] * w4[:, 3:4])                # (R, c)
    # ss-contiguous bin sum as a stride-ss row reduce_window: the rank-3
    # reshape formulation (w.reshape(-1, ss, c).sum(1)) materialized the
    # weighted taps through a T(8,128)→T(4,128) relayout before reducing
    # (~4 ms of the FasterRCNN 832² b8 infer batch); reduce_window keeps
    # the reduce in the producer's layout (measured 82.3→78.9 ms infer,
    # 152.5→150.6 ms train)
    return jax.lax.reduce_window(w, jnp.zeros((), w.dtype), jax.lax.add,
                                 (ss, 1), (ss, 1), "VALID")


def _wgather_pool_fwd(shape, dtype_name, ss, flat, idx, w4):
    out = _wgather_pool(shape, dtype_name, ss, flat, idx, w4)
    return out, (idx, w4)


def _wgather_pool_bwd(shape, dtype_name, ss, res, g):
    idx, w4 = res
    dtype = jnp.dtype(dtype_name)
    nb, c = g.shape
    # the (R, 4c) scatter-update rows are rank-1 per tap: w4[t] ⊗ g[bin(t)].
    # Building them as ONE broadcast-multiply over (nb, ss, 4, c) (then a
    # layout-preserving reshape to (R, 4c)) reads only w4 (R·4) and the
    # per-BIN cotangent g (nb·c ≈ 51 MB) while writing the 1.6 GB update
    # tensor once. Autodiff at a per-tap cut instead broadcast g to taps
    # (a relayout pass) and built the updates in a 4-output multiply
    # fusion + a separate concat pass — two extra full sweeps, ~9 ms of
    # the FasterRCNN 832² b8 train step.
    upd = (w4.reshape(nb, ss, 4, 1).astype(dtype) *
           g[:, None, None, :].astype(dtype))
    upd = upd.reshape(nb * ss, 4 * c)
    d_flat = jnp.zeros(shape, dtype).at[idx].add(upd)
    # weight cotangents are structurally dead: multilevel_roi_align
    # stop_gradients its rois (so ly/lx/valid carry no gradient by
    # CONSTRUCTION, not just by convention) — returning zeros skips
    # autodiff's rows·g reductions over the gathered tensor
    return d_flat, None, jnp.zeros_like(w4)


_wgather_pool.defvjp(_wgather_pool_fwd, _wgather_pool_bwd)


def _mlra_weighted_gather(feats, idx, w4, ss: int):
    """Weighted 4-tap quad-row gather + ss-contiguous bin pooling. A hand-
    written VJP scattering each tap directly into the unshifted pyramid (4
    scatters of c-wide rows at idx + {0, 1, wrow, wrow+1}) was measured
    SLOWER (54 ms vs 34 ms of the FasterRCNN 832² b8 train step): TPU
    scatter-add cost is row-count-bound, so quadrupling the update rows
    loses more than the 4× narrower rows save — the same asymmetry that
    motivates the quad-shift layout forward. The backward keeps autodiff's
    shape (one wide (R,4c) scatter + the rolls' adjoint through
    _quad_flat) but builds the update rows in one pass from the per-bin
    cotangent (see _wgather_pool_bwd)."""
    c = feats[0].shape[-1]
    flat = _quad_flat(feats, c)
    return _wgather_pool(flat.shape, jnp.dtype(flat.dtype).name, ss, flat,
                         idx, w4)


def _roi_levels(rois: jnp.ndarray, num_levels: int, canonical_level: int,
                canonical_size: float) -> jnp.ndarray:
    """torchvision MultiScaleRoIAlign level map:
    clamp(floor(k0 + log2(sqrt(area)/224)), levels)."""
    areas = jnp.maximum(rois[:, 2] - rois[:, 0], 0.0) * \
        jnp.maximum(rois[:, 3] - rois[:, 1], 0.0)
    target = jnp.floor(canonical_level +
                       jnp.log2(jnp.sqrt(areas) / canonical_size + 1e-8))
    return jnp.clip(target, 0, num_levels - 1).astype(jnp.int32)


def multilevel_roi_align(feats, rois: jnp.ndarray, strides, *,
                         out_size: int = 7, sampling_ratio: int = 2,
                         canonical_size: float = 224.0,
                         canonical_level: int = 2,
                         aligned: bool = False,
                         method: str = "align") -> jnp.ndarray:
    """FPN level-aware RoIAlign (torchvision MultiScaleRoIAlign semantics).

    TPU formulation: the pyramid is flattened into ONE row tensor and each
    roi gathers ONLY at its assigned level — per-roi level parameters
    (stride, base offset, width, height) come from (L,)-tables indexed by
    the level map, so the whole op is one fixed-shape row gather. The rows
    are QUAD-SHIFTED: each level is concatenated channel-wise with its
    x-, y-, and xy-rolled copies, so all four bilinear taps of a sample
    come from a single (4C,) row at (y0, x0) — TPU gathers are row-count
    bound (~2.2× faster for the same bytes), and the roll wraparound is
    provably inert because a wrapped tap's bilinear weight is exactly the
    border-clamp case's zero. The naive compute-every-level-and-select
    per-tap version was ~6× slower end-to-end on a v5e (395 ms → the roi
    stage of FasterRCNN 832² b8).

    Args:
      feats: list of (H_l, W_l, C) maps, one per stride in ``strides``.
      rois: (N, 4) xyxy input-image coords.
    Returns (N, out, out, C).
    """
    # rois are NOT differentiated through (torchvision roi_align likewise
    # provides no roi gradients); make that contract structural rather than
    # a silent zero from _wgather_pool_bwd's dead weight cotangent
    rois = jax.lax.stop_gradient(rois)
    n_lvl = len(feats)
    target = _roi_levels(rois, n_lvl, canonical_level, canonical_size)

    c = feats[0].shape[-1]
    if method != "align":
        flat = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)
    hs = jnp.asarray([f.shape[0] for f in feats], jnp.float32)
    ws = jnp.asarray([f.shape[1] for f in feats], jnp.float32)
    bases = jnp.asarray(
        [0] + list(jnp.cumsum(jnp.asarray(
            [f.shape[0] * f.shape[1] for f in feats]))[:-1]), jnp.int32)
    scales = jnp.asarray([1.0 / s for s in strides], jnp.float32)

    # per-roi level params (tiny table gathers)
    r_scale = scales[target]                               # (N,)
    r_h = hs[target]
    r_w = ws[target]
    r_base = bases[target]

    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * r_scale - offset
    y1 = rois[:, 1] * r_scale - offset
    x2 = rois[:, 2] * r_scale - offset
    y2 = rois[:, 3] * r_scale - offset
    if method == "align":
        if not aligned:  # torchvision legacy: min roi size 1
            rw = jnp.maximum(x2 - x1, 1.0)
            rh = jnp.maximum(y2 - y1, 1.0)
        else:
            rw = x2 - x1
            rh = y2 - y1
        s = sampling_ratio
        g = (jnp.arange(out_size * s) + 0.5) / s           # bins
        ys = y1[:, None] + g[None, :] * (rh / out_size)[:, None]  # (N, os)
        xs = x1[:, None] + g[None, :] * (rw / out_size)[:, None]
    else:  # roi_pool ablation: quantized grid, 4-sample max per bin
        x1q = jnp.round(rois[:, 0] * r_scale)
        y1q = jnp.round(rois[:, 1] * r_scale)
        rw = jnp.maximum(jnp.round(rois[:, 2] * r_scale) - x1q + 1, 1.0)
        rh = jnp.maximum(jnp.round(rois[:, 3] * r_scale) - y1q + 1, 1.0)
        s = 4
        g = (jnp.arange(out_size * s) + 0.5) / s / out_size
        ys = y1q[:, None] + g[None, :] * rh[:, None]
        xs = x1q[:, None] + g[None, :] * rw[:, None]

    n = rois.shape[0]
    # bin-major tap order (bin_y, bin_x, sub_y, sub_x): the s·s taps of a
    # bin land in CONTIGUOUS gather rows, so the final tap mean/max is a
    # contiguous-group row reduce — the previous y-major order needed a
    # strided (n,7,s,7,s,c) 6-D reduce that cost a full relayout pass of
    # the gather output (~2.6 ms/step of the FasterRCNN 832² b8 train step)
    t = out_size * out_size * s * s
    ysb = ys.reshape(n, out_size, 1, s, 1)
    xsb = xs.reshape(n, 1, out_size, 1, s)
    yy = jnp.broadcast_to(ysb, (n, out_size, out_size, s, s)).reshape(n, t)
    xx = jnp.broadcast_to(xsb, (n, out_size, out_size, s, s)).reshape(n, t)
    h_r = r_h[:, None]
    w_r = r_w[:, None]
    base_r = r_base[:, None]

    if method == "align":
        valid = (yy > -1.0) & (yy < h_r) & (xx > -1.0) & (xx < w_r)
        ycl = jnp.clip(yy, 0.0, h_r - 1.0)
        xcl = jnp.clip(xx, 0.0, w_r - 1.0)
        y0 = jnp.floor(ycl)
        x0 = jnp.floor(xcl)
        # no tap clamping needed: whenever y0+1/x0+1 would leave the map
        # (only possible at ycl == H-1 / xcl == W-1 exactly), ly/lx is 0,
        # so the rolled-wraparound value is multiplied by exactly 0 —
        # identical to torchvision's min(y0+1, H-1) clamp
        ly = ycl - y0
        lx = xcl - x0
        wi = w_r.astype(jnp.int32)
        idx = base_r + y0.astype(jnp.int32) * wi + x0.astype(jnp.int32)
        # keep the tap reduction 2-D: the gathered rows stay (R, 4c) in
        # their native {1,0} layout and each tap is an ALIGNED lane slice
        # (c = multiple of 128). Splitting the lane dim via a reshape to
        # (..., 4, c) instead forces a full relayout pass of the gather
        # output — measured 11.3 ms of the 100 ms FasterRCNN 832² b8 batch,
        # plus a slower 6-D multiply-reduce.
        r = n * t
        dt = feats[0].dtype
        # weight/reduce in the feature dtype (bf16 on TPU): the tap tensor
        # is the big operand, and halving its elementwise traffic matters
        # more than the ≤2⁻⁸ relative weight rounding (pooled features are
        # averages of 4·s² taps; parity tests bound the error). The 1/s²
        # bin-mean scale is pre-folded into the tap weights, so the pooled
        # bins come straight out of the gather op (and stay in dt — an f32
        # pooled materialization doubled the (B·R, t, c) HBM traffic).
        inv = 1.0 / (s * s)
        w4 = jnp.stack([(1 - ly) * (1 - lx), (1 - ly) * lx,
                        ly * (1 - lx), ly * lx], axis=-1)
        w4 = (w4 * (valid[..., None] * inv)).reshape(r, 4).astype(dt)
        out = _mlra_weighted_gather(tuple(feats), idx.reshape(r), w4,
                                    s * s)
        return out.reshape(n, out_size, out_size, c)

    ycl = jnp.clip(yy, 0.0, h_r - 1.0).astype(jnp.int32)
    xcl = jnp.clip(xx, 0.0, w_r - 1.0).astype(jnp.int32)
    idx = base_r + ycl * r_w.astype(jnp.int32)[:, None] + xcl
    vals = flat[idx.reshape(n, -1)]                        # (n·t, c)
    vals = vals.reshape(n, out_size * out_size, s * s, c)
    return vals.max(axis=2).reshape(n, out_size, out_size, c)
