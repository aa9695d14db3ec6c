"""Shared conv building blocks (flax.linen, NHWC, MXU-friendly).

Rebuild of the reference's model primitives (C8/C9 lineage: YOLOv5-v6.1
Conv/Bottleneck/C3/SPPF modules, SURVEY.md §2a). TPU-first choices:

* NHWC layout everywhere — XLA:TPU's native conv layout, keeps the channel
  dim on the 128-lane axis.
* ``dtype`` (compute) vs ``param_dtype`` (storage) split so the whole stack
  runs bfloat16 on the MXU with float32 master params.
* BatchNorm with Ultralytics-matching eps=1e-3, momentum=0.97 (torch
  momentum 0.03) so ported weights reproduce reference numbers
  (the reference reproduces Ultralytics mAP, README.md:133-135).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any, NamedTuple, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

# Trace-time flag: when set, every ConvBnAct sows its input's abs-max into
# the "quant_stats" collection (calibration pass for W8A8 serving — see
# ops/quant.py). A contextvar (not a module attribute) so no model code has
# to thread it; jit traces under our control, so trace-time is enough.
_CALIBRATE = contextvars.ContextVar("heltondetection_quant_calibrate",
                                    default=False)


@contextlib.contextmanager
def calibration_mode():
    tok = _CALIBRATE.set(True)
    try:
        yield
    finally:
        _CALIBRATE.reset(tok)


def _act_stats(x: jnp.ndarray) -> jnp.ndarray:
    """PER-CHANNEL activation statistics for calibration: ``(2, C)`` =
    ``[amax_c, p999_c]``.

    The 99.9th percentile of |x| (estimated on a <=2^20-element strided
    row subsample — plenty for a 3-digit quantile) lets ops/quant.py clip
    one activation outlier instead of letting it set the scale for the
    whole tensor (the classic abs-max PTQ failure mode). Per-tensor
    consumers (the per-layer W8A8 mode) reduce with a channel max; the
    int8-flow mode uses the channel vectors directly."""
    c = x.shape[-1]
    ax = jnp.abs(x.astype(jnp.float32)).reshape(-1, c)
    stride = max(1, ax.shape[0] // max(1, (1 << 20) // max(c, 1)))
    p999 = jnp.quantile(ax[::stride], 0.999, axis=0)
    return jnp.stack([jnp.max(ax, axis=0), p999])


class QT(NamedTuple):
    """An int8-quantized activation tensor flowing BETWEEN quantized convs
    (the W8A8 "int8 activation flow" serving mode, ops/quant.py
    build_flow_tree): ``i8`` is the NHWC int8 payload (1 byte/element in
    HBM — half of bf16, the measured bandwidth bound of the composed
    models), ``scale`` the per-channel dequant scale (C,) f32. Consumers
    fold ``scale`` into their own weights per input channel at trace
    time, so concatenating QTs with different scales is a free int8
    concat."""
    i8: jnp.ndarray
    scale: jnp.ndarray

    @property
    def shape(self):
        return self.i8.shape


def q_dequant(x, dtype=jnp.float32):
    """QT -> float tensor (boundary to unquantized consumers)."""
    if isinstance(x, QT):
        return (x.i8.astype(jnp.float32) * x.scale).astype(dtype)
    return x


def q_requant(y: jnp.ndarray, scale: jnp.ndarray) -> QT:
    """float tensor -> QT under the given per-channel scale."""
    y_i8 = jnp.clip(jnp.round(y.astype(jnp.float32) / scale),
                    -127.0, 127.0).astype(jnp.int8)
    return QT(y_i8, scale)


def q_cat(parts, axis: int = -1):
    """Channel-concat that keeps the int8 flow: all-QT parts concat as
    int8 with concatenated scale vectors (consumers fold per channel);
    any float part demotes the whole concat to float. QT scales are
    per-CHANNEL, so only the channel (last) axis is legal for the int8
    path — any other axis would silently desynchronize scale and payload."""
    if all(isinstance(p, QT) for p in parts):
        if axis not in (-1, parts[0].i8.ndim - 1):
            raise ValueError(
                f"q_cat over QT parts only supports the channel (last) "
                f"axis; got axis={axis}")
        return QT(jnp.concatenate([p.i8 for p in parts], axis=axis),
                  jnp.concatenate([p.scale for p in parts]))
    return jnp.concatenate([q_dequant(p) for p in parts], axis=axis)


def conv_bn_maybe_quant(mod: nn.Module, x: jnp.ndarray, *, features: int,
                        kernel: int, stride: int = 1, pad: int | None = None,
                        groups: int = 1, dtype: Any, conv_name: str,
                        bn_name: str, bn_momentum: float, bn_eps: float,
                        bn_train: bool) -> jnp.ndarray:
    """Conv → BatchNorm with the W8A8 serving + calibration hooks, shared
    by :class:`ConvBnAct` and the ResNet blocks (no activation — the caller
    owns it).

    Three modes, keyed purely on ambient state:

    * calibration (:func:`calibration_mode`): sow this conv's input
      ``[amax, p999]`` into the ``quant_stats`` collection, then run float.
    * serving with a "quant" collection present (ops/quant.py built it):
      BN is folded, weights are per-out-channel int8, the input is
      quantized with a calibrated static scale, and the conv runs
      int8 x int8 -> int32 on the MXU's double-rate path. The quant/dequant
      elementwise ops fuse into neighbours under XLA.
    * otherwise: the plain float conv+BN (bit-identical to pre-feature).

    Quant/stats variable names are prefixed with ``conv_name + "_"`` unless
    the module follows the ConvBnAct convention (one conv named "conv"), so
    multi-conv modules (ResNet Bottleneck) can hold several quantized convs
    side by side without colliding with their submodule scopes.
    """
    import jax
    p = autopad(kernel) if pad is None else pad
    prefix = "" if conv_name == "conv" else conv_name + "_"
    if _CALIBRATE.get():
        ci = x.shape[-1]
        mod.sow("quant_stats", prefix + "in_amax", _act_stats(x),
                init_fn=lambda: jnp.zeros((2, ci), jnp.float32),
                reduce_fn=jnp.maximum)
    if mod.has_variable("quant", prefix + "w_q"):
        w_q = mod.get_variable("quant", prefix + "w_q")
        out_scale = mod.get_variable("quant", prefix + "out_scale")
        bias = mod.get_variable("quant", prefix + "bias")
        inv_in = mod.get_variable("quant", prefix + "inv_in_scale")
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv_in),
                       -127.0, 127.0).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(
            x_q.shape, w_q.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x_q, w_q, (stride, stride), ((p, p), (p, p)),
            dimension_numbers=dn, feature_group_count=groups,
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * out_scale + bias).astype(dtype)
    x = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                padding=((p, p), (p, p)), feature_group_count=groups,
                use_bias=False, dtype=dtype, name=conv_name)(x)
    return nn.BatchNorm(use_running_average=not bn_train,
                        momentum=bn_momentum, epsilon=bn_eps, dtype=dtype,
                        name=bn_name)(x)


def make_divisible(x: float, divisor: int = 8) -> int:
    import math
    return max(divisor, int(math.ceil(x / divisor) * divisor))


def autopad(k: int) -> int:
    return k // 2


def scaled(c: int, w: float) -> int:
    """Channel count under a width multiple (YOLOv5 variant scaling)."""
    return make_divisible(c * w, 8)


def depth(n: int, d: float) -> int:
    """Block count under a depth multiple."""
    return max(round(n * d), 1)


class ConvBnAct(nn.Module):
    """Conv → BN → SiLU, the universal YOLOv5 block ("Conv")."""
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.float32
    pad: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.has_variable("quant", "w_f"):
            return self._int8_flow(x)
        if isinstance(x, QT):   # flow tensor reaching an unquantized conv
            x = q_dequant(x, self.dtype)
        x = conv_bn_maybe_quant(self, x, features=self.features,
                                kernel=self.kernel, stride=self.stride,
                                pad=self.pad, groups=self.groups,
                                dtype=self.dtype, conv_name="conv",
                                bn_name="bn", bn_momentum=0.97, bn_eps=1e-3,
                                bn_train=train)
        if self.act:
            x = nn.silu(x)
        if _CALIBRATE.get():
            # post-activation output stats: the int8-flow mode requants
            # every conv's OUTPUT with its own calibrated per-channel
            # scale, so producers never need to know their consumers
            co = x.shape[-1]
            self.sow("quant_stats", "out_amax", _act_stats(x),
                     init_fn=lambda: jnp.zeros((2, co), jnp.float32),
                     reduce_fn=jnp.maximum)
        return x

    def _int8_flow(self, x):
        """W8A8 with int8 ACTIVATION flow (ops/quant.build_flow_tree):
        activations live in HBM as int8 (1 byte — half of bf16, the
        measured bandwidth bound of the composed models, PERF_NOTES).
        The incoming QT's per-channel scales are folded into the float
        BN-folded weights at trace time and the result quantized per
        output channel — so int8 tensors with ANY per-channel scales
        (concats of different producers) feed the MXU's int8 path
        directly. Output is requantized to this conv's calibrated
        per-channel scale, or emitted float when the tree carries no
        out_scale (the head-boundary convs)."""
        import jax
        p = autopad(self.kernel) if self.pad is None else self.pad
        w_f = self.get_variable("quant", "w_f")        # (k,k,ci,co) f32
        bias = self.get_variable("quant", "bias")      # (co,)
        if isinstance(x, QT):
            x_i8, s_vec = x.i8, x.scale
        else:
            s_vec = self.get_variable("quant", "in_scale")     # (ci,)
            x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / s_vec),
                            -127.0, 127.0).astype(jnp.int8)
        if self.groups > 1:
            # Grouped conv: w_f's input dim is ci/groups; XLA's
            # feature_group_count splits the ci input channels into
            # contiguous groups, group j feeding output block j — fold
            # each group's slice of the incoming scale vector into its
            # own output block.
            kh, kw, cig, co = w_f.shape
            s_g = s_vec.reshape(self.groups, cig)          # (g, ci/g)
            w_eff = (w_f.reshape(kh, kw, cig, self.groups, co // self.groups)
                     * s_g.T[None, None, :, :, None]
                     ).reshape(kh, kw, cig, co)
        else:
            w_eff = w_f * s_vec[None, None, :, None]
        s_w = jnp.max(jnp.abs(w_eff), axis=(0, 1, 2)) / 127.0
        s_w = jnp.where(s_w > 0, s_w, 1.0)
        w_q = jnp.clip(jnp.round(w_eff / s_w), -127.0, 127.0
                       ).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(
            x_i8.shape, w_q.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x_i8, w_q, (self.stride, self.stride), ((p, p), (p, p)),
            dimension_numbers=dn, feature_group_count=self.groups,
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * s_w + bias
        if self.act:
            y = nn.silu(y)
        if self.has_variable("quant", "out_scale"):
            return q_requant(y, self.get_variable("quant", "out_scale"))
        return y.astype(self.dtype)


class Bottleneck(nn.Module):
    """1x1 → 3x3 with optional residual add (YOLOv5 Bottleneck)."""
    features: int
    shortcut: bool = True
    expansion: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        y = ConvBnAct(hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBnAct(self.features, 3, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            if isinstance(x, QT) or isinstance(y, QT):
                # int8-flow residual: dequant-add in one fused elementwise
                # pass (reads 2x int8, writes int8 — still cheaper than
                # the bf16 add), requantized with the add's own
                # calibrated scale
                z = q_dequant(x) + q_dequant(y)
                if self.has_variable("quant", "res_scale"):
                    return q_requant(
                        z, self.get_variable("quant", "res_scale"))
                return z.astype(self.dtype)
            y = x + y
            if _CALIBRATE.get():
                c = y.shape[-1]
                self.sow("quant_stats", "res_amax", _act_stats(y),
                         init_fn=lambda: jnp.zeros((2, c), jnp.float32),
                         reduce_fn=jnp.maximum)
        return y


class C3(nn.Module):
    """CSP bottleneck with 3 convs (YOLOv5 C3): split → n bottlenecks → merge."""
    features: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        y1 = ConvBnAct(hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(hidden, self.shortcut, 1.0, dtype=self.dtype,
                            name=f"m{i}")(y1, train)
        y2 = ConvBnAct(hidden, 1, dtype=self.dtype, name="cv2")(x, train)
        y = q_cat([y1, y2], axis=-1)
        return ConvBnAct(self.features, 1, dtype=self.dtype, name="cv3")(y, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling — fast (3 chained 5x5 maxpools)."""
    features: int
    pool: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        x = ConvBnAct(hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        p = self.pool // 2

        def pool(v):
            if isinstance(v, QT):
                # max is monotone and scales are positive, so pooling the
                # int8 payload IS pooling the dequantized values; pad with
                # int8-min (the float path's -inf)
                import jax
                return QT(jax.lax.reduce_window(
                    v.i8, jnp.int8(-128), jax.lax.max,
                    (1, self.pool, self.pool, 1), (1, 1, 1, 1),
                    ((0, 0), (p, p), (p, p), (0, 0))), v.scale)
            return nn.max_pool(v, (self.pool, self.pool), strides=(1, 1),
                               padding=((p, p), (p, p)))

        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        y = q_cat([x, y1, y2, y3], axis=-1)
        return ConvBnAct(self.features, 1, dtype=self.dtype, name="cv2")(y, train)


def upsample2x(x):
    """Nearest 2x upsample without gathers: reshape+broadcast (fast on
    TPU). QT-transparent (upsampling permutes/duplicates values, scales
    are per-channel)."""
    if isinstance(x, QT):
        return QT(upsample2x(x.i8), x.scale)
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
