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
from typing import Any, Sequence, Tuple

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
    """Per-tensor activation statistics for calibration: ``[amax, p999]``.

    The 99.9th percentile of |x| (estimated on a <=2^20-element strided
    subsample — plenty for a 3-digit quantile) lets ops/quant.py clip one
    activation outlier instead of letting it set the scale for the whole
    tensor (the classic abs-max PTQ failure mode)."""
    ax = jnp.abs(x.astype(jnp.float32)).ravel()
    stride = max(1, ax.shape[0] // (1 << 20))
    p999 = jnp.quantile(ax[::stride], 0.999)
    return jnp.stack([jnp.max(ax), p999])


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
        mod.sow("quant_stats", prefix + "in_amax", _act_stats(x),
                init_fn=lambda: jnp.zeros((2,), jnp.float32),
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
        x = conv_bn_maybe_quant(self, x, features=self.features,
                                kernel=self.kernel, stride=self.stride,
                                pad=self.pad, groups=self.groups,
                                dtype=self.dtype, conv_name="conv",
                                bn_name="bn", bn_momentum=0.97, bn_eps=1e-3,
                                bn_train=train)
        if self.act:
            x = nn.silu(x)
        return x


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
            y = x + y
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
        y = jnp.concatenate([y1, y2], axis=-1)
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
        pool = lambda v: nn.max_pool(v, (self.pool, self.pool), strides=(1, 1),
                                     padding=((p, p), (p, p)))
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        y = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return ConvBnAct(self.features, 1, dtype=self.dtype, name="cv2")(y, train)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample without gathers: reshape+broadcast (fast on TPU)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
