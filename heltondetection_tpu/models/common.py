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

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


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
        p = autopad(self.kernel) if self.pad is None else self.pad
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
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
