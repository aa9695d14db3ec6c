"""Necks: YOLOv5-style PAFPN, classic FPN, YOLOv8-style PAFPN. Rebuild C9.

Reference supports FPN and both PAFPN styles with swappable necks
(README.md:8-9; FasterRCNN defaults README.md:65: "PAFPN(YOLOv8风格), 输出特征层
的channel数统一为256"). The YOLOv5 PAFPN is fused into the detector head graph
exactly as ultralytics' head yaml so ported weights line up.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from heltondetection_tpu.models.common import (C3, ConvBnAct, depth, q_cat,
                                               scaled, upsample2x)


class PAFPNv5(nn.Module):
    """YOLOv5-v6.1 head neck: top-down then bottom-up CSP path.

    Input (c3, c4, c5) from CSPDarknet; output (p3, p4, p5) feeding the
    detect head, channels (256w, 512w, 1024w).
    """
    depth_multiple: float = 0.33
    width_multiple: float = 0.50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c3, c4, c5 = feats
        w, d = self.width_multiple, self.depth_multiple
        dt = self.dtype
        # top-down (q_cat keeps the int8-flow serving mode's activations
        # int8 through the concats — a plain jnp.concatenate otherwise)
        lat5 = ConvBnAct(scaled(512, w), 1, dtype=dt, name="lat5")(c5, train)
        x = q_cat([upsample2x(lat5), c4], axis=-1)
        t4 = C3(scaled(512, w), depth(3, d), shortcut=False, dtype=dt,
                name="td4")(x, train)
        lat4 = ConvBnAct(scaled(256, w), 1, dtype=dt, name="lat4")(t4, train)
        x = q_cat([upsample2x(lat4), c3], axis=-1)
        p3 = C3(scaled(256, w), depth(3, d), shortcut=False, dtype=dt,
                name="td3")(x, train)
        # bottom-up
        x = ConvBnAct(scaled(256, w), 3, 2, dtype=dt, name="bu3")(p3, train)
        x = q_cat([x, lat4], axis=-1)
        p4 = C3(scaled(512, w), depth(3, d), shortcut=False, dtype=dt,
                name="bu4")(x, train)
        x = ConvBnAct(scaled(512, w), 3, 2, dtype=dt, name="bu5")(p4, train)
        x = q_cat([x, lat5], axis=-1)
        p5 = C3(scaled(1024, w), depth(3, d), shortcut=False, dtype=dt,
                name="bu6")(x, train)
        return p3, p4, p5


class FPN(nn.Module):
    """Classic FPN (lateral 1x1 + top-down sum + 3x3 smooth), 256 channels,
    plus a stride-2 maxpool P6 level for RPN (torchvision FasterRCNN style —
    the reference's FasterRCNN FPN default, README.md:65)."""
    out_channels: int = 256
    dtype: Any = jnp.float32
    extra_pool: bool = True

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False
                 ) -> List[jnp.ndarray]:
        n = len(feats)
        laterals = [nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name=f"lat{i}")(f) for i, f in enumerate(feats)]
        for i in range(n - 2, -1, -1):
            laterals[i] = laterals[i] + upsample2x(laterals[i + 1])
        outs = [nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"smooth{i}")(laterals[i])
                for i in range(n)]
        if self.extra_pool:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs


class PAFPNv8(nn.Module):
    """YOLOv8-style PAFPN with unified output channels (reference FasterRCNN
    default neck, README.md:65): top-down concat+C3(no lateral convs) then
    bottom-up concat+C3, all levels projected to ``out_channels``."""
    out_channels: int = 256
    n_blocks: int = 1
    dtype: Any = jnp.float32
    extra_pool: bool = True

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False
                 ) -> List[jnp.ndarray]:
        dt = self.dtype
        n = len(feats)
        # unify channels first so concat widths stay bounded
        xs = [ConvBnAct(self.out_channels, 1, dtype=dt, name=f"in{i}")(f, train)
              for i, f in enumerate(feats)]
        # top-down
        td = [None] * n
        td[n - 1] = xs[n - 1]
        for i in range(n - 2, -1, -1):
            x = jnp.concatenate([upsample2x(td[i + 1]), xs[i]], axis=-1)
            td[i] = C3(self.out_channels, self.n_blocks, shortcut=False,
                       dtype=dt, name=f"td{i}")(x, train)
        # bottom-up
        outs = [None] * n
        outs[0] = td[0]
        for i in range(1, n):
            x = ConvBnAct(self.out_channels, 3, 2, dtype=dt,
                          name=f"bu{i}")(outs[i - 1], train)
            x = jnp.concatenate([x, td[i]], axis=-1)
            outs[i] = C3(self.out_channels, self.n_blocks, shortcut=False,
                         dtype=dt, name=f"out{i}")(x, train)
        if self.extra_pool:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs
