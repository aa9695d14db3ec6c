"""CSPDarknet backbone (YOLOv5-v6.1 topology), rebuild target C8.

Reference: HeltonDetection's YOLOv5 backbone (README.md:9, swappable backbones
README.md:8; lineage ultralytics/yolov5 models/yolov5{s,l}.yaml). v6.1 stem is
a 6x6/s2 conv (replacing Focus). Depth/width multiples give the s/n/m/l/x
variants scored in the reference tables (README.md:120-154).

Returns the three pyramid features C3 (stride 8), C4 (stride 16),
C5 (stride 32, post-SPPF).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from heltondetection_tpu.models.common import (C3, SPPF, ConvBnAct, depth,
                                               scaled)

# (depth_multiple, width_multiple) per variant
VARIANTS = {
    "n": (0.33, 0.25),
    "s": (0.33, 0.50),
    "m": (0.67, 0.75),
    "l": (1.00, 1.00),
    "x": (1.33, 1.25),
}


class CSPDarknet(nn.Module):
    depth_multiple: float = 0.33
    width_multiple: float = 0.50
    dtype: Any = jnp.float32
    dropblock_p: float = 0.0   # reference DropBlock-on-backbone ablation
    # (README.md:131-132, C16)
    include_c2: bool = False   # also return the stride-4 feature — needed
    # when CSPDarknet backs a FasterRCNN FPN (the reference's
    # timm_cspdarknet swap, README.md:120)
    norm_eval: bool = False    # BN in running-stats mode during training
    # (mmdet norm_eval; detection fine-tune default of the FasterRCNN
    # lineage — see models/resnet.py)
    frozen_stages: int = 0     # 1 = stem..c3_1 stop-gradient (mmdet-style)
    remat: bool = False        # jax.checkpoint each stage: backward re-runs
    # the stage forward instead of holding its activations — trades ~1/3
    # extra FLOPs for O(stage-boundary) activation memory, the TPU answer
    # to HBM-bound high-resolution training (identical math/params/grads)

    @nn.compact
    def __call__(self, x, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        w, d = self.width_multiple, self.depth_multiple
        CBA, C3b, SPPFb = ConvBnAct, C3, SPPF
        if self.remat:
            # nn.remat is variable/param-transparent (same tree, same
            # numbers); train is arg 2 counting self, and must be static
            CBA = nn.remat(ConvBnAct, static_argnums=(2,))
            C3b = nn.remat(C3, static_argnums=(2,))
            SPPFb = nn.remat(SPPF, static_argnums=(2,))
        dt = self.dtype
        bt = train and not self.norm_eval   # BN mode (DropBlock keeps train)
        # frozen stage's BNs always run on running stats (no stat updates)
        # even when norm_eval=False — mmdet _freeze_stages semantics; see
        # models/resnet.py for the rationale
        bt0 = bt and self.frozen_stages < 1
        # stem: 6x6 stride-2 conv, pad 2 (v6.0+)
        x = CBA(scaled(64, w), 6, 2, pad=2, dtype=dt, name="stem")(x, bt0)
        x = CBA(scaled(128, w), 3, 2, dtype=dt, name="down1")(x, bt0)
        c2 = C3b(scaled(128, w), depth(3, d), dtype=dt, name="c3_1")(x, bt0)
        if self.frozen_stages >= 1:
            c2 = jax.lax.stop_gradient(c2)
        x = CBA(scaled(256, w), 3, 2, dtype=dt, name="down2")(c2, bt)
        c3 = C3b(scaled(256, w), depth(6, d), dtype=dt, name="c3_2")(x, bt)
        x = CBA(scaled(512, w), 3, 2, dtype=dt, name="down3")(c3, bt)
        c4 = C3b(scaled(512, w), depth(9, d), dtype=dt, name="c3_3")(x, bt)
        x = CBA(scaled(1024, w), 3, 2, dtype=dt, name="down4")(c4, bt)
        x = C3b(scaled(1024, w), depth(3, d), dtype=dt, name="c3_4")(x, bt)
        c5 = SPPFb(scaled(1024, w), 5, dtype=dt, name="sppf")(x, bt)
        if self.dropblock_p > 0:
            from heltondetection_tpu.models.dropblock import DropBlock
            db = DropBlock(self.dropblock_p, name="dropblock")
            c3 = db(c3, deterministic=not train)
            c4 = db(c4, deterministic=not train)
            c5 = db(c5, deterministic=not train)
        if self.include_c2:
            return c2, c3, c4, c5
        return c3, c4, c5


def build_cspdarknet(variant: str = "s", dtype=jnp.float32) -> CSPDarknet:
    d, w = VARIANTS[variant]
    return CSPDarknet(depth_multiple=d, width_multiple=w, dtype=dtype)
