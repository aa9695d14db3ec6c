"""Swappable-backbone registry — rebuild target C8 (SURVEY.md §2a).

The reference supports swapping the detector backbone, including
timm-wrapped ones ("可更换Backbone", README.md:8-9; the timm_cspdarknet
FasterRCNN row, README.md:120). timm itself is torch-only, so the TPU
rebuild provides the same capability as a registry of flax backbones with
one uniform contract:

    build_backbone(name, dtype=..., dropblock_p=...) -> nn.Module
    module(x (B,H,W,3), train) -> tuple of pyramid features, low→high
    stride, ALWAYS ending at stride 32; four features (C2..C5) for
    ResNets / C2-tapped CSPDarknets, consumers slice what they need
    (YOLOv5 takes [-3:], FasterRCNN takes [-4:]).

Registered names: resnet18/34/50/101 and cspdarknet_{n,s,m,l,x}.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from heltondetection_tpu.models.cspdarknet import VARIANTS, CSPDarknet
from heltondetection_tpu.models.resnet import RESNET_STAGES, ResNet


def backbone_names():
    return (list(RESNET_STAGES) +
            [f"cspdarknet_{v}" for v in VARIANTS])


def build_backbone(name: str, dtype: Any = jnp.float32,
                   dropblock_p: float = 0.0, module_name: str = "backbone",
                   norm_eval: bool = False, frozen_stages: int = 0):
    """Instantiate a registered backbone module (not yet initialised).

    ``norm_eval``/``frozen_stages`` follow mmdet's ResNet knobs (BN in
    running-stats mode during training; stop-gradient through the first N
    stages) — the detection fine-tune defaults of the FasterRCNN lineage.
    """
    if name in RESNET_STAGES:
        stages, block = RESNET_STAGES[name]
        return ResNet(stage_sizes=stages, block=block, dtype=dtype,
                      dropblock_p=dropblock_p, norm_eval=norm_eval,
                      frozen_stages=frozen_stages, name=module_name)
    if name.startswith("cspdarknet_"):
        variant = name.split("_", 1)[1]
        d, w = VARIANTS[variant]
        return CSPDarknet(depth_multiple=d, width_multiple=w, dtype=dtype,
                          dropblock_p=dropblock_p, include_c2=True,
                          norm_eval=norm_eval, frozen_stages=frozen_stages,
                          name=module_name)
    raise ValueError(
        f"unknown backbone {name!r}; registered: {backbone_names()}")


def frozen_stage_prefixes(name: str, frozen_stages: int,
                          root: str = "backbone"):
    """Param-path prefixes (for make_optimizer frozen_prefixes) matching
    the stages that ``frozen_stages`` stop-gradients in the model — keeps
    AdamW weight decay off params whose grads are structurally zero."""
    if frozen_stages <= 0:
        return ()
    if name in RESNET_STAGES:
        return tuple([f"{root}/stem_"] +
                     [f"{root}/layer{i}_"
                      for i in range(1, frozen_stages + 1)])
    if name.startswith("cspdarknet_"):
        # CSPDarknet implements one frozen stage: stem..c3_1
        return (f"{root}/stem/", f"{root}/down1/", f"{root}/c3_1/")
    return ()
