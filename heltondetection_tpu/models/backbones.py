"""Swappable-backbone registry — rebuild target C8 (SURVEY.md §2a).

The reference supports swapping the detector backbone, including
timm-wrapped ones ("可更换Backbone", README.md:8-9; the timm_cspdarknet
FasterRCNN row, README.md:120). timm itself is torch-only, so the TPU
rebuild provides the same capability as an OPEN registry of flax backbones
with one uniform contract:

    build_backbone(name, dtype=..., dropblock_p=...) -> nn.Module
    module(x (B,H,W,3), train) -> tuple of pyramid features, low→high
    stride, ALWAYS ending at stride 32; four features (C2..C5) for
    ResNets / C2-tapped CSPDarknets, consumers slice what they need
    (YOLOv5 takes [-3:], FasterRCNN takes [-4:]).

Built-in names: resnet18/34/50/101 and cspdarknet_{n,s,m,l,x}. Third-party
backbones plug in via ``register_backbone`` (the timm-wrap analog): any
flax module meeting the contract becomes addressable from configs by name
— no framework edits needed (tests/test_backbones.py registers one and
trains both detector families through it).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax.numpy as jnp

from heltondetection_tpu.models.cspdarknet import VARIANTS, CSPDarknet
from heltondetection_tpu.models.resnet import RESNET_STAGES, ResNet

# name -> (factory, frozen_prefix_fn). The factory receives the uniform
# keyword set below; custom backbones may ignore knobs they don't support
# (**kw swallows them) but then must document that freezing is a no-op.
_REGISTRY: Dict[str, tuple] = {}


def register_backbone(name: str,
                      factory: Callable[..., Any],
                      frozen_prefixes: Optional[
                          Callable[[int, str], Sequence[str]]] = None,
                      ) -> None:
    """Register a custom backbone under ``name`` (config-addressable).

    ``factory(dtype, dropblock_p, module_name, norm_eval, frozen_stages,
    remat)`` must return a flax module with the pyramid contract in the module
    docstring. ``frozen_prefixes(frozen_stages, root)`` optionally returns
    the param-path prefixes the optimizer should freeze when
    ``frozen_stages`` > 0 (omit it if the backbone doesn't freeze).
    Re-registering a name overwrites it (last wins), so experiments can
    shadow a built-in.
    """
    _REGISTRY[name] = (factory, frozen_prefixes)


def backbone_names():
    return sorted(_REGISTRY)


def build_backbone(name: str, dtype: Any = jnp.float32,
                   dropblock_p: float = 0.0, module_name: str = "backbone",
                   norm_eval: bool = False, frozen_stages: int = 0,
                   remat: bool = False):
    """Instantiate a registered backbone module (not yet initialised).

    ``norm_eval``/``frozen_stages`` follow mmdet's ResNet knobs (BN in
    running-stats mode during training; stop-gradient through the first N
    stages) — the detection fine-tune defaults of the FasterRCNN lineage.
    """
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown backbone {name!r}; registered: {backbone_names()}")
    factory, _ = _REGISTRY[name]
    kw = dict(dtype=dtype, dropblock_p=dropblock_p, module_name=module_name,
              norm_eval=norm_eval, frozen_stages=frozen_stages)
    # factories registered before the remat knob existed keep working:
    # inspect the signature rather than catching TypeError (which would
    # mask TypeErrors raised INSIDE a remat-aware factory)
    import inspect
    try:
        fparams = inspect.signature(factory).parameters
        takes_remat = ("remat" in fparams or any(
            p.kind is inspect.Parameter.VAR_KEYWORD
            for p in fparams.values()))
    except (TypeError, ValueError):
        takes_remat = True   # unintrospectable callable: assume current API
    if takes_remat:
        return factory(remat=remat, **kw)
    if remat:
        raise ValueError(
            f"backbone {name!r} factory does not accept remat=True")
    return factory(**kw)


def frozen_stage_prefixes(name: str, frozen_stages: int,
                          root: str = "backbone"):
    """Param-path prefixes (for make_optimizer frozen_prefixes) matching
    the stages that ``frozen_stages`` stop-gradients in the model — keeps
    AdamW weight decay off params whose grads are structurally zero."""
    if frozen_stages <= 0:
        return ()
    entry = _REGISTRY.get(name)
    if entry is None or entry[1] is None:
        return ()
    return tuple(entry[1](frozen_stages, root))


def _resnet_factory(stages, block):
    def make(dtype, dropblock_p, module_name, norm_eval, frozen_stages,
             remat=False):
        return ResNet(stage_sizes=stages, block=block, dtype=dtype,
                      dropblock_p=dropblock_p, norm_eval=norm_eval,
                      frozen_stages=frozen_stages, remat=remat,
                      name=module_name)
    return make


def _resnet_frozen(frozen_stages: int, root: str):
    return ([f"{root}/stem_"] +
            [f"{root}/layer{i}_" for i in range(1, frozen_stages + 1)])


def _csp_factory(variant):
    d, w = VARIANTS[variant]

    def make(dtype, dropblock_p, module_name, norm_eval, frozen_stages,
             remat=False):
        return CSPDarknet(depth_multiple=d, width_multiple=w, dtype=dtype,
                          dropblock_p=dropblock_p, include_c2=True,
                          norm_eval=norm_eval, frozen_stages=frozen_stages,
                          remat=remat, name=module_name)
    return make


def _csp_frozen(frozen_stages: int, root: str):
    # CSPDarknet implements one frozen stage: stem..c3_1
    return (f"{root}/stem/", f"{root}/down1/", f"{root}/c3_1/")


for _name, (_stages, _block) in RESNET_STAGES.items():
    register_backbone(_name, _resnet_factory(_stages, _block),
                      _resnet_frozen)
for _variant in VARIANTS:
    register_backbone(f"cspdarknet_{_variant}", _csp_factory(_variant),
                      _csp_frozen)
