"""ResNet backbone (torchvision-v1 topology) — rebuild target C8.

The reference's FasterRCNN default backbone is ResNet50 (README.md:65
"Backbone默认为ResNet50") with ImageNet pretraining and optional freezing
(README.md:132 frozeBackbone ablation). Topology matches torchvision
``resnet50`` exactly (bottleneck 1-3-1, expansion 4, stride-2 in the 3x3,
7x7/2 stem + 3x3/2 maxpool) so ported weights reproduce features; NHWC.

Freezing: :func:`freeze_mask` returns a pytree mask usable with
``optax.masked`` to implement the reference's frozen-backbone fine-tune.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from heltondetection_tpu.models.common import conv_bn_maybe_quant

# torchvision BN hyperparams; conv_bn_maybe_quant adds the W8A8 PTQ hooks
# (ops/quant.py — serving-path backbone quantization; the param tree is
# unchanged: convN/bnN stay sibling submodules)
_cbn = functools.partial(conv_bn_maybe_quant, bn_momentum=0.9, bn_eps=1e-5)


class Bottleneck(nn.Module):
    features: int           # bottleneck width; output = features * 4
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        residual = x
        y = _cbn(self, x, features=self.features, kernel=1, dtype=dt,
                 conv_name="conv1", bn_name="bn1", bn_train=train)
        y = nn.relu(y)
        y = _cbn(self, y, features=self.features, kernel=3,
                 stride=self.stride, dtype=dt, conv_name="conv2",
                 bn_name="bn2", bn_train=train)
        y = nn.relu(y)
        y = _cbn(self, y, features=self.features * 4, kernel=1, dtype=dt,
                 conv_name="conv3", bn_name="bn3", bn_train=train)
        if self.downsample:
            residual = _cbn(self, x, features=self.features * 4, kernel=1,
                            stride=self.stride, dtype=dt,
                            conv_name="ds_conv", bn_name="ds_bn",
                            bn_train=train)
        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    """Two-3x3 residual block (resnet18/34; torchvision BasicBlock)."""
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        residual = x
        y = _cbn(self, x, features=self.features, kernel=3,
                 stride=self.stride, dtype=dt, conv_name="conv1",
                 bn_name="bn1", bn_train=train)
        y = nn.relu(y)
        y = _cbn(self, y, features=self.features, kernel=3, dtype=dt,
                 conv_name="conv2", bn_name="bn2", bn_train=train)
        if self.downsample:
            residual = _cbn(self, x, features=self.features, kernel=1,
                            stride=self.stride, dtype=dt,
                            conv_name="ds_conv", bn_name="ds_bn",
                            bn_train=train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)   # resnet50
    block: str = "bottleneck"                   # bottleneck | basic
    dtype: Any = jnp.float32
    dropblock_p: float = 0.0   # DropBlock on C3..C5 (reference backbone
    # regularization ablation, README.md:131-132)
    norm_eval: bool = False    # mmdet ResNet(norm_eval=True) / torchvision
    # FrozenBatchNorm2d: BN always uses running stats, even in training —
    # the detection-fine-tune default of the reference's lineage. Also much
    # faster on TPU: the per-BN batch-stat reduce+re-read passes vanish.
    frozen_stages: int = 0     # mmdet frozen_stages / torchvision
    # trainable_backbone_layers: 1 = stem+layer1 frozen (stop_gradient —
    # skips their backward entirely, not just the optimizer update)
    remat: bool = False        # jax.checkpoint each residual block: the
    # backward re-runs the block forward instead of holding its
    # activations — trades ~1/3 extra FLOPs for O(block-boundary)
    # activation memory (HBM-bound high-res training; identical math)

    @nn.compact
    def __call__(self, x, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        dt = self.dtype
        bn_train = train and not self.norm_eval
        # mmdet _freeze_stages semantics: a frozen stage's BNs are ALWAYS
        # in eval mode (running stats, no stat updates) even when
        # norm_eval=False — otherwise the frozen stage's eval-time function
        # would drift under its pinned weights as stats keep updating
        stem_bn = bn_train and self.frozen_stages < 1
        x = _cbn(self, x, features=64, kernel=7, stride=2, dtype=dt,
                 conv_name="stem_conv", bn_name="stem_bn", bn_train=stem_bn)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.frozen_stages >= 1:
            x = jax.lax.stop_gradient(x)
        outs = []
        widths = (64, 128, 256, 512)
        blk = Bottleneck if self.block == "bottleneck" else BasicBlock
        if self.remat:
            # nn.remat is variable/param-transparent (same tree, same
            # numbers); train is arg 2 counting self, and must be static
            blk = nn.remat(blk, static_argnums=(2,))
        for si, (n_blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            for bi in range(n_blocks):
                stride = 2 if (bi == 0 and si > 0) else 1
                down = bi == 0 and (self.block == "bottleneck" or si > 0)
                x = blk(w, stride=stride, downsample=down,
                        dtype=dt, name=f"layer{si + 1}_{bi}")(
                            x, bn_train and si + 1 > self.frozen_stages)
            if si + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            outs.append(x)
        if self.dropblock_p > 0:
            from heltondetection_tpu.models.dropblock import DropBlock
            db = DropBlock(self.dropblock_p, name="dropblock")
            outs = [outs[0]] + [db(o, deterministic=not train)
                                for o in outs[1:]]
        return tuple(outs)   # C2 (stride 4) .. C5 (stride 32)


RESNET_STAGES = {
    "resnet18": ((2, 2, 2, 2), "basic"),
    "resnet34": ((3, 4, 6, 3), "basic"),
    "resnet50": ((3, 4, 6, 3), "bottleneck"),
    "resnet101": ((3, 4, 23, 3), "bottleneck"),
}


def build_resnet50(dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype)


def freeze_mask(params, frozen_prefixes=("backbone",)):
    """Pytree mask (True = trainable) implementing backbone freezing
    (reference frozeBackbone, README.md:132). Use with optax.masked."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def trainable(path):
        keys = [getattr(p, "key", str(p)) for p in path]
        return not any(k.startswith(pref) for k in keys
                       for pref in frozen_prefixes)

    import jax.tree_util as jtu
    return jtu.tree_map_with_path(lambda p, _: trainable(p), params)
