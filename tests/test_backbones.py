"""Swappable-backbone registry tests (models/backbones.py, rebuild C8):
stride/shape contract per registered name, FasterRCNN and YOLOv5 forward
with swapped backbones, and freeze-mask compatibility."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from heltondetection_tpu.models.backbones import (backbone_names,
                                                  build_backbone)


@pytest.mark.parametrize("name", ["resnet18", "resnet50", "cspdarknet_n"])
def test_backbone_contract(name):
    m = build_backbone(name)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, False)
    feats = m.apply(v, x, False)
    assert len(feats) == 4              # C2..C5
    for i, f in enumerate(feats):
        stride = 4 * 2 ** i
        assert f.shape[1] == f.shape[2] == 64 // stride, (name, i, f.shape)


def test_registry_lists_and_rejects():
    names = backbone_names()
    assert "resnet50" in names and "cspdarknet_s" in names
    with pytest.raises(ValueError):
        build_backbone("vgg16")


def test_faster_rcnn_with_cspdarknet_backbone():
    from heltondetection_tpu.models.faster_rcnn import (FasterRCNN,
                                                        RCNNConfig,
                                                        faster_rcnn_infer,
                                                        init_faster_rcnn)
    cfg = RCNNConfig(num_classes=5, img_size=128, backbone="cspdarknet_n",
                     rpn_pre_nms_topk=64, rpn_post_nms_topk=64,
                     rpn_batch=32, box_batch=32, max_det=16, max_gt=8)
    m = FasterRCNN(cfg)
    v = init_faster_rcnn(m, jax.random.PRNGKey(0), 128)
    assert "stem" in v["params"]["backbone"]   # cspdarknet param tree
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 128, 128, 3)).astype(np.float32))
    ob, os_, oc, ov = jax.jit(
        lambda v, x: faster_rcnn_infer(m, v, x, cfg))(v, x)
    assert ob.shape == (1, 16, 4)
    assert np.isfinite(np.asarray(os_)).all()


def test_yolov5_with_resnet_backbone():
    from heltondetection_tpu.models.yolov5 import YOLOv5, decode_full
    m = YOLOv5(num_classes=5, width_multiple=0.25, backbone="resnet18")
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(v, x, train=False)
    boxes, obj, cls = decode_full(outs, 5)
    assert boxes.shape[1] == (8 ** 2 + 4 ** 2 + 2 ** 2) * 3
    assert np.isfinite(np.asarray(boxes)).all()


def test_register_custom_backbone_end_to_end():
    """The timm-wrap analog (README.md:120): a user-defined flax backbone
    registered by name becomes config-addressable and drives a full
    detector forward — no framework edits."""
    import flax.linen as nn

    from heltondetection_tpu.models.backbones import (frozen_stage_prefixes,
                                                      register_backbone)
    from heltondetection_tpu.models.yolov5 import YOLOv5, decode_full

    class TinyNet(nn.Module):
        dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x, train: bool = False):
            outs = []
            for i, ch in enumerate((8, 16, 24, 32)):
                x = nn.Conv(ch, (3, 3), strides=(4, 4) if i == 0 else (2, 2),
                            dtype=self.dtype, name=f"s{i}")(x)
                x = nn.relu(x)
                outs.append(x)
            return tuple(outs)

    register_backbone(
        "tinynet",
        lambda dtype, dropblock_p, module_name, norm_eval, frozen_stages:
            TinyNet(dtype=dtype, name=module_name),
        frozen_prefixes=lambda n, root: [f"{root}/s{i}/" for i in range(n)])

    m = YOLOv5(num_classes=3, width_multiple=0.25, backbone="tinynet")
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert "s0" in v["params"]["backbone"]      # custom tree under the name
    boxes, obj, cls = decode_full(m.apply(v, x, train=False), 3)
    assert boxes.shape[1] == (8 ** 2 + 4 ** 2 + 2 ** 2) * 3
    assert np.isfinite(np.asarray(boxes)).all()
    assert frozen_stage_prefixes("tinynet", 2) == ("backbone/s0/",
                                                   "backbone/s1/")
    # built-ins without a registered prefix fn / frozen_stages=0 stay empty
    assert frozen_stage_prefixes("tinynet", 0) == ()
