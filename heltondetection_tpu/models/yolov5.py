"""YOLOv5 detector: CSPDarknet ⊕ PAFPNv5 ⊕ coupled Detect head, + decode.

Rebuild targets C8/C9/C10 and the dense-detector stack of SURVEY.md §3.4:

    imgs[B,S,S,3] → CSPDarknet → (c3,c4,c5) → PAFPNv5 → (p3,p4,p5)
    → Detect: per level 1x1 conv → [B, H, W, A*(5+C)]
    → decode: xy = (2σ−0.5+grid)·stride, wh = (2σ)²·anchor, conf = σobj·σcls

The decode math is the YOLOv5-v6.1 spec, which the reference demonstrably
implements (it reproduces official Ultralytics weights' mAP through its own
eval stack, README.md:133-135).

All shapes static; decode emits one (B, N, ...) candidate tensor over all
levels that feeds ops.nms.batched_nms on-device.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from heltondetection_tpu.models.cspdarknet import CSPDarknet, VARIANTS
from heltondetection_tpu.models.necks import PAFPNv5
from heltondetection_tpu.ops.anchors import (YOLOV5_ANCHORS, YOLOV5_STRIDES,
                                             yolo_grid)


def packed_cls_width(num_classes: int) -> int:
    """Lane-padded per-anchor block width for the packed serve head:
    fits C class logits + 5 box/obj logits, rounded up to 128 lanes."""
    return max(128, -(-(num_classes + 5) // 128) * 128)


class _PackedDetect(nn.Module):
    """Conv-param-compatible packed detect head for TRAINING.

    Declares the exact {kernel (1,1,cin,A*(5+C)), bias} tree of the
    standard ``nn.Conv(name="detect{i}")`` layer (same lecun_normal/zeros
    init), but emits only the dense objectness logits ``pobj (B,HW,A)``
    (the obj BCE covers every cell) plus the per-anchor box/cls weight
    blocks ``(ka (cin,CP), ba (CP))`` with lanes ``[cls₀..cls_{C-1}, tx,
    ty, tw, th, obj, 0-pad]``. The box/cls candidate values are DEFERRED:
    the loss gathers the (B,HW,cin) feature rows at its ~M·A·O assigned
    positions and applies the matmul there (row selection commutes with a
    1×1 conv), so the box/cls branch — forward, weight grads, and the
    gather-VJP scatter — runs over the candidate set instead of the whole
    map (the three dense (B,HW,CP) scatters were ~6% of the b128 train
    step). Checkpoints stay interchangeable with the standard head.
    """
    num_classes: int
    num_anchors: int = 3

    @nn.compact
    def __call__(self, f2):                     # (B, HW, cin) f32
        cin = f2.shape[-1]
        a_n, c = self.num_anchors, self.num_classes
        blk = 5 + c
        no = a_n * blk
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, cin, no))[0, 0]
        bia = self.param("bias", nn.initializers.zeros, (no,))
        cp = packed_cls_width(c)
        obj_cols = jnp.asarray([a * blk + 4 for a in range(a_n)])
        pobj = f2 @ k[:, obj_cols] + bia[obj_cols]           # (B, HW, A)
        wblocks = []
        for a in range(a_n):
            idx = (list(range(a * blk + 5, a * blk + blk)) +
                   list(range(a * blk, a * blk + 5)))
            ka = jnp.pad(k[:, jnp.asarray(idx)], ((0, 0), (0, cp - blk)))
            ba = jnp.pad(bia[jnp.asarray(idx)], (0, cp - blk))
            wblocks.append((ka, ba))
        return pobj, wblocks


class YOLOv5(nn.Module):
    num_classes: int = 80
    depth_multiple: float = 0.33
    width_multiple: float = 0.50
    num_anchors: int = 3
    dtype: Any = jnp.float32
    dropblock_p: float = 0.0
    packed_head: bool = False
    packed_train: bool = False   # packed TRAIN head (_PackedDetect): same
    # checkpoint tree as the standard head, loss-friendly packed outputs
    backbone: str = "cspdarknet"   # "cspdarknet" = the v6.1 default tied to
    # depth/width multiples; any models/backbones.py registry name swaps it
    # (reference capability README.md:8-9)
    remat: bool = False   # checkpoint the backbone stages (see
    # models/cspdarknet.py): ~1/3 extra backbone FLOPs for O(boundary)
    # activation memory — for HBM-bound high-resolution training

    @nn.compact
    def __call__(self, x, train: bool = False):
        """Returns raw per-level maps [(B, Hl, Wl, A*(5+C)) for l in 3 levels].

        Output convs run in float32 regardless of compute dtype — the loss
        and decode are precision-sensitive (sigmoid saturation in bf16 costs
        mAP tenths, which blows the 0.3-pt parity budget, SURVEY.md §7).

        ``packed_head=True`` is the SERVE layout (weights mapped from a
        standard checkpoint by :func:`pack_head_variables`): per level the
        head emits ``(pobj (B,A·HW) f32, [pcand_a (B,HW,CP) bf16 per
        anchor], (h,w))``, flat in ANCHOR-MAJOR (a, y, x) row order.
        pobj carries only the objectness logits — the postprocess ranks
        stage-1 candidates by σ(obj), mirroring Ultralytics v6.1's own
        candidate pre-filter (`prediction[..., 4] > conf_thres`), with no
        reduction over the big class tensor at all. pcand packs, per
        anchor, ``[cls₀..cls_{C-1}, tx, ty, tw, th, obj, pad(−20)]`` into a
        lane-aligned CP-wide block so the per-candidate gather is ONE
        aligned bf16 gather. The standard layout interleaves 85-wide
        anchor blocks in the channel dim, which forces an expensive lane
        relayout before any TPU postprocess op (ops/postprocess.py).
        """
        if self.backbone == "cspdarknet":
            backbone = CSPDarknet(self.depth_multiple, self.width_multiple,
                                  dtype=self.dtype,
                                  dropblock_p=self.dropblock_p,
                                  remat=self.remat,
                                  name="backbone")
        else:
            from heltondetection_tpu.models.backbones import build_backbone
            backbone = build_backbone(self.backbone, dtype=self.dtype,
                                      dropblock_p=self.dropblock_p,
                                      remat=self.remat)
        neck = PAFPNv5(self.depth_multiple, self.width_multiple,
                       dtype=self.dtype, name="neck")
        feats = neck(backbone(x, train)[-3:], train)
        # int8-flow boundary guard: the quant tree's float_out defaults
        # make the last neck convs emit float, but a custom tree without
        # them must still reach the (float, precision-sensitive) head
        from heltondetection_tpu.models.common import q_dequant
        feats = [q_dequant(f, self.dtype) for f in feats]
        a = self.num_anchors
        outs = []
        if self.packed_head:
            # 1x1 convs expressed as explicit (B·HW, cin) matmuls, ONE
            # CP-wide matmul PER ANCHOR, so every candidate row is born as
            # exactly 128 aligned lanes in flat (a-major) row order — XLA's
            # conv layout assignment otherwise inserts ~4 ms of relayout
            # copies at B=128 before the postprocess gather
            cp = packed_cls_width(self.num_classes)
            for i, f in enumerate(feats):
                b, h, w, cin = f.shape
                f2 = f.astype(jnp.float32).reshape(b, h * w, cin)
                pobj = nn.Dense(a, dtype=jnp.float32,
                                name=f"detect{i}_obj")(f2)
                pobj = jnp.swapaxes(pobj, 1, 2).reshape(b, a * h * w)
                pcand = [nn.Dense(cp, dtype=jnp.float32,
                                  name=f"detect{i}_cand{j}")(f2)
                         .astype(jnp.bfloat16) for j in range(a)]
                outs.append((pobj, pcand, (h, w)))
            return outs
        if self.packed_train:
            for i, f in enumerate(feats):
                b, h, w, cin = f.shape
                f2 = f.astype(jnp.float32).reshape(b, h * w, cin)
                pobj, wblocks = _PackedDetect(self.num_classes, a,
                                              name=f"detect{i}")(f2)
                outs.append((pobj, f2, wblocks, (h, w)))
            return outs
        no = a * (5 + self.num_classes)
        for i, f in enumerate(feats):
            y = nn.Conv(no, (1, 1), dtype=jnp.float32,
                        name=f"detect{i}")(f.astype(jnp.float32))
            outs.append(y)
        return outs


def pack_head_variables(variables, num_classes: int,
                        num_anchors: int = 3):
    """Map a standard checkpoint's variables to the packed-head layout.

    detect{i}: kernel (1,1,cin, A*(5+C)) with channel a*(5+C)+j →
      detect{i}_obj  Dense kernel (cin, A), channel a = obj logit (j=4)
      detect{i}_cand{a} Dense kernel (cin, CP), the anchor's CP-lane block
        [cls₀..cls_{C-1}, tx, ty, tw, th, obj, pad]; pad channels get
        zero kernel and bias −20 (σ≈2e-9, inert under any threshold).
    Pure host-side reshuffle; mathematically identical logits.
    """
    import numpy as np
    params = dict(variables["params"])
    cp = packed_cls_width(num_classes)
    blk = 5 + num_classes
    for i in range(3):
        name = f"detect{i}"
        if name not in params:
            break
        k = np.asarray(params[name]["kernel"])[0, 0]   # (cin, A*blk)
        b = np.asarray(params[name]["bias"])
        ko = np.zeros(k.shape[:1] + (num_anchors,), k.dtype)
        bo = np.zeros((num_anchors,), b.dtype)
        del params[name]
        for a in range(num_anchors):
            ko[..., a] = k[..., a * blk + 4]
            bo[a] = b[a * blk + 4]
            # per-anchor CP-wide block: [cls..., tx, ty, tw, th, obj, pad]
            kc = np.zeros(k.shape[:1] + (cp,), k.dtype)
            bc = np.full((cp,), -20.0, b.dtype)
            kc[..., :num_classes] = k[..., a * blk + 5:a * blk + blk]
            bc[:num_classes] = b[a * blk + 5:a * blk + blk]
            kc[..., num_classes:num_classes + 5] = k[..., a * blk:a * blk + 5]
            bc[num_classes:num_classes + 5] = b[a * blk:a * blk + 5]
            params[f"{name}_cand{a}"] = {"kernel": jnp.asarray(kc),
                                         "bias": jnp.asarray(bc)}
        params[f"{name}_obj"] = {"kernel": jnp.asarray(ko),
                                 "bias": jnp.asarray(bo)}
    out = dict(variables)
    out["params"] = params
    return out


def decode_predictions(raw: Sequence[jnp.ndarray], num_classes: int,
                       anchors=YOLOV5_ANCHORS, strides=YOLOV5_STRIDES,
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Raw head maps → flat candidates.

    Returns (boxes_xyxy (B,N,4), obj_conf·cls_conf scores (B,N,C) is NOT
    materialised; instead returns (boxes, scores (B,N), classes (B,N)) using
    best-class selection — the multi-label path used by COCO eval keeps the
    per-class scores via :func:`decode_full`).
    """
    boxes, scores, classes = [], [], []
    for lvl, p in enumerate(raw):
        b, h, w, _ = p.shape
        a = len(anchors[lvl])
        p = p.reshape(b, h, w, a, 5 + num_classes)
        stride = strides[lvl]
        grid = yolo_grid(h, w)[None, :, :, None, :]            # (1,h,w,1,2)
        anc = jnp.asarray(anchors[lvl], jnp.float32)[None, None, None]  # (1,1,1,a,2)
        xy = (jax.nn.sigmoid(p[..., 0:2]) * 2.0 - 0.5 + grid) * stride
        wh = (jax.nn.sigmoid(p[..., 2:4]) * 2.0) ** 2 * anc
        obj = jax.nn.sigmoid(p[..., 4])
        cls = jax.nn.sigmoid(p[..., 5:])
        conf = obj[..., None] * cls                            # (b,h,w,a,C)
        best_c = jnp.argmax(conf, axis=-1)
        best_s = jnp.max(conf, axis=-1)
        box = jnp.concatenate([xy - wh * 0.5, xy + wh * 0.5], axis=-1)
        boxes.append(box.reshape(b, -1, 4))
        scores.append(best_s.reshape(b, -1))
        classes.append(best_c.reshape(b, -1))
    return (jnp.concatenate(boxes, 1), jnp.concatenate(scores, 1),
            jnp.concatenate(classes, 1).astype(jnp.int32))


def decode_full(raw: Sequence[jnp.ndarray], num_classes: int,
                anchors=YOLOV5_ANCHORS, strides=YOLOV5_STRIDES,
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Like :func:`decode_predictions` but keeps all per-class scores:
    returns (boxes (B,N,4), obj (B,N), cls (B,N,C)) for multi-label NMS —
    pycocotools mAP needs per-class candidates below 0.001 conf too.
    """
    boxes, objs, clss = [], [], []
    for lvl, p in enumerate(raw):
        b, h, w, _ = p.shape
        a = len(anchors[lvl])
        p = p.reshape(b, h, w, a, 5 + num_classes)
        stride = strides[lvl]
        grid = yolo_grid(h, w)[None, :, :, None, :]
        anc = jnp.asarray(anchors[lvl], jnp.float32)[None, None, None]
        xy = (jax.nn.sigmoid(p[..., 0:2]) * 2.0 - 0.5 + grid) * stride
        wh = (jax.nn.sigmoid(p[..., 2:4]) * 2.0) ** 2 * anc
        box = jnp.concatenate([xy - wh * 0.5, xy + wh * 0.5], axis=-1)
        boxes.append(box.reshape(b, -1, 4))
        objs.append(jax.nn.sigmoid(p[..., 4]).reshape(b, -1))
        clss.append(jax.nn.sigmoid(p[..., 5:]).reshape(b, -1, num_classes))
    return (jnp.concatenate(boxes, 1), jnp.concatenate(objs, 1),
            jnp.concatenate(clss, 1))


def build_yolov5(variant: str = "s", num_classes: int = 80,
                 dtype=jnp.float32, packed_head: bool = False) -> YOLOv5:
    d, w = VARIANTS[variant]
    return YOLOv5(num_classes=num_classes, depth_multiple=d,
                  width_multiple=w, dtype=dtype, packed_head=packed_head)
