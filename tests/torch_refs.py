"""Vendored cross-implementation oracles (pure torch/numpy, test-only).

The reference's strongest verification is scoring official Ultralytics
weights through its own stack (reference README.md:25,133-135). Real
weights/datasets are unavailable offline, so these minimal independent
implementations play the oracle role instead:

* ``TorchYOLOv5`` — YOLOv5-v6.1 graph (Conv/C3/SPPF/Detect) written
  against the public Ultralytics v6.1 spec with the exact
  ``model.0..model.24`` state_dict key layout, so the same synthetic
  state_dict drives both this net and ``utils/torch_convert.convert_yolov5``
  and full backbone→neck→head forward parity is pinned end to end.
* ``TorchResNet`` — torchvision-v1 ResNet layout (conv1/bn1/layer{1-4})
  pinning ``models/resnet.py`` + ``convert_resnet``.
* ``roi_align_numpy`` — double-loop torchvision ``aligned=False``
  semantics (the oracle for ``ops/roi_align.py``).
* ``nms_numpy`` / ``batched_nms_numpy`` — torchvision greedy NMS
  semantics (strict ``iou > thr`` suppression, no epsilon).
* ``decode_deltas_numpy`` — torchvision BoxCoder.decode_single semantics.

Everything here is deliberately slow-and-obvious: correctness oracles, not
production code. No file in the package imports this module.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# YOLOv5-v6.1 (Ultralytics key layout)
# ---------------------------------------------------------------------------

class TConv(nn.Module):
    """Ultralytics Conv: Conv2d(no bias) + BN(eps 1e-3, momentum .03) + SiLU."""

    def __init__(self, cin, cout, k=1, s=1, p=None):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, k // 2 if p is None else p,
                              bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3, momentum=0.03)

    def forward(self, x):
        return F.silu(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, cin, cout, shortcut=True, e=0.5):
        super().__init__()
        ch = int(cout * e)
        self.cv1 = TConv(cin, ch, 1)
        self.cv2 = TConv(ch, cout, 3)
        self.add = shortcut and cin == cout

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3(nn.Module):
    def __init__(self, cin, cout, n=1, shortcut=True, e=0.5):
        super().__init__()
        ch = int(cout * e)
        self.cv1 = TConv(cin, ch, 1)
        self.cv2 = TConv(cin, ch, 1)
        self.cv3 = TConv(2 * ch, cout, 1)
        self.m = nn.Sequential(*(TBottleneck(ch, ch, shortcut, 1.0)
                                 for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat([self.m(self.cv1(x)), self.cv2(x)], 1))


class TSPPF(nn.Module):
    def __init__(self, cin, cout, k=5):
        super().__init__()
        ch = cin // 2
        self.cv1 = TConv(cin, ch, 1)
        self.cv2 = TConv(ch * 4, cout, 1)
        self.m = nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.m(x)
        y2 = self.m(y1)
        return self.cv2(torch.cat([x, y1, y2, self.m(y2)], 1))


class TDetect(nn.Module):
    """v6.1 Detect: per-level 1x1 conv; raw maps only (decode is separate)."""

    def __init__(self, nc, chs, na=3):
        super().__init__()
        self.nc, self.na = nc, na
        self.m = nn.ModuleList(nn.Conv2d(c, na * (5 + nc), 1) for c in chs)

    def forward(self, feats):
        return [conv(f) for conv, f in zip(self.m, feats)]


class TorchYOLOv5(nn.Module):
    """Minimal YOLOv5-v6.1 with Ultralytics ``model.{i}`` key layout.

    Width/depth multiples follow the public yolov5{n,s,m,l,x}.yaml scaling;
    the module list indices (0-24, with paramless upsample/concat slots as
    Identity) reproduce the official state_dict keys exactly, so
    ``load_ultralytics_state_dict`` round-trips the same synthetic
    state_dict the converter tests use.
    """

    def __init__(self, nc=80, depth_multiple=0.33, width_multiple=0.50):
        super().__init__()
        import math

        def cw(c):
            return max(8, int(math.ceil(c * width_multiple / 8) * 8))

        def d(n):
            return max(round(n * depth_multiple), 1)

        m = nn.ModuleList()
        m.append(TConv(3, cw(64), 6, 2, 2))                 # 0 stem
        m.append(TConv(cw(64), cw(128), 3, 2))              # 1
        m.append(TC3(cw(128), cw(128), d(3)))               # 2
        m.append(TConv(cw(128), cw(256), 3, 2))             # 3
        m.append(TC3(cw(256), cw(256), d(6)))               # 4 → save
        m.append(TConv(cw(256), cw(512), 3, 2))             # 5
        m.append(TC3(cw(512), cw(512), d(9)))               # 6 → save
        m.append(TConv(cw(512), cw(1024), 3, 2))            # 7
        m.append(TC3(cw(1024), cw(1024), d(3)))             # 8
        m.append(TSPPF(cw(1024), cw(1024)))                 # 9
        m.append(TConv(cw(1024), cw(512), 1))               # 10 → save
        m.append(nn.Identity())                             # 11 upsample
        m.append(nn.Identity())                             # 12 concat [.., 6]
        m.append(TC3(cw(1024), cw(512), d(3), shortcut=False))   # 13
        m.append(TConv(cw(512), cw(256), 1))                # 14 → save
        m.append(nn.Identity())                             # 15 upsample
        m.append(nn.Identity())                             # 16 concat [.., 4]
        m.append(TC3(cw(512), cw(256), d(3), shortcut=False))    # 17 P3
        m.append(TConv(cw(256), cw(256), 3, 2))             # 18
        m.append(nn.Identity())                             # 19 concat [.., 14]
        m.append(TC3(cw(512), cw(512), d(3), shortcut=False))    # 20 P4
        m.append(TConv(cw(512), cw(512), 3, 2))             # 21
        m.append(nn.Identity())                             # 22 concat [.., 10]
        m.append(TC3(cw(1024), cw(1024), d(3), shortcut=False))  # 23 P5
        m.append(TDetect(nc, (cw(256), cw(512), cw(1024))))  # 24
        self.model = m

    def forward(self, x):
        m = self.model
        for i in range(10):
            x = m[i](x)
            if i == 4:
                c3 = x
            elif i == 6:
                c4 = x
        lat5 = m[10](x)
        x = torch.cat([F.interpolate(lat5, scale_factor=2, mode="nearest"),
                       c4], 1)
        t4 = m[13](x)
        lat4 = m[14](t4)
        x = torch.cat([F.interpolate(lat4, scale_factor=2, mode="nearest"),
                       c3], 1)
        p3 = m[17](x)
        x = torch.cat([m[18](p3), lat4], 1)
        p4 = m[20](x)
        x = torch.cat([m[21](p4), lat5], 1)
        p5 = m[23](x)
        return m[24]((p3, p4, p5))


def load_ultralytics_state_dict(model: nn.Module, sd) -> None:
    """strict load modulo BN num_batches_tracked (absent from converted sds)."""
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing), missing


def yolo_decode_torch(raw, nc, anchors, strides):
    """v6.1 inference decode of raw Detect maps, re-ordered to (h, w, a)
    flattening so outputs align row-for-row with
    ``models.yolov5.decode_full``. Returns (boxes_xyxy, obj, cls) numpy."""
    boxes, objs, clss = [], [], []
    for lvl, p in enumerate(raw):
        b, _, ny, nx = p.shape
        a = len(anchors[lvl])
        p = p.view(b, a, 5 + nc, ny, nx).permute(0, 3, 4, 1, 2)  # b,h,w,a,no
        y = p.sigmoid()
        gx, gy = torch.meshgrid(torch.arange(nx, dtype=torch.float32),
                                torch.arange(ny, dtype=torch.float32),
                                indexing="xy")
        grid = torch.stack([gx, gy], -1)[None, :, :, None, :]
        anc = torch.tensor(anchors[lvl], dtype=torch.float32)[
            None, None, None, :, :]
        xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * strides[lvl]
        wh = (y[..., 2:4] * 2.0) ** 2 * anc
        box = torch.cat([xy - wh / 2, xy + wh / 2], -1)
        boxes.append(box.reshape(b, -1, 4))
        objs.append(y[..., 4].reshape(b, -1))
        clss.append(y[..., 5:].reshape(b, -1, nc))
    return (torch.cat(boxes, 1).numpy(), torch.cat(objs, 1).numpy(),
            torch.cat(clss, 1).numpy())


# ---------------------------------------------------------------------------
# torchvision-v1 ResNet (key layout: conv1/bn1/layer{1..4}.{i}/downsample)
# ---------------------------------------------------------------------------

class TBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, width, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


class TTorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, width, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(width * 4)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


class TorchResNet(nn.Module):
    """Feature-pyramid ResNet with torchvision state_dict keys; returns
    (C2, C3, C4, C5). fc/avgpool omitted (detection backbones drop them)."""

    def __init__(self, stage_sizes=(3, 4, 6, 3), block="bottleneck"):
        super().__init__()
        blk = TTorchBottleneck if block == "bottleneck" else TBasicBlock
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        cin = 64
        for si, (n, width) in enumerate(zip(stage_sizes,
                                            (64, 128, 256, 512))):
            blocks = []
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                down = None
                if bi == 0 and (stride != 1 or cin != width * blk.expansion):
                    down = nn.Sequential(
                        nn.Conv2d(cin, width * blk.expansion, 1, stride,
                                  bias=False),
                        nn.BatchNorm2d(width * blk.expansion))
                blocks.append(blk(cin, width, stride, down))
                cin = width * blk.expansion
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c2, c3, c4, c5


def make_resnet_sd(stage_sizes=(3, 4, 6, 3), block="bottleneck", seed=0):
    """Synthetic torchvision-layout ResNet state_dict with randomized BN
    statistics (so a transpose or stat-swap bug cannot cancel out)."""
    net = TorchResNet(stage_sizes, block)
    gen = torch.Generator().manual_seed(seed)
    sd = {}
    for k, v in net.state_dict().items():
        if k.endswith("num_batches_tracked"):
            continue
        is_bn_scale = v.dim() == 1 and k.endswith("weight")
        if "running_var" in k or is_bn_scale:
            sd[k] = torch.rand(v.shape, generator=gen) + 0.5
        elif v.dim() == 1:
            sd[k] = torch.randn(v.shape, generator=gen) * 0.1
        else:
            sd[k] = torch.randn(v.shape, generator=gen) * 0.05
    return sd


# ---------------------------------------------------------------------------
# numpy op oracles (torchvision semantics)
# ---------------------------------------------------------------------------

def roi_align_numpy(feat, rois, out_size=7, spatial_scale=1.0,
                    sampling_ratio=2, aligned=False):
    """Double-loop RoIAlign, torchvision semantics (cpu roi_align kernel):
    feat (H, W, C), rois (N, 4) xyxy in input coords → (N, out, out, C).
    With ``aligned=False``: no half-pixel offset, roi size clamped to >= 1.
    Samples with y < -1 or y > H (resp. x) contribute zero; coordinates are
    clamped to [0, H-1] and the high tap index to H-1 before interpolation.
    """
    h, w, c = feat.shape
    n = rois.shape[0]
    out = np.zeros((n, out_size, out_size, c), np.float64)
    off = 0.5 if aligned else 0.0
    s = sampling_ratio
    for i in range(n):
        x1 = rois[i, 0] * spatial_scale - off
        y1 = rois[i, 1] * spatial_scale - off
        x2 = rois[i, 2] * spatial_scale - off
        y2 = rois[i, 3] * spatial_scale - off
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bh, bw = rh / out_size, rw / out_size
        for oy in range(out_size):
            for ox in range(out_size):
                acc = np.zeros(c, np.float64)
                for iy in range(s):
                    yc = y1 + oy * bh + (iy + 0.5) * bh / s
                    for ix in range(s):
                        xc = x1 + ox * bw + (ix + 0.5) * bw / s
                        if yc < -1.0 or yc > h or xc < -1.0 or xc > w:
                            continue
                        yy = min(max(yc, 0.0), h - 1.0)
                        xx = min(max(xc, 0.0), w - 1.0)
                        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
                        y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        ly, lx = yy - y0, xx - x0
                        acc += (feat[y0, x0] * (1 - ly) * (1 - lx) +
                                feat[y0, x1i] * (1 - ly) * lx +
                                feat[y1i, x0] * ly * (1 - lx) +
                                feat[y1i, x1i] * ly * lx)
                out[i, oy, ox] = acc / (s * s)
    return out.astype(np.float32)


def nms_numpy(boxes, scores, iou_threshold):
    """torchvision.ops.nms semantics: sort by score desc (stable; ties keep
    input order), greedily keep, suppress iou > threshold (strict, no eps).
    Returns kept indices in keep order (score-desc)."""
    order = np.argsort(-scores, kind="stable")
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    suppressed = np.zeros(len(boxes), bool)
    keep = []
    for ii in range(len(order)):
        i = order[ii]
        if suppressed[i]:
            continue
        keep.append(int(i))
        for jj in range(ii + 1, len(order)):
            j = order[jj]
            if suppressed[j]:
                continue
            iw = max(min(x2[i], x2[j]) - max(x1[i], x1[j]), 0.0)
            ih = max(min(y2[i], y2[j]) - max(y1[i], y1[j]), 0.0)
            inter = iw * ih
            iou = inter / (areas[i] + areas[j] - inter)
            if iou > iou_threshold:
                suppressed[j] = True
    return keep


def batched_nms_numpy(boxes, scores, idxs, iou_threshold):
    """torchvision.ops.batched_nms semantics via the coordinate-offset trick:
    boxes of different idxs never overlap, one plain NMS over all."""
    if len(boxes) == 0:
        return []
    max_coord = boxes.max()
    offsets = idxs.astype(np.float64) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    return nms_numpy(shifted.astype(np.float32), scores, iou_threshold)


def decode_deltas_numpy(anchors, deltas, weights=(1.0, 1.0, 1.0, 1.0),
                        clamp=np.log(1000.0 / 16)):
    """torchvision BoxCoder.decode_single semantics."""
    wa = anchors[:, 2] - anchors[:, 0]
    ha = anchors[:, 3] - anchors[:, 1]
    xa = anchors[:, 0] + 0.5 * wa
    ya = anchors[:, 1] + 0.5 * ha
    wx, wy, ww, wh = weights
    dx, dy = deltas[:, 0] / wx, deltas[:, 1] / wy
    dw = np.minimum(deltas[:, 2] / ww, clamp)
    dh = np.minimum(deltas[:, 3] / wh, clamp)
    cx, cy = dx * wa + xa, dy * ha + ya
    pw, ph = np.exp(dw) * wa, np.exp(dh) * ha
    return np.stack([cx - 0.5 * pw, cy - 0.5 * ph,
                     cx + 0.5 * pw, cy + 0.5 * ph], -1)


# ---------------------------------------------------------------------------
# FasterRCNN neck/RPN/box-head mirrors (VERDICT r4 item 2: the torch side
# of the two-stage AP-score oracle). Weights are COPIED from the flax
# model's params (load_frcnn_heads_from_flax) so one parameter set drives
# both independently written forwards; the backbone comes from
# make_resnet_sd via TorchResNet on this side and convert_resnet/
# graft_backbone on the flax side, exactly the production import path.
# ---------------------------------------------------------------------------

class TorchFPN(nn.Module):
    """models/necks.py FPN mirror: lateral 1x1 + nearest-2x top-down sum +
    3x3 smooth + stride-2 subsample P6 (torchvision FasterRCNN style)."""

    def __init__(self, cins, cout=256):
        super().__init__()
        self.lat = nn.ModuleList([nn.Conv2d(c, cout, 1) for c in cins])
        self.smooth = nn.ModuleList(
            [nn.Conv2d(cout, cout, 3, padding=1) for _ in cins])

    def forward(self, feats):
        lats = [l(f) for l, f in zip(self.lat, feats)]
        for i in range(len(lats) - 2, -1, -1):
            lats[i] = lats[i] + F.interpolate(lats[i + 1], scale_factor=2,
                                              mode="nearest")
        outs = [s(x) for s, x in zip(self.smooth, lats)]
        outs.append(F.max_pool2d(outs[-1], 1, stride=2))
        return outs


class TorchRPNHead(nn.Module):
    """models/faster_rcnn.py RPNHead mirror; flattening follows the flax
    NHWC order (h, w, anchor) with the 4 delta components fastest."""

    def __init__(self, c=256, a=3):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)
        self.cls = nn.Conv2d(c, a, 1)
        self.reg = nn.Conv2d(c, a * 4, 1)

    def forward(self, feats):
        logits, deltas = [], []
        for f in feats:
            t = F.relu(self.conv(f))
            b = t.shape[0]
            logits.append(self.cls(t).permute(0, 2, 3, 1).reshape(b, -1))
            deltas.append(self.reg(t).permute(0, 2, 3, 1).reshape(b, -1, 4))
        return torch.cat(logits, 1), torch.cat(deltas, 1)


class TorchCoupledBoxHead(nn.Module):
    """CoupledBoxHead mirror: crops arrive (R, 7, 7, C) channel-LAST (the
    roi_align_numpy layout == the flax flatten order), so the flatten
    matches the flax fc1 kernel with no permutation."""

    def __init__(self, in_feats, num_classes):
        super().__init__()
        self.fc1 = nn.Linear(in_feats, 1024)
        self.fc2 = nn.Linear(1024, 1024)
        self.cls = nn.Linear(1024, num_classes + 1)
        self.reg = nn.Linear(1024, num_classes * 4)

    def forward(self, crops):          # (R, 7, 7, C) torch tensor
        x = crops.reshape(crops.shape[0], -1)
        x = F.relu(self.fc1(x))
        x = F.relu(self.fc2(x))
        return self.cls(x), self.reg(x).reshape(x.shape[0], -1, 4)


def _t_conv(mod: nn.Conv2d, p) -> None:
    mod.weight.data = torch.from_numpy(
        np.transpose(np.asarray(p["kernel"], np.float32), (3, 2, 0, 1)).copy())
    mod.bias.data = torch.from_numpy(np.asarray(p["bias"], np.float32).copy())


def _t_dense(mod: nn.Linear, p) -> None:
    mod.weight.data = torch.from_numpy(
        np.asarray(p["kernel"], np.float32).T.copy())
    mod.bias.data = torch.from_numpy(np.asarray(p["bias"], np.float32).copy())


def load_frcnn_heads_from_flax(fpn: TorchFPN, rpn: TorchRPNHead,
                               box_head: TorchCoupledBoxHead, params) -> None:
    """Copy the flax FasterRCNN's neck/rpn/box_head params into the torch
    mirrors (flax HWIO conv kernels -> torch OIHW; dense (in,out) -> (out,in))."""
    for i in range(len(fpn.lat)):
        _t_conv(fpn.lat[i], params["neck"][f"lat{i}"])
        _t_conv(fpn.smooth[i], params["neck"][f"smooth{i}"])
    _t_conv(rpn.conv, params["rpn"]["conv"])
    _t_conv(rpn.cls, params["rpn"]["cls"])
    _t_conv(rpn.reg, params["rpn"]["reg"])
    _t_dense(box_head.fc1, params["box_head"]["fc1"])
    _t_dense(box_head.fc2, params["box_head"]["fc2"])
    _t_dense(box_head.cls, params["box_head"]["cls"])
    _t_dense(box_head.reg, params["box_head"]["reg"])
