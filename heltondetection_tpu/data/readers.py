"""Dataset readers: COCO-JSON, YOLO-txt, DOTA horizontal-box — rebuild
targets C5 / C6 / C6b (SURVEY.md §2a; README.md:10 "支持COCO, YOLO, DOTA标注格式
数据集读取") — plus Pascal-VOC XML and native VisDrone-DET (the reference's
VOC0712 / VisDrone2019 benchmark rows, which its shipped formats needed an
offline conversion for).

Host-side and framework-free: each reader maps an index → a raw sample dict
``{image (H,W,3 uint8 RGB), boxes_xyxy (N,4) float32, classes (N,) int32,
iscrowd (N,), img_id, file}``. The augmentation pipeline + loader turn these
into fixed-shape device batches. Unlike the reference, the YOLO-format
*eval* path is implemented (the reference left it "eval未实现", README.md:10
— noted as a deliberate capability extension).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def drop_ignore_boxes(raw: Dict) -> Dict:
    """Train-time GT excludes ignore boxes (COCO ``iscrowd=1`` / VOC
    ``difficult``): the reference's lineage never trains on them —
    Ultralytics drops iscrowd=1 when converting COCO labels,
    py-faster-rcnn defaults to use_diff=False, mmdet routes them to
    bboxes_ignore. They still reach :meth:`gt_for_eval` as ignore
    regions, where DetEval neither rewards nor penalizes matches."""
    crowd = raw.get("iscrowd")
    if crowd is None or len(crowd) == 0 or not np.any(crowd):
        return raw
    keep = np.asarray(crowd) == 0
    out = dict(raw)
    out["boxes"] = raw["boxes"][keep]
    out["classes"] = raw["classes"][keep]
    out["iscrowd"] = raw["iscrowd"][keep]
    return out


def imread_rgb(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class COCODataset:
    """COCO-JSON detection reader (C5). Category ids are remapped to a
    contiguous [0, num_classes) label space; the inverse map is kept for
    emitting COCO-format detections at eval."""

    def __init__(self, ann_file: str, img_dir: str,
                 keep_empty: bool = True):
        with open(ann_file) as f:
            coco = json.load(f)
        self.img_dir = img_dir
        cats = sorted(coco["categories"], key=lambda c: c["id"])
        self.cat_ids = [c["id"] for c in cats]
        self.class_names = [c["name"] for c in cats]
        self.cat_to_label = {cid: i for i, cid in enumerate(self.cat_ids)}
        self.label_to_cat = {i: cid for i, cid in enumerate(self.cat_ids)}

        self.images = {im["id"]: im for im in coco["images"]}
        anns_by_img: Dict = {i: [] for i in self.images}
        for a in coco.get("annotations", []):
            if a.get("ignore", 0):
                continue
            anns_by_img.setdefault(a["image_id"], []).append(a)
        self.ids = [i for i in self.images
                    if keep_empty or anns_by_img.get(i)]
        self.anns_by_img = anns_by_img

    def __len__(self):
        return len(self.ids)

    @property
    def num_classes(self):
        return len(self.cat_ids)

    def meta(self, idx: int) -> Dict:
        im = self.images[self.ids[idx]]
        return {"img_id": im["id"], "height": im["height"],
                "width": im["width"], "file": im["file_name"]}

    def load(self, idx: int) -> Dict:
        img_id = self.ids[idx]
        im = self.images[img_id]
        img = imread_rgb(os.path.join(self.img_dir, im["file_name"]))
        boxes, classes, crowd = [], [], []
        for a in self.anns_by_img.get(img_id, []):
            x, y, w, h = a["bbox"]
            if w <= 0 or h <= 0:
                continue
            boxes.append([x, y, x + w, y + h])
            classes.append(self.cat_to_label[a["category_id"]])
            crowd.append(a.get("iscrowd", 0))
        return {
            "image": img,
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "classes": np.asarray(classes, np.int32),
            "iscrowd": np.asarray(crowd, np.int32),
            "img_id": img_id,
            "file": im["file_name"],
        }

    def load_encoded(self, idx: int) -> Dict:
        """Raw JPEG bytes + annotation-file dims (no decode): feeds the
        native loader's in-pool libjpeg decode (data/native_loader.py,
        ``decode_in_pool=True``). Non-JPEG files are not supported here —
        use ``load``."""
        img_id = self.ids[idx]
        im = self.images[img_id]
        with open(os.path.join(self.img_dir, im["file_name"]), "rb") as f:
            buf = np.frombuffer(f.read(), np.uint8)
        boxes, classes, crowd = [], [], []
        for a in self.anns_by_img.get(img_id, []):
            x, y, w, h = a["bbox"]
            if w <= 0 or h <= 0:
                continue
            boxes.append([x, y, x + w, y + h])
            classes.append(self.cat_to_label[a["category_id"]])
            crowd.append(a.get("iscrowd", 0))
        return {
            "jpeg": buf,
            "height": im["height"],
            "width": im["width"],
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "classes": np.asarray(classes, np.int32),
            "iscrowd": np.asarray(crowd, np.int32),
            "img_id": img_id,
            "file": im["file_name"],
        }

    def gt_for_eval(self, det_eval):
        """Register all ground truth (xywh + crowd flags) with a DetEval."""
        for idx in range(len(self)):
            img_id = self.ids[idx]
            boxes, classes, crowd, areas = [], [], [], []
            for a in self.anns_by_img.get(img_id, []):
                x, y, w, h = a["bbox"]
                boxes.append([x, y, w, h])
                classes.append(self.cat_to_label[a["category_id"]])
                crowd.append(a.get("iscrowd", 0))
                areas.append(a.get("area", w * h))
            if boxes:
                det_eval.add_gt(img_id, boxes, classes, iscrowd=crowd,
                                areas=areas)


class YOLODataset:
    """YOLO-txt reader (C6): per-image ``.txt`` with lines
    ``cls cx cy w h`` normalized to [0,1]; images under ``img_dir``,
    labels under ``label_dir`` with the same stem."""

    IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")

    def __init__(self, img_dir: str, label_dir: str,
                 class_names: Optional[Sequence[str]] = None):
        self.img_dir = img_dir
        self.label_dir = label_dir
        self.files = sorted(
            f for f in os.listdir(img_dir)
            if os.path.splitext(f)[1].lower() in self.IMG_EXTS)
        self.class_names = list(class_names) if class_names else None
        self.label_to_cat = None  # labels are already contiguous

    def __len__(self):
        return len(self.files)

    @property
    def num_classes(self):
        return len(self.class_names) if self.class_names else 0

    def load(self, idx: int) -> Dict:
        fname = self.files[idx]
        img = imread_rgb(os.path.join(self.img_dir, fname))
        h, w = img.shape[:2]
        stem = os.path.splitext(fname)[0]
        lpath = os.path.join(self.label_dir, stem + ".txt")
        boxes, classes = [], []
        if os.path.exists(lpath):
            with open(lpath) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) < 5:
                        continue
                    c, cx, cy, bw, bh = (float(v) for v in parts[:5])
                    cx, cy, bw, bh = cx * w, cy * h, bw * w, bh * h
                    boxes.append([cx - bw / 2, cy - bh / 2,
                                  cx + bw / 2, cy + bh / 2])
                    classes.append(int(c))
        n = len(boxes)
        return {
            "image": img,
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "classes": np.asarray(classes, np.int32),
            "iscrowd": np.zeros(n, np.int32),
            "img_id": stem,
            "file": fname,
        }

    def gt_for_eval(self, det_eval):
        """YOLO-format eval support — implemented here even though the
        reference left it unimplemented (README.md:10 'eval未实现')."""
        for idx in range(len(self)):
            s = self.load(idx)
            if len(s["classes"]):
                b = s["boxes"]
                xywh = np.stack([b[:, 0], b[:, 1], b[:, 2] - b[:, 0],
                                 b[:, 3] - b[:, 1]], 1)
                det_eval.add_gt(s["img_id"], xywh, s["classes"])


class DOTADataset:
    """DOTA horizontal-box reader (C6b): per-image ``.txt`` where each line is
    ``x1 y1 x2 y2 x3 y3 x4 y4 category difficult``; the rotated quad is
    collapsed to its axis-aligned hull (the reference benchmarks DOTAv1.0-h —
    horizontal boxes, README.md:33,149-154; true rotated support migrated to
    its HeltonRotation successor and is out of scope)."""

    def __init__(self, img_dir: str, label_dir: str,
                 class_names: Sequence[str]):
        self.img_dir = img_dir
        self.label_dir = label_dir
        self.class_names = list(class_names)
        self.name_to_label = {n: i for i, n in enumerate(self.class_names)}
        self.files = sorted(
            f for f in os.listdir(img_dir)
            if os.path.splitext(f)[1].lower() in YOLODataset.IMG_EXTS)
        self.label_to_cat = None

    def __len__(self):
        return len(self.files)

    @property
    def num_classes(self):
        return len(self.class_names)

    def load(self, idx: int) -> Dict:
        fname = self.files[idx]
        img = imread_rgb(os.path.join(self.img_dir, fname))
        stem = os.path.splitext(fname)[0]
        lpath = os.path.join(self.label_dir, stem + ".txt")
        boxes, classes = [], []
        if os.path.exists(lpath):
            with open(lpath) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) < 9 or parts[0].startswith(("imagesource",
                                                              "gsd")):
                        continue
                    quad = np.asarray([float(v) for v in parts[:8]],
                                      np.float32).reshape(4, 2)
                    name = parts[8]
                    if name not in self.name_to_label:
                        continue
                    x1, y1 = quad.min(0)
                    x2, y2 = quad.max(0)
                    boxes.append([x1, y1, x2, y2])
                    classes.append(self.name_to_label[name])
        n = len(boxes)
        return {
            "image": img,
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "classes": np.asarray(classes, np.int32),
            "iscrowd": np.zeros(n, np.int32),
            "img_id": stem,
            "file": fname,
        }

    def gt_for_eval(self, det_eval):
        for idx in range(len(self)):
            s = self.load(idx)
            if len(s["classes"]):
                b = s["boxes"]
                xywh = np.stack([b[:, 0], b[:, 1], b[:, 2] - b[:, 0],
                                 b[:, 3] - b[:, 1]], 1)
                det_eval.add_gt(s["img_id"], xywh, s["classes"])


VISDRONE_CLASSES = (
    "pedestrian", "people", "bicycle", "car", "van", "truck", "tricycle",
    "awning-tricycle", "bus", "motor")


class VisDroneDataset:
    """VisDrone2019-DET reader. The reference benchmarks VisDrone2019 at
    1280² for both families (README.md:99-105,137-145) but ships no reader
    for its native format — its lineage (ultralytics/yolov5 VisDrone.yaml)
    converts offline with a script that keeps score==1 rows and maps
    category 1..10 → label 0..9. This reader applies the same rule
    directly: per-image ``.txt`` (same stem) with CSV lines
    ``left,top,width,height,score,category,truncation,occlusion``;
    ``score==0`` rows are the class-agnostic *ignored regions* (category
    0) plus the ``others`` category (11) — they become ``iscrowd=1`` so
    the train pipeline drops them (:func:`drop_ignore_boxes`) and eval
    treats them as ignore regions rather than penalizing detections that
    land inside them.
    """

    def __init__(self, img_dir: str, label_dir: str,
                 class_names: Optional[Sequence[str]] = None):
        self.img_dir = img_dir
        self.label_dir = label_dir
        self.class_names = list(class_names) if class_names \
            else list(VISDRONE_CLASSES)
        self.files = sorted(
            f for f in os.listdir(img_dir)
            if os.path.splitext(f)[1].lower() in YOLODataset.IMG_EXTS)
        # VisDrone's native category ids are 1..10 (0 = ignored regions,
        # 11 = others); _parse maps them to labels 0..9, so results-JSON
        # dumps must map back (+1) to score against the original files
        self.label_to_cat = {i: i + 1 for i in range(len(self.class_names))}

    def __len__(self):
        return len(self.files)

    @property
    def num_classes(self):
        return len(self.class_names)

    def _parse(self, stem: str):
        lpath = os.path.join(self.label_dir, stem + ".txt")
        boxes, classes, ignore = [], [], []
        nc = len(self.class_names)
        if os.path.exists(lpath):
            with open(lpath) as f:
                for line in f:
                    parts = line.strip().rstrip(",").split(",")
                    if len(parts) < 6:
                        continue
                    x, y, w, h = (float(v) for v in parts[:4])
                    if w <= 0 or h <= 0:
                        continue
                    score, cat = int(parts[4]), int(parts[5])
                    label = cat - 1  # category 1..10 → label 0..9
                    boxes.append([x, y, x + w, y + h])
                    if score == 0 or not 0 <= label < nc:
                        # ignored region (cat 0) / others (cat 11):
                        # class-agnostic ignore, label sentinel −1
                        classes.append(-1)
                        ignore.append(1)
                    else:
                        classes.append(label)
                        ignore.append(0)
        return boxes, classes, ignore

    def load(self, idx: int) -> Dict:
        fname = self.files[idx]
        img = imread_rgb(os.path.join(self.img_dir, fname))
        stem = os.path.splitext(fname)[0]
        boxes, classes, ignore = self._parse(stem)
        # the −1 ignore sentinel stays a valid label for padding code;
        # drop_ignore_boxes removes these rows before training anyway
        cls = np.maximum(np.asarray(classes, np.int32), 0)
        return {
            "image": img,
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "classes": cls,
            "iscrowd": np.asarray(ignore, np.int32),
            "img_id": stem,
            "file": fname,
        }

    def gt_for_eval(self, det_eval):
        nc = len(self.class_names)
        for idx in range(len(self)):
            stem = os.path.splitext(self.files[idx])[0]
            boxes, classes, ignore = self._parse(stem)
            if not boxes:
                continue
            b = np.asarray(boxes, np.float32)
            xywh = np.stack([b[:, 0], b[:, 1], b[:, 2] - b[:, 0],
                             b[:, 3] - b[:, 1]], 1)
            out_b, out_c, out_i = [], [], []
            for bb, c, ig in zip(xywh, classes, ignore):
                if c < 0:  # class-agnostic ignored region: ignore for
                    # every class (COCO ignore matching is per-category)
                    for k in range(nc):
                        out_b.append(bb)
                        out_c.append(k)
                        out_i.append(1)
                else:
                    out_b.append(bb)
                    out_c.append(c)
                    out_i.append(ig)
            det_eval.add_gt(stem, out_b, out_c, iscrowd=out_i)


VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor")


class VOCDataset:
    """Pascal-VOC XML reader. The reference's VOC0712 experiment rows
    (README.md:67-79,109-115) are its strongest FasterRCNN baselines and
    its FasterRCNN lineage repo trains from VOCdevkit layout directly
    (README.md:158 "可以利用voc数据集格式的数据进行训练"); this reader removes the
    offline VOC→COCO conversion the three shipped formats would require.

    ``ann``: either the Annotations/ directory (every .xml is a sample) or
    an ImageSets/Main split .txt (one image stem per line; Annotations/ is
    resolved as ``../../Annotations`` per the VOCdevkit layout).
    ``difficult`` objects become ``iscrowd=1``: the train pipelines drop
    them from the GT (:func:`drop_ignore_boxes` — py-faster-rcnn
    ``use_diff=False``) and DetEval treats them as ignore regions —
    detections matching them are neither rewarded nor penalized, the
    COCO-semantics analog of VOC's difficult-exclusion rule.
    """

    def __init__(self, ann: str, img_dir: str,
                 class_names: Optional[Sequence[str]] = None):
        self.img_dir = img_dir
        self.class_names = list(class_names) if class_names \
            else list(VOC_CLASSES)
        self.name_to_label = {n: i for i, n in enumerate(self.class_names)}
        self.label_to_cat = None  # labels are already contiguous
        if os.path.isdir(ann):
            self.ann_dir = ann
            self.stems = sorted(os.path.splitext(f)[0]
                                for f in os.listdir(ann)
                                if f.endswith(".xml"))
        else:  # ImageSets/Main/<split>.txt
            self.ann_dir = os.path.normpath(
                os.path.join(os.path.dirname(ann), "..", "..",
                             "Annotations"))
            with open(ann) as f:
                # lines may be "stem" or "stem 1/-1" (per-class splits)
                self.stems = [ln.split()[0] for ln in f if ln.strip()]

    def __len__(self):
        return len(self.stems)

    @property
    def num_classes(self):
        return len(self.class_names)

    def _parse(self, stem: str):
        import xml.etree.ElementTree as ET
        root = ET.parse(os.path.join(self.ann_dir, stem + ".xml")).getroot()
        fname = root.findtext("filename") or (stem + ".jpg")
        boxes, classes, difficult = [], [], []
        for obj in root.iter("object"):
            name = (obj.findtext("name") or "").strip()
            if name not in self.name_to_label:
                continue
            bb = obj.find("bndbox")
            # VOC pixel indices are 1-based inclusive
            x1 = float(bb.findtext("xmin")) - 1.0
            y1 = float(bb.findtext("ymin")) - 1.0
            x2 = float(bb.findtext("xmax")) - 1.0
            y2 = float(bb.findtext("ymax")) - 1.0
            if x2 <= x1 or y2 <= y1:
                continue
            boxes.append([x1, y1, x2, y2])
            classes.append(self.name_to_label[name])
            difficult.append(int(obj.findtext("difficult") or 0))
        return fname, boxes, classes, difficult

    def load(self, idx: int) -> Dict:
        stem = self.stems[idx]
        fname, boxes, classes, difficult = self._parse(stem)
        img = imread_rgb(os.path.join(self.img_dir, fname))
        return {
            "image": img,
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "classes": np.asarray(classes, np.int32),
            "iscrowd": np.asarray(difficult, np.int32),
            "img_id": stem,
            "file": fname,
        }

    def gt_for_eval(self, det_eval):
        for idx in range(len(self)):
            stem = self.stems[idx]
            _, boxes, classes, difficult = self._parse(stem)
            if boxes:
                b = np.asarray(boxes, np.float32)
                xywh = np.stack([b[:, 0], b[:, 1], b[:, 2] - b[:, 0],
                                 b[:, 3] - b[:, 1]], 1)
                det_eval.add_gt(stem, xywh, classes, iscrowd=difficult)


class CachedDataset:
    """RAM image cache wrapper for any reader (the reference lineage's
    ultralytics ``--cache ram`` knob): re-decoding JPEGs every epoch is the
    dominant host cost (one cv2.imread ≈ 5-10 ms), so ``load`` results are
    memoized up to a byte budget. Threads may race on first load — the
    double decode is benign and the dict write is atomic under the GIL.
    """

    def __init__(self, ds, max_bytes: int = 8 << 30):
        self.ds = ds
        self.max_bytes = max_bytes
        self._cache: Dict[int, Dict] = {}
        self._bytes = 0

    def __len__(self):
        return len(self.ds)

    def __getattr__(self, name):
        return getattr(self.ds, name)

    def load(self, idx: int) -> Dict:
        hit = self._cache.get(idx)
        if hit is not None:
            return hit
        s = self.ds.load(idx)
        size = s["image"].nbytes
        if self._bytes + size <= self.max_bytes:
            self._cache[idx] = s
            self._bytes += size
        return s
