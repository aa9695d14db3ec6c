"""Synthetic dataset builder for tests: colored-rectangle 'objects' on noise
backgrounds, emitted in COCO / YOLO / DOTA formats. Boxes are visually
learnable (solid bright rectangles), enabling overfit-style integration
tests without real data."""

import json
import os

import numpy as np

try:
    import cv2
except ImportError:
    cv2 = None

CLASS_COLORS = [(255, 40, 40), (40, 255, 40), (40, 40, 255), (255, 255, 40)]


def make_image_with_boxes(rng, h, w, max_objects=4, num_classes=4):
    img = rng.integers(90, 130, (h, w, 3)).astype(np.uint8)
    n = int(rng.integers(1, max_objects + 1))
    boxes, classes = [], []
    for _ in range(n):
        bw = int(rng.integers(max(8, w // 10), w // 3))
        bh = int(rng.integers(max(8, h // 10), h // 3))
        x1 = int(rng.integers(0, w - bw))
        y1 = int(rng.integers(0, h - bh))
        c = int(rng.integers(0, num_classes))
        img[y1:y1 + bh, x1:x1 + bw] = CLASS_COLORS[c]
        boxes.append([x1, y1, bw, bh])  # xywh
        classes.append(c)
    return img, boxes, classes


def build_coco_dataset(root, n_images=8, hw=(96, 128), num_classes=4, seed=0,
                       ext="png"):
    """Write images + COCO json under root; returns (ann_file, img_dir)."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        h, w = hw
        img, boxes, classes = make_image_with_boxes(rng, h, w,
                                                    num_classes=num_classes)
        fname = f"img_{i:04d}.{ext}"
        cv2.imwrite(os.path.join(img_dir, fname),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        images.append({"id": i + 1, "file_name": fname,
                       "height": h, "width": w})
        for b, c in zip(boxes, classes):
            annotations.append({
                "id": ann_id, "image_id": i + 1,
                "category_id": c + 10,  # non-contiguous on purpose
                "bbox": [float(v) for v in b],
                "area": float(b[2] * b[3]), "iscrowd": 0,
            })
            ann_id += 1
    categories = [{"id": c + 10, "name": f"class{c}"}
                  for c in range(num_classes)]
    ann_file = os.path.join(root, "ann.json")
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)
    return ann_file, img_dir


def build_yolo_dataset(root, n_images=4, hw=(96, 128), num_classes=4, seed=0):
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images")
    lbl_dir = os.path.join(root, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    for i in range(n_images):
        h, w = hw
        img, boxes, classes = make_image_with_boxes(rng, h, w,
                                                    num_classes=num_classes)
        stem = f"img_{i:04d}"
        cv2.imwrite(os.path.join(img_dir, stem + ".png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        with open(os.path.join(lbl_dir, stem + ".txt"), "w") as f:
            for b, c in zip(boxes, classes):
                cx, cy = (b[0] + b[2] / 2) / w, (b[1] + b[3] / 2) / h
                f.write(f"{c} {cx} {cy} {b[2] / w} {b[3] / h}\n")
    return img_dir, lbl_dir


def build_dota_dataset(root, n_images=3, hw=(96, 128), num_classes=4, seed=0):
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images")
    lbl_dir = os.path.join(root, "labelTxt")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    names = [f"class{c}" for c in range(num_classes)]
    for i in range(n_images):
        h, w = hw
        img, boxes, classes = make_image_with_boxes(rng, h, w,
                                                    num_classes=num_classes)
        stem = f"P{i:04d}"
        cv2.imwrite(os.path.join(img_dir, stem + ".png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        with open(os.path.join(lbl_dir, stem + ".txt"), "w") as f:
            f.write("imagesource:synthetic\ngsd:1.0\n")
            for b, c in zip(boxes, classes):
                x1, y1, bw, bh = b
                x2, y2 = x1 + bw, y1 + bh
                f.write(f"{x1} {y1} {x2} {y1} {x2} {y2} {x1} {y2} "
                        f"{names[c]} 0\n")
    return img_dir, lbl_dir, names


def build_visdrone_dataset(root, n_images=3, hw=(96, 128), num_classes=10,
                           seed=0):
    """VisDrone2019-DET layout: images/ + annotations/*.txt with CSV lines
    ``left,top,w,h,score,category,trunc,occ``. Image 0 additionally gets an
    ignored-region row (score=0, category=0) and an ``others`` row
    (category=11)."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images")
    lbl_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    for i in range(n_images):
        h, w = hw
        # objects drawn from the 4 paintable classes; labels live in the
        # full num_classes space (VisDrone categories 1..num_classes)
        img, boxes, classes = make_image_with_boxes(
            rng, h, w, num_classes=min(4, num_classes))
        stem = f"{i:07d}"
        cv2.imwrite(os.path.join(img_dir, stem + ".jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        with open(os.path.join(lbl_dir, stem + ".txt"), "w") as f:
            for b, c in zip(boxes, classes):
                x1, y1, bw, bh = b
                f.write(f"{int(x1)},{int(y1)},{int(bw)},{int(bh)},1,"
                        f"{c + 1},0,0\n")
            if i == 0:
                f.write("1,1,30,20,0,0,0,0\n")    # ignored region
                f.write("5,5,10,10,0,11,0,0\n")   # "others"
    return img_dir, lbl_dir


def build_voc_dataset(root, n_images=4, hw=(96, 128), num_classes=4, seed=0):
    """VOCdevkit layout: Annotations/*.xml + JPEGImages/*.jpg +
    ImageSets/Main/val.txt. Returns (ann_dir, img_dir, split_file, names).
    The LAST object of image 0 is marked difficult=1."""
    rng = np.random.default_rng(seed)
    ann_dir = os.path.join(root, "Annotations")
    img_dir = os.path.join(root, "JPEGImages")
    set_dir = os.path.join(root, "ImageSets", "Main")
    for d in (ann_dir, img_dir, set_dir):
        os.makedirs(d, exist_ok=True)
    names = [f"class{c}" for c in range(num_classes)]
    stems = []
    for i in range(n_images):
        h, w = hw
        img, boxes, classes = make_image_with_boxes(rng, h, w,
                                                    num_classes=num_classes)
        stem = f"voc_{i:04d}"
        stems.append(stem)
        cv2.imwrite(os.path.join(img_dir, stem + ".png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        objs = []
        for j, (b, c) in enumerate(zip(boxes, classes)):
            x1, y1, bw, bh = b
            diff = 1 if (i == 0 and j == len(boxes) - 1) else 0
            objs.append(
                "  <object>\n"
                f"    <name>{names[c]}</name>\n"
                f"    <difficult>{diff}</difficult>\n"
                "    <bndbox>\n"
                f"      <xmin>{x1 + 1:.1f}</xmin>"
                f"<ymin>{y1 + 1:.1f}</ymin>"
                f"<xmax>{x1 + bw + 1:.1f}</xmax>"
                f"<ymax>{y1 + bh + 1:.1f}</ymax>\n"
                "    </bndbox>\n  </object>")
        with open(os.path.join(ann_dir, stem + ".xml"), "w") as f:
            f.write("<annotation>\n"
                    f"  <filename>{stem}.png</filename>\n"
                    f"  <size><width>{w}</width><height>{h}</height>"
                    "<depth>3</depth></size>\n"
                    + "\n".join(objs) + "\n</annotation>\n")
    split_file = os.path.join(set_dir, "val.txt")
    with open(split_file, "w") as f:
        f.write("\n".join(stems) + "\n")
    return ann_dir, img_dir, split_file, names
