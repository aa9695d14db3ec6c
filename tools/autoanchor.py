"""Fit dataset-specific YOLOv5 anchors (autoanchor) for a config.

Usage: python tools/autoanchor.py --config path/to/cfg.py
           [--anchor-t 4.0] [--generations 1000] [--seed 0]
           [--max-images 10000]

Measures best-possible-recall (BPR) of the config's anchors (or the v6.1
defaults) against the TRAIN split's labels at `model.img_size`, fits new
anchors by k-means + genetic evolution (data/autoanchor.py), and prints a
config-ready `model.anchors` tuple. Paste the output into the config (or
set `train.autoanchor=True` to run the same check automatically at train
start).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run from anywhere)
import argparse

from heltondetection_tpu.configs.base import load_config
from heltondetection_tpu.data.autoanchor import (anchor_stats, fit_anchors,
                                                 dataset_label_wh)
from heltondetection_tpu.engine.runner import _cfg_anchors, build_dataset
from heltondetection_tpu.ops.anchors import YOLOV5_ANCHORS


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--anchor-t", type=float, default=4.0)
    ap.add_argument("--generations", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-images", type=int, default=10000,
                    help="label-sample cap for formats without annotation "
                         "metadata (COCO reads all labels without decode)")
    args = ap.parse_args()

    cfg = load_config(args.config)
    ds = build_dataset(cfg.data, "train")
    cur = _cfg_anchors(cfg) or YOLOV5_ANCHORS
    wh = dataset_label_wh(ds, cfg.model.img_size,
                          max_images=args.max_images, seed=args.seed)
    if not len(wh):
        raise SystemExit("no gt boxes found in the train split")
    st = anchor_stats(wh, cur, args.anchor_t)
    print(f"current anchors: BPR {st['bpr']:.4f}  fitness "
          f"{st['fitness']:.4f}  ({st['n_boxes']} boxes at "
          f"{cfg.model.img_size}^2)")
    fitted, new = fit_anchors(wh, anchor_t=args.anchor_t, seed=args.seed,
                              generations=args.generations)
    print(f"fitted  anchors: BPR {new['bpr']:.4f}  fitness "
          f"{new['fitness']:.4f}")
    if new["fitness"] <= st["fitness"]:
        print("fitted anchors do NOT beat the current set - keep it.")
        return
    print("\npaste into the config:\n")
    print("    model.anchors = (")
    for level in fitted:
        print(f"        {level},")
    print("    )")


if __name__ == "__main__":
    main()
