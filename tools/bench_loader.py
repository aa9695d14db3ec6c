"""Host loader throughput: native C++ pool vs pure-Python pipeline.

Synthesizes a small COCO set of ~VGA JPEGs, then measures steady-state
img/s for (a) the Python ThreadPool sample path, (b) the native pool with
host-decoded (RAM-cached) sources, (c) the native pool decoding JPEGs
in-pool. Usage: python tools/bench_loader.py [img_size] [batch].
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run from anywhere)
import sys, tempfile, time

import numpy as np

from tests.synth_data import build_coco_dataset
from heltondetection_tpu.data.readers import CachedDataset, COCODataset
from heltondetection_tpu.data.augment import TrainPipeline
from heltondetection_tpu.data.loader import TrainLoader

S = int(sys.argv[1]) if len(sys.argv) > 1 else 640
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
N_IMG = 64

root = tempfile.mkdtemp()
ann, imgs = build_coco_dataset(root, n_images=N_IMG, hw=(480, 640), ext="jpg")


def run(name, loader, epochs=(0, 1, 2)):
    # epoch 0 warms caches; time the rest
    n = 0
    for e in epochs:
        if e == 1:
            t0 = time.perf_counter()
        for batch in loader.epoch(e):
            if e >= 1:
                n += len(batch["image"])
    dt = time.perf_counter() - t0
    print(f"{name:42s} {n / dt:8.1f} img/s")
    return n / dt


kw = dict(mosaic_p=0.5, seed=0)
ds_cache = CachedDataset(COCODataset(ann, imgs))
run("python pipeline (RAM cache)",
    TrainLoader(TrainPipeline(ds_cache, S, **kw), B, num_workers=8))

try:
    from heltondetection_tpu.data.native_loader import (NativeTrainPipeline,
                                                        native_loader_available)
    assert native_loader_available()
except Exception as e:
    sys.exit(f"native loader unavailable: {e}")

ds_cache2 = CachedDataset(COCODataset(ann, imgs))
run("native pool (RAM cache)",
    TrainLoader(NativeTrainPipeline(ds_cache2, S, **kw), B, num_workers=8))

ds_jpg = COCODataset(ann, imgs)
run("native pool (decode-in-pool, no cache)",
    TrainLoader(NativeTrainPipeline(ds_jpg, S, decode_in_pool=True, **kw),
                B, num_workers=8))

ds_cold = COCODataset(ann, imgs)
run("python pipeline (no cache: cv2 decode)",
    TrainLoader(TrainPipeline(ds_cold, S, **kw), B, num_workers=8))
