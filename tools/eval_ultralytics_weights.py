"""Standalone Ultralytics-weights evaluator — rebuild target C20b: the
reference's `utils/otherUtils/eval_yolov5_by_pycocotools.py` (README.md:25,
its only [R]-verified internal path) scores OFFICIAL Ultralytics YOLOv5
weights through its own eval stack to prove backbone/neck/head/decode/NMS
math parity (result rows README.md:133,135: yolov5s 30.928 / yolov5l 42.015
mAP50-95).

Usage (needs a locally-provided yolov5{s,l}.pt — this sandbox has no
network egress):

    python tools/eval_ultralytics_weights.py --weights yolov5s.pt \
        --variant s --ann instances_val2017.json --imgs val2017/ \
        [--img-size 640] [--batch 32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--variant", default="s", choices=list("nsmlx"))
    p.add_argument("--ann", required=True)
    p.add_argument("--imgs", required=True)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--conf", type=float, default=0.001)
    p.add_argument("--iou", type=float, default=0.65)
    p.add_argument("--int8", choices=["layer", "flow"], default=None,
                   help="also quantize (W8A8 PTQ, ops/quant.py) and score "
                        "the quantized program — the real-weights mAP "
                        "delta measurement for the int8 serving path")
    args = p.parse_args()

    from heltondetection_tpu.data.augment import EvalPipeline
    from heltondetection_tpu.data.loader import EvalLoader
    from heltondetection_tpu.data.readers import COCODataset
    from heltondetection_tpu.engine.evaluator import Evaluator
    from heltondetection_tpu.models.yolov5 import decode_full
    from heltondetection_tpu.utils.cocoeval import DetEval, format_summary
    from heltondetection_tpu.utils.torch_convert import \
        load_ultralytics_checkpoint

    model, variables = load_ultralytics_checkpoint(args.weights,
                                                   variant=args.variant)
    ds = COCODataset(args.ann, args.imgs)

    import jax.numpy as jnp

    if args.int8:
        import numpy as np
        from heltondetection_tpu.data.augment import letterbox_np
        from heltondetection_tpu.ops.quant import (quantize_yolo,
                                                   quantize_yolo_flow)
        nb = np.zeros((0, 4), np.float32)
        calib = np.stack([
            letterbox_np(ds.load(i)["image"], nb, args.img_size)[0]
            for i in range(min(32, len(ds)))]).astype(np.uint8)
        quantize = (quantize_yolo_flow if args.int8 == "flow"
                    else quantize_yolo)
        variables = {**variables,
                     "quant": quantize(model, variables, calib)}

    def fwd(images):
        images = images.astype(jnp.float32) / 255.0
        outs = model.apply(variables, images, train=False)
        return decode_full(outs, 80)

    ev = Evaluator(fwd, 80, conf_thres=args.conf,
                   iou_thres=args.iou, multi_label=True)
    det = DetEval(80)
    ds.gt_for_eval(det)
    loader = EvalLoader(EvalPipeline(ds, args.img_size), args.batch)
    stats = ev.run(loader, det_eval=det)
    print(format_summary(stats))
    print(f"mAP50-95 = {stats['AP'] * 100:.3f}  AP50 = {stats['AP50'] * 100:.3f}")
    print("reference oracle rows: yolov5s 30.928 / yolov5l 42.015 "
          "(README.md:133,135)")


if __name__ == "__main__":
    main()
