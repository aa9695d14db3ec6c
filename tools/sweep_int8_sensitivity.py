"""Per-layer-group int8 sensitivity sweep on the overfit-AP protocol.

VERDICT r4 item 1: the only measured AP delta for the W8A8 serving path
was ~9 pts AP50-95 (float 0.984 -> int8 0.892 on the overfit-tiny-net
protocol, tests/test_quant.py::test_int8_ap_delta_on_trained_net), with
no per-layer attribution and no mitigation knob beyond the blunt skip=.

This tool answers WHERE the loss concentrates and validates a float-tail
mitigation:

* trains the protocol's tiny YOLO once (300 steps, synthetic COCO),
* scores float / fully-quantized baselines for both PTQ modes,
* leave-one-group-FLOAT: skip one module group at a time (marginal AP
  recovered by keeping that group float),
* quantize-ONLY-one-group: skip everything else (marginal AP damage),
* candidate mitigations (head-tail float, act_clip=amax, per-channel
  flow scales).

Run on the real chip (fast: tiny shapes, ~10 s/compile):

    python tools/sweep_int8_sensitivity.py [--mode layer|flow|both]

Results land in the PERF_NOTES.md int8 sensitivity entry.
"""
import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import jax                                                      # noqa: E402
import jax.numpy as jnp                                         # noqa: E402

from synth_data import build_coco_dataset                       # noqa: E402

from heltondetection_tpu.data.augment import (EvalPipeline,     # noqa: E402
                                              TrainPipeline, letterbox_np)
from heltondetection_tpu.data.loader import (EvalLoader,        # noqa: E402
                                             TrainLoader, device_prep)
from heltondetection_tpu.data.readers import COCODataset        # noqa: E402
from heltondetection_tpu.engine.evaluator import (Evaluator,    # noqa: E402
                                                  make_packed_serve_step)
from heltondetection_tpu.models.yolov5 import YOLOv5            # noqa: E402
from heltondetection_tpu.ops.quant import (build_flow_tree,     # noqa: E402
                                           build_quant_tree, calibrate_amax,
                                           YOLO_FLOW_FLOAT_OUT)
from heltondetection_tpu.train.schedule import make_optimizer   # noqa: E402
from heltondetection_tpu.train.trainer import (create_train_state,  # noqa: E402
                                               make_train_step)
from heltondetection_tpu.train.yolo_loss import YoloLossConfig  # noqa: E402
from heltondetection_tpu.utils.cocoeval import DetEval          # noqa: E402

# Module groups of the YOLOv5 graph (ConvBnAct path prefixes).
GROUPS = {
    "bb_early": ("backbone/down1", "backbone/c3_1",
                 "backbone/down2", "backbone/c3_2"),
    "bb_late": ("backbone/down3", "backbone/c3_3",
                "backbone/down4", "backbone/c3_4"),
    "bb_sppf": ("backbone/sppf",),
    "neck_td": ("neck/lat5", "neck/td4", "neck/lat4", "neck/td3"),
    "neck_bu": ("neck/bu3", "neck/bu4", "neck/bu5", "neck/bu6"),
}
# The three neck C3 blocks whose outputs feed the detect head directly —
# the float-tail mitigation candidate.
HEAD_TAIL = ("neck/td3", "neck/bu4", "neck/bu6")
ALL_PREFIXES = tuple(p for ps in GROUPS.values() for p in ps)
STEM = ("backbone/stem",)


def train_protocol(tmp):
    ann, imgs_dir = build_coco_dataset(tmp, n_images=8, hw=(96, 128))
    ds = COCODataset(ann, imgs_dir)
    nc, img_size, steps = ds.num_classes, 64, 300
    model = YOLOv5(num_classes=nc, depth_multiple=0.33, width_multiple=0.125)
    tx = make_optimizer(5e-3, total_steps=steps, warmup_steps=20)
    state = create_train_state(model, jax.random.PRNGKey(0), img_size, tx,
                               batch_size=8)
    step_fn = jax.jit(make_train_step(
        model, tx, YoloLossConfig(num_classes=nc, img_size=img_size)))
    pipe = TrainPipeline(ds, img_size, mosaic_p=0.0, hsv=False, flip_p=0.0,
                         max_boxes=16, seed=0)
    loader = TrainLoader(pipe, batch_size=8, num_workers=2)
    i = 0
    while i < steps:
        for batch in loader.epoch(i):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            batch["image"] = device_prep(batch["image"])
            state, _ = step_fn(state, batch)
            i += 1
            if i >= steps:
                break
    variables = {"params": state.ema_params,
                 "batch_stats": state.batch_stats}
    return ds, model, variables, nc, img_size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both",
                    choices=["layer", "flow", "both"])
    ap.add_argument("--fine", action="store_true",
                    help="also sweep each individual module prefix")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        print("training the protocol net (300 steps)...", flush=True)
        ds, model, variables, nc, img_size = train_protocol(tmp)

        nb = np.zeros((0, 4), np.float32)
        pad = np.stack([letterbox_np(ds.load(k)["image"], nb, img_size)[0]
                        for k in range(8)]).astype(np.uint8)
        amax = calibrate_amax(
            model, variables,
            [pad[i:i + 8] for i in range(0, len(pad), 8)])

        def score(quant):
            step = make_packed_serve_step(model, variables, nc,
                                          conf_thres=0.01, iou_thres=0.65,
                                          max_det=32, multi_label=False,
                                          quant=quant)
            det = DetEval(nc)
            ds.gt_for_eval(det)
            ev = Evaluator(None, nc, step_fn=step)
            with EvalLoader(EvalPipeline(ds, img_size), 4,
                            num_workers=0) as ld:
                return ev.run(ld, det_eval=det)

        def tree(mode, skip=STEM, act_clip="p999", per_channel=False):
            if mode == "layer":
                return build_quant_tree(variables, amax, skip=skip,
                                        act_clip=act_clip)
            return build_flow_tree(variables, amax, skip=skip,
                                   float_out=YOLO_FLOW_FLOAT_OUT,
                                   act_clip=act_clip)

        rows = []

        def run(label, quant):
            s = score(quant)
            rows.append((label, s["AP"], s["AP50"], s["AP75"]))
            print(f"{label:38s} AP={s['AP']:.4f} AP50={s['AP50']:.4f} "
                  f"AP75={s['AP75']:.4f}", flush=True)

        run("float", None)
        modes = ["layer", "flow"] if args.mode == "both" else [args.mode]
        for m in modes:
            run(f"{m}: all", tree(m))
            run(f"{m}: all, act_clip=amax", tree(m, act_clip="amax"))
            # leave-one-group-float
            for g, prefixes in GROUPS.items():
                run(f"{m}: float {g}", tree(m, skip=STEM + prefixes))
            # quantize-only-one-group
            for g, prefixes in GROUPS.items():
                others = tuple(p for p in ALL_PREFIXES if p not in prefixes)
                run(f"{m}: ONLY {g}", tree(m, skip=STEM + others))
            # mitigation candidates
            run(f"{m}: float head-tail (td3/bu4/bu6)",
                tree(m, skip=STEM + HEAD_TAIL))
            run(f"{m}: float neck", tree(
                m, skip=STEM + GROUPS["neck_td"] + GROUPS["neck_bu"]))
            if args.fine:
                for p in ALL_PREFIXES:
                    run(f"{m}: float {p}", tree(m, skip=STEM + (p,)))

        print("\n| config | AP | AP50 | AP75 |")
        print("|---|---|---|---|")
        for label, a, a50, a75 in rows:
            print(f"| {label} | {a:.4f} | {a50:.4f} | {a75:.4f} |")


if __name__ == "__main__":
    main()
