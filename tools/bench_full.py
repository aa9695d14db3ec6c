"""Full multi-path benchmark record (VERDICT r2 weak-4: bench.py tracks
only YOLOv5s serve; regressions in the other headline paths were invisible
to the per-round record). Runs every headline path and writes ONE JSON
object (also saved to BENCH_FULL_r*.json by the round workflow):

  serve   — YOLOv5s 640² fwd+decode+NMS img/s (bench.py's metric)
  yolo_train — YOLOv5s 640² packed train step img/s
  rcnn_infer — FasterRCNN-R50-FPN 832² infer img/s (+MFU)
  rcnn_train — FasterRCNN-R50-FPN 832² train img/s (+MFU)
  serve_l_int8 — YOLOv5l 640² serve, bf16 vs W8A8 int8 (the MXU-bound
                 regime where int8's double rate pays ~1.25×)

Each path runs as a subprocess so one failure can't void the record.
Usage: python tools/bench_full.py [out.json]   (~20 min: tunnel compiles)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run from anywhere)
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=2400):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    try:
        p = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=timeout)
        return p.stdout + p.stderr
    except subprocess.TimeoutExpired as e:
        # TimeoutExpired.stdout is BYTES even under text=True
        out = e.stdout or b""
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        return out + f"\nTIMEOUT after {timeout}s"


def _grab(out, pat):
    m = re.search(pat, out)
    return float(m.group(1)) if m else None


def main():
    rec = {}

    out = _run(["bench.py"])
    # bench.py's record is the one LINE that parses as JSON with "metric"
    # — brace-bearing log noise (absl/XLA warnings, retry text) must not
    # void the record this tool exists to protect
    rec["serve"] = {"error": out[-300:]}
    for ln in out.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                obj = json.loads(ln)
            except ValueError:
                continue
            if isinstance(obj, dict) and "metric" in obj:
                rec["serve"] = obj

    out = _run(["tools/bench_train.py", "128", "packed"])
    rec["yolo_train"] = {
        "img_s": _grab(out, r"train b128: [\d.]+ ms/step\s+([\d.]+) img/s"),
        "ms_step": _grab(out, r"train b128: ([\d.]+) ms/step"),
        "tflops": _grab(out, r"([\d.]+) TFLOP/s"),
        "mfu_pct": _grab(out, r"\(([\d.]+)% of v5e"),
    } if "img/s" in out else {"error": out[-300:]}
    if rec["yolo_train"].get("img_s"):
        # Ultralytics v6.1 README: YOLOv5s 640² 300-epoch COCO train ≈ 2
        # days on one V100 → 300·118,287/(2·86,400) ≈ 205 img/s; A100
        # proxy ≈ 1.8× V100 ≈ 370 img/s. The reference publishes no
        # throughput (README.md:61-154 is accuracy-only).
        rec["yolo_train"]["baseline_img_s"] = 370.0
        rec["yolo_train"]["baseline_source"] = (
            "Ultralytics v6.1 ~2 V100-days/300ep COCO = ~205 img/s; "
            "A100 proxy 1.8x = ~370")
        rec["yolo_train"]["vs_baseline"] = round(
            rec["yolo_train"]["img_s"] / 370.0, 3)

    out = _run(["tools/bench_rcnn.py", "8"])
    rec["rcnn_infer"] = {
        "img_s": _grab(out, r"ms/batch\s+([\d.]+) img/s"),
        "ms_batch": _grab(out, r"b8: ([\d.]+) ms/batch"),
        "tflops": _grab(out, r"([\d.]+) TFLOP/s"),
        "mfu_pct": _grab(out, r"\(([\d.]+)% of v5e"),
    } if "img/s" in out else {"error": out[-300:]}
    if rec["rcnn_infer"].get("img_s"):
        # detectron2 model zoo faster_rcnn_R_50_FPN_3x: 0.038 s/img on
        # V100 (bs1, ~800x1333 = 1.07MPx vs our 832² = 0.69MPx — theirs
        # is 1.5x the pixels, ours is batched); A100 proxy 1.8x ≈ 47
        # img/s. Cross-vendor, cross-shape — directional only.
        rec["rcnn_infer"]["baseline_img_s"] = 47.0
        rec["rcnn_infer"]["baseline_source"] = (
            "detectron2 R50-FPN 0.038 s/img V100 bs1 (~800x1333); "
            "A100 proxy 1.8x = ~47")
        rec["rcnn_infer"]["vs_baseline"] = round(
            rec["rcnn_infer"]["img_s"] / 47.0, 3)

    out = _run(["tools/bench_rcnn_train.py", "8", "832"])
    rec["rcnn_train"] = {
        "img_s": _grab(out, r"ms/step\s+([\d.]+) img/s"),
        "ms_step": _grab(out, r"b8: ([\d.]+) ms/step"),
        "tflops": _grab(out, r"([\d.]+) TFLOP/s"),
        "mfu_pct": _grab(out, r"\(([\d.]+)% of v5e"),
    } if "img/s" in out else {"error": out[-300:]}
    if rec["rcnn_train"].get("img_s"):
        # detectron2 R50-FPN 0.210 s/iter, 16 imgs over 8 V100 = 9.5
        # img/s/GPU; A100 proxy 1.8x ≈ 17 img/s/chip.
        rec["rcnn_train"]["baseline_img_s"] = 17.0
        rec["rcnn_train"]["baseline_source"] = (
            "detectron2 R50-FPN train 0.210 s/iter bs16/8xV100 = 9.5 "
            "img/s/GPU; A100 proxy 1.8x = ~17")
        rec["rcnn_train"]["vs_baseline"] = round(
            rec["rcnn_train"]["img_s"] / 17.0, 3)

    out = _run(["tools/bench_serve_int8.py", "l", "none,accuracy"],
               timeout=3600)
    rec["serve_l_int8"] = {
        "bf16_img_s": _grab(out, r"b128 bf16:\s+([\d.]+) img/s"),
        "int8_img_s": _grab(out, r"b128 int8\[none\]:\s+([\d.]+) img/s"),
        "int8flow_img_s": _grab(out,
                                r"b128 int8flow\[none\]:\s+([\d.]+) img/s"),
        "int8_acc_img_s": _grab(
            out, r"b128 int8\[accuracy\]:\s+([\d.]+) img/s"),
        "int8flow_acc_img_s": _grab(
            out, r"b128 int8flow\[accuracy\]:\s+([\d.]+) img/s"),
    } if "img/s" in out else {"error": out[-300:]}

    line = json.dumps(rec)
    print(line)
    # canonical latest record: bench.py embeds this as its "paths" field
    # so the driver-captured BENCH_r{N}.json carries every benched path
    # (VERDICT r4 item 3), not just the headline serve row
    with open(os.path.join(REPO, "BENCH_FULL_LATEST.json"), "w") as f:
        f.write(line + "\n")
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
