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


def _run(args, timeout=1200):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    try:
        p = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=timeout)
        return p.stdout + p.stderr
    except subprocess.TimeoutExpired as e:
        return (e.stdout or "") + f"\nTIMEOUT after {timeout}s"


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
    } if "img/s" in out else {"error": out[-300:]}

    out = _run(["tools/bench_rcnn.py", "8"])
    rec["rcnn_infer"] = {
        "img_s": _grab(out, r"ms/batch\s+([\d.]+) img/s"),
        "ms_batch": _grab(out, r"b8: ([\d.]+) ms/batch"),
        "tflops": _grab(out, r"([\d.]+) TFLOP/s"),
        "mfu_pct": _grab(out, r"\(([\d.]+)% of v5e"),
    } if "img/s" in out else {"error": out[-300:]}

    out = _run(["tools/bench_rcnn_train.py", "8", "832"])
    rec["rcnn_train"] = {
        "img_s": _grab(out, r"ms/step\s+([\d.]+) img/s"),
        "ms_step": _grab(out, r"b8: ([\d.]+) ms/step"),
        "tflops": _grab(out, r"([\d.]+) TFLOP/s"),
        "mfu_pct": _grab(out, r"\(([\d.]+)% of v5e"),
    } if "img/s" in out else {"error": out[-300:]}

    out = _run(["tools/bench_serve_int8.py", "l"], timeout=2700)
    rec["serve_l_int8"] = {
        "bf16_img_s": _grab(out, r"b128 bf16:\s+([\d.]+) img/s"),
        "int8_img_s": _grab(out, r"b128 int8:\s+([\d.]+) img/s"),
        "int8flow_img_s": _grab(out, r"b128 int8flow:\s+([\d.]+) img/s"),
    } if "img/s" in out else {"error": out[-300:]}

    line = json.dumps(rec)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
