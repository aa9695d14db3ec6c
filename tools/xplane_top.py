"""Print the top-N device ops by self time from a .xplane.pb trace.

Usage: python tools/xplane_top.py /tmp/jaxtrace_train [N]

Reads the TPU device plane's XLA-op line and aggregates event durations by
op name (the per-op breakdown the reference gets from nvprof/nsight; here
it drives which XLA fusions to attack).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run from anywhere)
import sys, glob, collections

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def main():
    root = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = sorted(glob.glob(f"{root}/**/*.xplane.pb", recursive=True))
    if not paths:
        sys.exit(f"no .xplane.pb under {root}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_names = plane.event_metadata
        per_op = collections.Counter()
        total = 0
        for line in plane.lines:
            # XLA op lines carry the per-fusion timing; step lines duplicate
            if "XLA Ops" not in line.name and "Ops" != line.name.strip():
                continue
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                per_op[name] += ev.duration_ps
                total += ev.duration_ps
        if not per_op:   # fall back: aggregate every line
            for line in plane.lines:
                for ev in line.events:
                    name = f"{line.name}:{ev_names[ev.metadata_id].name}"
                    per_op[name] += ev.duration_ps
                    total += ev.duration_ps
        print(f"== plane {plane.name}  (total {total/1e9:.3f} ms summed)")
        for name, ps in per_op.most_common(topn):
            print(f"{ps/1e9:10.3f} ms  {100*ps/max(total,1):5.1f}%  {name}")


if __name__ == "__main__":
    main()
