"""Summarize a jax.profiler trace (xplane.pb) without TensorBoard.

The tensorboard_plugin_profile in this image can't convert xspace
(pywrap ABI mismatch), so this reads the XSpace proto directly and
aggregates device-plane event durations per op name — enough to rank
where the slot/training-step time actually goes.

Usage: python scripts/analyze_trace.py <trace_dir_or_xplane.pb> [--top 40]
       [--line-filter XLA]
"""

import argparse
import collections
import glob
import os
import sys


def find_xplane(path):
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(
        path, "**", "*.xplane.pb"), recursive=True))
    if not hits:
        sys.exit(f"no *.xplane.pb under {path}")
    return hits[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--line-filter", default=None,
                    help="only lines whose name contains this substring")
    ap.add_argument("--plane-filter", default="TPU",
                    help="only planes whose name contains this (default "
                         "TPU; use '' for all incl. CPU/host)")
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xp = find_xplane(args.path)
    space = xplane_pb2.XSpace()
    with open(xp, "rb") as f:
        space.ParseFromString(f.read())

    print(f"# {xp}")
    for plane in space.planes:
        if args.plane_filter and args.plane_filter not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        print(f"\n== plane: {plane.name}")
        for line in plane.lines:
            if args.line_filter and args.line_filter not in line.name:
                continue
            tot = collections.Counter()
            cnt = collections.Counter()
            span_ps = 0
            t0, t1 = None, None
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                tot[name] += ev.duration_ps
                cnt[name] += 1
                beg = line.timestamp_ns * 1000 + ev.offset_ps
                end = beg + ev.duration_ps
                t0 = beg if t0 is None else min(t0, beg)
                t1 = end if t1 is None else max(t1, end)
                span_ps += ev.duration_ps
            if not tot:
                continue
            wall_ms = (t1 - t0) / 1e9 if t0 is not None else 0
            print(f"-- line: {line.name}  events={sum(cnt.values())} "
                  f"busy={span_ps / 1e9:.3f}ms wall={wall_ms:.3f}ms")
            for name, ps in tot.most_common(args.top):
                print(f"   {ps / 1e9:9.3f} ms  x{cnt[name]:<5d} "
                      f"{name[:110]}")


if __name__ == "__main__":
    main()
