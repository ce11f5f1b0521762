"""Summarize a jax.profiler xplane trace: top TPU ops by total duration.

Usage: python tools/parse_trace.py /tmp/az_trace
"""

import glob
import gzip
import os
import sys
from collections import defaultdict


def find_xplane(trace_dir):
    pats = [
        os.path.join(trace_dir, "**", "*.xplane.pb"),
    ]
    files = []
    for p in pats:
        files.extend(glob.glob(p, recursive=True))
    return sorted(files)


def main():
    trace_dir = sys.argv[1]
    files = find_xplane(trace_dir)
    if not files:
        print("no xplane files under", trace_dir)
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    for f in files:
        with open(f, "rb") as fh:
            data = fh.read()
        space = xplane_pb2.XSpace()
        space.ParseFromString(data)
        for plane in space.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            durations = defaultdict(float)
            counts = defaultdict(int)
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                    durations[name] += ev.duration_ps / 1e9  # ms
                    counts[name] += 1
            total = sum(durations.values())
            print(f"\n== plane: {plane.name} (total {total:.1f} ms across lines) ==")
            for name, ms in sorted(durations.items(), key=lambda kv: -kv[1])[:40]:
                print(f"{ms:10.2f} ms  x{counts[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
