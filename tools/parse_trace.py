"""Aggregate a jax.profiler chrome-trace capture by device op.

Finds plugins/profile/*/\*.trace.json.gz under the given dir, keeps events
on TPU device tracks (pid whose process_name mentions TPU/device), and
prints total/self duration per op name, descending.

Usage: python tools/parse_trace.py /tmp/prof_dir [--top 40] [--group]
  --group: collapse fusion instances (fusion.123 -> fusion) and report
           per-group totals.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(trace_dir):
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        sys.exit(f"no trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", []), path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--group", action="store_true")
    args = p.parse_args()

    events, path = load_events(args.trace_dir)
    print(f"# {path}", file=sys.stderr)

    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")

    device_pids = {pid for pid, name in pid_name.items()
                   if re.search(r"TPU|/device:|Chip", name, re.I)
                   and "host" not in name.lower()}
    if not device_pids:
        print("process names seen:", sorted(set(pid_name.values())),
              file=sys.stderr)
        device_pids = set(pid_name)

    total = collections.Counter()
    count = collections.Counter()
    wall = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if args.group:
            name = re.sub(r"[._-]?\d+$", "", name)
        dur = e.get("dur", 0) / 1e3  # us -> ms
        total[name] += dur
        count[name] += 1
        wall += dur

    print(f"# device-track op time total: {wall:.2f} ms "
          f"(all steps in capture)")
    for name, ms in total.most_common(args.top):
        print(f"{ms:10.3f} ms  x{count[name]:<5d} {name}")


if __name__ == "__main__":
    main()
