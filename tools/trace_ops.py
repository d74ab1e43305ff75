"""Aggregate a jax.profiler trace into per-op cost ranks.

Usage:
    python tools/trace_ops.py /tmp/trace/lbfgs_1024  [--top 40] [--group]

Reads the newest ``*.trace.json.gz`` under the given directory (the
``plugins/profile/<ts>/`` layout jax.profiler emits), keeps TensorCore op
events, and prints total duration per op name (and per fusion category with
``--group``).  This is how the round-2 layout-copy findings in PERF.md were
produced.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_trace(root: str) -> dict:
    paths = sorted(
        glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--group", action="store_true", help="aggregate by op category")
    ap.add_argument("--pid_filter", default="TPU", help="substring of the process name to keep")
    args = ap.parse_args()

    data = load_trace(args.root)
    events = data["traceEvents"]

    # map pid -> process name; keep device (TensorCore) lanes only
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
    keep_pids = {p for p, n in pnames.items() if args.pid_filter.lower() in n.lower()}
    if not keep_pids:  # fall back: anything that isn't a python/host lane
        keep_pids = {p for p, n in pnames.items() if "python" not in n.lower()}

    durs: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in keep_pids:
            continue
        name = e.get("name", "")
        if name.startswith(("Steps/", "XLA Modules:", "XLA Ops")):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        key = name
        if args.group:
            key = re.sub(r"[.\d]+$", "", name.split("(")[0])
        durs[key] += dur
        counts[key] += 1
        total += dur

    print(f"{'total ms':>10}  {'count':>6}  op")
    for name, ms in sorted(durs.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{ms:10.2f}  {counts[name]:6d}  {name[:140]}")
    print(f"\nsum of shown lanes: {total:.1f} ms across {len(durs)} distinct ops")


if __name__ == "__main__":
    main()
