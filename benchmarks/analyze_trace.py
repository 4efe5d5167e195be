"""Summarize a jax.profiler trace: device ops ranked by total time.

Usage: python benchmarks/analyze_trace.py <trace_dir> [--top 25]

Reads the newest vm.trace.json.gz under <trace_dir> and prints, for each
device lane, op totals/counts sorted by total duration — the ground truth
for where a compose batch spends its time (works over the dev tunnel,
unlike full-frame readbacks).
"""

from __future__ import annotations

import argparse
import gzip
import json
from collections import defaultdict
from pathlib import Path


def newest_trace(root: Path) -> Path:
    candidates = sorted(root.rglob("*.trace.json.gz"))
    if not candidates:
        raise FileNotFoundError(f"no *.trace.json.gz under {root}")
    return candidates[-1]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("trace_dir")
    parser.add_argument("--top", type=int, default=25)
    args = parser.parse_args()

    path = newest_trace(Path(args.trace_dir))
    with gzip.open(path) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")

    device_pids = {p for p, n in pid_names.items() if "device" in (n or "").lower()}
    per_op = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            dur = float(e.get("dur", 0.0))
            name = e.get("name", "?")
            per_op[name][0] += dur
            per_op[name][1] += 1
            total += dur

    print(f"trace: {path}")
    print(f"device lanes: {[pid_names[p] for p in device_pids]}")
    print(f"total device time: {total / 1e3:.3f} ms over {sum(c for _, c in per_op.values())} events\n")
    print(f"{'total ms':>10} {'count':>7} {'avg us':>9}  op")
    for name, (dur, count) in sorted(per_op.items(), key=lambda kv: -kv[1][0])[: args.top]:
        print(f"{dur / 1e3:10.3f} {count:7d} {dur / count:9.2f}  {name[:90]}")


if __name__ == "__main__":
    main()
