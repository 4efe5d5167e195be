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
    module_total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            dur = float(e.get("dur", 0.0))
            name = e.get("name", "?")
            if name.startswith("jit_"):
                # module spans CONTAIN the op events; counting both would
                # double the total — track separately
                module_total += dur
                continue
            per_op[name][0] += dur
            per_op[name][1] += 1
            total += dur

    print(f"trace: {path}")
    print(f"device lanes: {[pid_names[p] for p in device_pids]}")
    print(f"total device op time: {total / 1e3:.3f} ms over "
          f"{sum(c for _, c in per_op.values())} events "
          f"(module spans: {module_total / 1e3:.3f} ms)\n")
    print(f"{'total ms':>10} {'count':>7} {'avg us':>9}  op")
    for name, (dur, count) in sorted(per_op.items(), key=lambda kv: -kv[1][0])[: args.top]:
        print(f"{dur / 1e3:10.3f} {count:7d} {dur / count:9.2f}  {name[:90]}")

    # ---- module attribution: nest ops inside jit_* spans by timestamp ----
    modules = []
    ops = []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        span = (float(e.get("ts", 0)), float(e.get("ts", 0)) + float(e.get("dur", 0)))
        if name.startswith("jit_"):
            modules.append((name, span))
        else:
            ops.append((name, span, float(e.get("dur", 0.0))))
    by_module = defaultdict(lambda: defaultdict(lambda: [0.0, 0]))
    for name, (t0, t1), dur in ops:
        owner = "<top-level>"
        for mname, (m0, m1) in modules:
            if m0 <= t0 and t1 <= m1 + 1e-3:
                owner = mname
                break
        d = by_module[owner][name]
        d[0] += dur
        d[1] += 1
    print("\nper-module breakdown (ops nested by timestamp):")
    for mname, opmap in sorted(
        by_module.items(), key=lambda kv: -sum(v[0] for v in kv[1].values())
    ):
        mtotal = sum(v[0] for v in opmap.values())
        print(f"\n  {mname.split('(')[0]}  ({mtotal / 1e3:.3f} ms in ops)")
        for name, (dur, count) in sorted(opmap.items(), key=lambda kv: -kv[1][0])[:8]:
            print(f"    {dur / 1e3:8.3f} ms x{count:<4d} {name[:70]}")


if __name__ == "__main__":
    main()
