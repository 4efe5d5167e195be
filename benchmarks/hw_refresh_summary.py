"""Summarize a benchmarks/hw_refresh.sh output directory.

Reads the JSON/log artifacts the refresh batch writes under its OUT dir
(default /tmp/hw_refresh) and prints one compact table: headline bench
stability, the batch-512/640 probes, run_all config highlights, identity
bench, hardware numerics validation, and serving percentiles — the
numbers that feed README's engineering log after a re-measure.

Usage: python benchmarks/hw_refresh_summary.py [/tmp/hw_refresh]
"""
import json
import sys
from pathlib import Path


def _bench_line(path: Path):
    """bench.py writes exactly one JSON object line (possibly after logs)."""
    if not path.exists():
        return None
    for line in path.read_text().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/hw_refresh")
    if not out.is_dir():
        raise SystemExit(f"no refresh dir at {out} — run benchmarks/hw_refresh.sh first")

    print(f"== hw_refresh summary: {out} ==")

    headline_names = (
        ("bench_default_a.json", "headline default batch (A)"),
        ("bench_default_b.json", "headline default batch (B)"),
        # pre-round-3 batches carried the batch number in the filename
        ("bench_448_a.json", "headline default batch (A)"),
        ("bench_448_b.json", "headline default batch (B)"),
        ("bench_512.json", "batch 512 probe"),
        ("bench_640.json", "batch 640 probe"),
    )
    seen_labels = set()
    for name, label in headline_names:
        if label in seen_labels:
            continue
        rec = _bench_line(out / name)
        if rec is None:
            if not name.startswith("bench_default"):
                print(f"  {label:28s}: MISSING")
                seen_labels.add(label)
            continue
        seen_labels.add(label)
        if rec.get("error"):
            print(f"  {label:28s}: ERROR {rec['error']!r}")
        else:
            roof = rec.get("roofline") or {}
            util = roof.get("hbm_utilization")
            extra = (
                f", {roof.get('achieved_gbps')} GB/s"
                f" = {util * 100:.1f}% HBM peak" if util else ""
            )
            print(f"  {label:28s}: {rec['value']:.0f} {rec['unit']}"
                  f" ({rec.get('vs_baseline', '?')}x baseline{extra})")

    results = out / "results.json"
    if results.exists():
        r = json.loads(results.read_text())
        c5 = r.get("config5_throughput_sweep", {})
        print(f"  run_all config5 sweep       : "
              f"{c5.get('canvases_per_sec', '?')} canvases/sec "
              f"(superbatch {c5.get('superbatch', '?')})")
        c3 = r.get("config3_multi_ratio_fused", {})
        if c3:
            dev = c3.get("device_ms_per_4variant_pass") or c3.get(
                "device_ms"
            )
            vps = c3.get("variants_per_sec_device")
            if dev is not None:
                print(f"  run_all config3 fused       : {dev} ms / "
                      f"4-variant pass"
                      + (f" ({vps:.0f} variants/sec device)" if vps else ""))
            else:
                print(f"  run_all config3 fused       : {json.dumps(c3)[:100]}")
    else:
        print("  run_all results             : NOT COPIED (failed/timed out)")

    ident = out / "identity.log"
    if ident.exists():
        rows = {}
        for ln in ident.read_text().splitlines():
            for tag in ("scaled", "identity"):
                if ln.startswith(tag + " {"):
                    try:
                        rows[tag] = json.loads(ln[len(tag) + 1:])
                    except json.JSONDecodeError:
                        pass
        if rows:
            print("  identity bench              : " + ", ".join(
                f"{tag} {rec.get('canvases_per_sec', 0):.0f}"
                for tag, rec in rows.items()
            ) + " canvases/sec")
        else:
            tail = [ln for ln in ident.read_text().splitlines() if ln.strip()]
            print(f"  identity bench              : "
                  f"{tail[-1][:110] if tail else '(empty)'}")
    else:
        print("  identity bench              : MISSING")

    vh = out / "validate_hw.log"
    if vh.exists():
        rec = _bench_line(vh)  # first JSON-looking line... take the LAST
        last = None
        for ln in vh.read_text().splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                try:
                    last = json.loads(ln)
                except json.JSONDecodeError:
                    pass
        rec = last or rec
        if rec:
            print(f"  hardware numerics           : exact {rec.get('worst_exact', '?')}, "
                  f"traced <= {rec.get('worst_traced', '?')}/255, "
                  f"random fused3 <= {rec.get('worst_random_fused3', '?')}/255")
        else:
            print("  hardware numerics           : (no JSON summary line)")
    else:
        print("  hardware numerics           : MISSING")

    for log, tag in (("example01.log", "example 01 on chip"),
                     ("example02.log", "example 02 on chip")):
        p = out / log
        if p.exists():
            tail = [ln for ln in p.read_text().splitlines() if ln.strip()]
            print(f"  {tag:28s}: {tail[-1][:110] if tail else '(empty)'}")
        else:
            print(f"  {tag:28s}: MISSING")

    sj = out / "serving_results.json"
    if sj.exists():
        s = json.loads(sj.read_text())
        solid = s.get("render_solid", {})
        stream = s.get("render_batch_3ratio_stream", {})
        split = solid.get("phase_split") or {}
        split_s = (
            f" (phase split: device {split.get('device_p50_ms')}, "
            f"readback {split.get('readback_p50_ms')}, "
            f"encode {split.get('encode_p50_ms')})" if split else ""
        )
        print(f"  serving render p50/p95      : "
              f"{solid.get('p50_ms', '?')} / {solid.get('p95_ms', '?')} ms"
              + split_s)
        if stream:
            print(f"  serving stream ttfb p50     : "
                  f"{stream.get('ttfb', {}).get('p50_ms', '?')} ms "
                  f"(buffered total {stream.get('buffered_total_p50_ms', '?')} ms)")
    else:
        print("  serving results             : MISSING")


if __name__ == "__main__":
    main()
