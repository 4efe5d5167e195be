"""Benchmark: composited 1080p canvases/sec/chip vs the PIL reference.

Headline metric (BASELINE.md): 1080p canvases composited per second on one
TPU chip, batched compose path (fused gen-3 Pallas kernel: exact 3-limb
resample + clamped-window packed blend in one grid-(B,N) program, with
coefficient tables built in-kernel from per-object size scalars and the
packed-u32 canvas convention on input and output; --kernel xla selects the
pure-XLA windowed path), squarespace bundle workload with solver-realistic
downscale-only placements.

The step itself comes from the ONE factory shared with the sweep
(``parallel.sweep.make_solid_render_step`` with ``stat="fence"``,
``fallback_mode="tiered"`` — the round-2 consolidation debt, retired with
a hardware A/B in benchmarks/ab_r03/).

Honesty machinery (VERDICT r2 items 1-2):

* every device phase runs under a :class:`PhaseWatchdog` — a stalled
  compile/alloc/execute emits ONE machine-readable JSON line naming the
  phase (plus the expected live-HBM model for the batch) and exits before
  any outer ``timeout`` can SIGKILL the evidence away;
* the JSON carries an HBM roofline (``ops.roofline``): model bytes per
  batch, achieved GB/s, and utilization vs the chip's public peak — the
  throughput claim is falsifiable, not free-floating;
* ``vs_baseline`` follows a pinned protocol: median of ``--pil-rounds``
  (default 5) single-threaded PIL rounds, with the spread and host load
  average recorded alongside (round-2's best-of-3 swung 72-232
  canvases/sec across a single morning). If the live baseline fails its
  own contention gates after retries, the multiplier instead uses the
  committed quiet-host reference history and the JSON says so
  (``vs_baseline_source``).

Degraded-tunnel survival (VERDICT r4 item 1 — the round-4 headline was
lost to a 0.0 error record when a 300 s fixed upload deadline met a
~9 s-first-transfer/64 MB/s tunnel):

* after backend init the worker runs a small bounded TRANSFER probe and
  classifies the tunnel (healthy / degraded); transfer-heavy phase
  deadlines scale with the measured first-transfer latency and
  bandwidth, and the classification rides the JSON (``tunnel_state``);
* the default entry point is a thin SUPERVISOR (no JAX in-process) that
  runs the measurement in a worker subprocess; on a watchdog stall or
  any nonzero-value outcome it retries ONCE PER RUNG in a fresh process
  at a reduced batch (768 -> 256 -> 64), waiting between attempts so
  the dead worker's tunnel session can settle (fresh-process backend
  init while the device is busy is a known wedge mode). The final JSON
  carries ``batch_demoted_from`` + ``supervisor_attempts``; if every
  rung fails, the error line includes the committed
  ``last_known_good`` record so the driver never sees a bare 0.0;
* the pinned quiet-host PIL reference is no longer a frozen constant:
  a committed rolling history (``benchmarks/pil_quiet_history.json``)
  is refreshed whenever a live baseline passes its own gates on TPU,
  and the pinned fallback refuses entries older than
  ``PIN_MAX_AGE_DAYS`` or from a different host (VERDICT r4 item 5 +
  advisor note on host identity).

Prints exactly ONE JSON line to stdout; diagnostics go to stderr.
Usage: python bench.py [--batch 448] [--reps 20] [--sweep]
"""

from __future__ import annotations

import argparse
import datetime as _dt
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.resolve()
sys.path.insert(0, str(REPO))

METRIC = "composited 1080p canvases/sec/chip"

#: rolling quiet-host PIL reference history (newest first), refreshed by
#: any TPU run whose live baseline passes the contention gates
HISTORY_PATH = REPO / "benchmarks" / "pil_quiet_history.json"
#: last driver-grade successful headline (written by the supervisor on a
#: TPU success; quoted in the error line when every retry rung fails)
LAST_GOOD_PATH = REPO / "benchmarks" / "last_good_bench.json"
#: a pinned quiet-host entry older than this is REFUSED as the
#: vs_baseline denominator (host/Pillow conditions drift; VERDICT r4
#: item 5) — the run then publishes the live contended measurement with
#: an explicit source flag instead of a stale clean-looking multiplier
PIN_MAX_AGE_DAYS = 3

# Protocol-clean PIL reference of last resort, used ONLY if the committed
# history file is missing (e.g. a stripped checkout). Provenance:
# benchmarks/hw_refresh_r03.md run A, median-of-5 single-threaded rounds,
# spread 0.066, loadavg 0.13. Host identity recorded so a different
# machine never silently divides by this host's Pillow throughput.
PINNED_QUIET_PIL = {
    "date_utc": "2026-08-19",
    "median_canvases_per_sec": 288.91,
    "source": "benchmarks/hw_refresh_r03.md run A (2026-08-19)",
    "spread_vs_median": 0.066,
    "loadavg_1m": 0.13,
    "host": {"hostname": "vm", "cpu": "Intel(R) Xeon(R) Processor @ 2.10GHz"},
}


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def host_identity() -> dict:
    """Hostname + CPU model: the identity a quiet-host PIL number is
    only valid on (advisor r4: nothing detected a host mismatch)."""
    import platform as _pf

    cpu = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    cpu = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return {"hostname": _pf.node(), "cpu": cpu}


# ---------------------------------------------------------------------------
# Tunnel classification + batch demotion (pure; unit-tested in
# tests/test_bench_supervisor.py)


def classify_tunnel(first_transfer_s: float, round_trip_mbps: float):
    """(state, deadline_scale) from a bounded transfer probe.

    Healthy reference points: quiet tunnel first 1 MB round trip well
    under 1 s, hundreds of MB/s. The round-4 loss was ~9 s / ~64 MB/s —
    that day classifies degraded with scale 8 (upload deadline 300 ->
    2400 s, which the observed 125.7 s upload rides out comfortably).
    """
    scale = max(
        1.0, first_transfer_s / 1.0, 192.0 / max(round_trip_mbps, 1e-3)
    )
    scale = min(8.0, scale)
    # the state label and the scale must agree: consumers key on
    # tunnel_state.state, and "healthy with scaled deadlines" is a
    # contradiction (review r5) — any scaling IS the degraded call
    state = "healthy" if scale <= 1.0 else "degraded"
    return state, round(scale, 2)


def demotion_ladder(batch: int) -> list:
    """Fresh-process retry rungs: the requested batch TWICE, then the
    reduced fallbacks. The same-batch retry is the r5 pilot lesson: the
    observed stalls are tunnel WINDOWS (a wedged first transfer that
    clears once the stuck process dies and the session settles), not
    batch-size limits — the pilot's 768 attempt stalled in tunnel_probe,
    yet the demoted 256 retry completed at 27.4k/s and a 768 run minutes
    later hit 36.9k/s. One settle-then-same-batch retry recovers the
    full headline in that case; the reduced rungs (a degraded tunnel
    that stalls a 768-batch upload still completed batch 64 the same
    day — VERDICT r4) remain the hard fallback. 768 (the r2-r4 default,
    proven across every round) cushions the drop from the 1280 default
    before the deep rungs."""
    return [batch, batch] + [b for b in (768, 256, 64) if b < batch]


# ---------------------------------------------------------------------------
# Quiet-host PIL reference history (pure selection logic + file I/O)


def load_quiet_history() -> list:
    """Newest-first quiet-host entries; falls back to the baked constant
    if the committed file is missing/unreadable."""
    try:
        data = json.loads(HISTORY_PATH.read_text())
        entries = list(data.get("entries", []))
        if entries:
            return entries
    except (OSError, ValueError):
        pass
    return [dict(PINNED_QUIET_PIL)]


def select_quiet_pin(entries: list, host: dict, today: _dt.date):
    """HIGHEST-median same-host entry within PIN_MAX_AGE_DAYS, or
    (None, reason).

    Highest, not newest: the quiet reference means "what PIL achieves on
    this host at its demonstrated best", and a fresher-but-depressed
    reading must never lower it — a gate-passing live leg measured
    169.68 canvases/sec at loadavg 0.14 on a host whose same-window best
    is 288.91 (VM steal / frequency throttle are invisible to loadavg),
    and selecting it as the reference inflated the published multiplier
    219x vs the honest 129x. Transport-style reasoning applies:
    interference can only LOWER a PIL measurement, so max-over-window
    converges to the true quiet throughput from below.

    Freshness gates CORROBORATION, not the max (review r5): requiring
    the selected entry itself to be <= PIN_MAX_AGE_DAYS old would let
    the window-best age out and hand the reference to a fresher
    DEPRESSED entry — the exact inflation this function exists to
    prevent. Instead, at least one fresh same-host entry must exist
    (proof the host is alive and recently measured under the gates);
    given that, the reference is the max over ALL same-host entries
    regardless of age — an older HIGHER reading is strictly
    conservative as a denominator, because interference only lowers a
    PIL measurement and hosts do not get faster with age.

    Refusal reasons are published verbatim (``quiet_ref`` in the JSON)
    so an expired/foreign pin is a visible condition, not a silent one.
    """
    reason = "no quiet-host reference entries"
    best, best_age = None, None
    freshest_age = None
    for e in entries:
        eh = e.get("host") or {}
        if eh.get("hostname") != host.get("hostname"):
            reason = (
                f"pin host {eh.get('hostname')!r} != current host "
                f"{host.get('hostname')!r}"
            )
            continue
        try:
            age = (today - _dt.date.fromisoformat(e["date_utc"])).days
        except (KeyError, ValueError):
            reason = "pin entry missing a parseable date_utc"
            continue
        if freshest_age is None or age < freshest_age:
            freshest_age = age
        if best is None or (
            e["median_canvases_per_sec"] > best["median_canvases_per_sec"]
        ):
            best, best_age = e, age
    if best is not None:
        if freshest_age > PIN_MAX_AGE_DAYS:
            return None, (
                f"newest same-host pin is {freshest_age} days old "
                f"(max {PIN_MAX_AGE_DAYS} without revalidation)"
            )
        return best, best_age
    return None, reason


def record_quiet_entry(
    entries: list, median: float, protocol: dict, host: dict, today: _dt.date
) -> list:
    """Prepend today's gate-passing quiet measurement (keeping the HIGHER
    median for the same host+date — conservative: a higher denominator
    means a smaller multiplier) and persist the rolling window."""
    entry = {
        "date_utc": today.isoformat(),
        "median_canvases_per_sec": protocol["median_canvases_per_sec"],
        "source": "bench.py live baseline (gates passed)",
        "spread_vs_median": protocol["spread_vs_median"],
        "loadavg_1m": protocol["loadavg_1m"],
        "host": host,
    }
    same = [
        e for e in entries
        if e.get("date_utc") == entry["date_utc"]
        and (e.get("host") or {}).get("hostname") == host.get("hostname")
    ]
    if same and same[0]["median_canvases_per_sec"] >= median:
        return entries  # today's record already at least as conservative
    entries = [e for e in entries if e not in same]
    entries.insert(0, entry)
    if len(entries) > 6:
        # never evict the rolling window's best median: it IS the quiet
        # reference (select_quiet_pin is max-over-window), and a run of
        # depressed-host days must not age it out of the window
        keep = entries[:6]
        best = max(
            entries, key=lambda e: e.get("median_canvases_per_sec", 0.0)
        )
        if best not in keep:
            keep[-1] = best
        entries = keep
    try:
        tmp = HISTORY_PATH.with_suffix(".tmp")
        tmp.write_text(json.dumps({"entries": entries}, indent=1) + "\n")
        tmp.replace(HISTORY_PATH)
    except OSError as e:  # noqa: BLE001 - persistence must not cost the run
        log(f"quiet-history write failed ({e!r}); continuing")
    return entries


def emit_error_line(reason: str, extra: dict | None = None, code: int = 2) -> None:
    """The one honest JSON line for any failure mode, then hard exit
    (os._exit skips atexit/stdio flushing, so flush explicitly — stdout
    is block-buffered when redirected to a file, the hw_refresh.sh case)."""
    payload = {
        "metric": METRIC,
        "value": 0.0,
        "unit": "canvases/sec",
        "vs_baseline": 0.0,
        "error": reason,
    }
    if extra:
        payload.update(extra)
    print(json.dumps(payload), flush=True)
    os._exit(code)


def pil_baseline_canvases_per_sec(
    bundle, boxes_per_canvas, canvas_hw, n_canvases=8, rounds=5
):
    """Pinned-protocol PIL reference throughput: median of ``rounds``
    single-threaded rounds after one warm round, with the spread and the
    host load average recorded so a noisy ratio is visible as noisy
    (VERDICT r2 item 2: best-of-3 measured 72-232 canvases/sec on the
    same host within hours)."""
    from PIL import Image

    H, W = canvas_hw
    bg = Image.new("RGBA", (W, H), (128, 128, 128, 255))
    ids = bundle.object_ids()

    def one_round() -> float:
        t0 = time.perf_counter()
        for i in range(n_canvases):
            canvas = bg.copy()
            boxes = boxes_per_canvas[i % len(boxes_per_canvas)]
            for k, oid in enumerate(ids):
                x1, y1, x2, y2 = (int(v) for v in boxes[k])
                w, h = max(1, x2 - x1), max(1, y2 - y1)
                canvas.alpha_composite(
                    bundle.objects[oid].resize((w, h), Image.LANCZOS), dest=(x1, y1)
                )
        return n_canvases / (time.perf_counter() - t0)

    one_round()  # warm caches
    load_before = os.getloadavg()
    rates = sorted(one_round() for _ in range(max(1, rounds)))
    median = rates[len(rates) // 2]
    protocol = {
        "rounds": len(rates),
        "canvases_per_round": n_canvases,
        "median_canvases_per_sec": round(median, 2),
        "min": round(rates[0], 2),
        "max": round(rates[-1], 2),
        "spread_vs_median": round((rates[-1] - rates[0]) / median, 3),
        "loadavg_1m": round(load_before[0], 2),
        "loadavg_5m": round(load_before[1], 2),
    }
    return median, protocol


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    # Batch sweep on v5e with the framebuffer-reuse pipelined kernel.
    # Round 2 plateaued at 448 (28.4k) because batch 512 hit the smem
    # meta-table wall; the scalar-major layout (round 3) removed it:
    # 29,491 @ 512 -> 29,688 @ 640 -> 30,163 @ 768 -> 30,170 @ 896.
    # 768 adopted: the 896 gain is noise and its two reuse planes cost
    # ~2.5 GB more HBM.
    # 1280 default (r5 batch ladder, benchmarks/batch_ladder.py): the
    # round-3 smem fix removed the 512 wall and round-4 static windows
    # cut HBM/batch 38%, so throughput keeps climbing past the old 768
    # default — single-process interleaved ladder measured 768: 36,776 /
    # 896: 37,062 / 1024: 37,651 / 1280: 38,099 / 1536: 38,231
    # canvases/sec (plateau; 1536's 12.7 GB plane is too close to HBM
    # for the fresh/reuse swap). Full supervisor run at 1280: 37,957.
    parser.add_argument("--batch", type=int, default=1280)
    parser.add_argument("--reps", type=int, default=20)
    parser.add_argument("--pil-canvases", type=int, default=8)
    parser.add_argument("--pil-rounds", type=int, default=5)
    parser.add_argument("--sweep", action="store_true", help="also run the 4-ratio sweep")
    parser.add_argument(
        "--profile", default=None, metavar="DIR",
        help=(
            "capture a jax.profiler trace of the timed reps into DIR "
            "(works over the dev tunnel; analyze with "
            "benchmarks/analyze_trace.py DIR)"
        ),
    )
    parser.add_argument(
        "--superbatch", type=int, default=0, metavar="K",
        help=(
            "also measure the cross-dispatch-pipelined path: K box-batches "
            "scanned inside ONE device program (amortizes the per-dispatch "
            "host/tunnel gap K-fold; per-batch stats prove execution)"
        ),
    )
    parser.add_argument(
        "--kernel", choices=["xla", "pallas"], default="pallas",
        help=(
            "compose path: packed-u32 Pallas blend (default; ~15%% faster, "
            "falls back to XLA automatically on kernel failure) or the XLA "
            "windowed path"
        ),
    )
    parser.add_argument(
        "--_worker", action="store_true", help=argparse.SUPPRESS
    )
    return parser


# ---------------------------------------------------------------------------
# Supervisor: fresh-process measurement with reduced-batch retry. No JAX
# is imported on this path — a supervisor that initialized the backend
# would hold a second tunnel session alongside every worker (a known
# wedge mode when one side is mid-compile/dispatch).


def _parse_last_json_line(text: str):
    for line in reversed([ln for ln in text.splitlines() if ln.strip()]):
        try:
            return json.loads(line)
        except ValueError:
            continue
    return None


def _build_worker_cmd(args, batch: int) -> list:
    cmd = [
        sys.executable, str(REPO / "bench.py"), "--_worker",
        "--batch", str(batch), "--reps", str(args.reps),
        "--pil-canvases", str(args.pil_canvases),
        "--pil-rounds", str(args.pil_rounds),
        "--kernel", args.kernel,
    ]
    if args.sweep:
        cmd.append("--sweep")
    if args.profile:
        cmd += ["--profile", args.profile]
    if args.superbatch:
        cmd += ["--superbatch", str(args.superbatch)]
    return cmd


def _default_runner(args, batch: int):
    """Run one worker attempt; returns (rc, stdout_text). Worker stderr
    streams through live; stdout (the one JSON line) is captured. The
    backstop timeout only catches a watchdog that itself died — every
    in-worker phase already has a deadline."""
    import subprocess

    backstop = float(os.environ.get("ITPU_BENCH_ATTEMPT_TIMEOUT_S", "5400"))
    proc = subprocess.Popen(
        _build_worker_cmd(args, batch),
        stdout=subprocess.PIPE, text=True, cwd=str(REPO),
    )
    try:
        out, _ = proc.communicate(timeout=backstop)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, _ = proc.communicate()
        return 124, out or ""
    return proc.returncode, out or ""


def _read_last_good():
    try:
        return json.loads(LAST_GOOD_PATH.read_text())
    except (OSError, ValueError):
        return None


def _write_last_good(payload: dict) -> None:
    if payload.get("platform") != "tpu":
        return  # CPU smoke runs must not masquerade as a hardware record
    record = {
        "date_utc": _dt.datetime.now(_dt.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "value": payload.get("value"),
        "unit": payload.get("unit"),
        "batch": payload.get("batch"),
        "vs_baseline_quiet_ref": payload.get("vs_baseline_quiet_ref"),
        "kernel_flags": payload.get("kernel_flags"),
        "tunnel_state": payload.get("tunnel_state"),
    }
    try:
        tmp = LAST_GOOD_PATH.with_suffix(".tmp")
        tmp.write_text(json.dumps(record, indent=1) + "\n")
        tmp.replace(LAST_GOOD_PATH)
    except OSError as e:  # noqa: BLE001 - persistence must not cost the run
        log(f"last-good write failed ({e!r}); continuing")


def supervise(args, runner=_default_runner) -> int:
    """Run the worker down the demotion ladder until one rung produces a
    nonzero headline; print exactly ONE JSON line either way."""
    attempts = []
    for i, batch in enumerate(demotion_ladder(args.batch)):
        if i:
            settle = float(os.environ.get("ITPU_BENCH_RETRY_SLEEP_S", "15"))
            log(
                f"supervisor: retrying in a fresh process at batch {batch} "
                f"(settling {settle:.0f}s first — the dead worker's tunnel "
                f"session must wind down before a new backend init)"
            )
            time.sleep(settle)
        rc, out = runner(args, batch)
        payload = _parse_last_json_line(out)
        if payload and payload.get("value", 0) > 0:
            if attempts:
                # a same-batch retry that succeeds is a recovery, not a
                # demotion — only claim demoted when the batch shrank
                if batch < args.batch:
                    payload["batch_demoted_from"] = args.batch
                payload["supervisor_attempts"] = attempts
            print(json.dumps(payload), flush=True)
            _write_last_good(payload)
            return 0
        attempt = {
            "batch": batch,
            "rc": rc,
            "error": (payload or {}).get("error")
            or f"worker exit {rc} with no parseable JSON line",
        }
        for carry in ("watchdog", "tunnel_state"):
            if payload and payload.get(carry):
                attempt[carry] = payload[carry]
        attempts.append(attempt)
        log(f"supervisor: batch {batch} attempt failed (rc {rc}): "
            f"{attempt['error']}")
    final = {
        "metric": METRIC,
        "value": 0.0,
        "unit": "canvases/sec",
        "vs_baseline": 0.0,
        "error": attempts[-1]["error"],
        "supervisor_attempts": attempts,
    }
    last_good = _read_last_good()
    if last_good:
        final["last_known_good"] = last_good
    print(json.dumps(final), flush=True)
    return attempts[-1]["rc"] or 3


def main() -> None:
    args = build_parser().parse_args()

    from image_transformation_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.core.watchdog import PhaseWatchdog
    from image_transformation_tpu.ops import roofline
    from image_transformation_tpu.parallel.sweep import (
        make_batched_compose,
        make_solid_render_step,
        random_downscale_boxes,
        throughput_sweep,
    )

    # Bounded backend init: a wedged device tunnel hangs jax.devices()
    # FOREVER (observed: the remote server died mid-round and every
    # backend init blocked in make_c_api_client). Probe in a daemon
    # thread so an unreachable device yields one honest JSON error line
    # instead of a silent hang the driver can only kill. 900 s default
    # comfortably covers the observed 151 s cold-process warmup.
    import threading

    _ready = threading.Event()
    _dev_cell: list = []
    _probe_err: list = []

    def _probe_devices() -> None:
        # _ready must be set on BOTH outcomes: a fast-failing backend init
        # (connection refused) otherwise leaves the main thread waiting the
        # full timeout and reporting a misleading "did not complete".
        try:
            _dev_cell.append(jax.devices())
        except BaseException as e:  # noqa: BLE001 - reported below
            _probe_err.append(f"{type(e).__name__}: {e}")
        finally:
            _ready.set()

    threading.Thread(target=_probe_devices, daemon=True).start()
    timeout_s = float(os.environ.get("ITPU_BACKEND_INIT_TIMEOUT_S", "900"))
    if not _ready.wait(timeout=timeout_s) or not _dev_cell:
        reason = (
            _probe_err[0]
            if _probe_err
            else (
                f"device backend init did not complete within "
                f"{timeout_s:.0f}s (unreachable tunnel?)"
            )
        )
        emit_error_line(reason)

    devices = _dev_cell[0]
    log(f"devices: {devices}")
    device_kind = getattr(devices[0], "device_kind", "") or ""
    on_tpu = devices[0].platform == "tpu"

    bundle = load_bundle(REPO / "data" / "squarespace")
    arrays = bundle.to_arrays()
    H, W = 1080, 1920
    B = args.batch
    N = arrays.objects.shape[0]
    pad_h, pad_w = arrays.objects.shape[1], arrays.objects.shape[2]

    # --- phase watchdog (VERDICT r2 item 1): every device phase below
    # runs under a deadline; a stall emits the JSON line naming the phase
    # plus the live-HBM model for this batch, then exits before any outer
    # `timeout` SIGKILL. Deadlines are TPU-tuned; CPU (the smoke test,
    # full fallback-chain compiles under CI contention) gets 4x; scale
    # with ITPU_BENCH_DEADLINE_SCALE. Transfer-heavy phases additionally
    # scale with the tunnel probe below (VERDICT r4 item 1).
    scale = float(os.environ.get("ITPU_BENCH_DEADLINE_SCALE", "1"))
    if not on_tpu:
        scale *= 4.0
    DL = {
        "tunnel_probe": 300, "data_prep": 300, "upload": 300, "trace": 300,
        "compile": 900, "first_execute": 420, "warmup_reuse": 300,
        "timed_loop": max(300, args.reps * 10),
        "superbatch_first": 900,
        "superbatch_timed": max(300, args.reps * 10),
        "pil_baseline": 900, "sweep": 2400,
    }

    live_model = roofline.expected_live_hbm_bytes(
        B, N, (H, W), (pad_h, pad_w), shared_objs=(args.kernel == "pallas")
    )
    mem_stats = {}
    try:
        ms = devices[0].memory_stats() or {}
        mem_stats = {
            k: ms[k] for k in ("bytes_limit", "bytes_in_use") if k in ms
        }
    except Exception:  # noqa: BLE001 - not all backends expose this
        pass

    def on_stall(payload: dict) -> None:
        emit_error_line(
            f"stalled in phase '{payload.get('stalled_phase')}' after "
            f"{payload.get('elapsed_s')}s (deadline {payload.get('deadline_s')}s)",
            extra={"watchdog": payload},
            code=3,
        )

    wd = PhaseWatchdog(
        on_stall,
        context={
            "batch": B,
            "kernel": args.kernel,
            "expected_live_hbm_bytes": {
                k: round(v) if isinstance(v, float) else v
                for k, v in live_model.items()
            },
            "device_memory_stats": mem_stats,
            "device_kind": device_kind,
        },
        exit_code=3,
    )

    def phase(name: str) -> None:
        wd.phase(name, DL[name] * scale)

    # --- bounded transfer probe (VERDICT r4 item 1): classify the tunnel
    # BEFORE committing to fixed deadlines. Pure device_put + full host
    # readback — no compile on this path, so it measures transport alone.
    # A probe hang is itself caught by the watchdog (honest "tunnel_probe"
    # stall line) and the supervisor's fresh-process retry takes over.
    phase("tunnel_probe")
    t0 = time.perf_counter()
    x = jax.device_put(np.zeros((1 << 20,), np.uint8))
    np.asarray(x)
    first_s = time.perf_counter() - t0
    mbps = 2.0 / max(first_s, 1e-9)  # 1 MB each way
    if first_s < 30.0:
        t0 = time.perf_counter()
        x = jax.device_put(np.zeros((16 << 20,), np.uint8))
        np.asarray(x)
        mbps = 32.0 / max(time.perf_counter() - t0, 1e-9)
    x = None
    state, tscale = classify_tunnel(first_s, mbps)
    tunnel = {
        "state": state,
        "first_transfer_s": round(first_s, 3),
        "round_trip_mbps": round(mbps, 1),
        "deadline_scale": tscale,
    }
    log(f"tunnel probe: {tunnel}")
    if tscale > 1.0:
        for k in ("upload", "trace", "compile", "first_execute",
                  "warmup_reuse", "superbatch_first"):
            DL[k] = DL[k] * tscale
        log(
            f"tunnel degraded: transfer/compile deadlines scaled x{tscale} "
            f"(upload now {DL['upload'] * scale:.0f}s)"
        )
    wd.update_context(tunnel_state=tunnel)

    phase("data_prep")
    rng = np.random.default_rng(0)
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    # per-object static asset sizes: specializes the kernel's resample dots
    # to each object's real padded extents (STATUS item 19). Derived ONCE so
    # the headline and superbatch paths always compile against the same
    # static upper-bound contract.
    static_hw = tuple(tuple(int(v) for v in row) for row in arrays.obj_hw)

    bg_rgba = (128, 128, 128, 255)
    phase("upload")
    if args.kernel == "pallas":
        from image_transformation_tpu.ops.compose_pallas import planarize_objects

        # ONE shared planar copy: the kernel reads object row 0 for every
        # canvas (STATUS item 24) — B-fold duplication dropped from both
        # host RAM and HBM (~3.7 GB at batch 448). The factory's fallback
        # tiers broadcast it (and synthesize the solid background) on
        # device themselves, so no host canvas batch exists at all.
        objs_dev = jnp.asarray(
            np.asarray(planarize_objects(jnp.asarray(arrays.objects[None])))
        )
        step = make_solid_render_step(
            (H, W), (pad_h, pad_w), bg_rgba=bg_rgba, static_obj_hw=static_hw,
            stat="fence", fallback_mode="tiered",
        )
        release_reuse = step.release
        dev_args = (None, objs_dev, jnp.asarray(hw), jnp.asarray(boxes))
        # AOT-split the first dispatch so the watchdog can tell a compile
        # stall from an allocation/execution hang (the batch-512 case)
        step.precompile(*dev_args[1:], on_phase=phase)
    else:
        canvases = np.zeros((B, H, W, 4), np.uint8)
        canvases[..., :3] = 128
        canvases[..., 3] = 255
        objs_b = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
        step = make_batched_compose((pad_h, pad_w))
        release_reuse = lambda: None  # noqa: E731 - XLA path retains no plane
        dev_args = tuple(jnp.asarray(x) for x in (canvases, objs_b, hw, boxes))

    def fence(x):
        # block_until_ready does not reliably synchronize on the tunneled
        # platform; a tiny host readback is a true execution fence (the
        # device stream is in-order, so fencing the last call fences all).
        np.asarray(x)

    log("compiling + warmup ...")
    phase("first_execute")
    t0 = time.perf_counter()
    out, stat = step(*dev_args)
    fence(stat)
    log(f"first call (incl. any lazy compile): {time.perf_counter() - t0:.1f}s")
    # second warmup: runs the framebuffer-reuse program (the steady state
    # of the timed loop on the pallas path)
    phase("warmup_reuse")
    out, stat = step(*dev_args)
    fence(stat)

    import contextlib

    profile_cm = (
        jax.profiler.trace(args.profile) if args.profile else contextlib.nullcontext()
    )
    phase("timed_loop")
    with profile_cm:
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out, stat = step(*dev_args)
        fence(stat)
        dt = time.perf_counter() - t0
    ours = B * args.reps / dt
    log(f"tpu: {ours:.1f} canvases/sec ({dt / args.reps * 1e3:.1f} ms/batch of {B})")

    fast_path_held = args.kernel == "pallas" and getattr(
        step, "fallback", [None]
    )[0] is None

    # HBM roofline (VERDICT r2 item 2): model bytes the steady-state
    # reuse dispatch moves, achieved GB/s over the timed loop, and
    # utilization vs the chip's public peak. Only claimed when the gen-3
    # fast path actually served the loop — a latched fallback moves
    # different bytes and must not borrow the model.
    roof = None
    compute_roof = None
    if fast_path_held:
        from image_transformation_tpu.ops import compose_pallas as _cp

        bytes_model = roofline.solid_render_bytes_per_batch(
            B, N, (H, W), (pad_h, pad_w), static_obj_hw=static_hw,
            shared_objs=True, reuse=True, stat="fence",
            # mirror the kernel the loop actually ran: the render programs
            # resolve static_windows=None to the module flag (STATUS 30)
            static_windows=_cp.STATIC_WINDOWS,
        )
        roof = roofline.summarize(bytes_model, args.reps / dt, device_kind)
        log(
            f"roofline: {roof['achieved_gbps']} GB/s of HBM-model traffic"
            + (
                f" = {roof['hbm_utilization'] * 100:.1f}% of {device_kind} peak"
                if roof["hbm_utilization"] is not None
                else f" (unknown peak for {device_kind!r})"
            )
        )
        # Compute-side roofline (VERDICT r3 item 2): model MXU MACs and
        # VPU ops from the kernel's own stage functions over the REALIZED
        # boxes, and report each unit's speed-of-light time against the
        # measured wall — the falsifiable compute floor next to the HBM
        # line. Model failure must not cost the headline JSON.
        try:
            from image_transformation_tpu.ops import (
                compose_pallas,
                roofline_compute,
            )

            work = roofline_compute.solid_render_compute_per_batch(
                arrays.obj_hw, boxes, (H, W), (pad_h, pad_w),
                static_obj_hw=static_hw,
            )
            compute_roof = roofline_compute.summarize_compute(
                work, args.reps / dt, device_kind,
                int8=compose_pallas.INT8_DOTS,
                hbm_bytes_per_batch=bytes_model["total_bytes"],
            )
            log(
                "compute roofline: "
                f"mxu {compute_roof['mxu_sol_ms']} ms SOL "
                f"({compute_roof['mxu_utilization']}), "
                f"vpu {compute_roof['vpu_sol_ms']} ms SOL "
                f"({compute_roof['vpu_utilization']}), "
                f"binding={compute_roof.get('binding_unit')}, "
                f"sol_fraction={compute_roof.get('compute_sol_fraction')}"
            )
        except Exception as e:  # noqa: BLE001 - diagnostics only
            log(f"compute roofline model unavailable: {e!r}")

    # Drop the retained framebuffer-reuse plane (~4 GB at batch 448) before
    # the superbatch/sweep phases allocate their own planes — otherwise it
    # rides along as dead HBM and pushes peak usage toward the batch-512
    # resource wall.
    out = stat = None
    release_reuse()

    pipelined = None
    if args.superbatch > 1 and args.kernel == "pallas":
        # Cross-dispatch pipelining: scan K box-batches inside ONE program.
        # The per-batch data is only the boxes ([K, B, N, 4] int32 — a few
        # KB); the object tensor is shared and the background synthesizes
        # on device, so one dispatch composes K*B canvases and the
        # ~1.7 ms/dispatch tunnel gap amortizes K-fold. Each scan step
        # returns a per-batch stat, so every batch provably executed; the
        # composed frames are consumed on device (same consumption
        # semantics as the headline loop, which never reads frames back).
        import functools

        from image_transformation_tpu.ops.compose_pallas import (
            fused_canvas_pad_hw,
            pack_rgba_scalar,
            render_solid_fused_v3_reuse_program,
        )

        K = args.superbatch
        bg_packed = pack_rgba_scalar(bg_rgba)
        boxes_k = np.stack([
            np.stack([
                random_downscale_boxes(rng, arrays.obj_hw, (H, W))
                for _ in range(B)
            ])
            for _ in range(K)
        ])

        @functools.partial(jax.jit, donate_argnums=(0,))
        def super_step(plane, o, h_, bk):
            # framebuffer reuse across scan steps AND dispatches: one live
            # plane, window-restore between steps (restoring a solid plane
            # with any window set is a no-op, so the init boxes are free)
            def body(carry, b):
                prev, pb = carry
                out = render_solid_fused_v3_reuse_program(
                    prev, pb, o, h_, b, (H, W), bg_packed,
                    static_obj_hw=static_hw, pipelined=True,
                )
                return (out, b), jnp.sum(out[:, 0, :128], axis=1)
            (plane, _), stats = jax.lax.scan(body, (plane, bk[-1]), bk)
            return plane, stats

        try:
            phase("superbatch_first")
            hp, wp = fused_canvas_pad_hw((H, W), (pad_h, pad_w))
            plane = jnp.full((B, hp, wp), jnp.int32(bg_packed), jnp.int32)
            sb_args = (dev_args[1], dev_args[2], jnp.asarray(boxes_k))
            t0 = time.perf_counter()
            plane, stats = super_step(plane, *sb_args)
            fence(stats)
            log(f"superbatch first call (incl. compile): "
                f"{time.perf_counter() - t0:.1f}s")
            sb_reps = max(1, args.reps // K)
            phase("superbatch_timed")
            t0 = time.perf_counter()
            for _ in range(sb_reps):
                plane, stats = super_step(plane, *sb_args)
            fence(stats)
            dt_sb = time.perf_counter() - t0
            pipelined = K * B * sb_reps / dt_sb
            log(
                f"tpu pipelined (K={K} batches/dispatch): "
                f"{pipelined:.1f} canvases/sec "
                f"({dt_sb / sb_reps * 1e3:.1f} ms per {K}-batch dispatch)"
            )
            # drop the scan's retained plane (~4 GB at batch 448) before
            # the PIL-baseline and sweep phases — same dead-HBM concern
            # the headline path's step.release() addresses
            plane = stats = sb_args = None
        except Exception as e:  # noqa: BLE001 - diagnostic path only
            log(f"superbatch path failed ({e!r}); skipping")

    log("measuring PIL reference baseline ...")
    phase("pil_baseline")
    # Contention gate (VERDICT r3 item 4): a noisy/loaded host deflates
    # the PIL baseline and inflates vs_baseline (r3 shipped 188x off a
    # loadavg-2.31 baseline; quiet-host truth was ~120-135x). Retry a
    # few times for a protocol-clean round; if the gates still trip,
    # FLAG the multiplier as contended in the JSON instead of publishing
    # it as clean.
    contended = True
    for attempt in range(3):
        pil, pil_protocol = pil_baseline_canvases_per_sec(
            bundle, boxes, (H, W),
            n_canvases=args.pil_canvases, rounds=args.pil_rounds,
        )
        # The 5-minute average catches a recently-busy host that the
        # 1-minute one already forgave: observed post-suite legs with
        # loadavg_1m 0.4/0.49 measuring PIL at 168-216 canvases/sec vs
        # the true-idle 259-289 — 25% cross-run swing inside the old gate.
        contended = (
            pil_protocol["spread_vs_median"] > 0.15
            or pil_protocol["loadavg_1m"] > 0.5
            or pil_protocol["loadavg_5m"] > 0.5
        )
        if not contended:
            break
        log(
            f"pil baseline contended (spread "
            f"{pil_protocol['spread_vs_median']}, loadavg "
            f"{pil_protocol['loadavg_1m']}); retry {attempt + 1}/2"
        )
        time.sleep(5)
    pil_protocol["contended"] = contended
    log(f"pil reference: {pil:.2f} canvases/sec (protocol {pil_protocol})")

    # Quiet-host reference resolution (VERDICT r4 item 5): the pinned
    # fallback is a committed rolling history with an age + host-identity
    # contract, refreshed by every gate-passing TPU run, never a frozen
    # constant. A clean live baseline both refreshes the history and
    # serves as its own quiet reference.
    host = host_identity()
    today = _dt.datetime.now(_dt.timezone.utc).date()
    entries = load_quiet_history()
    if not contended and on_tpu:
        entries = record_quiet_entry(entries, pil, pil_protocol, host, today)
    quiet_pin, pin_or_reason = select_quiet_pin(entries, host, today)

    vs_baseline_source = "live"
    if not contended and quiet_pin is not None and pil < 0.75 * quiet_pin[
        "median_canvases_per_sec"
    ]:
        # Below-band: the live leg passed the loadavg/spread gates yet
        # sits far under the host's demonstrated quiet throughput —
        # VM steal / frequency throttling the gates cannot see (observed
        # 169.68 at loadavg 0.14 vs a 288.91 window best). Publishing
        # the live denominator would inflate the multiplier; use the
        # quiet reference and say so. The live reading stays in
        # baseline_protocol (and in the history, where max-selection
        # ignores it).
        pil_protocol["below_band"] = True
        pil = quiet_pin["median_canvases_per_sec"]
        vs_baseline_source = "pinned_quiet_host_band"
        log(
            f"pil baseline below the quiet band "
            f"({pil_protocol['median_canvases_per_sec']:.2f} vs window best "
            f"{pil:.2f}); vs_baseline uses the quiet reference"
        )
    if contended:
        if quiet_pin is not None:
            # Denominator failed its own gates after retries: fall back to
            # the committed quiet-host reference so the published
            # multiplier is never inflated by host load. The live
            # (contended) measurement stays in baseline_protocol.
            pil = quiet_pin["median_canvases_per_sec"]
            vs_baseline_source = "pinned_quiet_host"
            pil_protocol["pinned_reference"] = quiet_pin
            pil_protocol["pinned_age_days"] = pin_or_reason
            log(
                f"pil baseline still contended after retries; vs_baseline "
                f"uses pinned quiet-host reference {pil:.2f} canvases/sec "
                f"({quiet_pin.get('source')}, age {pin_or_reason}d)"
            )
        else:
            # Pin refused (stale or foreign host): publishing it would be
            # a clean-looking multiplier off unverifiable conditions.
            # Publish the live contended number with the source flagged.
            vs_baseline_source = "live_contended_pin_invalid"
            pil_protocol["pin_refused"] = pin_or_reason
            log(
                f"pil baseline contended AND quiet pin refused "
                f"({pin_or_reason}); vs_baseline uses the live contended "
                f"measurement, flagged"
            )

    if args.sweep:
        phase("sweep")
        sweep = throughput_sweep(
            [bundle, load_bundle(REPO / "data" / "audio_book")],
            ["9:16", "1:1", "16:9", "4:1"],
            batch_per_ratio=8,
            pixel_budget_size=(3840, 2160),
            kernel=args.kernel,
            superbatch=args.superbatch,  # 2.1x at 4K (see ROADMAP item 2)
        )
        log(f"sweep: {json.dumps(sweep['ratios'])}")

    wd.done()
    payload = {
        "metric": METRIC,
        "value": round(ours, 2),
        "unit": "canvases/sec",
        "batch": B,
        "platform": devices[0].platform,
        "vs_baseline": round(ours / pil, 2),
        "vs_baseline_source": vs_baseline_source,
        "tunnel_state": tunnel,
        "baseline_protocol": pil_protocol,
        "phase_seconds": wd.history(),
    }
    # Always also publish the conservative multiplier against the
    # quiet-host reference when a valid pin exists: the live PIL leg
    # swings 25% with residual host load even inside the gates (168-216
    # canvases/sec observed at loadavg<0.5 vs 259-289 true-idle), and
    # this figure is immune to that.
    if quiet_pin is not None:
        payload["vs_baseline_quiet_ref"] = round(
            ours / quiet_pin["median_canvases_per_sec"], 2
        )
        payload["quiet_ref"] = {
            "median_canvases_per_sec": quiet_pin["median_canvases_per_sec"],
            "date_utc": quiet_pin.get("date_utc"),
            "age_days": pin_or_reason,
            "source": quiet_pin.get("source"),
        }
    else:
        payload["vs_baseline_quiet_ref"] = None
        payload["quiet_ref"] = {"refused": pin_or_reason}
    if args.kernel == "pallas":
        from image_transformation_tpu.ops import compose_pallas as _cp2

        payload["kernel_flags"] = {
            "int8_dots": _cp2.INT8_DOTS,
            "static_windows": _cp2.STATIC_WINDOWS,
        }
    if contended:
        # the multiplier's denominator failed its own protocol gates —
        # publish it only with the caveat attached (VERDICT r3 item 4)
        payload["vs_baseline_contended"] = True
    if roof is not None:
        payload["roofline"] = roof
    if compute_roof is not None:
        payload["roofline_compute"] = compute_roof
    if pipelined:
        payload["pipelined_canvases_per_sec"] = round(pipelined, 2)
        payload["pipelined_vs_baseline"] = round(pipelined / pil, 2)
    print(json.dumps(payload))


if __name__ == "__main__":
    if "--_worker" in sys.argv or os.environ.get("ITPU_BENCH_NO_SUPERVISE"):
        try:
            main()
        except SystemExit:
            raise
        except BaseException as e:  # noqa: BLE001 - driver contract: 1 JSON line
            # the batch-512 probe taught this: a RESOURCE_EXHAUSTED that
            # escapes every fallback tier must still land as one honest JSON
            # line (the full demotion chain is on stderr), not a bare
            # traceback the driver can't parse
            import traceback

            traceback.print_exc(file=sys.stderr)
            emit_error_line(f"{type(e).__name__}: {str(e)[:500]}", code=1)
    else:
        sys.exit(supervise(build_parser().parse_args()))
