"""bench.py must survive backends without Mosaic (the driver's contract).

Runs the real benchmark script as a subprocess on CPU with a tiny batch:
the pallas tiers fail, the loud fallback chain latches the XLA path, and
exactly one JSON line lands on stdout.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_bench_falls_back_and_prints_one_json_line():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--batch", "2", "--reps", "1",
         "--pil-canvases", "1"],
        # generous: the CPU fallback chain compiles several programs, and
        # CI shares the host with other suites/benches (observed >600 s
        # under full-host contention)
        capture_output=True, text=True, timeout=1500, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    payload = json.loads(lines[0])
    assert payload["metric"] == "composited 1080p canvases/sec/chip"
    assert payload["value"] > 0
    assert payload["unit"] == "canvases/sec"
    assert payload["vs_baseline"] > 0
    # contention-gated denominator: the payload must say which baseline
    # the multiplier used (live protocol-clean, the committed quiet-host
    # reference when the live one failed its gates, or the flagged live
    # contended number when the pin itself was refused as stale/foreign)
    assert payload["vs_baseline_source"] in (
        "live", "pinned_quiet_host", "pinned_quiet_host_band",
        "live_contended_pin_invalid",
    )
    if payload["vs_baseline_source"] == "pinned_quiet_host":
        assert payload["baseline_protocol"]["contended"] is True
        assert "pinned_reference" in payload["baseline_protocol"]
        # the selected entry may be older than PIN_MAX_AGE_DAYS (the
        # window best persists once fresh corroboration exists — review
        # r5); its age is published for the reader to judge
        assert payload["baseline_protocol"]["pinned_age_days"] >= 0
    # degraded-tunnel survival layer (VERDICT r4 item 1): every run
    # carries the transfer-probe classification
    assert payload["tunnel_state"]["state"] in ("healthy", "degraded")
    assert payload["tunnel_state"]["deadline_scale"] >= 1.0
    assert payload["platform"] == "cpu"
    assert payload["batch"] == 2
