"""Unit tests for bench.py's degraded-tunnel survival layer (VERDICT r4
item 1) and the quiet-pin freshness protocol (item 5).

All pure logic + injected-runner supervisor loops — no JAX, no subprocess,
no hardware. The end-to-end path (worker subprocess producing one JSON
line) is covered by tests/test_bench_smoke.py.
"""

import datetime as dt
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402 - path bootstrap above

HOST = {"hostname": "vm", "cpu": "x"}
OTHER = {"hostname": "elsewhere", "cpu": "y"}
TODAY = dt.date(2026, 8, 20)


def _entry(date, median, host=HOST):
    return {
        "date_utc": date,
        "median_canvases_per_sec": median,
        "source": "test",
        "spread_vs_median": 0.05,
        "loadavg_1m": 0.1,
        "host": host,
    }


# --- tunnel classification -------------------------------------------------


def test_healthy_tunnel_keeps_deadlines():
    state, scale = bench.classify_tunnel(0.2, 500.0)
    assert state == "healthy"
    assert scale == 1.0


def test_round4_incident_classifies_degraded_with_max_scale():
    # the r04 loss: ~9 s first transfer, ~64 MB/s — scaled upload
    # deadline must comfortably cover the observed 125.7 s upload
    state, scale = bench.classify_tunnel(9.0, 64.0)
    assert state == "degraded"
    assert scale == 8.0
    assert 300 * scale >= 4 * 125.7


def test_slow_bandwidth_alone_scales():
    state, scale = bench.classify_tunnel(0.5, 48.0)
    assert state == "degraded"
    assert scale == 4.0  # 192/48


def test_demotion_ladder():
    # requested batch twice (tunnel stalls are windows that clear after a
    # settle — the same-batch retry recovers the full headline), then the
    # reduced rungs
    assert bench.demotion_ladder(1280) == [1280, 1280, 768, 256, 64]
    assert bench.demotion_ladder(768) == [768, 768, 256, 64]
    assert bench.demotion_ladder(256) == [256, 256, 64]
    assert bench.demotion_ladder(64) == [64, 64]
    assert bench.demotion_ladder(2) == [2, 2]  # smoke batch: no rungs below


# --- quiet-pin freshness ---------------------------------------------------


def test_pin_fresh_same_host_selected():
    pin, age = bench.select_quiet_pin([_entry("2026-08-19", 288.9)], HOST, TODAY)
    assert pin is not None and age == 1


def test_pin_stale_refused_with_reason():
    entries = [_entry("2026-08-10", 288.9)]
    pin, reason = bench.select_quiet_pin(entries, HOST, TODAY)
    assert pin is None
    assert "10 days old" in reason


def test_pin_foreign_host_refused():
    entries = [_entry("2026-08-20", 288.9, host=OTHER)]
    pin, reason = bench.select_quiet_pin(entries, HOST, TODAY)
    assert pin is None
    assert "elsewhere" in reason


def test_pin_skips_foreign_then_takes_same_host():
    entries = [
        _entry("2026-08-20", 100.0, host=OTHER),
        _entry("2026-08-19", 288.9),
    ]
    pin, age = bench.select_quiet_pin(entries, HOST, TODAY)
    assert pin is not None and pin["median_canvases_per_sec"] == 288.9


def test_pin_old_window_best_survives_with_fresh_corroboration():
    """Freshness gates corroboration, not the max (review r5): once a
    fresh same-host entry exists, the window best serves as the
    reference even past PIN_MAX_AGE_DAYS — an older HIGHER reading is
    strictly conservative (interference only lowers PIL), while handing
    the reference to the fresher depressed entry would re-open the
    inflation path."""
    entries = [
        _entry("2026-08-20", 169.68),  # fresh, depressed
        _entry("2026-08-10", 288.91),  # 10 days old, window best
    ]
    pin, age = bench.select_quiet_pin(entries, HOST, TODAY)
    assert pin["median_canvases_per_sec"] == 288.91
    assert age == 10
    # but with NO fresh corroboration the old best is refused
    pin2, reason = bench.select_quiet_pin(
        [_entry("2026-08-10", 288.91)], HOST, TODAY
    )
    assert pin2 is None and "10 days old" in reason


def test_pin_selects_window_best_not_newest():
    """A fresher-but-depressed gate-passing reading (VM steal is
    invisible to loadavg: 169.68 measured at loadavg 0.14 on a host
    whose best is 288.91) must not become the quiet reference —
    max-over-window converges to true quiet throughput from below."""
    entries = [
        _entry("2026-08-20", 169.68),  # newest, depressed
        _entry("2026-08-19", 288.91),
        _entry("2026-08-19", 259.6),
    ]
    pin, age = bench.select_quiet_pin(entries, HOST, TODAY)
    assert pin["median_canvases_per_sec"] == 288.91
    assert age == 1


def test_record_quiet_entry_trim_never_evicts_window_best(
    tmp_path, monkeypatch
):
    """Six depressed days must not age the window's best median out of
    the rolling history — it IS the quiet reference."""
    monkeypatch.setattr(bench, "HISTORY_PATH", tmp_path / "h.json")
    entries = [_entry("2026-08-19", 288.91)]
    proto = {"median_canvases_per_sec": 170.0, "spread_vs_median": 0.05,
             "loadavg_1m": 0.1}
    for day in range(14, 20):
        e = dict(proto)
        entries = bench.record_quiet_entry(
            entries, 170.0, e, HOST, dt.date(2026, 8, day)
        )
    assert len(entries) <= 6
    assert max(
        x["median_canvases_per_sec"] for x in entries
    ) == 288.91


def test_record_quiet_entry_keeps_higher_same_day(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "HISTORY_PATH", tmp_path / "h.json")
    entries = [_entry("2026-08-20", 288.9)]
    proto = {"median_canvases_per_sec": 250.0, "spread_vs_median": 0.05,
             "loadavg_1m": 0.1}
    out = bench.record_quiet_entry(entries, 250.0, proto, HOST, TODAY)
    # lower same-day median must NOT displace the conservative record
    assert out[0]["median_canvases_per_sec"] == 288.9
    proto2 = dict(proto, median_canvases_per_sec=300.0)
    out = bench.record_quiet_entry(out, 300.0, proto2, HOST, TODAY)
    assert out[0]["median_canvases_per_sec"] == 300.0
    assert (tmp_path / "h.json").exists()
    persisted = json.loads((tmp_path / "h.json").read_text())
    assert persisted["entries"][0]["median_canvases_per_sec"] == 300.0


# --- supervisor loop -------------------------------------------------------


def _args(batch=768):
    return bench.build_parser().parse_args(["--batch", str(batch)])


def _stall_line(batch, phase="upload"):
    return json.dumps({
        "metric": bench.METRIC, "value": 0.0, "unit": "canvases/sec",
        "vs_baseline": 0.0,
        "error": f"stalled in phase '{phase}' after 300.0s (deadline 300.0s)",
        "watchdog": {"stalled_phase": phase, "batch": batch},
        "tunnel_state": {"state": "degraded", "deadline_scale": 8.0},
    })


def _good_line(batch, value=9000.0):
    return json.dumps({
        "metric": bench.METRIC, "value": value, "unit": "canvases/sec",
        "batch": batch, "platform": "cpu", "vs_baseline": 30.0,
    })


def test_supervisor_demotes_after_stall(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", tmp_path / "lg.json")
    monkeypatch.setenv("ITPU_BENCH_RETRY_SLEEP_S", "0")
    calls = []

    def runner(args, batch):
        calls.append(batch)
        if batch == 768:
            return 3, _stall_line(batch) + "\n"
        return 0, _good_line(batch) + "\n"

    rc = bench.supervise(_args(768), runner=runner)
    assert rc == 0
    assert calls == [768, 768, 256]  # same-batch retry first, then demote
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 1  # ONE JSON line contract holds through retries
    payload = json.loads(lines[0])
    assert payload["value"] == 9000.0
    assert payload["batch_demoted_from"] == 768
    assert len(payload["supervisor_attempts"]) == 2
    assert payload["supervisor_attempts"][0]["batch"] == 768
    assert payload["supervisor_attempts"][0]["watchdog"]["stalled_phase"] == "upload"


def test_supervisor_same_batch_recovery_is_not_a_demotion(
    tmp_path, monkeypatch, capsys
):
    """A stall whose same-batch retry succeeds (the tunnel window
    cleared after the settle) reports supervisor_attempts but NOT
    batch_demoted_from — the headline ran at the requested batch."""
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", tmp_path / "lg.json")
    monkeypatch.setenv("ITPU_BENCH_RETRY_SLEEP_S", "0")
    seen = []

    def runner(args, batch):
        seen.append(batch)
        if len(seen) == 1:
            return 3, _stall_line(batch, phase="tunnel_probe") + "\n"
        return 0, _good_line(batch, value=36900.0) + "\n"

    rc = bench.supervise(_args(768), runner=runner)
    assert rc == 0
    assert seen == [768, 768]
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["value"] == 36900.0
    assert "batch_demoted_from" not in payload
    assert len(payload["supervisor_attempts"]) == 1


def test_supervisor_success_first_try_is_unannotated(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", tmp_path / "lg.json")
    rc = bench.supervise(_args(768), runner=lambda a, b: (0, _good_line(b)))
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip())
    assert "batch_demoted_from" not in payload
    assert "supervisor_attempts" not in payload


def test_supervisor_total_failure_quotes_last_known_good(
    tmp_path, monkeypatch, capsys
):
    lg = tmp_path / "lg.json"
    lg.write_text(json.dumps({"value": 36700.0, "date_utc": "2026-08-20"}))
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", lg)
    monkeypatch.setenv("ITPU_BENCH_RETRY_SLEEP_S", "0")
    rc = bench.supervise(_args(768), runner=lambda a, b: (3, _stall_line(b)))
    assert rc == 3
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["value"] == 0.0
    assert len(payload["supervisor_attempts"]) == 4  # 768 x2, 256, 64 (no 768 rung below itself)
    assert payload["last_known_good"]["value"] == 36700.0


def test_supervisor_handles_empty_worker_output(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", tmp_path / "lg.json")
    monkeypatch.setenv("ITPU_BENCH_RETRY_SLEEP_S", "0")
    rc = bench.supervise(_args(64), runner=lambda a, b: (137, ""))
    assert rc == 137
    payload = json.loads(capsys.readouterr().out.strip())
    assert "no parseable JSON" in payload["error"]


def test_last_good_only_written_for_tpu(tmp_path, monkeypatch):
    lg = tmp_path / "lg.json"
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", lg)
    bench._write_last_good({"platform": "cpu", "value": 5.0})
    assert not lg.exists()
    bench._write_last_good({"platform": "tpu", "value": 36700.0, "batch": 768})
    assert json.loads(lg.read_text())["value"] == 36700.0


def test_worker_cmd_forwards_flags():
    args = bench.build_parser().parse_args(
        ["--batch", "768", "--sweep", "--superbatch", "4", "--kernel", "pallas"]
    )
    cmd = bench._build_worker_cmd(args, 256)
    assert "--_worker" in cmd
    assert cmd[cmd.index("--batch") + 1] == "256"
    assert "--sweep" in cmd
    assert cmd[cmd.index("--superbatch") + 1] == "4"
