"""Aux subsystems: labels, timing, structured logging, run config."""

import json
import time

from image_transformation_tpu.core.config import RunConfig
from image_transformation_tpu.core.labels import (
    ALLOWED_LABELS,
    compute_per_label_numbers,
    is_allowed_label,
    normalize_label,
)
from image_transformation_tpu.core.logging import RunLogger
from image_transformation_tpu.core.timing import StepTimer


def test_labels_vocabulary_and_numbering():
    assert "photo" in ALLOWED_LABELS and "cta" in ALLOWED_LABELS
    assert normalize_label("  Photo ") == "photo"
    assert is_allowed_label("LOGO")
    assert not is_allowed_label("banner")
    assert compute_per_label_numbers(["photo", "text", "photo"]) == [1, 1, 2]


def test_step_timer_accumulates_and_writes(tmp_path):
    t = StepTimer()
    with t.time_step("a", echo=False):
        time.sleep(0.01)
    with t.time_step("a", echo=False):
        time.sleep(0.01)
    with t.time_step("b", echo=False):
        pass
    assert t.get("a") >= 0.02
    path = tmp_path / "time_log.txt"
    t.write_to_file(str(path))
    lines = path.read_text().splitlines()
    assert lines[0].startswith("a: ") and lines[0].endswith("s")
    assert set(t.summary()) == {"a", "b"}


def test_run_logger_events_jsonl(tmp_path, capsys):
    logger = RunLogger(tmp_path / "events.jsonl")
    logger.log("validate", "something failed", iteration=3)
    logger.event("compose", iteration=3, ms=12.5)
    out = capsys.readouterr().out
    assert "[validate] something failed" in out
    events = [json.loads(l) for l in (tmp_path / "events.jsonl").read_text().splitlines()]
    assert events[0]["tag"] == "validate" and events[0]["iteration"] == 3
    assert events[1]["ms"] == 12.5
    assert "compose" not in out.split("\n")[1] if len(out.split("\n")) > 1 else True


def test_run_config_roundtrip_and_redaction():
    cfg = RunConfig(ratio="9:16", api_key="SECRET", refine_iters=3)
    d = cfg.to_dict()
    assert d["ratio"] == "9:16" and d["refine_iters"] == 3
    assert "api_key" not in d
    # defaults match the reference CLI
    assert cfg.align == "center" and cfg.margin == 0.05
    assert cfg.temperature == 1.0 and cfg.samples == 1


def test_prune_cache_dir_bounds_disk(tmp_path):
    """The persistent compile cache prunes oldest entries to the budget."""
    import os
    import time

    from image_transformation_tpu.core.cache import prune_cache_dir

    for i in range(5):
        p = tmp_path / f"entry_{i}.bin"
        p.write_bytes(b"x" * 100)
        os.utime(p, (time.time() - 1000 + i, time.time() - 1000 + i))
    # budget allows only the 3 newest 100-byte entries
    removed = prune_cache_dir(str(tmp_path), max_bytes=300, force=True)
    assert removed == 2
    left = sorted(p.name for p in tmp_path.iterdir() if p.name.startswith("entry"))
    assert left == ["entry_2.bin", "entry_3.bin", "entry_4.bin"]
    # marker written; a non-forced immediate re-run is a no-op
    assert (tmp_path / ".last_prune").exists()
    assert prune_cache_dir(str(tmp_path), max_bytes=0) == 0
