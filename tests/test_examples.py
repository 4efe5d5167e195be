"""Every script in examples/ runs end-to-end.

The examples are the documented on-ramp (examples/README.md); executing
them in CI keeps the README honest — a renamed helper or changed
signature fails here before a user hits it. Each runs in a subprocess
on the CPU backend (the scripts themselves call honor_platform_env /
force the virtual mesh), mirroring `JAX_PLATFORMS=cpu python examples/NN_*.py`.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
EXAMPLES = sorted((REPO / "examples").glob("[0-9]*.py"))


def _run(script: Path, timeout: float = 600.0) -> str:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # The multichip example sets its own device count; keep the pytest
    # conftest's 8-device flag for the rest (harmless to single-device runs).
    proc = subprocess.run(
        [sys.executable, str(script)],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{script.name} exited {proc.returncode}\n"
        f"--- stdout ---\n{proc.stdout}\n--- stderr ---\n{proc.stderr}"
    )
    return proc.stdout


def test_examples_inventory_matches_readme():
    """README's table lists exactly the scripts on disk — both ways:
    every script is documented AND every documented name still exists
    (a rename/delete that leaves a stale row must fail here)."""
    import re

    readme = (REPO / "examples" / "README.md").read_text()
    assert EXAMPLES, "no example scripts found"
    on_disk = {script.name for script in EXAMPLES}
    in_readme = set(re.findall(r"\b\d{2}_\w+\.py\b", readme))
    assert in_readme == on_disk, (
        f"README/disk mismatch: only in README {sorted(in_readme - on_disk)}, "
        f"only on disk {sorted(on_disk - in_readme)}"
    )


@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(script):
    out = _run(script)
    expected = {
        "01_compose.py": "composed 369x657 canvas with 4 objects",
        "02_batch_ratios.py": "16:9: 657x369, 4 boxes",
        "03_pipeline_fake_vlm.py": "composed drafts: ['draft_macro_iter_00.png']",
        "04_serving_client.py": "stream: ratio=16:9",
        "05_multichip.py": "mesh: ",
        "06_agentic.py": "iterations: 2, placements: 4",
    }[script.name]
    assert expected in out, f"{script.name} output missing {expected!r}:\n{out}"
