"""Execute the Streamlit UI scripts end-to-end under the headless driver.

The reference's primary UX is ``streamlit run app.py``
(/root/reference/app.py:31-324, agentic/app.py:146-188).  These tests run
the SAME ``main()`` functions that streamlit would, with every widget call
resolved by ``ui.headless.HeadlessStreamlit``: parameters are set, the run
button pressed (fake VLM backend), and the artifact browser's rendering is
asserted per iteration — so widget wiring and session-state handling are
under test, not just import gating.
"""

import shutil
from pathlib import Path

import pytest

from image_transformation_tpu.ui.headless import HeadlessStreamlit, run_app
from image_transformation_tpu.vlm.client import register_fake_client

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture
def ui_root(tmp_path, monkeypatch):
    """Isolated repo root: real bundles (read-only), tmp outputs."""
    (tmp_path / "data").symlink_to(REPO / "data")
    (tmp_path / "input").mkdir()
    for name in ("squarespace.jpg", "audio_book.jpg"):
        shutil.copy(REPO / "input" / name, tmp_path / "input" / name)
    import image_transformation_tpu.ui.agentic_app as agentic_app
    import image_transformation_tpu.ui.app as app

    monkeypatch.setattr(app, "REPO_ROOT", tmp_path)
    monkeypatch.setattr(agentic_app, "REPO_ROOT", tmp_path)
    yield tmp_path
    register_fake_client(None)


def test_main_app_full_run_and_browse(ui_root):
    st = HeadlessStreamlit()

    # -- pass 1: first load renders pickers; click a thumbnail button
    run_app("main", st, {"select_squarespace.jpg": True})
    assert st.session_state["selected_stem"] == "squarespace"
    assert len(st.find("image", contains="input")) == 2  # both thumbnails
    assert st.find("text_area", contains="Planner design rules")
    # defaults flowed out of the widgets
    assert st.find("slider", contains="Margin")[0].value == 0.05

    # -- pass 2: choose the hermetic backend and run
    run_app("main", st, {
        "VLM backend": "fake (hermetic)",
        "Refine iterations": 1,
        "Run macro placement": True,
    })
    assert any(c.kind == "empty.success" for c in st.calls), st.transcript()
    assert st.session_state["has_run"] is True

    out_root = ui_root / "output_macro_placement" / "squarespace"
    assert (out_root / "iteration_00" / "final_product" /
            "draft_macro_iter_00.png").exists()
    # artifact browser rendered the iteration-00 draft and its expanders
    assert st.find("image", contains="draft_macro_iter_00.png")
    for title in ("JSON artifacts", "Planner prompt", "Critic statement",
                  "VLM raw output", "Timing log"):
        assert st.find("expander", contains=title), title
    assert st.find("json")  # layout JSON rendered structurally
    assert any("compose_baseline" in c.label for c in st.find("code"))

    # -- pass 3: browse iteration 1 (identical-JSON no-change iteration)
    st.session_state["iter_idx"] = 1
    run_app("main", st, {})
    assert st.find("info", contains="No composed image for this iteration")
    assert st.find("slider", contains="Iteration")[0].value == 1


def test_main_app_validation_errors(ui_root):
    st = HeadlessStreamlit()
    # nebius backend without a key -> error, nothing runs
    run_app("main", st, {"Run macro placement": True})
    assert st.find("error", contains="Nebius API key")
    assert "has_run" not in st.session_state

    # missing bundle -> error mentioning the bundle path
    shutil.copy(REPO / "input" / "squarespace.jpg", ui_root / "input" / "zz_nobundle.png")
    run_app("main", st, {
        "VLM backend": "fake (hermetic)",
        "select_zz_nobundle.png": True,
    })
    run_app("main", st, {
        "VLM backend": "fake (hermetic)",
        "Run macro placement": True,
    })
    assert st.find("error", contains="Missing segmentation bundle")


def test_main_app_custom_design_rules_reach_pipeline(ui_root):
    """Persona textarea edits flow into the planner prompt artifacts."""
    st = HeadlessStreamlit()
    run_app("main", st, {"select_squarespace.jpg": True})
    run_app("main", st, {
        "VLM backend": "fake (hermetic)",
        "Refine iterations": 0,
        "Planner design rules": "USE_EXACTLY_THIS_RULE_TOKEN",
        "Run macro placement": True,
    })
    assert any(c.kind == "empty.success" for c in st.calls), st.transcript()
    prompt = (ui_root / "output_macro_placement" / "squarespace" /
              "iteration_00" / "vlm_input_text" / "prompt_flex.txt").read_text()
    assert "USE_EXACTLY_THIS_RULE_TOKEN" in prompt


def test_agentic_app_full_run(ui_root):
    st = HeadlessStreamlit()
    # nebius without key stops the script at st.stop()
    run_app("agentic", st, {"Run agentic workflow": True})
    assert st.find("error", contains="Nebius API key")
    assert st.find("stop")

    run_app("agentic", st, {
        "VLM backend": "fake (hermetic)",
        "Bundle": "squarespace",
        "Micro iterations": 1,
        "Run agentic workflow": True,
    })
    assert any(c.kind == "empty.success" for c in st.calls), st.transcript()
    run_root = Path(st.session_state["agentic_run"])
    assert run_root.exists() and str(ui_root) in str(run_root)
    # browser rendered a draft image and artifact captions per iteration
    assert st.find("expander", contains="iteration_")
    assert st.find("image", contains=".png")
    assert st.find("caption", contains="layout_json/")


def test_headless_cli_transcript(ui_root, capsys, monkeypatch):
    """`python -m image_transformation_tpu.ui.headless main` renders a pass."""
    from image_transformation_tpu.ui import headless

    headless.main(["main", "--set", "Ratio W=16", "--set", "Ratio H=9"])
    out = capsys.readouterr().out
    assert "<title 'Macro Placement" in out
    assert "<number_input 'Ratio W' -> 16>" in out


def test_root_entry_shims_run_headlessly(ui_root, monkeypatch):
    """The reference's launch files (`streamlit run app.py`,
    `agentic/app.py`) execute top-to-bottom under the headless driver —
    the exact modules the Dockerfile CMD points at."""
    import runpy

    import image_transformation_tpu.ui.agentic_app as agentic_mod
    import image_transformation_tpu.ui.app as app_mod

    st = HeadlessStreamlit()
    monkeypatch.setattr(app_mod, "st", st)
    runpy.run_path(str(REPO / "app.py"), run_name="__main__")
    assert st.find("title", contains="Macro Placement")
    assert st.find("button", contains="Run macro placement")

    st2 = HeadlessStreamlit()
    monkeypatch.setattr(agentic_mod, "st", st2)
    runpy.run_path(str(REPO / "agentic" / "app.py"), run_name="__main__")
    assert st2.find("title", contains="Agentic")
    assert st2.find("selectbox", contains="Bundle")
