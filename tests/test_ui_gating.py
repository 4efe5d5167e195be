"""UI modules: importable and cleanly gated when streamlit is absent."""

from pathlib import Path

import pytest


def test_ui_modules_import_without_streamlit():
    import image_transformation_tpu.ui.agentic_app as agentic_app
    import image_transformation_tpu.ui.app as app

    for mod in (app, agentic_app):
        if getattr(mod, "st", None) is None:
            with pytest.raises(RuntimeError, match="streamlit is not installed"):
                mod.main()


def test_input_listing_helpers(tmp_path):
    from image_transformation_tpu.ui.app import _list_bundles, _list_inputs

    (tmp_path / "a.png").write_bytes(b"x")
    (tmp_path / "b.jpg").write_bytes(b"x")
    (tmp_path / "c.txt").write_bytes(b"x")
    assert [p.name for p in _list_inputs(tmp_path)] == ["a.png", "b.jpg"]
    assert _list_inputs(tmp_path / "missing") == []

    bundle = tmp_path / "bundleA"
    bundle.mkdir()
    (bundle / "results.json").write_text("[]")
    (tmp_path / "not_a_bundle").mkdir()
    assert [p.name for p in _list_bundles(tmp_path)] == ["bundleA"]


def test_repo_ships_reference_entry_files():
    root = Path(__file__).resolve().parents[1]
    for name in (
        "app.py", "agentic/app.py", "compositor.py", "background_resizing.py",
        "layout_constraints.py", "api_client.py", "macro_placement_test.py",
        "utils/timing.py", "utils/labels.py", "Dockerfile", "requirements.txt",
    ):
        assert (root / name).exists(), name
