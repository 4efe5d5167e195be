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


def test_console_browser_lists_and_shows(tmp_path, capsys):
    """The textual fallback UI browses a real run's artifact tree."""
    import json

    import pytest

    from image_transformation_tpu.pipeline.run import run_macro_only
    from image_transformation_tpu.ui.console import list_runs, main, show_run
    from image_transformation_tpu.vlm.client import FakeClient, register_fake_client

    items = json.loads((__import__("pathlib").Path("data/squarespace") / "results.json").read_text())
    children = [{"object_id": int(it["object_id"]), "name": it["label"]} for it in items]
    layout = json.dumps({"root": {"type": "flex", "direction": "column", "children": children}})
    register_fake_client(lambda: FakeClient([layout, "Score 7/10 ok", layout]))
    try:
        base = run_macro_only(
            "data/squarespace", "9:16", "center", 0.05,
            api_type="auto", refine_iters=1, base_output_root=tmp_path,
        )
    finally:
        register_fake_client(None)

    runs = list_runs(tmp_path)
    assert runs and runs[0]["stem"] == "squarespace"
    report = show_run(tmp_path, "squarespace")
    it0 = report["iterations"][0]
    assert it0["draft"] and it0["placements"]
    assert report["time_log"] and "compose_baseline" in report["time_log"]
    # iteration 1 repeated the JSON -> no-change marker, no draft
    it1 = report["iterations"][1]
    assert it1.get("no_change") and it1["draft"] is None

    main(["--root", str(tmp_path), "list"])
    main(["--root", str(tmp_path), "show", "squarespace"])
    out = capsys.readouterr().out
    assert "squarespace" in out and "iteration 00" in out and "compose_baseline" in out
    main(["--root", str(tmp_path), "show", "squarespace", "--iter", "0", "--json"])
    parsed = json.loads(capsys.readouterr().out)
    assert parsed["iterations"][0]["iteration"] == 0

    with pytest.raises(FileNotFoundError):
        show_run(tmp_path, "missing_stem")


def test_web_viewer_serves_runs(tmp_path):
    """The stdlib web viewer serves run list, iteration pages, artifacts,
    and JSON endpoints; file access is jailed to the artifact root."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from image_transformation_tpu.pipeline.fleet import install_generic_fake_client
    from image_transformation_tpu.pipeline.run import run_macro_only
    from image_transformation_tpu.ui.web import serve
    from image_transformation_tpu.vlm.client import register_fake_client

    install_generic_fake_client()
    try:
        run_macro_only(
            "data/squarespace", "9:16", "center", 0.05,
            api_type="auto", refine_iters=0, base_output_root=tmp_path,
        )
    finally:
        register_fake_client(None)

    server = serve(tmp_path, port=0)  # ephemeral port
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        def get(path):
            try:
                with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                    return r.status, r.read(), r.headers.get("Content-Type", "")
            except urllib.error.HTTPError as e:
                return e.code, e.read(), ""

        status, body, _ = get("/")
        assert status == 200 and b"squarespace" in body
        status, body, _ = get("/run/squarespace")
        assert status == 200 and b"iteration 00" in body and b"/file/" in body
        runs = json.loads(get("/api/runs")[1])
        assert runs[0]["stem"] == "squarespace"
        report = json.loads(get("/api/run/squarespace")[1])
        assert report["iterations"][0]["placements"]
        draft_rel = "iteration_00/final_product/draft_macro_iter_00.png"
        status, body, ctype = get(f"/file/squarespace/{draft_rel}")
        assert status == 200 and ctype == "image/png" and body[:4] == b"\x89PNG"
        # traversal jailed (files AND run stems)
        status, _, _ = get("/file/squarespace/../../etc/passwd")
        assert status in (403, 404)
        status, _, _ = get("/run/..%2f..%2fetc")
        assert status == 404
        status, _, _ = get("/api/run/..%2fsquarespace")
        assert status == 404
        status, _, _ = get("/run/nope")
        assert status == 404
    finally:
        server.shutdown()
        thread.join(timeout=5)
