"""Fleet runner tests: multi-bundle x multi-ratio matrix on the virtual mesh."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from image_transformation_tpu.pipeline.fleet import main as fleet_main, run_fleet

BUNDLES = [Path("data/squarespace"), Path("data/audio_book")]
RATIOS = ["9:16", "1:1", "16:9"]


def test_fleet_renders_full_matrix(tmp_path):
    summary = run_fleet(BUNDLES, RATIOS, output_root=tmp_path)
    assert set(summary["bundles"]) == {"squarespace", "audio_book"}
    for b in BUNDLES:
        for r in RATIOS:
            p = tmp_path / b.name / f"variant_{r.replace(':', 'x')}.png"
            assert p.exists(), p
            w, h = Image.open(p).size
            exp_w, exp_h = summary["bundles"][b.name]["canvas_sizes"][r]
            assert (w, h) == (exp_w, exp_h)
        assert (tmp_path / b.name / "boxes.json").exists()
        assert summary["bundles"][b.name]["layout_source"] == "fallback:column"
    assert summary["total_canvases"] == len(BUNDLES) * len(RATIOS)
    assert json.loads((tmp_path / "fleet_summary.json").read_text())


def test_fleet_sharded_matches_single_device(tmp_path):
    from image_transformation_tpu.parallel.mesh import make_mesh

    single = run_fleet(BUNDLES[:1], RATIOS, output_root=tmp_path / "single")
    mesh = make_mesh()  # 8 virtual CPU devices
    sharded = run_fleet(BUNDLES[:1], RATIOS, output_root=tmp_path / "mesh", mesh=mesh)
    assert sharded["devices"] == 8
    for r in RATIOS:
        name = f"variant_{r.replace(':', 'x')}.png"
        a = np.asarray(Image.open(tmp_path / "single" / "squarespace" / name))
        b = np.asarray(Image.open(tmp_path / "mesh" / "squarespace" / name))
        assert np.array_equal(a, b), r
    assert single["total_canvases"] == sharded["total_canvases"]


def test_fleet_explicit_layout_and_bundle_local_layout(tmp_path):
    # explicit layout file: photo only, row
    layout = {"root": {"type": "flex", "direction": "row",
                       "children": [{"object_id": 2, "name": "photo"}]}}
    layout_path = tmp_path / "layout.json"
    layout_path.write_text(json.dumps(layout))
    s = run_fleet(BUNDLES[:1], ["1:1"], output_root=tmp_path / "explicit",
                  layout_json=layout_path)
    assert s["bundles"]["squarespace"]["layout_source"].startswith("file:")
    used = json.loads(
        (tmp_path / "explicit" / "squarespace" / "fleet_layout_used.json").read_text()
    )
    assert used == layout

    # bundle-local fleet_layout.json beats the fallback
    bdir = tmp_path / "bundle_copy"
    import shutil

    shutil.copytree(BUNDLES[0], bdir)
    (bdir / "fleet_layout.json").write_text(json.dumps(layout))
    s2 = run_fleet([bdir], ["1:1"], output_root=tmp_path / "local")
    assert s2["bundles"]["bundle_copy"]["layout_source"] == "bundle:fleet_layout.json"


def test_fleet_cli_smoke(tmp_path, capsys):
    fleet_main([
        "--bundles", "data/squarespace",
        "--ratios", "1:1,16:9",
        "--output-root", str(tmp_path),
        "--reps", "2",
    ])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["bundles"] == 1
    assert out["total_canvases"] == 4  # 2 ratios x 2 reps


def test_fleet_rejects_layout_without_root(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"direction": "row"}))
    with pytest.raises(ValueError):
        run_fleet(BUNDLES[:1], ["1:1"], output_root=tmp_path, layout_json=bad)


def test_fleet_loops_runs_full_pipelines_concurrently(tmp_path):
    """run_fleet_loops: overlapped iterate loops, one artifact tree each."""
    from image_transformation_tpu.pipeline.fleet import (
        install_generic_fake_client,
        run_fleet_loops,
    )
    from image_transformation_tpu.vlm.client import register_fake_client

    install_generic_fake_client()
    try:
        results = run_fleet_loops(
            BUNDLES, "9:16", parallel=2, refine_iters=0,
            base_output_root=tmp_path, api_type="auto",
        )
    finally:
        register_fake_client(None)

    assert set(results) == {"squarespace", "audio_book"}
    for stem, r in results.items():
        assert "output" in r, r
        draft = (
            tmp_path / stem / "iteration_00" / "final_product"
            / "draft_macro_iter_00.png"
        )
        assert draft.exists(), draft


def test_fleet_loops_isolates_per_bundle_errors(tmp_path):
    from image_transformation_tpu.pipeline.fleet import run_fleet_loops

    results = run_fleet_loops(
        [Path("data/squarespace"), tmp_path / "missing"],
        "9:16", parallel=2, refine_iters=0, api_type="auto",
        base_output_root=tmp_path,
    )
    assert "error" in results["missing"]


def test_fleet_cli_full_loop_hermetic(tmp_path, capsys):
    from image_transformation_tpu.vlm.client import register_fake_client

    try:
        fleet_main([
            "--bundles", "data/squarespace,data/audio_book",
            "--ratios", "9:16",
            "--full-loop", "--api", "fake", "--refine-iters", "1",
            "--parallel", "2",
            "--output-root", str(tmp_path),
        ])
    finally:
        register_fake_client(None)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["bundles"] == 2 and out["ok"] == 2, out
    for stem in ("squarespace", "audio_book"):
        assert (tmp_path / stem / "time_log.txt").exists()


def test_fleet_full_loop_rejects_incompatible_flags(tmp_path, capsys):
    with pytest.raises(SystemExit):
        fleet_main([
            "--bundles", "data/squarespace", "--ratios", "9:16",
            "--full-loop", "--mesh", "--output-root", str(tmp_path),
        ])
    with pytest.raises(SystemExit):
        fleet_main([
            "--bundles", "data/squarespace", "--ratios", "9:16,1:1",
            "--full-loop", "--output-root", str(tmp_path),
        ])


def test_fleet_picks_up_previous_full_loop_layout(tmp_path):
    """render mode resolves layouts from the fleet's own --output-root."""
    from image_transformation_tpu.pipeline.fleet import (
        install_generic_fake_client,
        run_fleet_loops,
    )
    from image_transformation_tpu.vlm.client import register_fake_client

    install_generic_fake_client()
    try:
        run_fleet_loops(
            BUNDLES[:1], "9:16", parallel=1, refine_iters=0,
            base_output_root=tmp_path, api_type="auto",
        )
    finally:
        register_fake_client(None)

    summary = run_fleet(BUNDLES[:1], ["1:1"], output_root=tmp_path)
    assert summary["bundles"]["squarespace"]["layout_source"] == "previous_run"


def test_unique_stems_dedupes_same_dir_spellings():
    """Two spellings of the SAME directory collapse to one fleet entry —
    under --full-loop two threads on one tree would purge each other."""
    from image_transformation_tpu.pipeline.fleet import _unique_stems

    stems = _unique_stems([Path("data/squarespace"),
                           Path("./data/squarespace"),
                           Path("data/audio_book")])
    assert len(stems) == 2
    assert sorted(stems.values()) == ["audio_book", "squarespace"]


def test_colliding_basenames_never_read_each_others_layouts(tmp_path):
    """Two bundles sharing a basename resolve previous-run layouts by
    their UNIQUE stem: bundle A must not pick up bundle B's saved layout
    from <root>/<basename>, and A's own colliding-run tree under
    <root>/<stemA>/<basename> must be found."""
    import shutil

    from image_transformation_tpu.pipeline.fleet import resolve_layout

    a_dir = tmp_path / "clientA" / "promo"
    b_dir = tmp_path / "clientB" / "promo"
    shutil.copytree("data/squarespace", a_dir)
    shutil.copytree("data/audio_book", b_dir)
    out = tmp_path / "out"

    def write_state(base: Path, ids):
        layout_dir = base / "iteration_00" / "layout_json"
        layout_dir.mkdir(parents=True)
        flex = {"root": {"type": "flex", "direction": "column", "children": [
            {"object_id": i, "name": f"o{i}"} for i in ids
        ]}}
        (layout_dir / "loop_state.json").write_text(
            json.dumps({"flex_raw": flex})
        )
        return flex

    items_a = json.loads((a_dir / "results.json").read_text())
    items_b = json.loads((b_dir / "results.json").read_text())
    ids_a = sorted(int(it["object_id"]) for it in items_a)
    ids_b = sorted(int(it["object_id"]) for it in items_b)

    # B's NON-colliding tree sits at out/promo (a past solo run of B)
    write_state(out / "promo", ids_b)

    # A (a collider: stem clientA__promo) must NOT read out/promo
    flex, src = resolve_layout(a_dir, items_a, None, output_root=out,
                               stem="clientA__promo")
    assert src == "fallback:column"

    # ... but finds its OWN colliding full-loop tree under out/<stem>/<name>
    flex_a = write_state(out / "clientA__promo" / "promo", ids_a)
    flex, src = resolve_layout(a_dir, items_a, None, output_root=out,
                               stem="clientA__promo")
    assert src == "previous_run" and flex == flex_a

    # a NON-collider whose tree holds foreign object ids falls through
    # (id validation): give out/promo ids that B doesn't have
    import shutil as _sh

    _sh.rmtree(out / "promo")
    write_state(out / "promo", [max(ids_b) + 50])
    flex, src = resolve_layout(b_dir, items_b, None, output_root=out,
                               stem="promo")
    assert src == "fallback:column"
