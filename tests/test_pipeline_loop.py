"""Hermetic iterate-loop tests (BASELINE config #4): mocked VLM personas,
fault injection, retry-with-feedback, identical-JSON short-circuit, resume.
"""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from image_transformation_tpu.pipeline.run import PipelineError, run_macro_only
from image_transformation_tpu.vlm.client import FakeClient, register_fake_client

BUNDLE = Path("data/squarespace")


def _layout(pad_cta=None):
    children = [
        {"object_id": 1, "name": "logo"},
        {"object_id": 2, "name": "photo"},
        {"object_id": 3, "name": "text"},
        {"object_id": 4, "name": "cta"},
    ]
    if pad_cta is not None:
        children[3] = dict(children[3], padding_px=pad_cta)
    return json.dumps({"root": {"type": "flex", "direction": "column", "children": children}})


def teardown_function(function):
    register_fake_client(None)


def _run(tmp_path, script, refine_iters=2, **kw):
    register_fake_client(lambda: FakeClient(script))
    return run_macro_only(
        BUNDLE, "9:16", "center", 0.05,
        api_type="auto", refine_iters=refine_iters,
        base_output_root=tmp_path, **kw,
    )


def test_full_loop_with_changing_refinements(tmp_path):
    # planner, critic1, refine1 (adds cta padding), critic2, refine2 (more padding)
    script = [_layout(), "Score 6/10: tighten cta", _layout(pad_cta=6),
              "Score 8/10: a bit more", _layout(pad_cta=12)]
    base = _run(tmp_path, script, refine_iters=2)
    # every iteration composed (layout changed each time)
    for i in range(3):
        d = base / f"iteration_{i:02d}"
        assert (d / "final_product" / f"draft_macro_iter_{i:02d}.png").exists()
        assert (d / "layout_json" / f"layout_macro_iter_{i:02d}.json").exists()
    # iteration drafts differ (padding shrinks the cta)
    im1 = np.asarray(Image.open(base / "iteration_00/final_product/draft_macro_iter_00.png"))
    im2 = np.asarray(Image.open(base / "iteration_02/final_product/draft_macro_iter_02.png"))
    assert not np.array_equal(im1, im2)
    assert (base / "time_log.txt").exists()
    log = (base / "time_log.txt").read_text()
    for step in ("prepare", "contact_sheet", "vlm_flex_baseline", "compose_baseline",
                 "vlm_critic_iter_01", "vlm_refine_iter_01", "compose_iter_01"):
        assert step in log, step


def test_identical_json_skips_compose(tmp_path):
    script = [_layout(), "fine", _layout()]  # refiner repeats the layout
    base = _run(tmp_path, script, refine_iters=1)
    d1 = base / "iteration_01"
    assert (d1 / "vlm_input_text" / "no_change_iter_01.txt").exists()
    assert not (d1 / "final_product" / "draft_macro_iter_01.png").exists()


def test_invalid_json_from_planner_raises_pipeline_error(tmp_path):
    register_fake_client(lambda: FakeClient(["THIS IS NOT JSON {{{"]))
    with pytest.raises(PipelineError, match="no usable layout"):
        run_macro_only(BUNDLE, "9:16", "center", 0.05, api_type="auto",
                       refine_iters=0, base_output_root=tmp_path)


def test_planner_api_error_sentinel_persisted(tmp_path):
    def boom(**kwargs):
        raise RuntimeError("network down")

    register_fake_client(lambda: FakeClient([boom]))
    with pytest.raises(PipelineError):
        run_macro_only(BUNDLE, "9:16", "center", 0.05, api_type="auto",
                       refine_iters=0, base_output_root=tmp_path)
    sentinel = json.loads(
        (tmp_path / "squarespace/iteration_00/vlm_output/layout_flex_iter_00.json").read_text()
    )
    assert sentinel["error"] == "api_error"


def test_refiner_validation_failure_triggers_retry_with_feedback(tmp_path):
    bad = json.dumps({"root": {"type": "flex", "direction": "column", "children": [
        {"object_id": 1, "name": "logo"},  # drops objects -> coverage mismatch
    ]}})
    script = [_layout(), "critique", bad, _layout(pad_cta=4)]
    base = _run(tmp_path, script, refine_iters=1)
    d1 = base / "iteration_01"
    assert (d1 / "vlm_input_text" / "flex_validation_error_iter_01.txt").exists()
    assert (d1 / "vlm_output" / "layout_flex_iter_01_retry.json").exists()
    # the retry prompt carries the validator feedback
    retry_prompt = (d1 / "vlm_input_text" / "prompt_refine_iter_01_retry.txt").read_text()
    assert "VALIDATION ERRORS" in retry_prompt
    assert "coverage mismatch" in retry_prompt
    # retry succeeded -> composed
    assert (d1 / "final_product" / "draft_macro_iter_01.png").exists()


def test_resume_continues_without_baseline(tmp_path, capsys):
    script = [_layout(), "c1", _layout(pad_cta=4)]
    _run(tmp_path, script, refine_iters=1)
    register_fake_client(lambda: FakeClient(["c2", _layout(pad_cta=8)]))
    base = run_macro_only(
        BUNDLE, "9:16", "center", 0.05, api_type="auto",
        refine_iters=2, base_output_root=tmp_path, resume=True,
    )
    out = capsys.readouterr().out
    assert "[resume] continuing from iteration 2" in out
    assert (base / "iteration_02" / "final_product" / "draft_macro_iter_02.png").exists()
    # baseline artifacts untouched from the first run
    assert (base / "iteration_00" / "vlm_input_text" / "prompt_flex.txt").exists()


def test_resume_survives_crash_mid_iteration(tmp_path, capsys):
    """A kill mid-iteration leaves the newest iteration dir half-built
    (no loop_state.json). Resume must scan BACK to the newest completed
    iteration and continue from there — never fall through to the purge
    that would destroy every completed iteration."""
    import shutil

    script = [_layout(), "c1", _layout(pad_cta=4)]
    base = _run(tmp_path, script, refine_iters=1)
    # simulate the crash: iteration_02 dirs created, nothing completed
    half = base / "iteration_02" / "layout_json"
    half.mkdir(parents=True)
    (base / "iteration_02" / "final_product").mkdir()
    register_fake_client(lambda: FakeClient(["c2", _layout(pad_cta=8)]))
    out_base = run_macro_only(
        BUNDLE, "9:16", "center", 0.05, api_type="auto",
        refine_iters=2, base_output_root=tmp_path, resume=True,
    )
    out = capsys.readouterr().out
    assert "[resume] continuing from iteration 2" in out
    # completed iterations intact (the purge did NOT run)
    assert (out_base / "iteration_00" / "final_product"
            / "draft_macro_iter_00.png").exists()
    assert (out_base / "iteration_01" / "layout_json"
            / "loop_state.json").exists()
    assert (out_base / "iteration_02" / "final_product"
            / "draft_macro_iter_02.png").exists()
    # pre-resume timings preserved in the rewritten log
    log = (out_base / "time_log.txt").read_text()
    assert "compose_baseline" in log and "compose_iter_02" in log
    shutil.rmtree(out_base)


def test_resume_walks_back_to_existing_draft(tmp_path):
    """If the newest completed iteration skipped compose (identical JSON),
    resume must feed the critic/refiner the newest EXISTING draft rather
    than an empty payload for a missing file."""
    # iteration_01 produces identical JSON -> skip compose, loop_state saved
    script = [_layout(), "c1", _layout()]
    base = _run(tmp_path, script, refine_iters=1)
    assert not (base / "iteration_01" / "final_product"
                / "draft_macro_iter_01.png").exists()
    register_fake_client(lambda: FakeClient(["c2", _layout(pad_cta=6)]))
    out_base = run_macro_only(
        BUNDLE, "9:16", "center", 0.05, api_type="auto",
        refine_iters=2, base_output_root=tmp_path, resume=True,
    )
    # the resumed iteration used iteration_00's draft and composed fine
    prev = (out_base / "iteration_02" / "vlm_input_image"
            / "composite_prev.png")
    assert prev.exists()
    assert (out_base / "iteration_02" / "final_product"
            / "draft_macro_iter_02.png").exists()


def test_refine_solve_crash_skips_compose_and_continues(tmp_path):
    """A refinement that fails validation twice AND crashes the solver
    must persist the failure and continue (the reference would abort the
    run); the iteration keeps its loop state."""
    # padding_px: -5 passes json parsing but blows up sanitize at solve
    bad = json.dumps({"root": {
        "type": "flex", "direction": "column",
        "children": [
            {"object_id": 1, "name": "x", "padding_px": -5},
        ],
    }})
    script = [_layout(), "c1", bad, bad, "c2", _layout(pad_cta=9)]
    base = _run(tmp_path, script, refine_iters=2)
    # iteration_01: solve crash recorded, run continued into iteration_02
    assert (base / "iteration_01" / "vlm_output"
            / "failed_output_iter_01.txt").exists()
    assert (base / "iteration_02" / "final_product"
            / "draft_macro_iter_02.png").exists()


def test_draft_matches_pil_reference_end_to_end(tmp_path):
    """The composed draft is bit-exact vs a PIL rendering of the same
    solved layout on the same solid canvas."""
    from background_resizing import fill_solid
    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.layout.canvas import compute_canvas_size
    from image_transformation_tpu.layout.flex import solve_flex

    script = [_layout()]
    base = _run(tmp_path, script, refine_iters=0)
    got = np.asarray(Image.open(base / "iteration_00/final_product/draft_macro_iter_00.png"))

    bundle = load_bundle(BUNDLE)
    W, H = compute_canvas_size(bundle.background.size, "9:16", verbose=False)
    placements = solve_flex(json.loads(_layout())["root"], (W, H), bundle.sizes())
    canvas = fill_solid(str(BUNDLE / "background.png"), (W, H))
    for p in placements:
        oid = int(p["object_id"])
        x1, y1, x2, y2 = p["box"]
        canvas.alpha_composite(
            bundle.objects[oid].resize((max(1, x2 - x1), max(1, y2 - y1)), Image.LANCZOS),
            dest=(x1, y1),
        )
    assert np.array_equal(got, np.asarray(canvas))


def test_variants_fused_rerender(tmp_path):
    from image_transformation_tpu.pipeline.cli import render_variants

    script = [_layout()]
    base = _run(tmp_path, script, refine_iters=0)
    out_dir = render_variants(BUNDLE, base, ["9:16", "1:1", "16:9"])
    sizes = {}
    for ratio, wh in [("9x16", (369, 657)), ("1x1", (492, 492)), ("16x9", (657, 369))]:
        p = out_dir / f"variant_{ratio}.png"
        assert p.exists()
        im = Image.open(p)
        sizes[ratio] = im.size
        assert im.size == wh
    # the 9:16 variant re-renders the same layout the loop composed
    loop_draft = np.asarray(
        Image.open(base / "iteration_00/final_product/draft_macro_iter_00.png")
    )
    variant = np.asarray(Image.open(out_dir / "variant_9x16.png"))
    assert variant.shape == loop_draft.shape
    diff = np.abs(variant.astype(int) - loop_draft.astype(int))
    assert diff.max() <= 2  # fused path uses traced coefficient tables


def test_gradient_background_mode(tmp_path):
    """--background gradient synthesizes the canvas with fill_gradient's
    exact semantics (edge-strip medians + lower-variance axis)."""
    script = [_layout()]
    base = _run(tmp_path, script, refine_iters=0, background="gradient")
    canvas = np.asarray(
        Image.open(base / "iteration_00/vlm_input_image/canvas.png")
    )

    import background_resizing as ref_shim

    expected = np.asarray(
        ref_shim.fill_gradient(str(BUNDLE / "background.png"), (canvas.shape[1], canvas.shape[0]))
    )
    assert np.array_equal(canvas, expected)
    # metadata records the mode
    meta = json.loads(
        (base / "iteration_00/vlm_input_text/run_metadata.json").read_text()
    )
    assert meta["background"] == "gradient"


def test_unknown_background_mode_rejected(tmp_path):
    script = [_layout()]
    with pytest.raises(PipelineError):
        _run(tmp_path, script, refine_iters=0, background="plaid")
