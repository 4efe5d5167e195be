"""Agentic graph: hermetic end-to-end run with WORKING tool-calling.

The reference's micro agent can never execute tools (its client drops
them — SURVEY.md §2.6.2); this pins that ours does.
"""

import json

import numpy as np
import pytest
from PIL import Image

from image_transformation_tpu.agentic.graph import END, StateGraph
from image_transformation_tpu.agentic.tools import placements_from_flex
from image_transformation_tpu.agentic.state import ObjectMeta
from image_transformation_tpu.agentic.workflow import run_workflow
from image_transformation_tpu.vlm.client import FakeClient, register_fake_client


def teardown_module(module):
    register_fake_client(None)


def test_graph_engine_runs_and_routes():
    g = StateGraph(dict)
    trace = []
    g.add_node("a", lambda s: (trace.append("a"), s)[1])
    g.add_node("b", lambda s: (trace.append("b"), s.update(n=s.get("n", 0) + 1) or s)[1])
    g.set_entry_point("a")
    g.add_edge("a", "b")
    g.add_conditional_edges(
        "b", lambda s: "STOP" if s["n"] >= 3 else "LOOP", {"STOP": END, "LOOP": "b"}
    )
    out = g.compile().invoke({})
    assert out["n"] == 3
    assert trace == ["a", "b", "b", "b"]


def test_simplified_solver_packs_top_left():
    objects = {
        1: ObjectMeta(1, "a", "a.png", 100, 40),
        2: ObjectMeta(2, "b", "b.png", 60, 30),
    }
    flex = {"root": {"type": "flex", "direction": "column", "gap_px": 5,
                     "children": [{"object_id": 1}, {"object_id": 2}]}}
    placements = placements_from_flex(flex, (200, 200), objects)
    assert placements[1].box == [0, 0, 100, 40]
    assert placements[2].box == [0, 45, 60, 75]


def test_simplified_solver_rejects_overflow_and_missing():
    objects = {1: ObjectMeta(1, "a", "a.png", 300, 40)}
    flex = {"root": {"type": "flex", "direction": "row", "children": [{"object_id": 1}]}}
    with pytest.raises(ValueError, match="larger than canvas"):
        placements_from_flex(flex, (200, 200), objects)
    objects[2] = ObjectMeta(2, "b", "b.png", 10, 10)
    with pytest.raises(ValueError, match="missing required"):
        placements_from_flex(flex, (400, 200), objects)


def test_agentic_end_to_end_with_tool_calls(tmp_path):
    layout = {
        "root": {
            "type": "flex",
            "direction": "column",
            "gap_px": 4,
            "children": [
                {"object_id": 1, "name": "logo"},
                {"object_id": 2, "name": "photo"},
                {"object_id": 3, "name": "text"},
                {"object_id": 4, "name": "cta"},
            ],
        }
    }
    script = [
        json.dumps(layout),  # macro
        "Score: 7/10\nSuggestions: move logo right",  # critic round 1
        {  # micro: actual tool calls
            "message": {
                "content": "",
                "tool_calls": [
                    {"id": "c1", "function": {"name": "adjust_x",
                                              "arguments": json.dumps({"object": "logo", "pixels": 10})}},
                    {"id": "c2", "function": {"name": "adjust_y",
                                              "arguments": json.dumps({"object": "4", "pixels": -5})}},
                ],
            }
        },
        "Score: 9/10\nLooks good.",  # critic round 2 (stops on iteration cap)
    ]
    register_fake_client(lambda: FakeClient(script))
    try:
        state = run_workflow(
            bundle_dir="data/squarespace",
            ratio="9:16",
            base_run_dir=tmp_path,
            api_type="auto",
            max_iterations=1,
        )
    finally:
        register_fake_client(None)

    # tool calls executed: logo shifted +10 x; cta shifted -5 y (clamped at 0 is fine)
    assert state.iteration == 1
    assert len(state.last_tool_calls) == 2
    logo = state.placements[1]
    assert logo.x == 10 and logo.y == 0
    cta = state.placements[4]
    assert cta.y == sum(m.height for m in list(state.objects.values())[:3]) + 3 * 4 - 5

    # compositor rendered both iterations
    for it in (0, 1):
        img = tmp_path / "squarespace" / f"iteration_{it:02d}" / "final_product" / f"draft_macro_iter_{it:02d}.png"
        assert img.exists(), img
    arr = np.asarray(Image.open(img))
    assert arr.shape[2] == 4
    # the logo's pixels moved: iteration 1 differs from iteration 0
    img0 = np.asarray(Image.open(
        tmp_path / "squarespace" / "iteration_00" / "final_product" / "draft_macro_iter_00.png"
    ))
    assert not np.array_equal(arr, img0)


def test_agentic_compositor_rejects_scaling(tmp_path):
    from image_transformation_tpu.agentic.nodes import build_compositor_node
    from image_transformation_tpu.agentic.state import PlacementState
    from image_transformation_tpu.agentic.workflow import initialize_state

    state = initialize_state(
        image_name="squarespace",
        ratio="9:16",
        bundle_dir=__import__("pathlib").Path("data/squarespace"),
        base_run_dir=tmp_path,
        api_type="auto",
        api_key=None,
        temperature=0.5,
        max_iterations=1,
        canvas_size=(369, 657),
    )
    meta = state.objects[1]
    state.register_placement(
        PlacementState(1, meta.name, 0, 0, meta.width // 2, meta.height)
    )
    with pytest.raises(ValueError, match="scaling objects is not permitted"):
        build_compositor_node()(state)


def test_extract_json_object_survives_prose_and_fences():
    """Realistic LLM replies: prose before/after the object, stray brace
    placeholders in trailing text, fences anywhere — all must yield the
    layout object instead of killing the run."""
    from image_transformation_tpu.agentic.nodes import extract_json_object

    layout = {"root": {"type": "flex", "children": [{"object_id": 1}]}}
    blob = json.dumps(layout)
    cases = [
        blob,
        f"Here is the layout: {blob} Note: tune {{gap_px}} later.",
        f"Sure!\n```json\n{blob}\n```\nLet me know.",
        f"prose first\n```\n{blob}\n```",
        f"{{broken json}} then the real one {blob}",
    ]
    for text in cases:
        assert extract_json_object(text) == layout, text[:60]
    with pytest.raises(ValueError):
        extract_json_object("no json here {not: valid}")


def test_micro_nudges_clamp_on_canvas():
    """An over-eager nudge past a canvas edge clamps instead of going
    negative — a negative origin would make the compose kernel silently
    drop the object from the render (PARITY divergence #4) while the
    layout JSON still records it."""
    from image_transformation_tpu.agentic.state import AgentState, PlacementState, RunContext
    from image_transformation_tpu.agentic.tools import adjust_x, adjust_y

    run = RunContext(
        image_name="t", ratio="1:1", canvas_size=(100, 80), bundle_dir=".",
        background_path=".", objects_dir=".", results_json_path=".",
        original_image_path=None, run_root=".", max_iterations=1,
    )
    state = AgentState(
        run=run,
        objects={1: ObjectMeta(1, "logo", "logo.png", 30, 20)},
        api_type="fake", api_key=None, temperature=0.0,
    )
    state.placements["logo"] = PlacementState(
        object_id=1, name="logo", x=5, y=5, width=30, height=20
    )
    adjust_x(state, "logo", -50)
    assert state.placements["logo"].x == 0
    adjust_y(state, "logo", 500)
    assert state.placements["logo"].y == 60  # 80 - 20
    adjust_x(state, "logo", 500)
    assert state.placements["logo"].x == 70  # 100 - 30
