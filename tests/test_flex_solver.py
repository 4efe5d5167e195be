"""Flex-DSL host solver vs stored reference-behavior goldens + properties."""

import json
from pathlib import Path

import pytest

from image_transformation_tpu.layout.flex import (
    FlexError,
    clamp_boxes,
    measure_node,
    sanitize_padding,
    sanitize_pin,
    sanitize_stick_to,
    solve_flex,
)

GOLDENS = json.loads(
    (Path(__file__).parent / "goldens" / "flex_goldens.json").read_text()
)


@pytest.mark.parametrize("idx", range(len(GOLDENS)))
def test_solver_matches_reference_golden(idx):
    case = GOLDENS[idx]
    sizes = {int(k): tuple(v) for k, v in case["sizes"].items()}
    got = solve_flex(case["root"], tuple(case["canvas"]), sizes)
    assert got == case["placements"], (
        f"case {idx} diverged:\n got={json.dumps(got, indent=1)}\n "
        f"want={json.dumps(case['placements'], indent=1)}"
    )


def test_measure_row_and_column():
    sizes = {1: (10, 4), 2: (6, 8)}
    row = {"type": "flex", "direction": "row", "gap_px": 3,
           "children": [{"object_id": 1, "name": "a"}, {"object_id": 2, "name": "b"}]}
    assert measure_node(row, sizes) == (19, 8)
    col = dict(row, direction="column", padding_px=2)
    assert measure_node(col, sizes) == (14, 19)


def test_object_padding_enters_measurement():
    sizes = {1: (10, 4)}
    node = {"object_id": 1, "name": "a", "padding_px": {"left": 3, "bottom": 5}}
    assert measure_node(node, sizes) == (13, 9)


def test_solver_never_scales_up():
    sizes = {1: (10, 10)}
    root = {"type": "flex", "direction": "row",
            "children": [{"object_id": 1, "name": "a"}]}
    [p] = solve_flex(root, (1000, 1000), sizes)
    x1, y1, x2, y2 = p["box"]
    assert (x2 - x1, y2 - y1) == (10, 10)
    assert p["scale"] == 1.0


def test_slot_is_intrinsic_size_so_canvas_overflow_persists():
    # The slot an object is placed into is its *measured* size, so a single
    # oversized object is NOT downscaled to the canvas (reference semantics;
    # clamp_boxes then shifts, size-preserving).
    sizes = {1: (100, 50)}
    root = {"type": "flex", "direction": "row",
            "children": [{"object_id": 1, "name": "a"}]}
    [p] = solve_flex(root, (40, 200), sizes)
    x1, y1, x2, y2 = p["box"]
    assert (x2 - x1, y2 - y1) == (100, 50)
    assert p["scale"] == 1.0


def test_object_downscales_to_padded_slot():
    # Object padding shrinks the inner slot below the image size -> downscale.
    sizes = {1: (100, 50)}
    root = {"type": "flex", "direction": "row", "children": [
        {"object_id": 1, "name": "a", "padding_px": 10}]}
    [p] = solve_flex(root, (400, 400), sizes)
    x1, y1, x2, y2 = p["box"]
    # slot = 120x70, inner = 100x50 -> fits exactly at scale 1
    assert (x2 - x1, y2 - y1) == (100, 50) and p["scale"] == 1.0


def test_clamp_boxes_preserves_size():
    placements = [{"object_id": 1, "box": [-5, 90, 15, 110]}]
    clamp_boxes(placements, (100, 100))
    assert placements[0]["box"] == [0, 80, 20, 100]


def test_all_placements_inside_canvas_after_clamp():
    for case in GOLDENS:
        W, H = case["canvas"]
        for p in case["placements"]:
            x1, y1, x2, y2 = p["box"]
            if x2 - x1 <= W and y2 - y1 <= H:
                assert 0 <= x1 and x2 <= W and 0 <= y1 and y2 <= H


def test_sanitizers_reject_bad_input():
    with pytest.raises(FlexError):
        sanitize_padding(-1, 1)
    with pytest.raises(FlexError):
        sanitize_padding({"diagonal": 3}, 1)
    with pytest.raises(FlexError):
        sanitize_pin({"horizontal": "middle"}, 1)
    with pytest.raises(FlexError):
        sanitize_stick_to({"edges": ["left", "right"]}, 1)
    with pytest.raises(FlexError):
        sanitize_stick_to({"edges": ["top"], "margin_px": -2}, 1)
