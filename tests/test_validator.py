"""Validator modes: structural rules, sanitize stripping, conflicts.

The reference's validator is dead code as-run (SURVEY.md §2.6.1); these
tests pin the as-specified behavior our implementation restores.
"""

import pytest

from image_transformation_tpu.layout.flex import FlexError
from image_transformation_tpu.layout.validate import (
    compute_nesting_conflicts,
    extract_json_maybe,
    parse_flex_response,
    validate_flex_dsl,
)

IDS = [1, 2]
LABELS = {1: "logo", 2: "photo"}


def _doc(**root_extra):
    root = {
        "type": "flex",
        "direction": "column",
        "children": [
            {"object_id": 1, "name": "logo"},
            {"object_id": 2, "name": "photo"},
        ],
    }
    root.update(root_extra)
    return {"root": root}


def test_valid_baseline_layout_passes():
    data, seen = validate_flex_dsl(_doc(), IDS, LABELS)
    assert sorted(seen) == IDS


def test_structure_errors():
    with pytest.raises(FlexError, match="Missing root"):
        validate_flex_dsl({}, IDS, LABELS)
    with pytest.raises(FlexError, match="type=flex"):
        validate_flex_dsl({"root": {"type": "grid", "direction": "row"}}, IDS, LABELS)
    with pytest.raises(FlexError, match="direction"):
        validate_flex_dsl({"root": {"type": "flex", "direction": "diagonal"}}, IDS, LABELS)
    deep = {"root": {"type": "flex", "direction": "row", "children": [
        {"type": "flex", "direction": "row", "children": [
            {"type": "flex", "direction": "row",
             "children": [{"object_id": 1, "name": "logo"}]}]}]}}
    with pytest.raises(FlexError, match="depth > 2"):
        validate_flex_dsl(deep, IDS, LABELS)


def test_coverage_and_name_checks():
    doc = _doc()
    doc["root"]["children"] = doc["root"]["children"][:1]
    with pytest.raises(FlexError, match="coverage mismatch"):
        validate_flex_dsl(doc, IDS, LABELS)
    doc = _doc()
    doc["root"]["children"][0]["name"] = "wrong"
    with pytest.raises(FlexError, match="name mismatch"):
        validate_flex_dsl(doc, IDS, LABELS)
    doc = _doc()
    doc["root"]["children"].append({"object_id": 1, "name": "logo"})
    with pytest.raises(FlexError, match="coverage mismatch"):  # duplicate
        validate_flex_dsl(doc, IDS, LABELS)


def test_sanitize_strips_planner_styling():
    doc = _doc(gap_px=10, padding_px=4, justify="start", align="end")
    doc["root"]["children"][0]["padding_px"] = 9
    validate_flex_dsl(
        doc, IDS, LABELS,
        forbid_root_spacing=True, drop_container_styling=True, sanitize=True,
    )
    assert "gap_px" not in doc["root"] and "justify" not in doc["root"]
    assert "padding_px" not in doc["root"]["children"][0]


def test_root_frozen_in_refine_mode():
    doc = _doc(gap_px=10)
    with pytest.raises(FlexError, match="root container cannot set"):
        validate_flex_dsl(
            doc, IDS, LABELS,
            allow_object_tuning=True, allow_container_spacing=True,
            allow_container_align=True, forbid_root_spacing=True,
        )
    doc = _doc(justify="start")
    with pytest.raises(FlexError, match="cannot change justify"):
        validate_flex_dsl(
            doc, IDS, LABELS,
            allow_object_tuning=True, allow_container_spacing=True,
            allow_container_align=True, forbid_root_spacing=True,
        )


def test_tuning_fields_validated_in_refine_mode():
    doc = _doc()
    doc["root"]["children"][0]["stick_to"] = {"edges": ["left", "right"]}
    with pytest.raises(FlexError, match="cannot include both"):
        validate_flex_dsl(
            doc, IDS, LABELS,
            allow_object_tuning=True, allow_container_spacing=True,
            allow_container_align=True,
        )


def test_cross_child_conflict_detection():
    nested = {"root": {"type": "flex", "direction": "row", "children": [
        {"object_id": 1, "name": "logo"},
        {"type": "flex", "direction": "column",
         "children": [{"object_id": 2, "name": "photo"}]},
    ]}}
    with pytest.raises(FlexError, match="non-nestable pair via grouping"):
        validate_flex_dsl(
            nested, IDS, LABELS,
            row_bad_pairs={frozenset({"logo", "photo"})},
        )


def test_conflict_precomputation_arithmetic():
    labels = ["a", "b", "c"]
    sizes = [(400, 50), (300, 60), (10, 400)]
    row_bad, col_bad = compute_nesting_conflicts(labels, sizes, (500, 500), 0.05)
    assert ("a", "b") in row_bad  # 400+300+gap > 450 inner width
    assert ("a", "c") in col_bad or ("b", "c") in col_bad or ("a", "b") not in col_bad


def test_json_extraction():
    assert extract_json_maybe('```json\n{"a": 1}\n```') == '{"a": 1}'
    assert extract_json_maybe('noise {"a": {"b": 2}} trailing') == '{"a": {"b": 2}}'
    assert parse_flex_response("not json")["error"] == "invalid_json"
    assert parse_flex_response('{"root": {}}') == {"root": {}}
