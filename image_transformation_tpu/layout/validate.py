"""Flex-DSL validation, sanitize modes, and nesting-conflict precomputation.

Validation parity target: /root/reference/macro_placement_test.py:388-634.

Known divergence (intentional, documented in SURVEY.md §2.6.1): the
reference's `_validate_flex_dsl` contains an indentation bug that makes its
recursive check dead code — as-run, every validation raises a coverage
mismatch and callers fall back to retry paths. This module implements the
validator *as specified*: the recursion actually runs, sanitize modes
actually strip fields, and the coverage/conflict checks see real data. The
orchestrator preserves the reference's *failure handling* (persist error,
retry-once with feedback) for when validation legitimately fails.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Set, Tuple

from .flex import (
    ALLOWED_ALIGN,
    ALLOWED_DIRECTION,
    ALLOWED_JUSTIFY,
    FlexError,
    sanitize_offset,
    sanitize_padding,
    sanitize_pin,
    sanitize_stick_to,
)

LabelPair = Tuple[str, str]


def extract_json_maybe(content: str) -> str:
    """Strip markdown fences and slice the outermost JSON object."""
    s = content.strip()
    if s.startswith("```"):
        parts = s.split("```", 2)
        if len(parts) >= 3:
            s = parts[1]
    start = s.find("{")
    end = s.rfind("}")
    if start != -1 and end != -1 and end > start:
        s = s[start : end + 1]
    return s


def parse_flex_response(raw_text: str) -> Dict:
    """Parse a VLM response into a DSL dict, or an error sentinel."""
    try:
        return json.loads(extract_json_maybe(raw_text))
    except Exception:
        return {"error": "invalid_json", "raw": raw_text[:1000]}


def _leaf_names(node: Dict) -> List[str]:
    """All object names under a node (itself if an object leaf)."""
    out: List[str] = []
    if isinstance(node, dict):
        if "object_id" in node:
            nm = node.get("name")
            if isinstance(nm, str) and nm:
                out.append(nm)
        else:
            for sub in node.get("children", []) or []:
                if isinstance(sub, dict):
                    out.extend(_leaf_names(sub))
    return out


def validate_flex_dsl(
    data: Dict,
    required_obj_ids: List[int],
    id_to_label: Dict[int, str],
    row_bad_pairs: Optional[Set[frozenset]] = None,
    col_bad_pairs: Optional[Set[frozenset]] = None,
    *,
    allow_object_tuning: bool = False,
    allow_container_spacing: bool = False,
    allow_container_align: bool = False,
    forbid_root_spacing: bool = False,
    drop_container_styling: bool = False,
    sanitize: bool = False,
) -> Tuple[Dict, List[int]]:
    """Validate (and optionally sanitize in place) a Flex-DSL document.

    Returns (data, seen_ids). Raises FlexError on any violation.
    """
    if not isinstance(data, dict):
        raise FlexError("DSL root must be an object")
    if "root" not in data:
        raise FlexError("Missing root container")
    root = data["root"]
    if not isinstance(root, dict):
        raise FlexError("root must be an object")

    seen_ids: List[int] = []
    violations: List[str] = []

    def check_conflicts(node: Dict) -> None:
        direction = node.get("direction")
        children = node.get("children", []) or []
        if not children:
            return
        name_sets = [
            _leaf_names(ch) if isinstance(ch, dict) else [] for ch in children
        ]
        for i in range(len(name_sets)):
            for j in range(i + 1, len(name_sets)):
                for ai in name_sets[i]:
                    for bj in name_sets[j]:
                        pair = frozenset({ai, bj})
                        if direction == "row" and row_bad_pairs and pair in row_bad_pairs:
                            violations.append(
                                "Row container indirectly nests non-nestable "
                                f"pair via grouping: {ai} + {bj}"
                            )
                        if direction == "column" and col_bad_pairs and pair in col_bad_pairs:
                            violations.append(
                                "Column container indirectly nests non-nestable "
                                f"pair via grouping: {ai} + {bj}"
                            )

    def validate_container(node: Dict, depth: int) -> None:
        if depth > 2:
            raise FlexError("Nesting depth > 2 not allowed")
        if node.get("type") != "flex":
            raise FlexError("Only type=flex containers supported")
        if node.get("direction") not in ALLOWED_DIRECTION:
            raise FlexError("direction must be 'row' or 'column'")

        justify_present = "justify" in node
        align_present = "align" in node
        justify = node.get("justify", "center")
        align = node.get("align", "center")
        if justify not in ALLOWED_JUSTIFY:
            raise FlexError("invalid justify")
        if align not in ALLOWED_ALIGN:
            raise FlexError("invalid align")

        gap_present = "gap_px" in node
        pad_present = "padding_px" in node
        gap = node.get("gap_px", 0)
        pad = node.get("padding_px", 0)

        if drop_container_styling and sanitize:
            for key in ("gap_px", "padding_px", "justify", "align"):
                node.pop(key, None)
            gap_present = pad_present = justify_present = align_present = False
            gap = pad = 0
            justify = align = "center"

        if not allow_container_align:
            non_center = (justify_present and justify not in (None, "center")) or (
                align_present and align not in (None, "center")
            )
            if non_center:
                if sanitize:
                    node.pop("justify", None)
                    node.pop("align", None)
                    justify_present = align_present = False
                else:
                    raise FlexError("container align/justify not allowed in this mode")
            elif sanitize:
                if justify_present and justify in (None, "center"):
                    node.pop("justify", None)
                    justify_present = False
                if align_present and align in (None, "center"):
                    node.pop("align", None)
                    align_present = False

        if forbid_root_spacing and depth == 1:
            if (gap_present and gap != 0) or (pad_present and pad != 0):
                raise FlexError("root container cannot set gap_px or padding_px")
            if sanitize:
                node.pop("gap_px", None)
                node.pop("padding_px", None)
            if justify_present and justify != "center":
                raise FlexError("root container cannot change justify")
            if align_present and align != "center":
                raise FlexError("root container cannot change align")
            if sanitize:
                node.pop("justify", None)
                node.pop("align", None)
                justify_present = align_present = False

        if not allow_container_spacing and not drop_container_styling:
            if gap_present and gap not in (0, None):
                raise FlexError("gap_px not allowed in this mode")
            if pad_present and pad not in (0, None):
                raise FlexError("padding_px not allowed in this mode")
            if sanitize:
                node.pop("gap_px", None)
                node.pop("padding_px", None)

        if not isinstance(gap, int) or isinstance(gap, bool) or gap < 0:
            raise FlexError("gap_px must be non-negative int")
        if not isinstance(pad, int) or isinstance(pad, bool) or pad < 0:
            raise FlexError("padding_px must be non-negative int")

        children = node.get("children", [])
        if not isinstance(children, list) or not children:
            raise FlexError("flex container must have children")
        for ch in children:
            if not isinstance(ch, dict):
                raise FlexError("child must be object")
            if "object_id" in ch:
                oid = int(ch["object_id"])
                seen_ids.append(oid)
                name = ch.get("name")
                if not isinstance(name, str) or not name:
                    raise FlexError(f"missing or invalid 'name' for object_id {oid}")
                known = id_to_label.get(oid, "").strip()
                if known and name.strip() != known:
                    raise FlexError(
                        f"name mismatch for object_id {oid}: got '{name}', expected '{known}'"
                    )
                if not allow_object_tuning:
                    extras = set(ch.keys()) - {"object_id", "name"}
                    if extras:
                        if sanitize:
                            for key in extras:
                                ch.pop(key, None)
                        else:
                            raise FlexError(
                                f"object_id {oid} includes unsupported fields "
                                f"{sorted(extras)} in baseline mode"
                            )
                else:
                    if ch.get("padding_px") is not None:
                        sanitize_padding(ch.get("padding_px"), oid)
                    if ch.get("pin") is not None:
                        sanitize_pin(ch.get("pin"), oid)
                    if ch.get("offset_px") is not None:
                        sanitize_offset(ch.get("offset_px"), oid)
                    if ch.get("stick_to") is not None:
                        sanitize_stick_to(ch.get("stick_to"), oid)
            else:
                validate_container(ch, depth + 1)
        check_conflicts(node)

    # NOTE: in the reference this call is unreachably indented inside the
    # function body (macro_placement_test.py:573); here it actually runs.
    validate_container(root, 1)

    if sorted(seen_ids) != sorted(required_obj_ids):
        raise FlexError(
            f"object_id coverage mismatch. seen={sorted(seen_ids)}, "
            f"required={sorted(required_obj_ids)}"
        )
    if violations:
        raise FlexError("; ".join(violations))
    return data, seen_ids


def compute_nesting_conflicts(
    labels: List[str],
    sizes: List[Tuple[int, int]],
    canvas_size: Tuple[int, int],
    margin_pct: float,
) -> Tuple[List[LabelPair], List[LabelPair]]:
    """Pairs of labels that cannot share a row (widths) / column (heights).

    Pure-data variant of the reference's file-reading version
    (macro_placement_test.py:587-634); core.bundle supplies labels/sizes.
    """
    w, h = canvas_size
    inner_w = max(1, int(w - 2 * (margin_pct * w)))
    inner_h = max(1, int(h - 2 * (margin_pct * h)))
    min_gap = max(8, int(min(w, h) * 0.01))

    row_bad: Set[LabelPair] = set()
    col_bad: Set[LabelPair] = set()
    n = len(labels)
    for i in range(n):
        for j in range(i + 1, n):
            wi, hi = sizes[i]
            wj, hj = sizes[j]
            if wi >= inner_w or wj >= inner_w or (wi + wj + min_gap) > inner_w:
                row_bad.add(tuple(sorted((labels[i], labels[j]))))
            if hi >= inner_h or hj >= inner_h or (hi + hj + min_gap) > inner_h:
                col_bad.add(tuple(sorted((labels[i], labels[j]))))
    return sorted(row_bad), sorted(col_bad)
