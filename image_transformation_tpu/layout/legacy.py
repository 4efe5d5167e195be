"""Legacy grid/flow layout helpers (pre-Flex-DSL public surface).

The reference exports these from layout_constraints.py even though the main
pipeline no longer calls them (SURVEY.md §2.6.5); they remain part of the
public API. Parity anchors: /root/reference/layout_constraints.py:144-342.
All of this is scalar host logic on object metadata — no device work.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Tuple

from PIL import Image

from .canvas import GRID_CELLS, CellName, cell_row_col


@dataclass
class ObjectMeta:
    object_id: int
    label: str
    file: str
    width: int
    height: int


@dataclass
class Placement:
    object_id: int
    cell: CellName
    box: Tuple[int, int, int, int]
    scale: float


def load_object_meta(objects_dir: str, results_json_path: str) -> Dict[int, ObjectMeta]:
    with open(results_json_path, "r", encoding="utf-8") as f:
        items = json.load(f)
    meta: Dict[int, ObjectMeta] = {}
    for it in items:
        oid = int(it["object_id"])
        file_abs = os.path.join(os.path.dirname(results_json_path), it["filename"])
        with Image.open(file_abs).convert("RGBA") as im:
            w, h = im.size
        meta[oid] = ObjectMeta(oid, it.get("label", ""), file_abs, w, h)
    return meta


_FILL_ORDER = [
    "middle_center", "top_center", "bottom_center", "middle_left",
    "middle_right", "top_left", "top_right", "bottom_left", "bottom_right",
]


def baseline_cell_assignments(results_json_path: str) -> List[Tuple[int, CellName]]:
    """Heuristic 3x3 cell assignment: hero to center, logo/text to the right
    column, the rest by descending area."""
    with open(results_json_path, "r", encoding="utf-8") as f:
        items = json.load(f)
    sized = []
    for it in items:
        x1, y1, x2, y2 = it.get("bounding_box", [0, 0, 0, 0])
        area = max(1, int((x2 - x1) * (y2 - y1)))
        sized.append((int(it["object_id"]), area, it.get("label", "")))
    sized.sort(key=lambda t: t[1], reverse=True)

    placements: List[Tuple[int, CellName]] = []
    used: set = set()
    if sized:
        placements.append((sized[0][0], "middle_center"))
        used.add("middle_center")
    for oid, _, label in sized[1:]:
        low = label.lower()
        if "logo" in low or "text" in low:
            target = "top_right" if "top_right" not in used else (
                "bottom_right" if "bottom_right" not in used else None
            )
            if target:
                placements.append((oid, target))
                used.add(target)
    for oid, _, _ in sized[1:]:
        if oid in [p[0] for p in placements]:
            continue
        for cell in _FILL_ORDER:
            if cell not in used:
                placements.append((oid, cell))
                used.add(cell)
                break
    return placements


def _edge_aligned_xy(cell: CellName, axis: str, x1: int, x2: int, extent: int,
                     inner: int, start: int) -> int:
    row, col = cell_row_col(cell)
    key = col if axis == "x" else row
    if key == 0:
        return x1
    if key == 1:
        return start + (inner - extent) // 2
    return x2 - extent


def finalize_layout(
    assignments: List[Tuple[int, CellName]],
    results_json_path: str,
    canvas_size: Tuple[int, int],
    cells: Dict[CellName, Tuple[int, int, int, int]],
    align: str = "center",
    spacing_px: int = 8,
) -> List[Placement]:
    """Place assigned objects in their grid cells (no scaling), tiling
    multi-object cells along the longer cell axis with fixed spacing."""
    meta = load_object_meta(
        os.path.join(os.path.dirname(results_json_path), "objects"), results_json_path
    )
    by_cell: Dict[CellName, List[ObjectMeta]] = {name: [] for name in GRID_CELLS}
    for oid, cell in assignments:
        by_cell.setdefault(cell, [])
        if oid in meta:
            by_cell[cell].append(meta[oid])

    placements: List[Placement] = []
    for cell, objs in by_cell.items():
        if not objs:
            continue
        x1, y1, x2, y2 = cells[cell]
        cw = max(1, x2 - x1)
        ch = max(1, y2 - y1)
        n = len(objs)
        row, col = cell_row_col(cell)
        if n == 1:
            om = objs[0]
            if align == "center":
                px = x1 + (cw - om.width) // 2
                py = y1 + (ch - om.height) // 2
            else:
                px = x1 if col == 0 else (x1 + (cw - om.width) // 2 if col == 1 else x2 - om.width)
                py = y1 if row == 0 else (y1 + (ch - om.height) // 2 if row == 1 else y2 - om.height)
            placements.append(Placement(om.object_id, cell, (px, py, px + om.width, py + om.height), 1.0))
            continue
        horizontal = cw >= ch
        if horizontal:
            total_w = sum(o.width for o in objs) + spacing_px * (n - 1)
            cur_x = x1
            if align == "center":
                cur_x = x1 + (cw - total_w) // 2
            elif col == 2:
                cur_x = x2 - total_w
            for o in objs:
                if align == "center":
                    py = y1 + (ch - o.height) // 2
                else:
                    py = y1 if row == 0 else (y1 + (ch - o.height) // 2 if row == 1 else y2 - o.height)
                placements.append(Placement(o.object_id, cell, (cur_x, py, cur_x + o.width, py + o.height), 1.0))
                cur_x += o.width + spacing_px
        else:
            total_h = sum(o.height for o in objs) + spacing_px * (n - 1)
            cur_y = y1
            if align == "center":
                cur_y = y1 + (ch - total_h) // 2
            elif row == 2:
                cur_y = y2 - total_h
            for o in objs:
                if align == "center":
                    px = x1 + (cw - o.width) // 2
                else:
                    px = x1 if col == 0 else (x1 + (cw - o.width) // 2 if col == 1 else x2 - o.width)
                placements.append(Placement(o.object_id, cell, (px, cur_y, px + o.width, cur_y + o.height), 1.0))
                cur_y += o.height + spacing_px
    return placements


def pack_flow(
    scaled_objs: List[ObjectMeta],
    canvas_size: Tuple[int, int],
    layout_params: Dict,
    meta: Dict[int, ObjectMeta],
) -> Tuple[List[Placement], Tuple[int, int]]:
    """Centered vertical/horizontal flow packing of pre-scaled objects."""
    align = layout_params.get("align", "center")
    orientation = layout_params.get("orientation", "auto")
    global_margin = layout_params.get("global_margin_px", 20)
    global_spacing = layout_params.get("global_spacing_px", 20)

    tw, th = canvas_size
    if orientation == "auto":
        orientation = "vertical" if th >= tw else "horizontal"

    placements: List[Placement] = []
    if orientation == "vertical":
        total = sum(o.height for o in scaled_objs) + (len(scaled_objs) - 1) * global_spacing
        cursor_y = (th - total) // 2
        for o in scaled_objs:
            px = (tw - o.width) // 2 if align == "center" else global_margin
            scale = o.width / meta[o.object_id].width if meta[o.object_id].width > 0 else 1.0
            placements.append(Placement(o.object_id, "flow_vertical",
                                        (px, cursor_y, px + o.width, cursor_y + o.height), scale))
            cursor_y += o.height + global_spacing
    else:
        total = sum(o.width for o in scaled_objs) + (len(scaled_objs) - 1) * global_spacing
        cursor_x = (tw - total) // 2
        for o in scaled_objs:
            py = (th - o.height) // 2 if align == "center" else global_margin
            scale = o.width / meta[o.object_id].width if meta[o.object_id].width > 0 else 1.0
            placements.append(Placement(o.object_id, "flow_horizontal",
                                        (cursor_x, py, cursor_x + o.width, py + o.height), scale))
            cursor_x += o.width + global_spacing
    return placements, canvas_size


def layout_final_json(
    placements: List[Placement],
    canvas_size: Tuple[int, int],
    margin_pct: float,
    align: str,
) -> Dict:
    return {
        "canvas": {
            "width": canvas_size[0],
            "height": canvas_size[1],
            "margin": margin_pct,
            "align": align,
        },
        "placements": [
            {
                "object_id": p.object_id,
                "cell": p.cell,
                "box": [int(v) for v in p.box],
                "scale": float(p.scale),
            }
            for p in placements
        ],
    }
