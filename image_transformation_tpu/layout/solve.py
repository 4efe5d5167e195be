"""Vectorized Flex-DSL solver: layout as tensors, solvable under jit/vmap.

The host oracle (layout/flex.py) recurses over the DSL dict; this module
flattens the depth<=2 tree into fixed-size integer tensors once on host
(:class:`FlexProgram`) and solves them with masked segment arithmetic in
pure jnp (:func:`solve_program`). Canvas size and per-object pixel sizes
are *traced* inputs, so one compiled program re-solves a layout for any
canvas/margin/object-size variant, vmaps across a batch of them, and fuses
with the compose kernel into a single device program (BASELINE.json
configs #2/#3: margin/align sweeps and batched multi-ratio rendering).

Exact integer parity with the oracle is pinned by property tests: floor
division (jnp follows Python floor semantics), banker's rounding
(jnp.round), downscale-only fitting, pins/offsets/stick edges, sequential
clamp order, and the final size-preserving canvas clamp.

Structure encoding (depth <= 2): the root's children are "entries" —
either a leaf object or a level-1 container whose children are all leaf
objects. Objects carry their tuning fields; containers carry
direction/justify/align/gap/padding.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

import jax.numpy as jnp

DIR_ROW, DIR_COL = 0, 1
J_START, J_CENTER, J_END, J_SPACE_BETWEEN, J_SPACE_AROUND = 0, 1, 2, 3, 4
A_START, A_CENTER, A_END = 0, 1, 2
PIN_NONE, PIN_START, PIN_CENTER, PIN_END = 0, 1, 2, 3

_JUSTIFY_CODE = {
    "start": J_START, "center": J_CENTER, "end": J_END,
    "space_between": J_SPACE_BETWEEN, "space_around": J_SPACE_AROUND,
}
_ALIGN_CODE = {"start": A_START, "center": A_CENTER, "end": A_END}
_PIN_CODE = {"start": PIN_START, "center": PIN_CENTER, "end": PIN_END}


def _justify_code(value) -> int:
    """Oracle-tolerant mapping: flex.py's _axis_cursor falls through to
    start-cursor behavior for unknown justify strings, so the tensor
    program must too (a raw KeyError here used to surface as a misleading
    "missing field" 400 from /v1/render_batch while /v1/render accepted
    the same layout)."""
    return _JUSTIFY_CODE.get(value, J_START)


def _align_code(value) -> int:
    """flex.py's _cross_position treats unknown align as center."""
    return _ALIGN_CODE.get(value, A_CENTER)


@dataclass
class FlexProgram:
    """Host-flattened layout tensors (numpy; ship to device as needed).

    Shapes: E entries, C containers, N objects (program order = DSL order =
    z-order). ``obj_slot_entry``/``obj_slot_container`` locate each object's
    slot; exactly one of them is >= 0.
    """

    # root
    root_dir: int
    root_justify: int
    root_align: int
    root_gap: int
    root_pad: int
    # entries (root children)
    entry_is_container: np.ndarray  # bool [E]
    entry_ref: np.ndarray  # int32 [E] -> object row or container row
    # containers
    cont_dir: np.ndarray  # int32 [C]
    cont_justify: np.ndarray
    cont_align: np.ndarray
    cont_gap: np.ndarray
    cont_pad: np.ndarray
    cont_children: np.ndarray  # int32 [C, K] object rows, -1 padding
    # objects (program order)
    obj_ids: np.ndarray  # int32 [N]
    obj_pad: np.ndarray  # int32 [N, 4] l, r, t, b
    obj_pin: np.ndarray  # int32 [N, 2] horizontal, vertical (PIN_*)
    obj_offset: np.ndarray  # int32 [N, 2] x, y
    obj_stick: np.ndarray  # int32 [N, 4] left, right, top, bottom flags
    obj_stick_margin: np.ndarray  # int32 [N]
    obj_parent_entry: np.ndarray  # int32 [N] entry row if root child else -1
    obj_parent_cont: np.ndarray  # int32 [N] container row if nested else -1

    @staticmethod
    def from_dsl(root: Dict) -> "FlexProgram":
        from .flex import sanitize_offset, sanitize_padding, sanitize_pin, sanitize_stick_to

        entries_is_c: List[bool] = []
        entries_ref: List[int] = []
        conts: List[Dict] = []
        cont_children: List[List[int]] = []
        objs: List[Dict] = []
        obj_parent_entry: List[int] = []
        obj_parent_cont: List[int] = []

        def add_object(node: Dict, entry_idx: int, cont_idx: int) -> int:
            oid = int(node.get("object_id", -1))
            pad = sanitize_padding(node.get("padding_px"), oid)
            pin = sanitize_pin(node.get("pin"), oid) if node.get("pin") is not None else {}
            off = sanitize_offset(node.get("offset_px"), oid)
            stick = (
                sanitize_stick_to(node.get("stick_to"), oid)
                if node.get("stick_to") is not None
                else {}
            )
            edges = stick.get("edges", [])
            objs.append({
                "id": oid,
                "pad": [pad["left"], pad["right"], pad["top"], pad["bottom"]],
                "pin": [
                    _PIN_CODE.get(pin.get("horizontal"), PIN_NONE),
                    _PIN_CODE.get(pin.get("vertical"), PIN_NONE),
                ],
                "offset": [off["x"], off["y"]],
                "stick": [
                    int("left" in edges), int("right" in edges),
                    int("top" in edges), int("bottom" in edges),
                ],
                "stick_margin": int(stick.get("margin_px", 0)),
            })
            obj_parent_entry.append(entry_idx)
            obj_parent_cont.append(cont_idx)
            return len(objs) - 1

        for ch in root.get("children", []) or []:
            if "object_id" in ch:
                e = len(entries_is_c)
                entries_is_c.append(False)
                entries_ref.append(add_object(ch, e, -1))
            else:
                c = len(conts)
                conts.append({
                    "dir": DIR_ROW if ch.get("direction", "row") == "row" else DIR_COL,
                    "justify": _justify_code(ch.get("justify", "center")),
                    "align": _align_code(ch.get("align", "center")),
                    "gap": int(ch.get("gap_px", 0)),
                    "pad": int(ch.get("padding_px", 0)),
                })
                kids = []
                for sub in ch.get("children", []) or []:
                    if "object_id" not in sub:
                        raise ValueError("FlexProgram requires depth <= 2")
                    kids.append(add_object(sub, -1, c))
                cont_children.append(kids)
                entries_is_c.append(True)
                entries_ref.append(c)

        E = max(1, len(entries_is_c))
        C = max(1, len(conts))
        N = max(1, len(objs))
        K = max(1, max((len(k) for k in cont_children), default=1))

        kids_arr = np.full((C, K), -1, np.int32)
        for c, kids in enumerate(cont_children):
            kids_arr[c, : len(kids)] = kids

        def pad_list(values, fill, n):
            out = list(values) + [fill] * (n - len(values))
            return np.asarray(out, np.int32)

        return FlexProgram(
            root_dir=DIR_ROW if root.get("direction", "row") == "row" else DIR_COL,
            root_justify=_justify_code(root.get("justify", "center")),
            root_align=_align_code(root.get("align", "center")),
            root_gap=int(root.get("gap_px", 0)),
            root_pad=int(root.get("padding_px", 0)),
            entry_is_container=pad_list(
                [int(b) for b in entries_is_c], 0, E
            ).astype(bool),
            entry_ref=pad_list(entries_ref, -1, E),
            cont_dir=pad_list([c["dir"] for c in conts], 0, C),
            cont_justify=pad_list([c["justify"] for c in conts], J_CENTER, C),
            cont_align=pad_list([c["align"] for c in conts], A_CENTER, C),
            cont_gap=pad_list([c["gap"] for c in conts], 0, C),
            cont_pad=pad_list([c["pad"] for c in conts], 0, C),
            cont_children=kids_arr,
            obj_ids=pad_list([o["id"] for o in objs], -1, N),
            obj_pad=np.asarray(
                [o["pad"] for o in objs] + [[0, 0, 0, 0]] * (N - len(objs)), np.int32
            ),
            obj_pin=np.asarray(
                [o["pin"] for o in objs] + [[0, 0]] * (N - len(objs)), np.int32
            ),
            obj_offset=np.asarray(
                [o["offset"] for o in objs] + [[0, 0]] * (N - len(objs)), np.int32
            ),
            obj_stick=np.asarray(
                [o["stick"] for o in objs] + [[0, 0, 0, 0]] * (N - len(objs)), np.int32
            ),
            obj_stick_margin=pad_list([o["stick_margin"] for o in objs], 0, N),
            obj_parent_entry=pad_list(obj_parent_entry, -1, N),
            obj_parent_cont=pad_list(obj_parent_cont, -1, N),
        )

    @property
    def n_entries(self) -> int:
        return len(self.entry_ref)

    @property
    def n_objects(self) -> int:
        return len(self.obj_ids)


def _axis_start_and_gap(justify, inner_start, inner_extent, content, n, gap):
    """Traced replica of the oracle's justify cursor arithmetic."""
    total = content + gap * jnp.maximum(n - 1, 0)
    start_start = inner_start
    start_center = inner_start + jnp.maximum(0, (inner_extent - total) // 2)
    start_end = inner_start + jnp.maximum(0, inner_extent - total)
    sb_applies = (justify == J_SPACE_BETWEEN) & (n > 1)
    sa_applies = (justify == J_SPACE_AROUND) & (n > 0)
    g_sb = jnp.maximum(0, (inner_extent - content) // jnp.maximum(n - 1, 1))
    g_sa = jnp.maximum(0, (inner_extent - content) // jnp.maximum(n, 1))
    start = jnp.where(
        justify == J_CENTER,
        start_center,
        jnp.where(justify == J_END, start_end, start_start),
    )
    start = jnp.where(sa_applies, inner_start + g_sa // 2, start)
    gap_between = jnp.where(sb_applies, g_sb, jnp.where(sa_applies, g_sa, gap))
    return start, gap_between


def _cross_pos(align, inner_start, inner_extent, extent):
    center = inner_start + (inner_extent - extent) // 2
    return jnp.where(
        align == A_START,
        inner_start,
        jnp.where(align == A_END, inner_start + (inner_extent - extent), center),
    )


def solve_program(
    prog: FlexProgram,
    canvas_wh,
    obj_wh: jnp.ndarray,
    obj_known: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve to clamped pixel boxes. Returns (boxes int32 [N,4], scales f32 [N]).

    canvas_wh: (W, H) traced ints; obj_wh: int32 [N, 2] = (w, h) per program
    object row; obj_known: bool [N] (False reproduces the oracle's
    missing-image semantics: the object fills its inner slot).
    """
    W = jnp.asarray(canvas_wh[0], jnp.int32)
    H = jnp.asarray(canvas_wh[1], jnp.int32)
    ow = obj_wh[:, 0].astype(jnp.int32)
    oh = obj_wh[:, 1].astype(jnp.int32)
    pad_l, pad_r = prog.obj_pad[:, 0], prog.obj_pad[:, 1]
    pad_t, pad_b = prog.obj_pad[:, 2], prog.obj_pad[:, 3]

    valid_obj = jnp.asarray(prog.obj_parent_entry >= 0) | jnp.asarray(
        prog.obj_parent_cont >= 0
    )

    # ---- measure objects (size + 4-side padding, floored at 0) ----
    m_ow = jnp.maximum(0, ow + pad_l + pad_r)
    m_oh = jnp.maximum(0, oh + pad_t + pad_b)

    # ---- measure containers ----
    C, K = prog.cont_children.shape
    kid_idx = jnp.asarray(prog.cont_children)
    kid_valid = kid_idx >= 0
    safe_kid = jnp.maximum(kid_idx, 0)
    kid_w = jnp.where(kid_valid, m_ow[safe_kid], 0)
    kid_h = jnp.where(kid_valid, m_oh[safe_kid], 0)
    n_kids = jnp.sum(kid_valid, axis=1)
    c_gap = jnp.asarray(prog.cont_gap)
    c_pad2 = 2 * jnp.maximum(0, jnp.asarray(prog.cont_pad))
    gaps = c_gap * jnp.maximum(n_kids - 1, 0)
    c_dir = jnp.asarray(prog.cont_dir)
    m_cw = jnp.where(
        c_dir == DIR_ROW, jnp.sum(kid_w, axis=1) + gaps, jnp.max(kid_w, axis=1)
    )
    m_ch = jnp.where(
        c_dir == DIR_ROW, jnp.max(kid_h, axis=1), jnp.sum(kid_h, axis=1) + gaps
    )
    m_cw = jnp.maximum(0, m_cw + c_pad2)
    m_ch = jnp.maximum(0, m_ch + c_pad2)
    # empty containers measure to (2*pad, 2*pad)
    m_cw = jnp.where(n_kids == 0, jnp.maximum(0, c_pad2), m_cw)
    m_ch = jnp.where(n_kids == 0, jnp.maximum(0, c_pad2), m_ch)

    # ---- entry measured sizes ----
    e_is_c = jnp.asarray(prog.entry_is_container)
    e_ref = jnp.maximum(jnp.asarray(prog.entry_ref), 0)
    e_valid = jnp.asarray(prog.entry_ref) >= 0
    e_w = jnp.where(e_is_c, m_cw[e_ref], m_ow[e_ref])
    e_h = jnp.where(e_is_c, m_ch[e_ref], m_oh[e_ref])
    e_w = jnp.where(e_valid, e_w, 0)
    e_h = jnp.where(e_valid, e_h, 0)

    # ---- place root entries ----
    r_pad = prog.root_pad
    inner_x = jnp.int32(0) + r_pad
    inner_y = jnp.int32(0) + r_pad
    inner_w = jnp.maximum(0, W - 2 * r_pad)
    inner_h = jnp.maximum(0, H - 2 * r_pad)
    n_entries = jnp.sum(e_valid)
    row = prog.root_dir == DIR_ROW
    main_extent = jnp.where(row, e_w, e_h)
    content = jnp.sum(jnp.where(e_valid, main_extent, 0))
    start, gap_between = _axis_start_and_gap(
        jnp.int32(prog.root_justify),
        jnp.where(row, inner_x, inner_y),
        jnp.where(row, inner_w, inner_h),
        content,
        n_entries,
        jnp.int32(prog.root_gap),
    )
    steps = jnp.where(e_valid, main_extent + gap_between, 0)
    offsets = jnp.concatenate([jnp.zeros((1,), steps.dtype), jnp.cumsum(steps)[:-1]])
    main_pos = start + offsets
    cross_pos = _cross_pos(
        jnp.int32(prog.root_align),
        jnp.where(row, inner_y, inner_x),
        jnp.where(row, inner_h, inner_w),
        jnp.where(row, e_h, e_w),
    )
    e_x = jnp.where(row, main_pos, cross_pos)
    e_y = jnp.where(row, cross_pos, main_pos)

    # ---- place container children (slots inside their entry box) ----
    # container c sits at the entry whose ref == c and is_container
    cont_rows = jnp.arange(C)
    ent_of_cont = jnp.argmax(
        (jnp.asarray(prog.entry_ref)[None, :] == cont_rows[:, None])
        & e_is_c[None, :]
        & e_valid[None, :],
        axis=1,
    )
    c_x0 = e_x[ent_of_cont]
    c_y0 = e_y[ent_of_cont]
    c_w = m_cw
    c_h = m_ch
    c_padv = jnp.asarray(prog.cont_pad)
    ci_x = c_x0 + c_padv
    ci_y = c_y0 + c_padv
    ci_w = jnp.maximum(0, c_w - 2 * c_padv)
    ci_h = jnp.maximum(0, c_h - 2 * c_padv)
    c_row = c_dir == DIR_ROW
    kid_main = jnp.where(c_row[:, None], kid_w, kid_h)
    kid_content = jnp.sum(jnp.where(kid_valid, kid_main, 0), axis=1)
    c_start, c_gap_between = _axis_start_and_gap(
        jnp.asarray(prog.cont_justify),
        jnp.where(c_row, ci_x, ci_y),
        jnp.where(c_row, ci_w, ci_h),
        kid_content,
        n_kids,
        c_gap,
    )
    kid_steps = jnp.where(kid_valid, kid_main + c_gap_between[:, None], 0)
    kid_offsets = jnp.concatenate(
        [jnp.zeros((C, 1), kid_steps.dtype), jnp.cumsum(kid_steps, axis=1)[:, :-1]],
        axis=1,
    )
    kid_main_pos = c_start[:, None] + kid_offsets
    kid_cross_pos = _cross_pos(
        jnp.asarray(prog.cont_align)[:, None],
        jnp.where(c_row, ci_y, ci_x)[:, None],
        jnp.where(c_row, ci_h, ci_w)[:, None],
        jnp.where(c_row[:, None], kid_h, kid_w),
    )
    kid_x = jnp.where(c_row[:, None], kid_main_pos, kid_cross_pos)
    kid_y = jnp.where(c_row[:, None], kid_cross_pos, kid_main_pos)

    # ---- gather per-object slot origin/size + governing direction/align ----
    N = prog.n_objects
    pe = jnp.asarray(prog.obj_parent_entry)
    pc = jnp.asarray(prog.obj_parent_cont)
    is_root_child = pe >= 0
    safe_pe = jnp.maximum(pe, 0)
    safe_pc = jnp.maximum(pc, 0)

    # position within container child list
    obj_rows = jnp.arange(N)
    in_cont_pos = jnp.argmax(kid_idx[safe_pc] == obj_rows[:, None], axis=1)

    slot_x = jnp.where(is_root_child, e_x[safe_pe], kid_x[safe_pc, in_cont_pos])
    slot_y = jnp.where(is_root_child, e_y[safe_pe], kid_y[safe_pc, in_cont_pos])
    slot_w = jnp.where(is_root_child, e_w[safe_pe], kid_w[safe_pc, in_cont_pos])
    slot_h = jnp.where(is_root_child, e_h[safe_pe], kid_h[safe_pc, in_cont_pos])
    gov_dir = jnp.where(is_root_child, jnp.int32(prog.root_dir), c_dir[safe_pc])
    gov_align = jnp.where(is_root_child, jnp.int32(prog.root_align), jnp.asarray(prog.cont_align)[safe_pc])

    # ---- per-object placement (elementwise replica of the oracle) ----
    in_x1 = slot_x + pad_l
    in_y1 = slot_y + pad_t
    in_x2 = jnp.maximum(in_x1, slot_x + slot_w - pad_r)
    in_y2 = jnp.maximum(in_y1, slot_y + slot_h - pad_b)
    in_w = jnp.maximum(0, in_x2 - in_x1)
    in_h = jnp.maximum(0, in_y2 - in_y1)

    owf = ow.astype(jnp.float32)
    ohf = oh.astype(jnp.float32)
    known = obj_known & (ow > 0) & (oh > 0)
    sw = jnp.where(in_w > 0, in_w.astype(jnp.float32) / jnp.maximum(owf, 1.0), 1.0)
    sh = jnp.where(in_h > 0, in_h.astype(jnp.float32) / jnp.maximum(ohf, 1.0), 1.0)
    scale = jnp.maximum(0.0, jnp.minimum(1.0, jnp.minimum(sw, sh)))
    t_w = jnp.round(owf * scale).astype(jnp.int32)
    t_h = jnp.round(ohf * scale).astype(jnp.int32)
    t_w = jnp.where(known, t_w, in_w)
    t_h = jnp.where(known, t_h, in_h)
    scale = jnp.where(known, scale, 1.0)
    t_w = jnp.clip(t_w, 0, in_w)
    t_h = jnp.clip(t_h, 0, in_h)

    pin_h = prog.obj_pin[:, 0]
    pin_v = prog.obj_pin[:, 1]
    # default modes: horizontal <- align if parent is column else start;
    # vertical <- align if parent is row else start
    def align_to_pin(a):
        return jnp.where(a == A_CENTER, PIN_CENTER, jnp.where(a == A_END, PIN_END, PIN_START))

    h_mode = jnp.where(
        pin_h != PIN_NONE,
        pin_h,
        jnp.where(gov_dir == DIR_COL, align_to_pin(gov_align), PIN_START),
    )
    v_mode = jnp.where(
        pin_v != PIN_NONE,
        pin_v,
        jnp.where(gov_dir == DIR_ROW, align_to_pin(gov_align), PIN_START),
    )

    rem_w = jnp.maximum(0, in_w - t_w).astype(jnp.float32)
    rem_h = jnp.maximum(0, in_h - t_h).astype(jnp.float32)
    base_x = jnp.where(
        h_mode == PIN_CENTER,
        in_x1.astype(jnp.float32) + rem_w / 2,
        jnp.where(h_mode == PIN_END, (in_x2 - t_w).astype(jnp.float32), in_x1.astype(jnp.float32)),
    )
    base_y = jnp.where(
        v_mode == PIN_CENTER,
        in_y1.astype(jnp.float32) + rem_h / 2,
        jnp.where(v_mode == PIN_END, (in_y2 - t_h).astype(jnp.float32), in_y1.astype(jnp.float32)),
    )

    st_l = prog.obj_stick[:, 0] > 0
    st_r = prog.obj_stick[:, 1] > 0
    st_t = prog.obj_stick[:, 2] > 0
    st_b = prog.obj_stick[:, 3] > 0
    margin = jnp.asarray(prog.obj_stick_margin).astype(jnp.float32)
    base_x = jnp.where(st_l, in_x1.astype(jnp.float32) + margin, base_x)
    base_x = jnp.where(
        ~st_l & st_r, (in_x2 - t_w).astype(jnp.float32) - margin, base_x
    )
    base_y = jnp.where(st_t, in_y1.astype(jnp.float32) + margin, base_y)
    base_y = jnp.where(
        ~st_t & st_b, (in_y2 - t_h).astype(jnp.float32) - margin, base_y
    )

    base_x = base_x + prog.obj_offset[:, 0]
    base_y = base_y + prog.obj_offset[:, 1]

    max_x = jnp.maximum(in_x1, in_x2 - t_w).astype(jnp.float32)
    max_y = jnp.maximum(in_y1, in_y2 - t_h).astype(jnp.float32)
    base_x = jnp.clip(base_x, in_x1.astype(jnp.float32), max_x)
    base_y = jnp.clip(base_y, in_y1.astype(jnp.float32), max_y)

    x1 = jnp.round(base_x).astype(jnp.int32)  # banker's, as Python round()
    y1 = jnp.round(base_y).astype(jnp.int32)
    x2 = x1 + t_w
    y2 = y1 + t_h

    # sequential push-inside (right/bottom first, then left/top)
    over_r = jnp.maximum(0, x2 - in_x2)
    x1, x2 = x1 - over_r, x2 - over_r
    under_l = jnp.maximum(0, in_x1 - x1)
    x1, x2 = x1 + under_l, x2 + under_l
    over_b = jnp.maximum(0, y2 - in_y2)
    y1, y2 = y1 - over_b, y2 - over_b
    under_t = jnp.maximum(0, in_y1 - y1)
    y1, y2 = y1 + under_t, y2 + under_t

    # final canvas clamp (size preserving)
    w_box = x2 - x1
    h_box = y2 - y1
    x1 = jnp.maximum(0, jnp.minimum(x1, W - w_box))
    y1 = jnp.maximum(0, jnp.minimum(y1, H - h_box))
    boxes = jnp.stack([x1, y1, x1 + w_box, y1 + h_box], axis=1)
    boxes = jnp.where(valid_obj[:, None], boxes, 0)
    return boxes.astype(jnp.int32), scale
